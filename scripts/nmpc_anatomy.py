"""Slope-fetch anatomy of one NMPC (SQP) control step at the bench config.

Phases (chained dependent repeats + one tiny host fetch -- the axon-safe
timing method, CLAUDE.md):

  F_eval       vmapped F(zeta, u) over (B, Np)
  jacs         the three condense autodiff products (jac_z, jac_u, Fv)
  condense     full _condense (jacs + condensation scan)
  qp_pass      one SQP pass's QP assembly + factored-kernel solve
  rollout      one between-pass nonlinear re-rollout (lax.scan of F)
  sqp_solve    full NonlinearKmpc.solve (sqp_iters passes)
  plant_step   Arm.simulate_Ts at the bench integrator settings

Run on the TPU, one process:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/nmpc_anatomy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope_clock(make_chain, ks=(2, 10), reps=5):
    walls = {}
    for k in ks:
        f = make_chain(k)
        float(f())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        walls[k] = min(ts)
    return (walls[ks[-1]] - walls[ks[0]]) / (ks[-1] - ks[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.control.kmpc import _pad_ref
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_ref_trajectory,
    )

    B = int(os.environ.get("BENCH_BATCH", "2048"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="nonlinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    pca_explained=99.99,
                                    dtype="float32")).train_models()
    cfg = MpcConfig(
        horizon=10, qp_iters=8,
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
        proj_idx=(4, 5))
    mpc = make_kmpc(ks.model, ks.scaler, cfg)
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    sim = Ksim(arm, mpc)
    print(f"N={ks.model.meta.NL} nz={mpc.nz} Np={mpc.Np} B={B} "
          f"sqp_iters={cfg.sqp_iters} qp_iters={cfg.qp_iters}", flush=True)

    # realistic per-lane state from a short closed loop
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)
    rec = ("X", "U", "zeta", "u_prev_sc", "U_plan_in")
    runner = sim.batched_runner(ref["y"], steps=12, record=rec)
    out = jax.block_until_ready(runner(jnp.asarray(X0), jnp.asarray(W)))
    pick = lambda k: jnp.asarray(np.asarray(out[k])[:, -1])
    zeta, u_prev, U_plan = pick("zeta"), pick("u_prev_sc"), pick("U_plan_in")
    X, U = pick("X"), pick("U")
    refhor = jnp.asarray(sim.prep_ref(ref["y"])[11: 12 + mpc.Np])
    Np, m, nz = mpc.Np, mpc.m, mpc.nz

    def chain(fn, seed, k):
        @jax.jit
        def f():
            def body(x, _):
                return fn(x), ()
            xx, _ = jax.lax.scan(body, seed, None, length=k)
            return jnp.sum(jax.tree_util.tree_leaves(xx)[0][0]).astype(jnp.float32)
        return f

    results = {}

    Zl0 = jnp.tile(zeta[:, None, :], (1, Np, 1))          # (B, Np, nz)
    Ul0 = jnp.tile(u_prev[:, None, :], (1, Np, 1))        # (B, Np, m)

    # 1. F eval over (B, Np)
    F_bn = jax.vmap(jax.vmap(mpc.F_fn))
    def f_step(Zl):
        return Zl * 0.999 + 1e-9 * jnp.sum(F_bn(Zl, Ul0))
    results["F_eval"] = slope_clock(lambda k: chain(f_step, Zl0, k))

    # 2. the three condense autodiff products
    jz = jax.vmap(jax.vmap(jax.jacfwd(mpc.F_fn, argnums=0)))
    ju = jax.vmap(jax.vmap(jax.jacfwd(mpc.F_fn, argnums=1)))
    def jac_step(Zl):
        a = jz(Zl, Ul0)
        b = ju(Zl, Ul0)
        c = F_bn(Zl, Ul0)
        return Zl * 0.999 + 1e-9 * (jnp.sum(a) + jnp.sum(b) + jnp.sum(c))
    results["jacs"] = slope_clock(lambda k: chain(jac_step, Zl0, k))

    # 3. full condense
    cond = jax.vmap(lambda Zl, Ul, z0: mpc._condense(Zl, Ul, z0))
    def cond_step(Zl):
        Sz, sz = cond(Zl, Ul0, zeta)
        return Zl * 0.999 + 1e-9 * (jnp.sum(Sz) + jnp.sum(sz))
    results["condense"] = slope_clock(lambda k: chain(cond_step, Zl0, k))

    # 4. one SQP pass (condense + assemble + QP) via sqp_iters=1 solve
    import dataclasses
    mpc1 = make_kmpc(ks.model, ks.scaler, dataclasses.replace(cfg, sqp_iters=1))
    solve1 = jax.vmap(lambda zz, uu: mpc1.solve(zz, uu, refhor))
    def pass_step(up):
        Uo, ok = solve1(zeta, up)
        return 0.999 * up + 1e-6 * Uo[:, 1]
    results["sqp_1pass"] = slope_clock(lambda k: chain(pass_step, u_prev, k))

    # 5. one nonlinear re-rollout
    def roll_one(z0, Ur):
        def roll(zc, u):
            return mpc.F_fn(zc, u), zc
        _, Zl = jax.lax.scan(roll, z0, Ur)
        return Zl
    roll_v = jax.vmap(roll_one)
    def roll_step(Zl):
        Z2 = roll_v(zeta, Ul0)
        return Zl * 0.999 + 1e-9 * jnp.sum(Z2)
    results["rollout"] = slope_clock(lambda k: chain(roll_step, Zl0, k))

    # 6. full SQP solve
    solve_v = jax.vmap(lambda zz, uu: mpc.solve(zz, uu, refhor))
    def solve_step(up):
        Uo, ok = solve_v(zeta, up)
        return 0.999 * up + 1e-6 * Uo[:, 1]
    results["sqp_solve"] = slope_clock(lambda k: chain(solve_step, u_prev, k))

    # 7. plant step
    plant_v = jax.vmap(lambda x, u, w: arm.simulate_Ts(x, u, w))
    Wj = jnp.asarray(W)
    def plant_stepf(x):
        return plant_v(x, U, Wj)
    results["plant_step"] = slope_clock(lambda k: chain(plant_stepf, X, k))

    for name, s in results.items():
        print(f"{name:12s}: {s*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
