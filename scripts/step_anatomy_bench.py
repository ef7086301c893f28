"""Slope-fetch anatomy of one closed-loop step at the bench config.

Times, via chained dependent repeats + one tiny host fetch (the only
axon-safe method for Pallas-containing programs, CLAUDE.md timing trap):

  lift            vmapped basis.lift
  qp_assemble     bilinear qp_data + u0 elimination (no solve)
  qp_kernel       solve_qp_shared_batched on the assembled matrices
  mpc_solve       full BilinearKmpc.solve
  plant_step      Arm.simulate_Ts (bench integrator settings)

Run on the TPU, one process:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/step_anatomy_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope_clock(make_chain, ks=(2, 10), reps=5):
    """make_chain(k) -> jitted fn returning a scalar; per-iter cost = slope."""
    walls = {}
    for k in ks:
        f = make_chain(k)
        float(f())                       # compile + first fetch
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f())                   # host fetch = true sync
            ts.append(time.perf_counter() - t0)
        walls[k] = min(ts)
    return (walls[ks[-1]] - walls[ks[0]]) / (ks[-1] - ks[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.control.kmpc import bilinear_consts, _pad_ref
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_ref_trajectory,
    )

    B = int(os.environ.get("BENCH_BATCH", "8192"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()
    blocks = tuple(int(b) for b in os.environ["BLOCKS"].split(",")) \
        if os.environ.get("BLOCKS") else None
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=int(os.environ.get("QP_ITERS", "2")),
        qp_dual_warm=True,   # bench.py config
        qp_dual_shift=True, input_blocks=blocks,
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
        proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    sim = Ksim(arm, mpc)

    # harvest realistic per-lane inputs from a short closed loop
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)
    rec = ("X", "U", "zeta", "u_prev_sc", "U_plan_in", "what")
    runner = sim.batched_runner(ref["y"], steps=12, record=rec)
    out = jax.block_until_ready(runner(jnp.asarray(X0), jnp.asarray(W)))
    pick = lambda k: jnp.asarray(np.asarray(out[k])[:, -1])
    zeta, u_prev, U_plan = pick("zeta"), pick("u_prev_sc"), pick("U_plan_in")
    X, U = pick("X"), pick("U")
    refhor = jnp.asarray(sim.prep_ref(ref["y"])[11: 12 + mpc.Np])
    basis = mpc.model.basis
    if getattr(mpc, "wants_zeta", False):
        z = zeta          # lift-fused controller: the solve consumes zeta
    else:
        z = jax.jit(jax.vmap(basis.lift))(zeta)
    consts = bilinear_consts(mpc)
    Np, m, nproj = mpc.Np, mpc.m, mpc.nproj

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
    )

    def assemble_one(c, z1, up, Upl):
        """Factored qp_data (W, v), mirroring bilinear_solve_pure iters=1."""
        refp = _pad_ref(refhor, Np, nproj)
        Yr = refp.reshape(-1)
        r = c["PA"].shape[1]
        CB = (c["PG"] @ z1).reshape((Np + 1) * r, Np * m)
        CAz = (c["PA"] @ z1).reshape(-1)
        sq = jnp.sqrt(c["Qd"])
        W = sq[:, None] * CB[:, m:]
        v = sq * (CAz - Yr + CB[:, :m] @ up)
        x0 = jnp.concatenate([Upl[2:], Upl[-1:]], axis=0).reshape(-1)
        if "Tb" in c:                            # move-blocked reduced var
            W = W @ c["Tb"]
            x0 = c["Sel"] @ x0
        return W, v, x0

    if "Tb" in consts:
        Av = jnp.asarray(consts["FjT"])
        bv = jnp.asarray(consts["cFjT"])
        F0 = jnp.asarray(consts["F0T"])
        rdz = jnp.asarray(consts["RdT"])
    else:
        Av = jnp.asarray(consts["Fj"][:, m:])
        bv = jnp.asarray(consts["cFj"])
        F0 = jnp.asarray(consts["Fj"][:, :m])
        rdz = jnp.asarray(consts["Rd"][m:])
    Wz, vz, x0z = jax.jit(jax.vmap(
        lambda zz, uu, UU: assemble_one(consts, zz, uu, UU)))(z, u_prev, U_plan)
    bz = jnp.broadcast_to(bv[None], (B,) + bv.shape) - (u_prev @ F0.T)

    def chain(fn, seed, k):
        """Chain k dependent applications of fn; fn(x)->x-like; fetch scalar."""
        @jax.jit
        def f():
            def body(x, _):
                return fn(x), ()
            xx, _ = jax.lax.scan(body, seed, None, length=k)
            return jnp.sum(jax.tree_util.tree_leaves(xx)[0][0]).astype(jnp.float32)
        return f

    results = {}

    # 1. lift: zeta -> z -> perturb back into a zeta-shaped carry
    lift_v = jax.vmap(basis.lift)
    results["lift"] = slope_clock(lambda k: chain(
        lambda zt: zt * 0.999 + 1e-9 * jnp.sum(lift_v(zt)), zeta, k))

    # 2. assembly only (carry: zeta-like; output feeds back via tiny sum)
    asm_v = jax.vmap(lambda zz, uu, UU: assemble_one(consts, zz, uu, UU))
    def asm_step(zt):
        P1, q1, x01 = asm_v(lift_v(zt), u_prev, U_plan)
        return zt * 0.999 + 1e-12 * jnp.sum(q1)
    results["lift+assemble"] = slope_clock(lambda k: chain(asm_step, zeta, k))

    # 3. kernel only (bench variant: banded + dual warm), carry (x, lam)
    lam_seed = jnp.ones((B, Av.shape[0]), jnp.float32)
    def kern_step(carry):
        x, lam = carry
        xs, lam1, ok, gap = solve_qp_factored_batched(
            Wz, vz, rdz, Av, bz, x0=0.99 * x, iters=mpc.cfg.qp_iters,
            band=mpc._band, lam0=lam)
        return xs, lam1
    results["qp_kernel"] = slope_clock(lambda k: chain(
        kern_step, (x0z, lam_seed), k))

    # 4. full mpc.solve (bench variant: dual warm), carry (U_plan, lam)
    solve_v = jax.vmap(lambda zz, uu, UU, ll: mpc.solve(zz, uu, refhor,
                                                        U_init=UU,
                                                        lam_init=ll))
    def mpc_step(carry):
        Upl, lam = carry
        Uo, ok, lam1 = solve_v(z, u_prev, Upl, lam)
        return 0.999 * Uo, lam1
    results["mpc_solve"] = slope_clock(lambda k: chain(
        mpc_step, (U_plan, lam_seed), k))

    # 5. plant step (carry: X)
    plant_v = jax.vmap(lambda x, u, w: arm.simulate_Ts(x, u, w))
    Wj = jnp.asarray(W)
    def plant_stepf(x):
        return plant_v(x, U, Wj)
    results["plant_step"] = slope_clock(lambda k: chain(plant_stepf, X, k))

    for name, s in results.items():
        print(f"{name:15s}: {s*1e3:7.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
