"""TRUE in-loop phase costs by surgical ablation of the fused scan.

ROUND-5 NOTE: this measures the GENERAL (unfused) runner -- the bench
now ships the single-launch step-fused runner (ops/pallas/step_fused.py)
whose in-kernel anatomy is attributed by scripts/device_profile.py +
scripts/kernel_anatomy.py instead (stubbing mpc.solve cannot see inside
one launch; the round-5 trace also showed this script's qp-iters
marginal UNDER-measures because removing the QP removes its prologue).

The isolated chained-phase anatomy (scripts/step_anatomy_bench.py) measures
each phase OUT of the loop; at B=32768 its numbers sum to more than the
real step, i.e. it overstates shares (different layouts, no cross-phase
fusion).  Here each phase is instead REPLACED by a shape-preserving stub
inside the otherwise untouched closed-loop scan, and the end-to-end wall
delta is that phase's true in-loop marginal cost:

  full      : the shipping bench loop
  no_qp     : mpc.solve -> shifted-plan passthrough (keeps z/u dataflow)
  no_plant  : simulate_Ts -> decayed state + tiny input coupling
  no_lift   : basis.lift -> cheap linear embed
  floor     : all three stubbed (harness + carry traffic only)

Deltas do not decompose perfectly (fusion across phase boundaries changes
when neighbors disappear) but they bound each phase honestly in the real
program.  Walls: median of reps with block_until_ready (big-output runner
-- queue backpressure makes BUR track true exec, CLAUDE.md timing notes).

Run on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/inloop_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_ref_trajectory,
    )

    model_type = os.environ.get("MODEL", "bilinear")
    B = int(os.environ.get("BENCH_BATCH",
                           "32768" if model_type == "bilinear" else "8192"))
    steps = int(os.environ.get("BENCH_STEPS", "301"))
    reps = int(os.environ.get("REPS", "5"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(
            model_type=model_type, obs_type=("poly",), obs_degree=(3,),
            dim_red=True,
            pca_explained=99.99 if model_type == "nonlinear" else 99.0,
            dtype="float32")).train_models()
    blocks_env = os.environ.get("BLOCKS", "1,1,2,5")
    blocks = tuple(int(b) for b in blocks_env.split(",")) if blocks_env \
        else None
    cfg = MpcConfig(
        horizon=10,
        qp_iters=int(os.environ.get(
            "QP_ITERS", "3" if model_type == "bilinear" else "8")),
        qp_dual_warm=model_type == "bilinear",
        qp_dual_shift=model_type == "bilinear", input_blocks=blocks,
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8), input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5))

    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W0 = np.zeros((B, 2), np.float32)

    def wall(sim):
        runner = sim.batched_runner(ref["y"], steps=steps,
                                    record=("Y", "R", "alive"))
        out = jax.block_until_ready(runner(X0, W0))       # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(runner(X0, W0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def build(no_qp=False, no_plant=False, no_lift=False, cfg_kw=None):
        import dataclasses
        c = dataclasses.replace(cfg, **cfg_kw) if cfg_kw else cfg
        mpc = make_kmpc(ks.model, ks.scaler, c)
        arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                            output_type="markers", substeps=3, newton_iters=2,
                            jac_mode="step"))
        if no_qp:
            Np, m = mpc.Np, mpc.m

            def fake_solve(z, u_prev, refhor, U_init=None, lam_init=None):
                # shape-true passthrough keeping the z/u dataflow alive so
                # XLA cannot dead-code the lift or the carry
                bump = 1e-6 * (jnp.sum(z) + jnp.sum(refhor))
                U = jnp.concatenate([U_init[1:], U_init[-1:]], 0) + bump
                ok = jnp.asarray(True)
                if lam_init is None:
                    return U, ok
                return U, ok, lam_init * 0.999 + bump
            mpc.solve = fake_solve
        if no_plant:
            def fake_sim(x, u, w=None):
                return x * 0.9995 + 1e-4 * jnp.sum(u) + 1e-6 * jnp.sum(w)
            arm.simulate_Ts = fake_sim
        if no_lift:
            # the basis is a frozen dataclass SHARED with ks.model: shadow
            # lift via an instance attribute and restore it afterwards
            NL = mpc.meta.NL
            basis = mpc.model.basis
            emb = jnp.zeros((NL, mpc.meta.nzeta), jnp.float32) \
                .at[: mpc.meta.nzeta, :].set(jnp.eye(mpc.meta.nzeta))
            object.__setattr__(basis, "lift", lambda zeta: emb @ zeta)
        return Ksim(arm, mpc)

    def measure(**kw):
        sim = build(**kw)
        try:
            return wall(sim)
        finally:
            if kw.get("no_lift"):
                try:
                    object.__delattr__(sim.mpc.model.basis, "lift")
                except AttributeError:
                    pass

    results = {}
    results["full"] = measure()
    results["no_qp"] = measure(no_qp=True)
    results["no_plant"] = measure(no_plant=True)
    if model_type == "bilinear":
        results["no_lift"] = measure(no_lift=True)
        results["floor"] = measure(no_qp=True, no_plant=True, no_lift=True)
    else:
        # NMPC (the raw zeta is the controller state -- no harness lift):
        # marginal config ablations inside the REAL loop.  sqp-1 gives the
        # per-SQP-pass marginal; qp-4 gives 4 kernel iterations' marginal;
        # jacp2 halves the Jacobian+condense work (numerics change, timing
        # only)
        results["floor"] = measure(no_qp=True, no_plant=True)
        results["sqp-1"] = measure(
            cfg_kw={"sqp_iters": cfg.sqp_iters - 1})
        results["qp-4"] = measure(cfg_kw={"qp_iters": cfg.qp_iters - 4})
        results["jacp2"] = measure(cfg_kw={"sqp_jac_period": 2})

    full = results["full"]
    per = 1e3 / (steps - 1)
    print(f"model={model_type} B={B} steps={steps} blocks={blocks} "
          f"qp_iters={cfg.qp_iters}")
    for k, v in results.items():
        print(f"{k:9s}: {v:7.4f} s  ({v * per:6.3f} ms/step)", flush=True)
    print("-- marginals (full - ablated) --")
    for k, v in results.items():
        if k == "full":
            continue
        d = full - v
        print(f"{k:9s}: {d * per:6.3f} ms/step  "
              f"({100 * d / full:5.1f}% of step)")


if __name__ == "__main__":
    main()
