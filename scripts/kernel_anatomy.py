"""In-kernel fixed-vs-marginal anatomy of the lifted bilinear IPM kernel.

The round-5 device profile (scripts/device_profile.py) shows the Pallas QP
kernel is ~76% of the step with NO device idle time -- the step's fixed
cost lives INSIDE the kernel, not in XLA glue.  This bench splits the
kernel wall into (prologue+epilogue fixed) vs (per-Mehrotra-iteration
marginal) by sweeping static ``iters`` at the exact bench shapes, timed by
chained slope-fetch (the only axon-safe method for Pallas programs).

Run on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/kernel_anatomy.py
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

    from koopman_realizations_tpu.config import MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import make_kmpc
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_bilinear_lifted_batched,
    )
    from koopman_realizations_tpu.utils.matio import load_data4sysid

    B = int(os.environ.get("BENCH_BATCH", "65536"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=3, qp_dual_warm=True,
        input_blocks=(1, 1, 2, 5),
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8), input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5)))
    assert mpc._lift_gens is not None
    g = mpc._lift_gens
    tables = mpc._lift_tables
    c = mpc.consts()
    rng = np.random.default_rng(0)
    nz = mpc.meta.nzeta
    m = mpc.m
    n = c["FjT"].shape[1]
    mc = c["FjT"].shape[0]
    p = (mpc.Np + 1) * mpc.nproj
    zeta = jnp.asarray(0.1 * rng.normal(size=(B, nz)), jnp.float32)
    up = jnp.asarray(0.05 * rng.normal(size=(B, m)), jnp.float32)
    sqYr = np.asarray(c["sqq"]) * 0.1 * rng.normal(size=(p,)).astype(np.float32)
    sqYr = jnp.asarray(sqYr, jnp.float32)
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)
    band = mpc._band

    def chained(k, iters):
        @jax.jit
        def f(zeta, up, x0, lam0):
            def body(carry, _):
                z, x, lam = carry
                x1, lam1, ok, gap = solve_qp_bilinear_lifted_batched(
                    z, up, sqYr, g["Gz"], g["Gm"], g["Gb"], g["Hz"],
                    g["Hm"], g["Hb"], g["Pz"], g["Pm"], g["Pb"],
                    c["RdT"], c["FjT"], c["cFjT"], c["F0T"],
                    x0=0.9 * x, iters=iters, tables=tables, band=band,
                    lam0=lam + 1e-6)
                # data dependency forward: perturb zeta from the solution so
                # repeats cannot be CSE'd / reordered
                z1 = z + 1e-9 * x1[:, :1] * jnp.ones((1, nz), jnp.float32)
                return (z1, x1, jnp.abs(lam1) + 1e-3), ()
            carry, _ = jax.lax.scan(body, (zeta, x0, lam0), None, length=k)
            return jnp.sum(carry[1][0])
        return f

    print(f"B={B} n={n} mc={mc} p={p} nz={nz} band={band} "
          f"tile={os.environ.get('KMPC_FACTORED_TILE', 'auto')}", flush=True)
    ks = (2, 8, 16)
    fns = {}
    for iters in (0, 1, 3, 6):
        for k in ks:
            fns[(iters, k)] = chained(k, iters)
            float(fns[(iters, k)](zeta, up, x0, lam0))   # compile
    # interleave reps across all variants (tunnel drift ~20% -- only
    # back-to-back comparisons are trustworthy)
    walls = {key: [] for key in fns}
    for _ in range(7):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(zeta, up, x0, lam0))
            walls[key].append(time.perf_counter() - t0)
    results = {}
    for iters in (0, 1, 3, 6):
        w = {k: float(np.median(walls[(iters, k)])) for k in ks}
        per = (w[16] - w[2]) / 14
        results[iters] = per
        print(f"iters={iters}: per-solve {per * 1e3:7.3f} ms "
              f"(k2 {w[2]*1e3:.1f} k8 {w[8]*1e3:.1f} k16 {w[16]*1e3:.1f})",
              flush=True)

    it_cost = (results[6] - results[1]) / 5
    fixed = results[0]
    print(f"\nfixed (iters=0 prologue+epilogue): {fixed * 1e3:7.3f} ms")
    print(f"per-iteration marginal (1->6 slope): {it_cost * 1e3:7.3f} ms")
    print(f"iters=3 total {results[3] * 1e3:7.3f} ms -> fixed share "
          f"{100 * fixed / results[3]:.1f}%")


if __name__ == "__main__":
    main()
