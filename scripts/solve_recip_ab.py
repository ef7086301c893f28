"""In-process A/B: reciprocal-diag vs IEEE-divide triangular solves.

The round-5 iteration anatomy put the two direction solves at 0.161
ms/iter; replacing their per-step (1, T) divides with multiplies by the
Cholesky's precomputed reciprocal diagonal shortens the serial chain but
adds one rounding per element (test_kernel_factored_q0 max-dx grew
1.2e-3 -> 7.6e-3 kernel-vs-kernel).  This measures what the change
actually buys at the bench shape, both variants traced in one process
(distinct static ``tol`` defeats the jit cache).

Run on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/solve_recip_ab.py
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
    from koopman_realizations_tpu.ops.pallas import qp_ipm as K
    from koopman_realizations_tpu.utils.matio import load_data4sysid

    B = int(os.environ.get("BENCH_BATCH", "65536"))
    ITERS = int(os.environ.get("ITERS", "3"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=ITERS, qp_dual_warm=True,
        input_blocks=(1, 1, 2, 5),
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8), input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5)))
    g = mpc._lift_gens
    tables = mpc._lift_tables
    c = mpc.consts()
    rng = np.random.default_rng(0)
    nz, m = mpc.meta.nzeta, mpc.m
    n, mc = c["FjT"].shape[1], c["FjT"].shape[0]
    band = mpc._band
    p = (mpc.Np + 1) * mpc.nproj
    zeta = jnp.asarray(0.1 * rng.normal(size=(B, nz)), jnp.float32)
    up = jnp.asarray(0.05 * rng.normal(size=(B, m)), jnp.float32)
    sqYr = jnp.asarray(np.asarray(c["sqq"])
                       * 0.1 * rng.normal(size=(p,)).astype(np.float32))
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    def solve_divide(L, rdiag, rhs, n):
        acc = rhs
        ys = []
        for k in range(n):
            yk = acc[k] / L[k, k, :]
            ys.append(yk)
            if k + 1 < n:
                acc = acc - L[:, k, :] * yk[None, :]
        acc = jnp.stack(ys, axis=0)
        xs = [None] * n
        for i in reversed(range(n)):
            xi = acc[i] / L[i, i, :]
            xs[i] = xi
            if i > 0:
                acc = acc - L[i, :, :] * xi[None, :]
        return jnp.stack(xs, axis=0)

    orig = K._chol_solve_lanes
    variants = {"recip": orig, "divide": solve_divide}

    def chained(name, k, idx):
        K._chol_solve_lanes = variants[name]
        try:
            @jax.jit
            def f(zeta, up, x0, lam0):
                def body(carry, _):
                    z, x, lam = carry
                    x1, lam1, ok, gap = K.solve_qp_bilinear_lifted_batched(
                        z, up, sqYr, g["Gz"], g["Gm"], g["Gb"], g["Hz"],
                        g["Hm"], g["Hb"], g["Pz"], g["Pm"], g["Pb"],
                        c["RdT"], c["FjT"], c["cFjT"], c["F0T"],
                        x0=0.9 * x, iters=ITERS, tables=tables, band=band,
                        lam0=jnp.abs(lam) + 1e-3, tol=3e-3 + idx * 1e-9)
                    z1 = z + 1e-9 * x1[:, :1] * jnp.ones((1, nz),
                                                         jnp.float32)
                    return (z1, x1, x1[:, :1] + lam1 * 0 + 1.0), ()
                carry, _ = jax.lax.scan(body, (zeta, x0, lam0), None,
                                        length=k)
                return jnp.sum(carry[1][0])
            float(f(zeta, up, x0, lam0))
            return f
        finally:
            K._chol_solve_lanes = orig

    fns = {}
    for i, v in enumerate(variants):
        for k in (2, 16):
            fns[(v, k)] = chained(v, k, i)
    walls = {key: [] for key in fns}
    for _ in range(9):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(zeta, up, x0, lam0))
            walls[key].append(time.perf_counter() - t0)
    print(f"B={B} iters={ITERS}")
    for v in variants:
        w2 = float(np.median(walls[(v, 2)]))
        w16 = float(np.median(walls[(v, 16)]))
        print(f"{v:7s}: per-solve {(w16 - w2) / 14 * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
