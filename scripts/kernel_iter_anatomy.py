"""Decompose the Mehrotra ITERATION cost (timing-only stub variants).

kernel_anatomy.py: the lifted bench kernel is ~0.7 ms fixed + ~0.43 ms
per iteration at B=65536.  This bench monkeypatches ``_mehrotra_loop``
with shape-preserving stubs (numerics garbage) and re-traces the real
lifted wrapper (distinct static ``tol`` per variant defeats the jit
cache), attributing the per-iteration cost to: Cholesky factor,
triangular solves, Newton-matrix formation, predictor direction,
residuals/steps.

Run on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/kernel_iter_anatomy.py
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

    def variant_loop(stub):
        def loop(n, mc, iters, slack_floor, Pr, q, b, A, At, form_AtDA,
                 x0, lam0):
            mu_floor = jnp.float32(1e-8)

            def matvec_P(v):
                acc = Pr[:, 0, :] * v[0][None, :]
                for j in range(1, n):
                    acc = acc + Pr[:, j, :] * v[j][None, :]
                return acc

            s0 = jnp.maximum(b - K._dot(A, x0), jnp.float32(slack_floor))

            def max_step(v, dv):
                ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
                return jnp.minimum(1.0, 0.99 * jnp.min(ratio, axis=0))

            rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            eyeT = (rowi == coli).astype(jnp.float32)[..., None]

            def body(_, carry):
                x, s, lam = carry
                mu = jnp.sum(s * lam, axis=0) / mc
                r_p = K._dot(A, x) + s - b
                r_d = matvec_P(x) + q + K._dot(At, lam)
                active = (mu > mu_floor) \
                    | (jnp.max(jnp.abs(r_p), axis=0) > mu_floor)
                D = jnp.clip(lam / s, 1e-14, 1e14)
                if stub == "noform":
                    M = Pr + D[0][None, None, :]
                else:
                    M = Pr + form_AtDA(D)
                if stub == "nochol":
                    L = eyeT + 1e-6 * M
                    rdiag = jnp.ones((n, M.shape[2]), jnp.float32)
                else:
                    L, rdiag = K._chol_lanes(M, n)

                def direction(r_slam):
                    rhs = -r_d - K._dot(At, (-r_slam + lam * r_p) / s)
                    if stub == "nosolve":
                        dx = rhs * 0.5
                    else:
                        dx = K._chol_solve_lanes(L, rdiag, rhs, n)
                    ds = -r_p - K._dot(A, dx)
                    dlam = (-r_slam - lam * ds) / s
                    return dx, ds, dlam

                if stub == "onedir":
                    sigma = jnp.float32(0.1)
                    mu_s = sigma * mu
                    dx, ds, dlam = direction(s * lam - mu_s[None])
                else:
                    dx_a, ds_a, dlam_a = direction(s * lam)
                    alpha_a = jnp.minimum(max_step(s, ds_a),
                                          max_step(lam, dlam_a))
                    mu_aff = jnp.sum((s + alpha_a[None] * ds_a)
                                     * (lam + alpha_a[None] * dlam_a),
                                     axis=0) / mc
                    sigma = (mu_aff / (mu + 1e-30)) ** 3
                    dx, ds, dlam = direction(
                        s * lam + ds_a * dlam_a - (sigma * mu)[None])
                alpha = jnp.where(active,
                                  jnp.minimum(max_step(s, ds),
                                              max_step(lam, dlam)), 0.0)[None]
                step = lambda v, dv: jnp.where(jnp.isfinite(dv),
                                               v + alpha * dv, v)
                return step(x, dx), step(s, ds), step(lam, dlam)

            return jax.lax.fori_loop(0, iters, body, (x0, s0, lam0))
        return loop

    orig = K._mehrotra_loop
    variants = ["full", "noform", "nochol", "nosolve", "onedir"]

    def chained(stub, k, idx):
        K._mehrotra_loop = orig if stub == "full" else variant_loop(stub)
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
                        lam0=jnp.abs(lam) + 1e-3,
                        tol=3e-3 + idx * 1e-9)     # distinct static key
                    z1 = z + 1e-9 * x1[:, :1] * jnp.ones((1, nz),
                                                         jnp.float32)
                    return (z1, x1, x1[:, :1] + lam1 * 0 + 1.0), ()
                carry, _ = jax.lax.scan(body, (zeta, x0, lam0), None,
                                        length=k)
                return jnp.sum(carry[1][0])
            # force trace+compile NOW while the patch is active
            float(f(zeta, up, x0, lam0))
            return f
        finally:
            K._mehrotra_loop = orig

    print(f"B={B} iters={ITERS} n={n} mc={mc} band={band}", flush=True)
    ks_ = (2, 8)
    fns = {}
    for i, v in enumerate(variants):
        for k in ks_:
            fns[(v, k)] = chained(v, k, i)
    walls = {key: [] for key in fns}
    for _ in range(7):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            float(fn(zeta, up, x0, lam0))
            walls[key].append(time.perf_counter() - t0)
    res = {}
    for v in variants:
        w2 = float(np.median(walls[(v, 2)]))
        w8 = float(np.median(walls[(v, 8)]))
        res[v] = (w8 - w2) / 6
        print(f"{v:9s}: per-solve {res[v] * 1e3:7.3f} ms", flush=True)
    print(f"-- marginals vs full (/{ITERS} iters each) --")
    for v in variants[1:]:
        d = res["full"] - res[v]
        print(f"{v:9s}: {1e3 * d:7.3f} ms total, "
              f"{1e3 * d / ITERS:7.3f} ms/iter")


if __name__ == "__main__":
    main()
