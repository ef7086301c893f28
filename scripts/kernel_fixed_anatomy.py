"""Decompose the lifted-kernel PROLOGUE cost (timing-only stub variants).

HISTORICAL NOTE: this script snapshots the EARLY-round-5 kernel body
(serial per-row lift, 6-pass assembly, max|P| scale) -- the variants it
stubs are the ones the round-5 optimizations then removed.  Its stub
attributions also proved DCE-confounded at iters=0; the decisive
measurements were kernel_anatomy.py's static-iters slope and the
KMPC_ASM_PREC=default probe.  Kept as the record of the method and its
failure mode.

kernel_anatomy.py found the bench kernel = 0.77 ms fixed + 0.39 ms/iter at
B=65536 (iters=3 -> 2.18 ms).  This bench copies ``_bilin_lift_kernel``
with pieces stubbed (shapes preserved, numerics garbage) at iters=0 to
attribute the fixed cost: in-VMEM poly lift, assembly GEMMs, Gram+scale,
epilogue/launch floor.  Variants are timed back-to-back in one process
(slope-fetch) like every kernel A/B.

Run on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/kernel_fixed_anatomy.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from koopman_realizations_tpu.config import MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import make_kmpc
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.ops.pallas import qp_ipm as K
    from koopman_realizations_tpu.utils.matio import load_data4sysid

    B = int(os.environ.get("BENCH_BATCH", "65536"))
    ITERS = int(os.environ.get("ITERS", "0"))
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
    g = mpc._lift_gens
    tables = mpc._lift_tables
    c = mpc.consts()
    nz, m = mpc.meta.nzeta, mpc.m
    n, mc = c["FjT"].shape[1], c["FjT"].shape[0]
    p = (mpc.Np + 1) * mpc.nproj
    band = mpc._band
    tile = K.factored_tile_for(n)

    def kern(stub, z_ref, up_ref, x0_ref, sqYr_ref, rdiag_ref, Gz_ref,
             Gm_ref, Gb_ref, Hz_ref, Hm_ref, Hb_ref, Pz_ref, Pm_ref,
             Pb_ref, cFr_ref, F0r_ref, A_ref, At_ref, *rest):
        T = tile
        reg = jnp.float32(1e-7)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        eye = (rowi == coli).astype(jnp.float32)
        x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
        zt = z_ref[...]
        up = up_ref[...]
        if stub in ("nolift", "noassembly"):
            monos = jnp.broadcast_to(zt[0][None, :] * 0.1,
                                     (77, T)) + 1e-3
        else:
            zrows = [zt[i] for i in range(nz)]
            feats = []
            prev = zrows
            for parent_idx, dim_idx in tables:
                new = [prev[int(pi)] * zrows[int(di)]
                       for pi, di in zip(parent_idx, dim_idx)]
                feats.extend(new)
                prev = new
            monos = jnp.stack(feats, axis=0)
        if stub == "noassembly":
            Wf = jnp.broadcast_to(Gb_ref[...], (p * n, T)) \
                + 1e-4 * monos[0][None, :]
            CB0 = jnp.broadcast_to(Hb_ref[...], (m * p, T))
            v = jnp.broadcast_to(Pb_ref[...], (p, T)) - sqYr_ref[...]
        else:
            Wf = K._dot(Gz_ref[...], zt) + K._dot(Gm_ref[...], monos) \
                + Gb_ref[...]
            CB0 = K._dot(Hz_ref[...], zt) + K._dot(Hm_ref[...], monos) \
                + Hb_ref[...]
            v = (K._dot(Pz_ref[...], zt) + K._dot(Pm_ref[...], monos)
                 + Pb_ref[...] - sqYr_ref[...])
        for j in range(m):
            v = v + CB0[j * p:(j + 1) * p, :] * up[j][None, :]
        b = jnp.broadcast_to(cFr_ref[...], (mc, T))
        F0r = F0r_ref[...]
        for j in range(m):
            b = b - F0r[:, j][:, None] * up[j][None, :]
        rdiag_obj = rdiag_ref[0, :]
        if stub == "nogram":
            P = (eye * (2.0 * rdiag_obj)[None, :])[..., None] \
                + Wf[0][None, None, :] * 1e-6
            qv = 2.0 * (Wf[:n, :] * v[0][None, :])
        else:
            P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
            qv = jnp.zeros((n, T), jnp.float32)
            for r in range(p):
                Wr = Wf[r * n:(r + 1) * n, :]
                P = P + 2.0 * (Wr[:, None, :] * Wr[None, :, :])
                qv = qv + Wr * v[r][None, :]
            qv = 2.0 * qv
        if stub == "noscale":
            obj = jnp.ones((T,), jnp.float32)
        else:
            obj = jnp.maximum(jnp.max(jnp.abs(P), axis=(0, 1)), 1e-8)
        iobj = 1.0 / obj
        obj_ref[...] = obj[None, :]
        Pr = P * iobj[None, None, :] + reg * eye[..., None]
        q = qv * iobj[None, :]
        A = A_ref[...]
        At = At_ref[...]
        form_AtDA = K._make_form_AtDA(band, n, T, rest, eye, rowi, coli)
        x0 = x0_ref[...]
        lam0 = jnp.sqrt(jnp.clip(rest[-5][...] * iobj[None, :], 1e-4, 1e4))
        x, s, lam = K._mehrotra_loop(n, mc, ITERS, 1e-2, Pr, q, b, A, At,
                                     form_AtDA, x0, lam0)
        x_ref[...] = x
        s_ref[...] = s
        lam_ref[...] = lam

    # ---- wrapper mirroring solve_qp_bilinear_lifted_batched -------------
    rng = np.random.default_rng(0)
    A = np.asarray(c["FjT"], np.float32)
    row = np.maximum(np.max(np.abs(A), axis=1), 1e-10)
    A_eq = jnp.asarray(A / row[:, None])
    cFr = jnp.asarray(np.asarray(c["cFjT"]) / row, jnp.float32)
    F0r = jnp.asarray(np.asarray(c["F0T"]) / row[:, None], jnp.float32)
    Wd = (np.asarray(A_eq) * np.asarray(A_eq)).T
    Wo = (np.asarray(A_eq)[:, :n - band] * np.asarray(A_eq)[:, band:]).T
    structured = (jnp.asarray(Wd), jnp.asarray(Wo))
    struct_specs = [(n, mc), (Wo.shape[0], mc)]

    zeta = jnp.asarray(0.1 * rng.normal(size=(B, nz)), jnp.float32)
    up = jnp.asarray(0.05 * rng.normal(size=(B, m)), jnp.float32)
    sqYr = jnp.asarray(
        np.asarray(c["sqq"]) * 0.1 * rng.normal(size=(p,)).astype(np.float32))
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    variants = ["full", "noscale", "nogram", "nolift", "noassembly"]
    ks = (2, 8)

    def chained(stub, k):
        kfn = functools.partial(kern, stub)
        lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        shared = lambda r, cc: pl.BlockSpec((r, cc), lambda i: (0, 0),
                                            memory_space=pltpu.VMEM)
        n_mono = g["Gm"].shape[1]

        @jax.jit
        def f(zeta, up, x0, lam0):
            def body(carry, _):
                z, x, lam = carry
                xt, st, lamt, objt = pl.pallas_call(
                    kfn, grid=(B // tile,),
                    in_specs=[
                        lane2(nz), lane2(m), lane2(n), shared(p, 1),
                        shared(1, n),
                        shared(p * n, nz), shared(p * n, n_mono),
                        shared(p * n, 1),
                        shared(m * p, nz), shared(m * p, n_mono),
                        shared(m * p, 1),
                        shared(p, nz), shared(p, n_mono), shared(p, 1),
                        shared(mc, 1), shared(mc, m),
                        shared(mc, n), shared(n, mc),
                        *[shared(r, cc) for r, cc in struct_specs],
                        lane2(mc),
                    ],
                    out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
                    out_shape=[
                        jax.ShapeDtypeStruct((n, B), jnp.float32),
                        jax.ShapeDtypeStruct((mc, B), jnp.float32),
                        jax.ShapeDtypeStruct((mc, B), jnp.float32),
                        jax.ShapeDtypeStruct((1, B), jnp.float32)],
                )(z.T, up.T, x.T, sqYr[:, None],
                  jnp.asarray(c["RdT"], jnp.float32)[None],
                  g["Gz"], g["Gm"], g["Gb"].reshape(-1, 1),
                  g["Hz"], g["Hm"], g["Hb"].reshape(-1, 1),
                  g["Pz"], g["Pm"], g["Pb"].reshape(-1, 1),
                  cFr[:, None], F0r, A_eq, A_eq.T, *structured, lam.T)
                x1 = xt.T
                z1 = z + 1e-9 * x1[:, :1] * jnp.ones((1, nz), jnp.float32)
                return (z1, x1, jnp.abs(lamt.T) + 1e-3), ()
            carry, _ = jax.lax.scan(body, (zeta, x0, lam0), None, length=k)
            return jnp.sum(carry[1][0])
        return f

    print(f"B={B} tile={tile} iters={ITERS} n={n} mc={mc} p={p}", flush=True)
    fns = {}
    for v in variants:
        for k in ks:
            fns[(v, k)] = chained(v, k)
            float(fns[(v, k)](zeta, up, x0, lam0))
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
        print(f"{v:12s}: per-solve {res[v] * 1e3:7.3f} ms", flush=True)
    print("-- marginals vs full --")
    for v in variants[1:]:
        print(f"{v:12s}: {1e3 * (res['full'] - res[v]):7.3f} ms")


if __name__ == "__main__":
    main()
