"""A/B variants of the NMPC condensation on TPU (slope-fetch timing).

Variants:
  cur        current _condense (3 jacfwd calls + scan w/ dynamic slices)
  onehot     scan with precomputed placement matrices (no dynamic slices)
  unroll     onehot + unrolled scan
  fusedjac   single jacfwd over concat([zeta; u]) (one primal chain)
  composed   fusedjac + PCA/output maps folded into one (nz, Nfeats) matrix
  lanesminor composed + B-last condensation scan (VPU elementwise matmuls)

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/nmpc_condense_bench.py
"""

# HISTORICAL (round-2e evidence): 'cur' measured the PRE-rewrite condense;
# since kmpc.py now ships the composed-F + one-hot form, 'cur' ==
# 'composed' and the printed speedups no longer measure a live trade-off.


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

    from koopman_realizations_tpu.config import MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import make_kmpc
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import load_data4sysid

    B = int(os.environ.get("BENCH_BATCH", "2048"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="nonlinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    pca_explained=99.99,
                                    dtype="float32")).train_models()
    cfg = MpcConfig(horizon=10, qp_iters=8,
                    input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
                    input_slopeConst=1e-1, cost_running=10.0,
                    cost_terminal=100.0,
                    cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
                    proj_idx=(4, 5))
    mpc = make_kmpc(ks.model, ks.scaler, cfg)
    model, basis = ks.model, ks.model.basis
    Np, m, nz = mpc.Np, mpc.m, mpc.nz
    nza = basis.nzeta_aug
    rng = np.random.default_rng(0)
    zeta = jnp.asarray(rng.normal(0, 0.1, (B, nz)).astype(np.float32))
    Zl0 = jnp.tile(zeta[:, None, :], (1, Np, 1))
    Ul0 = jnp.asarray(rng.normal(0, 0.1, (B, Np, m)).astype(np.float32))

    def chain(fn, seed, k):
        @jax.jit
        def f():
            def body(x, _):
                return fn(x), ()
            xx, _ = jax.lax.scan(body, seed, None, length=k)
            return jnp.sum(jax.tree_util.tree_leaves(xx)[0][0]).astype(jnp.float32)
        return f

    results = {}

    # ---- variant: current --------------------------------------------------
    cond_cur = jax.vmap(lambda Zl, Ul, z0: mpc._condense(Zl, Ul, z0))

    def step_of(cond):
        def step(Zl):
            with jax.default_matmul_precision("high"):
                Sz, sz = cond(Zl, Ul0, zeta)
            return Zl * 0.999 + 1e-9 * (jnp.sum(Sz) + jnp.sum(sz))
        return step

    results["cur"] = slope_clock(lambda k: chain(step_of(cond_cur), Zl0, k))

    # shared pieces ----------------------------------------------------------
    # placement: Emb[k] (m, Np*m) puts the B block at column k*m
    Emb = np.zeros((Np, m, Np * m), np.float32)
    for k in range(Np):
        Emb[k, :, k * m:(k + 1) * m] = np.eye(m)
    Embj = jnp.asarray(Emb)

    F_fn = mpc.F_fn

    def jacs_cur(Zl, Ul):
        jac_z = jax.vmap(jax.jacfwd(F_fn, argnums=0))(Zl, Ul)
        jac_u = jax.vmap(jax.jacfwd(F_fn, argnums=1))(Zl, Ul)
        Fv = jax.vmap(F_fn)(Zl, Ul)
        cv = Fv - jnp.einsum("kij,kj->ki", jac_z, Zl) \
                - jnp.einsum("kij,kj->ki", jac_u, Ul)
        return jac_z, jac_u, cv

    def scan_onehot(jac_z, jac_u, cv, zeta0, unroll=1):
        def fwd(carry, inp):
            Sk, sk = carry
            Ak, Bk, ck, Ek = inp
            S1 = Ak @ Sk + Bk @ Ek
            s1 = Ak @ sk + ck
            return (S1, s1), (S1, s1)
        S0 = jnp.zeros((nz, Np * m), jac_z.dtype)
        (_, _), (Ss, ss) = jax.lax.scan(
            fwd, (S0, zeta0), (jac_z, jac_u, cv, Embj), unroll=unroll)
        Sz = jnp.concatenate([S0[None], Ss], axis=0)
        sz = jnp.concatenate([zeta0[None], ss], axis=0)
        return Sz, sz

    # ---- variant: onehot ---------------------------------------------------
    def cond_onehot(Zl, Ul, z0):
        jz, ju, cv = jacs_cur(Zl, Ul)
        return scan_onehot(jz, ju, cv, z0)
    results["onehot"] = slope_clock(lambda k: chain(
        step_of(jax.vmap(cond_onehot)), Zl0, k))

    # ---- variant: unroll ---------------------------------------------------
    def cond_unroll(Zl, Ul, z0):
        jz, ju, cv = jacs_cur(Zl, Ul)
        return scan_onehot(jz, ju, cv, z0, unroll=Np)
    results["unroll"] = slope_clock(lambda k: chain(
        step_of(jax.vmap(cond_unroll)), Zl0, k))

    # ---- variant: fusedjac -------------------------------------------------
    def Fx(x):
        return F_fn(x[:nz], x[nz:])

    def jacs_fused(Zl, Ul):
        X = jnp.concatenate([Zl, Ul], axis=-1)          # (Np, nz+m)
        Fv, J = jax.vmap(lambda x: (Fx(x), jax.jacfwd(Fx)(x)))(X)
        cv = Fv - jnp.einsum("kij,kj->ki", J, X)
        return J[..., :nz], J[..., nz:], cv

    def cond_fused(Zl, Ul, z0):
        jz, ju, cv = jacs_fused(Zl, Ul)
        return scan_onehot(jz, ju, cv, z0, unroll=Np)
    results["fusedjac"] = slope_clock(lambda k: chain(
        step_of(jax.vmap(cond_fused)), Zl0, k))

    # ---- variant: composed -------------------------------------------------
    # F(x) = A1 x + A2 feats(x) + a0  (PCA + output map folded)
    W_T = np.asarray(model.W).T                         # (nz, N)
    if basis.pcs is not None:
        P_T = np.asarray(basis.pcs).T                   # (npcs, N_full)
        Wx, Wp, W1 = W_T[:, :nza], W_T[:, nza:-1], W_T[:, -1]
        A1 = Wx + Wp @ P_T[:, :nza]
        A2 = Wp @ P_T[:, nza:-1]
        a0 = W1 + Wp @ P_T[:, -1]
    else:
        A1, A2, a0 = W_T[:, :nza], W_T[:, nza:-1], W_T[:, -1]
    A1j, A2j, a0j = jnp.asarray(A1), jnp.asarray(A2), jnp.asarray(a0)

    def feats(x):
        parts = [basis._family_feats(kind, deg, x)
                 for kind, deg in basis.families]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), x.dtype)

    def Fx_comp(x):
        return A1j @ x + A2j @ feats(x) + a0j

    # sanity print (host): composed == model.F
    x_t = jnp.asarray(rng.normal(0, 0.1, (nza,)).astype(np.float32))
    err = float(jnp.max(jnp.abs(Fx_comp(x_t) - F_fn(x_t[:nz], x_t[nz:]))))
    print(f"composed-F max abs err vs model.F: {err:.2e}", flush=True)

    def jacs_comp(Zl, Ul):
        X = jnp.concatenate([Zl, Ul], axis=-1)
        Fv, J = jax.vmap(lambda x: (Fx_comp(x), jax.jacfwd(Fx_comp)(x)))(X)
        cv = Fv - jnp.einsum("kij,kj->ki", J, X)
        return J[..., :nz], J[..., nz:], cv

    def cond_comp(Zl, Ul, z0):
        jz, ju, cv = jacs_comp(Zl, Ul)
        return scan_onehot(jz, ju, cv, z0, unroll=Np)
    results["composed"] = slope_clock(lambda k: chain(
        step_of(jax.vmap(cond_comp)), Zl0, k))

    # ---- variant: lanesminor ----------------------------------------------
    # jacs as composed (vmapped, B leading), then condensation with B LAST:
    # carry (nz, Np*m, B); per scan step pure elementwise-fma contractions.
    def cond_lanes_batched(Zl, Ul, z0):
        jz, ju, cv = jax.vmap(jacs_comp)(Zl, Ul)        # (B, Np, nz, ·)
        jzT = jnp.transpose(jz, (1, 2, 3, 0))           # (Np, nz, nz, B)
        juT = jnp.transpose(ju, (1, 2, 3, 0))           # (Np, nz, m, B)
        cvT = jnp.transpose(cv, (1, 2, 0))              # (Np, nz, B)
        z0T = jnp.transpose(z0, (1, 0))                 # (nz, B)

        def fwd(carry, inp):
            Sk, sk = carry                              # (nz, Npm, B), (nz, B)
            Ak, Bk, ck, Ek = inp                        # (nz,nz,B),(nz,m,B),(nz,B),(m,Npm)
            S1 = jnp.einsum("ijb,jcb->icb", Ak, Sk) \
                + jnp.einsum("imb,mc->icb", Bk, Ek)
            s1 = jnp.einsum("ijb,jb->ib", Ak, sk) + ck
            return (S1, s1), (S1, s1)

        S0 = jnp.zeros((nz, Np * m, B), jz.dtype)
        (_, _), (Ss, ss) = jax.lax.scan(
            fwd, (S0, z0T), (jzT, juT, cvT, Embj))
        Sz = jnp.concatenate([S0[None], Ss], axis=0)    # (Np+1, nz, Npm, B)
        sz = jnp.concatenate([z0T[None], ss], axis=0)   # (Np+1, nz, B)
        return (jnp.transpose(Sz, (3, 0, 1, 2)),
                jnp.transpose(sz, (2, 0, 1)))

    results["lanesminor"] = slope_clock(lambda k: chain(
        step_of(cond_lanes_batched), Zl0, k))

    # ---- variant: composed_sep (composed F, separate jacfwd calls) ---------
    def cond_comp_sep(Zl, Ul, z0):
        Fz = lambda zl, ul: Fx_comp(jnp.concatenate([zl, ul]))
        jz = jax.vmap(jax.jacfwd(Fz, argnums=0))(Zl, Ul)
        ju = jax.vmap(jax.jacfwd(Fz, argnums=1))(Zl, Ul)
        Fv = jax.vmap(Fz)(Zl, Ul)
        cv = Fv - jnp.einsum("kij,kj->ki", jz, Zl) \
                - jnp.einsum("kij,kj->ki", ju, Ul)
        return scan_onehot(jz, ju, cv, z0, unroll=Np)
    results["composed_sep"] = slope_clock(lambda k: chain(
        step_of(jax.vmap(cond_comp_sep)), Zl0, k))

    # numerical parity of all variants vs current (at matching precision)
    with jax.default_matmul_precision("high"):
        Szc, szc = jax.jit(cond_cur)(Zl0, Ul0, zeta)
        scale = float(jnp.max(jnp.abs(Szc)))
        for name, fn in (("onehot", jax.vmap(cond_onehot)),
                         ("unroll", jax.vmap(cond_unroll)),
                         ("fusedjac", jax.vmap(cond_fused)),
                         ("composed", jax.vmap(cond_comp)),
                         ("composed_sep", jax.vmap(cond_comp_sep)),
                         ("lanesminor", cond_lanes_batched)):
            Sz2, sz2 = jax.jit(fn)(Zl0, Ul0, zeta)
            d = (float(jnp.max(jnp.abs(Sz2 - Szc))) / scale,
                 float(jnp.max(jnp.abs(sz2 - szc))))
            print(f"parity {name:12s}: relSz={d[0]:.2e} dsz={d[1]:.2e}",
                  flush=True)

    for name, s in results.items():
        print(f"{name:10s}: {s*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
