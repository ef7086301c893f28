"""ONE-LAUNCH closed-loop MPC step: QP + arm plant + kinematics + carries.

Round-5 device profile (scripts/device_profile.py): at the shipping
B=65536 bench config the step is ~2.9 ms wall = QP kernel 2.0 ms + plant
0.36 ms + XLA glue 0.33 ms + host gap 0.23 ms, with the device 100% busy
but strictly serializing the phases.  The plant consumes the PREVIOUS
step's input (``Ksim.m:239-246``), so within a step the QP and the plant
are data-independent -- fusing them into ONE Pallas launch lets Mosaic
interleave the plant's long scalar-ish chains with the IPM's serial
Cholesky chains, and moves the freeze/ok/warm-start glue (ksim.py keep
selects, ops/qp.py epilogue, kmpc.py warm-start shifts) into the same
launch.  Carries stay LANES-MINOR across the scan (the lane-major Ksim
the round-4 verdict asked for): no per-step (B, n) <-> (n, B) transposes
remain.

Scope (the shipping bilinear RTI configuration; ``Ksim.fused_runner``
guards): BilinearKmpc with the lift-fused generators (wants_zeta), input
move-blocking, dual warm carry WITHOUT stage shift, no state bounds, no
observer, no delays (nd=0), Arm plant with SDIRK2 jac_mode step/substep,
markers/angles output, lane-constant load.  Everything else falls back
to the general ``batched_runner``.

Per-step closed-loop semantics reproduced exactly (same math as
``Ksim.make_body`` + ``bilinear_solve_pure`` + ``sdirk2_soa``):
  zeta = scaled y (nd=0) -> lift+assembly+IPM (shared core with
  ``_bilin_lift_kernel``) -> u_next = plan row 1 = first free move;
  x_new = SDIRK2(x, u_prev, w); y_new = markers(x_new); lanes freeze on
  !ok or non-finite plant state; the next step's primal warm start is
  the STATIC group-shift selection Pwarm @ x (== Sel @ shift(U_plan)),
  and the dual carry rides in row-equilibrated*obj units (the exact
  value the kernel consumes, skipping the original-units round trip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from koopman_realizations_tpu.models.arm_lanes import sdirk2_rows
from koopman_realizations_tpu.ops.pallas.qp_ipm import (
    _diag_obj_scale,
    _dot,
    _dot3,
    _dot_sel,
    _factored_gram,
    _lift_assembly_core,
    _lift_onehot_tables,
    _make_form_AtDA,
    _mehrotra_loop,
    _split_bf16,
    _split_bf16_val,
    factored_tile_for,
)


def _markers_rows(acfg, a_rows):
    """Marker outputs as rows: ``Arm.get_y`` for 'markers'/'angles'.

    a_rows: list of Nlinks (T,) joint angles.  markers: xy of every
    ``nlinks``-th joint, origin dropped (``Arm.get_markers:307-311``,
    ``get_y:364-412``) -- rows ordered (x_1, y_1, x_2, y_2, ...).
    """
    if acfg.output_type == "angles":
        return list(a_rows)
    th, run = [], None
    for a in a_rows:
        run = a if run is None else run + a
        th.append(run)
    l = acfg.l
    xs, ys = [], []
    rx, ry = None, None
    for t in th:
        sx = -l * jnp.sin(t)
        sy = l * jnp.cos(t)
        rx = sx if rx is None else rx + sx
        ry = sy if ry is None else ry + sy
        xs.append(rx)
        ys.append(ry)
    out = []
    for j in range(acfg.nlinks - 1, acfg.Nlinks, acfg.nlinks):
        out += [xs[j], ys[j]]
    return out


def _step_kernel(n, mc, iters, tile, band, p, m, nz, nx, tables, acfg,
                 G, bvec, uscale, yscale, proj_idx, tol, gap_sane,
                 ysc_ref, upsc_ref, xpl_ref, w_ref, alive_ref, x0_ref,
                 lamc_ref, yp_ref, sqYr_ref, rdiag_ref,
                 Gzh_ref, Gzl_ref, Gb_ref, Hzh_ref, Hzl_ref, Hb_ref,
                 Pzh_ref, Pzl_ref, Pb_ref, cFr_ref, F0r_ref,
                 A_ref, At_ref, Pwarm_ref, *rest):
    """One tile of the fused closed-loop step (see module docstring).

    ``rest``: lift operands (8 per degree block), banded-structure
    operands, then the 7 outputs (ysc, upsc, xpl, alive, x0, lam, yp).
    """
    T = tile
    reg = jnp.float32(1e-7)
    nblk = len(tables)
    lift_ops = rest[:8 * nblk]
    rest = rest[8 * nblk:]
    (ysc_o, upsc_o, xpl_o, alive_o, x0_o, lam_o, yp_o) = rest[-7:]

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    zt = ysc_ref[...]                                  # zeta == scaled y
    up = upsc_ref[...]                                 # (m, T) scaled

    # ---- QP: lift + assembly + factored Gram + Mehrotra (shared core) ---
    gens = (Gzh_ref, Gzl_ref, Gb_ref, Hzh_ref, Hzl_ref, Hb_ref,
            Pzh_ref, Pzl_ref, Pb_ref)
    Wf, v, b = _lift_assembly_core(tables, p, m, mc, T, zt, up,
                                   sqYr_ref[...], gens, lift_ops,
                                   cFr_ref, F0r_ref)
    P, qv = _factored_gram(n, T, eye, rdiag_ref[0, :], Wf, v, p)
    obj = _diag_obj_scale(P, n)
    iobj = 1.0 / obj
    Pr = P * iobj[None, None, :] + reg * eye[..., None]
    q = qv * iobj[None, :]
    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)
    # dual carry arrives in row-equilibrated * obj_prev units (see module
    # docstring); same sqrt damping toward the cold start as _ipm_kernel
    lam0 = jnp.sqrt(jnp.clip(lamc_ref[...] * iobj[None, :], 1e-4, 1e4))
    x, s, lam = _mehrotra_loop(n, mc, iters, 1e-2, Pr, q, b, A, At,
                               form_AtDA, x0_ref[...], lam0)

    # ---- ok mask (the ops/qp wrapper epilogue, in-kernel) ---------------
    gap = jnp.sum(s * lam, axis=0) / mc
    r_p = jnp.max(jnp.maximum(_dot(A, x) - b, 0.0), axis=0)
    bmax = jnp.maximum(jnp.max(jnp.abs(b), axis=0), 1.0)
    finite_x = jnp.all(jnp.isfinite(x), axis=0)
    ok = finite_x & (gap < gap_sane) & (r_p < tol * bmax)

    _plant_freeze_epilogue(
        acfg, G, bvec, uscale, yscale, proj_idx, nx, m, ok, x,
        lam * obj[None, :], zt, up, xpl_ref, w_ref, alive_ref, x0_ref,
        lamc_ref, yp_ref, Pwarm_ref,
        (ysc_o, upsc_o, xpl_o, alive_o, x0_o, lam_o, yp_o))


def _plant_freeze_epilogue(acfg, G, bvec, uscale, yscale, proj_idx, nx, m,
                           ok, x, lam_carry_new, zt, up, xpl_ref, w_ref,
                           alive_ref, x0_ref, lamc_ref, yp_ref, Pwarm_ref,
                           outs):
    """Shared tail of the fused step kernels: SDIRK2 plant step (previous
    input; data-independent of this step's QP), output kinematics, alive
    freeze, and the carry advance (see ``_step_kernel``)."""
    (ysc_o, upsc_o, xpl_o, alive_o, x0_o, lam_o, yp_o) = outs
    uf, uo = uscale
    up_orig = [up[j] * uf[j] + uo[j] for j in range(m)]
    xs0 = tuple(xpl_ref[i] for i in range(nx))
    xs_new = sdirk2_rows(acfg, G, bvec, xs0, up_orig, w_ref[0], w_ref[1],
                         acfg.Ts, acfg.substeps, acfg.newton_iters,
                         acfg.jac_mode, unroll=True)
    fin_pl = jnp.isfinite(xs_new[0])
    for xi in xs_new[1:]:
        fin_pl = fin_pl & jnp.isfinite(xi)
    y_rows = _markers_rows(acfg, list(xs_new[:nx // 2]))
    yfac, yoff = yscale

    msk = (alive_ref[...][0] > 0.5) & ok & fin_pl      # (T,)
    mrow = msk[None, :]
    keep = lambda new, old: jnp.where(mrow, new, old)
    alive_o[...] = msk.astype(jnp.float32)[None, :]
    xpl_o[...] = keep(jnp.stack(xs_new, axis=0), xpl_ref[...])
    ysc_new = jnp.stack([(y_rows[j] - yoff[j]) / yfac[j]
                         for j in range(len(y_rows))], axis=0)
    ysc_o[...] = keep(ysc_new, zt)
    yp_o[...] = keep(jnp.stack([y_rows[j] for j in proj_idx], axis=0),
                     yp_ref[...])
    upsc_o[...] = keep(x[:m, :], up)                   # plan row 1 = move 0
    x0_o[...] = keep(_dot(Pwarm_ref[...], x), x0_ref[...])
    lam_o[...] = keep(lam_carry_new, lamc_ref[...])


def _linear_step_kernel(n, mc, iters, tile, band, m, nz, nx, tables, acfg,
                        G, bvec, uscale, yscale, proj_idx, tol, gap_sane,
                        ysc_ref, upsc_ref, xpl_ref, w_ref, alive_ref,
                        x0_ref, lamc_ref, yp_ref, fYr_ref,
                        Psh_ref, G1zh_ref, G1zl_ref, G1b_ref, P21_ref,
                        cFr_ref, F0r_ref, A_ref, At_ref, Pwarm_ref, *rest):
    """Fused step tile for the LINEAR controller (static condensed MPC).

    The linear QP's Hessian is LANE-SHARED and static, so no per-lane
    Gram or objective scale exists: the host pre-equilibrates P and folds
    1/obj into the gradient generators.  Per step the reduced gradient is
    LINEAR in the lifted state and the reference window,
    fz = G1 z + G2 Yr + P21 u0 (``LinearKmpc.solve``), and z's poly+PCA
    lift folds into G1's sections exactly as in the bilinear lift-fused
    kernel -- so the kernel consumes the raw zeta, the per-step
    lane-shared G2 Yr column (fYr), and u_prev.  Duals start COLD (the
    verified linear floor rejects the warm start).  Then the shared
    plant/freeze/carry tail runs as in ``_step_kernel``.

    ``rest``: [G1m hi/lo, Spar, Sdim] per degree block, the
    banded-structure operands, then the 7 outputs.
    """
    T = tile
    reg = jnp.float32(1e-7)
    nblk = len(tables)
    lift_ops = rest[:4 * nblk]
    rest = rest[4 * nblk:]
    (ysc_o, upsc_o, xpl_o, alive_o, x0_o, lam_o, yp_o) = rest[-7:]

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    zt = ysc_ref[...]                                  # zeta == scaled y
    up = upsc_ref[...]                                 # (m, T) scaled

    # ---- gradient assembly (3-pass bf16; generators carry 1/obj) --------
    zh, zl = _split_bf16_val(zt)
    q = _dot3(G1zh_ref[...], G1zl_ref[...], zh, zl) + G1b_ref[...] \
        + fYr_ref[...]
    prev = zt
    for d in range(nblk):
        G1mh, G1ml, Spar_d, Sdim_d = lift_ops[4 * d:4 * d + 4]
        mono = _dot_sel(Spar_d, prev) * _dot_sel(Sdim_d, zt)
        mh, ml = _split_bf16_val(mono)
        q = q + _dot3(G1mh[...], G1ml[...], mh, ml)
        prev = mono
    P21 = P21_ref[...]                                 # (n, m), 1/obj folded
    for j in range(m):
        q = q + P21[:, j][:, None] * up[j][None, :]
    b = jnp.broadcast_to(cFr_ref[...], (mc, T))
    F0r = F0r_ref[...]
    for j in range(m):
        b = b - F0r[:, j][:, None] * up[j][None, :]

    Pr = Psh_ref[...][..., None] + reg * eye[..., None]
    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)
    lam0 = jnp.ones((mc, T), jnp.float32)              # verified-floor cold
    x, s, lam = _mehrotra_loop(n, mc, iters, 1e-2, Pr, q, b, A, At,
                               form_AtDA, x0_ref[...], lam0)

    gap = jnp.sum(s * lam, axis=0) / mc
    r_p = jnp.max(jnp.maximum(_dot(A, x) - b, 0.0), axis=0)
    bmax = jnp.maximum(jnp.max(jnp.abs(b), axis=0), 1.0)
    finite_x = jnp.all(jnp.isfinite(x), axis=0)
    ok = finite_x & (gap < gap_sane) & (r_p < tol * bmax)

    _plant_freeze_epilogue(
        acfg, G, bvec, uscale, yscale, proj_idx, nx, m, ok, x, lam,
        zt, up, xpl_ref, w_ref, alive_ref, x0_ref, lamc_ref, yp_ref,
        Pwarm_ref,
        (ysc_o, upsc_o, xpl_o, alive_o, x0_o, lam_o, yp_o))


def _step_call(carry, sqYr, operands, *, meta, interpret):
    """One fused step over the padded lanes-minor carry tuple.

    NOT itself jitted: the runner jits the whole scan.  ``meta`` is the
    static tuple from ``build_step_fused``; ``operands`` carries only
    arrays (specs are rebuilt here from the static shapes).
    """
    (n, mc, iters, tile, band, p, m, nz, nx, ny, tables, acfg, G, bvec,
     uscale, yscale, proj_idx, tol, gap_sane) = meta
    ysc, upsc, xpl, w, alive, x0, lamc, yp = carry
    Bp = ysc.shape[1]
    kern = functools.partial(
        _step_kernel, n, mc, iters, tile, band, p, m, nz, nx, tables,
        acfg, np.asarray(G), np.asarray(bvec), uscale, yscale, proj_idx,
        tol, gap_sane)
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    gen_args, lift_args, struct_args, cFr, F0r, A_eq, At, Pwarm, rdiag = \
        operands
    gen_specs = [shared(p * n, nz), shared(p * n, nz), shared(p * n, 1),
                 shared(m * p, nz), shared(m * p, nz), shared(m * p, 1),
                 shared(p, nz), shared(p, nz), shared(p, 1)]
    lift_specs = []
    prev_rows = nz
    for parent_idx, _dim in tables:
        r = len(parent_idx)
        for rows in (p * n, m * p, p):
            lift_specs += [shared(rows, r), shared(rows, r)]
        lift_specs += [shared(r, prev_rows), shared(r, nz)]
        prev_rows = r
    if band is None:
        struct_specs = [shared(n * n, mc)]
    else:
        struct_specs = [shared(n, mc), shared(max(n - band, 1), mc)]
    per_ref = sqYr.ndim == 2
    nproj = len(proj_idx)
    outs = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane2(ny), lane2(m), lane2(nx), lane2(2), lane2(1),
            lane2(n), lane2(mc), lane2(nproj),
            lane2(p) if per_ref else shared(p, 1),
            shared(1, n),
            *gen_specs,
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc), shared(n, n),
            *lift_specs,
            *struct_specs,
        ],
        out_specs=[lane2(ny), lane2(m), lane2(nx), lane2(1), lane2(n),
                   lane2(mc), lane2(nproj)],
        out_shape=[jax.ShapeDtypeStruct((ny, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((m, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((nx, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((nproj, Bp), jnp.float32)],
        interpret=interpret,
    )(ysc, upsc, xpl, w, alive, x0, lamc, yp,
      sqYr if per_ref else sqYr[:, None], rdiag,
      *gen_args, cFr[:, None], F0r, A_eq, At, Pwarm,
      *lift_args, *struct_args)
    ysc1, upsc1, xpl1, alive1, x01, lam1, yp1 = outs
    return (ysc1, upsc1, xpl1, w, alive1, x01, lam1, yp1), \
        (yp1, alive1[0] > 0.5)


def _linear_step_call(carry, fYr, operands, *, meta, interpret):
    """One fused LINEAR-controller step (see ``_linear_step_kernel``)."""
    (n, mc, iters, tile, band, m, nz, nx, ny, tables, acfg, G, bvec,
     uscale, yscale, proj_idx, tol, gap_sane) = meta
    ysc, upsc, xpl, w, alive, x0, lamc, yp = carry
    Bp = ysc.shape[1]
    kern = functools.partial(
        _linear_step_kernel, n, mc, iters, tile, band, m, nz, nx, tables,
        acfg, np.asarray(G), np.asarray(bvec), uscale, yscale, proj_idx,
        tol, gap_sane)
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    (gen_args, lift_args, struct_args, cFr, F0r, A_eq, At, Pwarm) = \
        operands
    gen_specs = [shared(n, n), shared(n, nz), shared(n, nz), shared(n, 1),
                 shared(n, m)]
    lift_specs = []
    prev_rows = nz
    for parent_idx, _dim in tables:
        r = len(parent_idx)
        lift_specs += [shared(n, r), shared(n, r),
                       shared(r, prev_rows), shared(r, nz)]
        prev_rows = r
    if band is None:
        struct_specs = [shared(n * n, mc)]
    else:
        struct_specs = [shared(n, mc), shared(max(n - band, 1), mc)]
    nproj = len(proj_idx)
    outs = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane2(ny), lane2(m), lane2(nx), lane2(2), lane2(1),
            lane2(n), lane2(mc), lane2(nproj),
            shared(n, 1),
            *gen_specs,
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc), shared(n, n),
            *lift_specs,
            *struct_specs,
        ],
        out_specs=[lane2(ny), lane2(m), lane2(nx), lane2(1), lane2(n),
                   lane2(mc), lane2(nproj)],
        out_shape=[jax.ShapeDtypeStruct((ny, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((m, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((nx, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((nproj, Bp), jnp.float32)],
        interpret=interpret,
    )(ysc, upsc, xpl, w, alive, x0, lamc, yp, fYr[:, None],
      *gen_args, cFr[:, None], F0r, A_eq, At, Pwarm,
      *lift_args, *struct_args)
    ysc1, upsc1, xpl1, alive1, x01, lam1, yp1 = outs
    return (ysc1, upsc1, xpl1, w, alive1, x01, lam1, yp1), \
        (yp1, alive1[0] > 0.5)


def build_linear_step_fused(mpc, arm, scaler, tile: int = None,
                            interpret: bool = False):
    """Build (step_fn, init_carry_fn, fYr_fn, meta) for the fused LINEAR
    closed loop.  ``fYr_fn(Yr_flat)`` computes the per-step lane-shared
    gradient column G2 @ Yr (host/XLA side, tiny); everything else
    mirrors ``build_step_fused``.
    """
    from koopman_realizations_tpu.ops.observables import poly_parent_tables
    basis = mpc.model.basis
    assert mpc._Tb is not None and basis is not None \
        and basis.pcs is not None and len(basis.families) == 1 \
        and basis.families[0][0] == "poly"
    acfg = arm.cfg
    nx = acfg.nx
    m = mpc.m
    nz = mpc.meta.nzeta
    ny = nz
    A = np.asarray(mpc.F_red, np.float64)
    n = A.shape[1]
    mc = A.shape[0]
    band = mpc._band
    if tile is None:
        import os
        env = os.environ.get("KMPC_STEP_TILE")
        tile = int(env) if env else (1024 if n <= 16
                                     else factored_tile_for(n))

    # static condensed pieces, f64, 1/obj folded (shared Hessian => the
    # objective scale is a HOST constant)
    P = 2.0 * np.asarray(mpc.H, np.float64)
    obj = max(float(np.max(np.abs(P))), 1e-8)
    Psh = (P[m:, m:] / obj).astype(np.float32)
    P21 = (P[m:, :m] / obj).astype(np.float32)
    CBr = np.asarray(mpc.CB, np.float64)[:, m:]        # ((Np+1)p, nred)
    Qd = np.asarray(mpc.q_diag, np.float64)
    CA = np.asarray(mpc.CA, np.float64)
    G1 = (2.0 * CBr.T @ (Qd[:, None] * CA)) / obj      # (nred, NL)
    G2 = (-2.0 * CBr.T * Qd[None, :]) / obj            # (nred, (Np+1)p)
    # fold the poly+PCA lift into G1's z-sections (lift-fused bilinear
    # pattern: z = [zeta; pcs^T g; 1])
    nzq = basis.nzeta_aug
    P_T = np.asarray(basis.pcs, np.float64).T
    npcs = P_T.shape[0]
    G1p = G1[:, nzq:nzq + npcs]
    G1z = G1[:, :nzq] + G1p @ P_T[:, :nzq]
    G1m = G1p @ P_T[:, nzq:-1]
    G1b = (G1[:, -1] + G1p @ P_T[:, -1]).reshape(-1, 1)
    _, tables = poly_parent_tables(nzq, basis.families[0][1])
    tables = tuple((tuple(int(x) for x in pi), tuple(int(x) for x in di))
                   for pi, di in tables)

    row = np.maximum(np.max(np.abs(A), axis=1), 1e-10)
    A_eq = jnp.asarray((A / row[:, None]).astype(np.float32))
    cFr = jnp.asarray(np.asarray(mpc.cF_red) / row, jnp.float32)
    F0r = jnp.asarray(np.asarray(mpc.F0_red) / row[:, None], jnp.float32)
    Aeq_np = np.asarray(A_eq, np.float64)
    if band is None:
        struct_args = (jnp.asarray(
            np.einsum("ci,cj->ijc", Aeq_np, Aeq_np)
            .reshape(n * n, mc).astype(np.float32)),)
    else:
        Wd = (Aeq_np * Aeq_np).T.astype(np.float32)
        Wo = (Aeq_np[:, :n - band] * Aeq_np[:, band:]).T \
            .astype(np.float32) if band > 0 \
            else np.zeros((1, mc), np.float32)
        struct_args = (jnp.asarray(Wd), jnp.asarray(Wo))

    gen_args = [jnp.asarray(Psh), *_split_bf16(G1z),
                jnp.asarray(G1b, jnp.float32), jnp.asarray(P21)]
    onehot = _lift_onehot_tables(tables, nzq)
    lift_args = []
    off = 0
    for (Spar, Sdim) in onehot:
        r = Spar.shape[0]
        lift_args += list(_split_bf16(G1m[:, off:off + r]))
        lift_args += [jnp.asarray(Spar), jnp.asarray(Sdim)]
        off += r

    Np = mpc.Np
    S_rows = np.zeros(((Np - 1) * m, (Np - 1) * m), np.float32)
    for k in range(Np - 1):
        src = min(k + 1, Np - 2)
        S_rows[k * m:(k + 1) * m, src * m:(src + 1) * m] = np.eye(m)
    Pwarm = jnp.asarray(
        np.asarray(mpc._Sel, np.float32) @ S_rows
        @ np.asarray(mpc._Tb, np.float32))

    uf = tuple(float(x) for x in np.asarray(scaler.u_factor).reshape(-1))
    uo = tuple(float(x) for x in np.asarray(scaler.u_offset).reshape(-1))
    yfac = tuple(float(x) for x in np.asarray(scaler.y_factor).reshape(-1))
    yoff = tuple(float(x) for x in np.asarray(scaler.y_offset).reshape(-1))
    meta = (n, mc, int(mpc.cfg.qp_iters), int(tile), band, m, nz, nx, ny,
            tables, acfg, tuple(map(tuple, np.asarray(arm._G))),
            tuple(np.asarray(arm._b)), (uf, uo), (yfac, yoff),
            tuple(mpc.proj_idx), 3e-3, 5e-2)
    operands = (tuple(gen_args), tuple(lift_args), tuple(struct_args),
                cFr, F0r, A_eq, A_eq.T, Pwarm)
    G2j = jnp.asarray(G2.astype(np.float32))

    def fYr_fn(Yr_flat):
        return G2j @ Yr_flat                           # (n,) per step

    def step_fn(carry, fYr):
        return _linear_step_call(carry, fYr, operands, meta=meta,
                                 interpret=interpret)

    def init_carry(X0, W, u0=None):
        B = X0.shape[0]
        pad = (-B) % tile

        def padb(a):
            a = jnp.asarray(a, jnp.float32)
            if pad:
                a = jnp.concatenate([a, jnp.tile(a[-1:], (pad, 1))], 0)
            return a.T

        X0 = jnp.asarray(X0, jnp.float32)
        y0 = arm.get_y_batch(X0)
        ysc0 = jax.vmap(scaler.y_down)(y0)
        u0 = jnp.zeros((m,), jnp.float32) if u0 is None \
            else jnp.asarray(u0, jnp.float32)
        u0_sc = jnp.asarray(scaler.u_down(u0), jnp.float32)
        upsc0 = jnp.tile(u0_sc[None], (B, 1))
        nf = Pwarm.shape[0] // m
        x00 = jnp.tile(jnp.tile(u0_sc, nf)[None], (B, 1))
        lam0 = jnp.ones((B, mc), jnp.float32)          # cold; carry unused
        alive0 = jnp.ones((B, 1), jnp.float32)
        yp0 = y0[:, list(mpc.proj_idx)]
        return (padb(ysc0), padb(upsc0), padb(X0), padb(W), padb(alive0),
                padb(x00), padb(lam0), padb(yp0))

    return step_fn, init_carry, fYr_fn, {"tile": tile, "n": n, "mc": mc}


def build_step_fused(mpc, arm, scaler, tile: int = None,
                     interpret: bool = False):
    """Build (step_fn, init_carry_fn, meta) for the fused closed loop.

    step_fn(carry, sqYr) -> (carry, (yp (nproj, Bp), alive (Bp,) bool));
    init_carry_fn(X0 (B, nx), W (B, 2), u0 (m,)) -> padded lanes-minor
    carry tuple.  The caller scans step_fn over per-step reference
    windows (``Ksim.fused_runner``).
    """
    assert mpc._lift_gens is not None and mpc._Tb is not None
    g = mpc._lift_gens
    tables = mpc._lift_tables
    nz = mpc.meta.nzeta
    m = mpc.m
    acfg = arm.cfg
    nx = acfg.nx
    ny = nz                    # nd = 0: zeta IS the scaled output
    A = np.asarray(mpc.F_red, np.float32)
    n = A.shape[1]
    mc = A.shape[0]
    p = (mpc.Np + 1) * mpc.nproj
    band = mpc._band
    if tile is None:
        import os
        env = os.environ.get("KMPC_STEP_TILE")
        # measured round 5 (B=64-128k sweep): the fused step prefers 1024
        # (24.95M) over the lifted kernel's 768 (23.62M); 1536+ fails to
        # compile (VMEM).  Larger n falls back to the factored default.
        tile = int(env) if env else (1024 if n <= 16
                                     else factored_tile_for(n))

    row = np.maximum(np.max(np.abs(A), axis=1), 1e-10)
    A_eq = jnp.asarray(A / row[:, None])
    cFr = jnp.asarray(np.asarray(mpc.cF_red) / row, jnp.float32)
    F0r = jnp.asarray(np.asarray(mpc.F0_red) / row[:, None], jnp.float32)
    At = A_eq.T
    if band is None:
        struct_args = (jnp.asarray(
            np.einsum("ci,cj->ijc", np.asarray(A_eq), np.asarray(A_eq))
            .reshape(n * n, mc)),)
        struct_shapes = [(n * n, mc)]
    else:
        Aeq_np = np.asarray(A_eq)
        Wd = (Aeq_np * Aeq_np).T
        Wo = (Aeq_np[:, :n - band] * Aeq_np[:, band:]).T if band > 0 \
            else np.zeros((1, mc), np.float32)
        struct_args = (jnp.asarray(Wd), jnp.asarray(Wo))
        struct_shapes = [(n, mc), (Wo.shape[0], mc)]

    # generator operands: z-section hi/lo pairs + per-degree-block splits
    # (mirrors solve_qp_bilinear_lifted_batched's prep)
    Gzh, Gzl = _split_bf16(g["Gz"])
    Hzh, Hzl = _split_bf16(g["Hz"])
    Pzh, Pzl = _split_bf16(g["Pz"])
    gen_args = [Gzh, Gzl, jnp.asarray(g["Gb"], jnp.float32).reshape(-1, 1),
                Hzh, Hzl, jnp.asarray(g["Hb"], jnp.float32).reshape(-1, 1),
                Pzh, Pzl, jnp.asarray(g["Pb"], jnp.float32).reshape(-1, 1)]
    onehot = _lift_onehot_tables(tables, nz)
    Gm32 = jnp.asarray(g["Gm"], jnp.float32)
    Hm32 = jnp.asarray(g["Hm"], jnp.float32)
    Pm32 = jnp.asarray(g["Pm"], jnp.float32)
    lift_args = []
    off = 0
    for (Spar, Sdim) in onehot:
        r = Spar.shape[0]
        for Mat in (Gm32, Hm32, Pm32):
            lift_args += list(_split_bf16(Mat[:, off:off + r]))
        lift_args += [jnp.asarray(Spar), jnp.asarray(Sdim)]
        off += r

    # Pwarm: the receding-horizon primal warm start as a static one-hot
    # map of the previous solution -- Sel @ shift-rows @ Tb (all 0/1, so
    # the product is exact row selection == _warm_start + Sel)
    Np = mpc.Np
    S_rows = np.zeros(((Np - 1) * m, (Np - 1) * m), np.float32)
    for k in range(Np - 1):                      # shifted row k = old k+1
        src = min(k + 1, Np - 2)
        S_rows[k * m:(k + 1) * m, src * m:(src + 1) * m] = np.eye(m)
    Pwarm = jnp.asarray(
        np.asarray(mpc._Sel, np.float32) @ S_rows
        @ np.asarray(mpc._Tb, np.float32))

    uf = tuple(float(x) for x in np.asarray(scaler.u_factor).reshape(-1))
    uo = tuple(float(x) for x in np.asarray(scaler.u_offset).reshape(-1))
    yfac = tuple(float(x) for x in np.asarray(scaler.y_factor).reshape(-1))
    yoff = tuple(float(x) for x in np.asarray(scaler.y_offset).reshape(-1))
    G = arm._G
    bvec = arm._b
    meta = (n, mc, int(mpc.cfg.qp_iters), int(tile), band, p, m, nz, nx,
            ny, tables, acfg, tuple(map(tuple, np.asarray(G))),
            tuple(np.asarray(bvec)), (uf, uo), (yfac, yoff),
            tuple(mpc.proj_idx), 3e-3, 5e-2)
    rdiag = jnp.asarray(mpc.consts()["RdT"], jnp.float32)[None]
    operands = (tuple(gen_args), tuple(lift_args), tuple(struct_args),
                cFr, F0r, A_eq, At, Pwarm, rdiag)

    def step_fn(carry, sqYr):
        return _step_call(carry, sqYr, operands, meta=meta,
                          interpret=interpret)

    def init_carry(X0, W, u0=None):
        B = X0.shape[0]
        pad = (-B) % tile
        Bp = B + pad

        def padb(a):                       # (B, r) -> (r, Bp) lanes-minor
            a = jnp.asarray(a, jnp.float32)
            if pad:
                a = jnp.concatenate([a, jnp.tile(a[-1:], (pad, 1))], 0)
            return a.T

        X0 = jnp.asarray(X0, jnp.float32)
        y0 = arm.get_y_batch(X0)                           # (B, ny)
        ysc0 = jax.vmap(scaler.y_down)(y0)
        u0 = jnp.zeros((m,), jnp.float32) if u0 is None \
            else jnp.asarray(u0, jnp.float32)
        u0_sc = jnp.asarray(scaler.u_down(u0), jnp.float32)
        upsc0 = jnp.tile(u0_sc[None], (B, 1))
        nf = Pwarm.shape[0] // m
        x00 = jnp.tile(jnp.tile(u0_sc, nf)[None], (B, 1))
        lam0 = jnp.tile(jnp.asarray(row, jnp.float32)[None], (B, 1))
        alive0 = jnp.ones((B, 1), jnp.float32)
        yp0 = y0[:, list(mpc.proj_idx)]
        return (padb(ysc0), padb(upsc0), padb(X0), padb(W), padb(alive0),
                padb(x00), padb(lam0), padb(yp0))

    return step_fn, init_carry, {"tile": tile, "n": n, "mc": mc}
