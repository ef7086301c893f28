"""Batched dense QP solver (replaces MATLAB ``quadprog``/Gurobi).

Solves   min_x  1/2 x^T P x + q^T x   s.t.  A x <= b

with a Mehrotra predictor-corrector primal-dual interior-point method run for
a FIXED number of iterations -- no data-dependent control flow, so the whole
solve jits into the closed-loop scan and batches over thousands of scenarios
with vmap (decision dims here are tiny: m*Np ~ 30, constraint rows ~100, so
each iteration is one small Cholesky the MXU eats for free).

The reference calls ``quadprog(2H, f, A, b)`` per control step
(``Kmpc.get_mpcInput:383``, ``:810``, ``:883``); infeasible solves there
return NaN and Ksim breaks the loop (``Ksim.m:220-222``).  Here infeasible /
diverged lanes are flagged in the returned ``ok`` mask instead of crashing,
so one bad scenario cannot kill a 10k-lane batch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    x: jnp.ndarray       # primal solution
    lam: jnp.ndarray     # inequality multipliers
    ok: jnp.ndarray      # scalar bool: converged + finite
    gap: jnp.ndarray     # final complementarity gap


def band_offset_of(A) -> "int | None":
    """Static band structure of A^T A for the Pallas kernel's fast path.

    A is the HOST-side (numpy) constraint matrix.  Returns d such that
    |A|^T |A| is nonzero only on the diagonal and the +-d off-diagonals
    (0 = diagonal-only), or None if no single offset covers it.  Using |A|
    keeps the answer conservative under accidental cancellation.  MPC
    input-bound + slope stacks (``Kmpc.m:230-277``) are exactly the
    d = m case; smoothness rows (offsets m AND 2m) return None.
    """
    import numpy as np
    A = np.asarray(A)
    if A.ndim != 2 or A.shape[0] == 0:
        return 0
    G = (np.abs(A).T @ np.abs(A)) > 0
    n = G.shape[0]
    i, j = np.nonzero(G)
    offs = set(np.abs(i - j).tolist()) - {0}
    if not offs:
        return 0
    if len(offs) == 1:
        return int(offs.pop())
    return None


def _debug_check_band(A, band_offset) -> None:
    """Opt-in consistency check of the ``band_offset`` static promise.

    Enabled by ``KRT_QP_DEBUG_CHECKS=1``: when A is concretely available
    (not a tracer -- i.e. the caller is outside jit), recompute the band
    structure and fail loudly on a mismatch instead of silently corrupting
    the Newton matrix in the Pallas kernel.  Free when disabled; trace-time
    only when enabled inside jit (A is a tracer there and is skipped).
    """
    import os
    if band_offset is None or not int(os.environ.get(
            "KRT_QP_DEBUG_CHECKS", "0")):
        return
    if isinstance(A, jax.core.Tracer):
        return
    import numpy as np
    actual = band_offset_of(np.asarray(A))
    # diagonal-only (0) structure is covered by any band promise
    if actual != band_offset and actual != 0:
        raise ValueError(
            f"band_offset promise {band_offset} does not match the actual "
            f"constraint-stack structure ({actual}); pass the value from "
            f"band_offset_of on the real rows")


def solve_qp(P, q, A, b, iters: int = 25, x0=None,
             shared_A: bool = False, backend: str = "auto",
             band_offset: int = None, lam0=None) -> QPSolution:
    """See ``_solve_qp``; this wrapper adds the opt-in ``KRT_QP_DEBUG_CHECKS``
    validation of the ``band_offset`` static promise before entering jit."""
    _debug_check_band(A, band_offset)
    return _solve_qp(P, q, A, b, iters, x0, shared_A, backend,
                     band_offset, lam0)


@partial(jax.jit,
         static_argnames=("iters", "shared_A", "backend", "band_offset"))
def _solve_qp(P, q, A, b, iters: int = 25, x0=None,
              shared_A: bool = False, backend: str = "auto",
              band_offset: int = None, lam0=None) -> QPSolution:
    """Interior-point solve of min 1/2 x'Px + q'x s.t. Ax <= b.

    P must be symmetric PSD (the MPC Hessian is PSD by construction; a small
    primal regularization is added for the semidefinite case).  ``x0`` warm
    starts the primal iterate -- MPC solves pass the feasible "hold the
    previous input" plan, which matters when slope constraints make the
    feasible set a narrow band far from the origin.

    ``shared_A`` promises that A is NOT batched under an enclosing vmap
    (lane-shared constraint rows, the no-state-bounds MPC case).  Unbatched,
    the Newton matrix then forms as one (B, mc) @ (mc, n^2) GEMM over
    precomputed row outer products -- an MXU-shaped contraction.  Under vmap
    on TPU (f32) the whole solve instead routes to the lanes-minor Pallas
    kernel (``ops.pallas.qp_ipm``), which runs all iterations in VMEM with
    the batch on the 128-wide lane axis.  Do not set shared_A when A varies
    per lane.

    ``backend``: 'auto' (Pallas when batched + shared_A + f32 + TPU) or
    'jax' (force the pure-JAX path everywhere).

    ``band_offset``: optional static structure promise for the Pallas path,
    from ``band_offset_of`` applied to the HOST-side constraint stack; see
    ``ops.pallas.qp_ipm.solve_qp_shared_batched``.  Ignored off the Pallas
    route.  A wrong value silently corrupts the Newton matrix -- only pass
    values computed from the actual rows.

    ``lam0`` (mc,): optional multiplier warm start in original units (the
    previous receding-horizon solve's ``lam``); floored internally so stale
    rows cannot start the predictor-corrector off the central path.

    # the Newton systems need true f32 accumulation: TPU matmuls default to
    # bf16 inputs, which stalls convergence (batched lanes flag not-ok)
    """
    with jax.default_matmul_precision("highest"):
        use_pallas = (shared_A and backend != "jax"
                      and jnp.asarray(b).shape[-1] > 0
                      and jnp.asarray(P).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        if use_pallas:
            warm = x0 is not None
            if x0 is None:
                x0 = jnp.zeros(q.shape, jnp.float32)
            warm_dual = lam0 is not None
            if lam0 is None:
                lam0 = jnp.ones(b.shape, jnp.float32)
            f = _pallas_routed_solver(iters, warm, band_offset, warm_dual)
            x, lam, ok, gap = f(jnp.asarray(P, jnp.float32),
                                jnp.asarray(q, jnp.float32),
                                jnp.asarray(A, jnp.float32),
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(x0, jnp.float32),
                                jnp.asarray(lam0, jnp.float32))
            return QPSolution(x=x, lam=lam, ok=ok, gap=gap)
        return _solve_qp_impl(P, q, A, b, iters, x0, shared_A, lam0)


def _factored_Pq(W, v, r_diag, q0=None):
    """Dense (P, q) of the objective ||W x + v||^2 + x'diag(r)x + q0'x."""
    P = 2.0 * (W.T @ W + jnp.diag(r_diag))
    q = 2.0 * (W.T @ v)
    if q0 is not None:
        q = q + q0
    return P, q


def solve_qp_factored(W, v, r_diag, A, b, iters: int = 25, x0=None,
                      backend: str = "auto", band_offset: int = None,
                      lam0=None, q0=None) -> QPSolution:
    """See ``_solve_qp_factored``; wrapper adding the opt-in
    ``KRT_QP_DEBUG_CHECKS`` validation of the ``band_offset`` promise."""
    _debug_check_band(A, band_offset)
    return _solve_qp_factored(W, v, r_diag, A, b, iters, x0, backend,
                              band_offset, lam0, q0)


@partial(jax.jit,
         static_argnames=("iters", "backend", "band_offset"))
def _solve_qp_factored(W, v, r_diag, A, b, iters: int = 25, x0=None,
                       backend: str = "auto", band_offset: int = None,
                       lam0=None, q0=None) -> QPSolution:
    """Least-squares-form QP: min ||W x + v||_2^2 + x^T diag(r) x + q0^T x
    s.t. A x <= b  (dense form P = 2 (W^T W + diag(r)), q = 2 W^T v + q0).

    The factored objective is what condensed MPC assembly naturally
    produces (W = sqrt(Q) CB, v = sqrt(Q) (CA z - Yr + ...)); keeping it
    factored lets the batched Pallas path form the Gram in-kernel instead
    of as a host-side batched-small GEMM.  A is implicitly lane-shared
    (the only case the factored kernel supports); per-lane-A callers use
    ``solve_qp``.  Semantics otherwise match ``solve_qp``.

    ``q0`` (n,): optional additive linear term.  Diagonal-quadratic +
    linear extras (e.g. the SQP's Levenberg term rho||x - x_prev||^2)
    fold into (r_diag + rho, q0 = -2 rho x_prev) instead of materializing
    sqrt(rho) I least-squares rows -- n fewer Gram rows per solve.
    """
    with jax.default_matmul_precision("highest"):
        use_pallas = (backend != "jax"
                      and jnp.asarray(b).shape[-1] > 0
                      and jnp.asarray(W).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        if use_pallas:
            warm = x0 is not None
            if x0 is None:
                x0 = jnp.zeros(W.shape[-1:], jnp.float32)
            warm_dual = lam0 is not None
            if lam0 is None:
                lam0 = jnp.ones(b.shape, jnp.float32)
            has_q0 = q0 is not None
            if q0 is None:
                q0 = jnp.zeros(W.shape[-1:], jnp.float32)
            f = _factored_routed_solver(iters, warm, band_offset, warm_dual,
                                        has_q0)
            x, lam, ok, gap = f(jnp.asarray(W, jnp.float32),
                                jnp.asarray(v, jnp.float32),
                                jnp.asarray(r_diag, jnp.float32),
                                jnp.asarray(A, jnp.float32),
                                jnp.asarray(b, jnp.float32),
                                jnp.asarray(x0, jnp.float32),
                                jnp.asarray(lam0, jnp.float32),
                                jnp.asarray(q0, jnp.float32))
            return QPSolution(x=x, lam=lam, ok=ok, gap=gap)
        P, q = _factored_Pq(jnp.asarray(W), jnp.asarray(v),
                            jnp.asarray(r_diag), q0)
        return _solve_qp_impl(P, q, A, b, iters, x0, True, lam0)


def _factored_routed_solver(iters: int, warm: bool, band: int,
                            warm_dual: bool, has_q0: bool = False):
    """custom_vmap'd factored solver (see ``_pallas_routed_solver``)."""
    key = ("factored", iters, warm, band, warm_dual, has_q0)
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
    )

    def _pure(W, v, r_diag, A, b, x0, lam0, q0):
        P, q = _factored_Pq(W, v, r_diag, q0 if has_q0 else None)
        sol = _solve_qp_impl(P, q, A, b, iters, x0 if warm else None, True,
                             lam0 if warm_dual else None)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(W, v, r_diag, A, b, x0, lam0, q0):
        return _pure(W, v, r_diag, A, b, x0, lam0, q0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, W, v, r_diag, A, b, x0, lam0, q0):
        Wb, vb, rb, Ab, bb, xb, lb, q0b = in_batched
        if Ab or rb:
            out = jax.vmap(_pure, in_axes=tuple(
                0 if bi else None for bi in in_batched))(
                    W, v, r_diag, A, b, x0, lam0, q0)
            return out, (True, True, True, True)
        bc = lambda val, vib: val if vib else \
            jnp.broadcast_to(val[None], (axis_size,) + val.shape)
        x, lam, ok, gap = solve_qp_factored_batched(
            bc(W, Wb), bc(v, vb), r_diag, A, bc(b, bb),
            x0=bc(x0, xb) if warm else None, iters=iters, band=band,
            lam0=bc(lam0, lb) if warm_dual else None,
            q0=bc(q0, q0b) if has_q0 else None)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


_ROUTED_CACHE = {}


def _bilin_assemble(z, u_prev, Yr, PGW, PG0, PAsq, sq, cF, F0):
    """XLA-side (W, v, b) assembly of the fused-bilinear QP -- the exact
    computation ``_bilin_kernel`` performs in VMEM, for the pure path."""
    p = PAsq.shape[0]
    n = PGW.shape[0] // p
    m = u_prev.shape[-1]
    W = (PGW @ z).reshape(p, n)
    CB0 = (PG0 @ z).reshape(m, p).T
    v = PAsq @ z - sq * Yr + CB0 @ u_prev
    b = cF - F0 @ u_prev
    return W, v, b


def solve_qp_bilinear(z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A, cF, F0,
                      iters: int = 25, x0=None, backend: str = "auto",
                      band_offset: int = None, lam0=None) -> QPSolution:
    """Fused bilinear-MPC solve: the QP ASSEMBLY runs inside the Pallas
    kernel when batched (``ops.pallas.qp_ipm.solve_qp_bilinear_batched``).

    For the iters=1 shared-Beta bilinear controller, (W, v, b) of the
    factored QP are linear in the lane's lifted state z and previous input
    u_prev against lane-shared generators (``BilinearKmpc.PGW/PG0/PAsq``),
    so shipping (z, u_prev) to the kernel replaces the per-lane
    (W, v, b) HBM round trip (~5x less kernel input traffic at bench
    shapes).  Unbatched / non-TPU / per-candidate-const calls fall back to
    assembling in XLA; per-lane ``Yr`` (multi-ref batches) assembles in
    XLA but still solves on the factored kernel.  Semantics are
    lane-for-lane those of assembling (W, v, b) and calling
    ``solve_qp_factored``.
    """
    _debug_check_band(A, band_offset)
    return _solve_qp_bilinear(z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A,
                              cF, F0, iters, x0, backend, band_offset, lam0)


@partial(jax.jit,
         static_argnames=("iters", "backend", "band_offset"))
def _solve_qp_bilinear(z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A, cF, F0,
                       iters: int = 25, x0=None, backend: str = "auto",
                       band_offset: int = None, lam0=None) -> QPSolution:
    with jax.default_matmul_precision("highest"):
        use_pallas = (backend != "jax"
                      and jnp.asarray(cF).shape[-1] > 0
                      and jnp.asarray(z).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        if not use_pallas:
            W, v, b = _bilin_assemble(z, u_prev, Yr, PGW, PG0, PAsq, sq,
                                      cF, F0)
            P, q = _factored_Pq(W, v, r_diag)
            return _solve_qp_impl(P, q, A, b, iters, x0, True, lam0)
        warm = x0 is not None
        if x0 is None:
            x0 = jnp.zeros(A.shape[-1:], jnp.float32)
        warm_dual = lam0 is not None
        if lam0 is None:
            lam0 = jnp.ones(cF.shape, jnp.float32)
        f = _bilinear_routed_solver(iters, warm, band_offset, warm_dual)
        x, lam, ok, gap = f(jnp.asarray(z, jnp.float32),
                            jnp.asarray(u_prev, jnp.float32),
                            jnp.asarray(Yr, jnp.float32),
                            jnp.asarray(PGW, jnp.float32),
                            jnp.asarray(PG0, jnp.float32),
                            jnp.asarray(PAsq, jnp.float32),
                            jnp.asarray(sq, jnp.float32),
                            jnp.asarray(r_diag, jnp.float32),
                            jnp.asarray(A, jnp.float32),
                            jnp.asarray(cF, jnp.float32),
                            jnp.asarray(F0, jnp.float32),
                            jnp.asarray(x0, jnp.float32),
                            jnp.asarray(lam0, jnp.float32))
        return QPSolution(x=x, lam=lam, ok=ok, gap=gap)


def _bilinear_routed_solver(iters: int, warm: bool, band: int,
                            warm_dual: bool):
    """custom_vmap'd fused-bilinear solver: batched (z, u_prev) with shared
    generators hits the assembly-fused kernel; a batched Yr (multi-ref)
    assembles per-lane in XLA and rides the factored kernel; batched
    generators (candidate-model axes) fall back to plain vmap."""
    key = ("bilinear", iters, warm, band, warm_dual)
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_bilinear_batched,
    )

    def _pure(z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A, cF, F0,
              x0, lam0):
        W, v, b = _bilin_assemble(z, u_prev, Yr, PGW, PG0, PAsq, sq, cF, F0)
        P, q = _factored_Pq(W, v, r_diag)
        sol = _solve_qp_impl(P, q, A, b, iters, x0 if warm else None, True,
                             lam0 if warm_dual else None)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A, cF, F0,
              x0, lam0):
        return _pure(z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A, cF, F0,
                     x0, lam0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, z, u_prev, Yr, PGW, PG0, PAsq, sq,
              r_diag, A, cF, F0, x0, lam0):
        (zb, ub, Yrb, PGWb, PG0b, PAsqb, sqb, rb, Ab, cFb, F0b, xb,
         lb) = in_batched
        if PGWb or PG0b or PAsqb or sqb or rb or Ab or cFb or F0b:
            # per-lane generators (candidate-model axes): no shared-A kernel
            out = jax.vmap(_pure, in_axes=tuple(
                0 if bi else None for bi in in_batched))(
                    z, u_prev, Yr, PGW, PG0, PAsq, sq, r_diag, A, cF, F0,
                    x0, lam0)
            return out, (True, True, True, True)
        bc = lambda val, vib: val if vib else \
            jnp.broadcast_to(val[None], (axis_size,) + val.shape)
        # a batched Yr (run_multi_ref) rides the same kernel as a
        # per-lane sq*Yr tile (in-kernel subtraction broadcasts either
        # shape); sq (p,) broadcasts against both (p,) and (B, p)
        x, lam, ok, gap = solve_qp_bilinear_batched(
            bc(z, zb), bc(u_prev, ub),
            sq * (bc(Yr, Yrb) if Yrb else Yr), PGW, PG0, PAsq, r_diag,
            A, cF, F0, x0=bc(x0, xb) if warm else None, iters=iters,
            band=band, lam0=bc(lam0, lb) if warm_dual else None)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


def _bilin_lift_assemble(zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm, Hb,
                         Pz, Pm, Pb, tables, p):
    """One lane's XLA lift + assembly against the z-section-folded
    generators -- the exact math ``_bilin_lift_kernel`` runs in VMEM
    (pure fallback / parity oracle).  Returns (W (p, n), v (p,))."""
    feats = []
    prev = zeta
    for parent_idx, dim_idx in tables:
        prev = prev[jnp.asarray(parent_idx)] * zeta[jnp.asarray(dim_idx)]
        feats.append(prev)
    monos = jnp.concatenate(feats) if feats else \
        jnp.zeros((0,), zeta.dtype)
    n = Gz.shape[0] // p
    m = up.shape[-1]
    W = (Gz @ zeta + Gm @ monos + Gb).reshape(p, n)
    CB0 = (Hz @ zeta + Hm @ monos + Hb).reshape(m, p).T
    v = Pz @ zeta + Pm @ monos + Pb - sqYr + CB0 @ up
    return W, v


def solve_qp_bilinear_lifted(zeta, u_prev, sqYr, lifted: dict, r_diag, A,
                             cF, F0, tables, iters: int = 25, x0=None,
                             backend: str = "auto", band_offset: int = None,
                             lam0=None) -> QPSolution:
    """Lift-fused bilinear solve: the POLY LIFT, the QP assembly, and the
    interior point run inside one Pallas kernel when batched
    (``ops.pallas.qp_ipm.solve_qp_bilinear_lifted_batched``).

    ``lifted`` carries the z-section-folded generators (Gz/Gm/Gb for W,
    Hz/Hm/Hb for CB0, Pz/Pm/Pb for v -- ``BilinearKmpc`` precomputes
    them in f64); ``tables`` the ``poly_parent_tables`` gather pairs as
    nested tuples.  The lane ships its RAW zeta; no lifted state exists
    outside the kernel.  Semantics are lane-for-lane those of lifting in
    XLA and calling ``solve_qp_factored``.
    """
    _debug_check_band(A, band_offset)
    return _solve_qp_bilinear_lifted(
        zeta, u_prev, sqYr, lifted["Gz"], lifted["Gm"], lifted["Gb"],
        lifted["Hz"], lifted["Hm"], lifted["Hb"], lifted["Pz"],
        lifted["Pm"], lifted["Pb"], r_diag, A, cF, F0, tables, iters, x0,
        backend, band_offset, lam0)


@partial(jax.jit,
         static_argnames=("tables", "iters", "backend", "band_offset"))
def _solve_qp_bilinear_lifted(zeta, u_prev, sqYr, Gz, Gm, Gb, Hz, Hm, Hb,
                              Pz, Pm, Pb, r_diag, A, cF, F0, tables, iters,
                              x0, backend, band_offset,
                              lam0=None) -> QPSolution:
    with jax.default_matmul_precision("highest"):
        use_pallas = (backend != "jax"
                      and jnp.asarray(cF).shape[-1] > 0
                      and jnp.asarray(zeta).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        p = Pz.shape[0]
        if not use_pallas:
            W, v = _bilin_lift_assemble(zeta, u_prev, sqYr, Gz, Gm, Gb,
                                        Hz, Hm, Hb, Pz, Pm, Pb, tables, p)
            b = cF - F0 @ u_prev
            P, q = _factored_Pq(W, v, r_diag)
            return _solve_qp_impl(P, q, A, b, iters, x0, True, lam0)
        warm = x0 is not None
        if x0 is None:
            x0 = jnp.zeros(A.shape[-1:], jnp.float32)
        warm_dual = lam0 is not None
        if lam0 is None:
            lam0 = jnp.ones(cF.shape, jnp.float32)
        f = _bilin_lifted_routed_solver(tables, iters, warm, band_offset,
                                        warm_dual)
        x, lam, ok, gap = f(
            jnp.asarray(zeta, jnp.float32), jnp.asarray(u_prev, jnp.float32),
            jnp.asarray(sqYr, jnp.float32), Gz, Gm, Gb, Hz, Hm, Hb,
            Pz, Pm, Pb, jnp.asarray(r_diag, jnp.float32),
            jnp.asarray(A, jnp.float32), jnp.asarray(cF, jnp.float32),
            jnp.asarray(F0, jnp.float32), jnp.asarray(x0, jnp.float32),
            jnp.asarray(lam0, jnp.float32))
        return QPSolution(x=x, lam=lam, ok=ok, gap=gap)


def _bilin_lifted_routed_solver(tables, iters: int, warm: bool, band: int,
                                warm_dual: bool):
    """custom_vmap'd lift-fused bilinear solver (see the fused/factored
    siblings)."""
    key = ("bilin_lift", tables, iters, warm, band, warm_dual)
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_bilinear_lifted_batched,
    )

    def _pure(zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm, Hb, Pz, Pm, Pb, r_diag,
              A, cF, F0, x0, lam0):
        W, v = _bilin_lift_assemble(zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm, Hb,
                                    Pz, Pm, Pb, tables, Pz.shape[0])
        b = cF - F0 @ up
        P, q = _factored_Pq(W, v, r_diag)
        sol = _solve_qp_impl(P, q, A, b, iters, x0 if warm else None, True,
                             lam0 if warm_dual else None)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm, Hb, Pz, Pm, Pb, r_diag,
              A, cF, F0, x0, lam0):
        return _pure(zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm, Hb, Pz, Pm, Pb,
                     r_diag, A, cF, F0, x0, lam0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm,
              Hb, Pz, Pm, Pb, r_diag, A, cF, F0, x0, lam0):
        (zb, ub, Yrb, *genb, rb, Ab, cFb, F0b, xb, lb) = in_batched
        if any(genb) or rb or Ab or cFb or F0b:
            out = jax.vmap(_pure, in_axes=tuple(
                0 if bi else None for bi in in_batched))(
                    zeta, up, sqYr, Gz, Gm, Gb, Hz, Hm, Hb, Pz, Pm, Pb,
                    r_diag, A, cF, F0, x0, lam0)
            return out, (True, True, True, True)
        bc = lambda val, vib: val if vib else \
            jnp.broadcast_to(val[None], (axis_size,) + val.shape)
        # a batched sqYr (run_multi_ref's per-lane trajectories) rides
        # the same kernel as a per-lane tile (in-kernel subtraction
        # broadcasts either shape)
        x, lam, ok, gap = solve_qp_bilinear_lifted_batched(
            bc(zeta, zb), bc(up, ub),
            bc(sqYr, Yrb) if Yrb else sqYr, Gz, Gm, Gb, Hz, Hm, Hb,
            Pz, Pm, Pb, r_diag, A, cF, F0,
            x0=bc(x0, xb) if warm else None, iters=iters, tables=tables,
            band=band, lam0=bc(lam0, lb) if warm_dual else None)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


def _nmpc_condense_assemble(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, cols,
                            m):
    """One lane's XLA condensation + factored assembly -- the exact math
    ``ops.pallas.qp_ipm._nmpc_kernel`` runs in VMEM (pure fallback /
    parity oracle).  jz (Np, nz, nz), ju (Np, nz, m), cv (Np, nz);
    returns (W (p, n), v (p,))."""
    Np, nz = jz.shape[0], jz.shape[1]
    nstate = Cz.shape[1]
    nproj = Cz.shape[0]
    nU = max(cols) + m            # decision columns: [u0 | reduced moves]
    W_rows, v_rows = [], []
    S = jnp.zeros((nz, nU), jz.dtype)
    s = zeta                      # s_0 = current state (S_0 = 0)
    for k in range(Np + 1):
        proj = Cz @ S[:nstate]                     # (nproj, nU)
        sproj = Cz @ s[:nstate]
        for r in range(nproj):
            sqk = sq[k * nproj + r]
            W_rows.append(sqk * proj[r, m:])
            v_rows.append(sqk * sproj[r] - sqRef[k * nproj + r]
                          + sqk * (proj[r, :m] @ u_prev))
        if k < Np:
            S = jz[k] @ S
            S = S.at[:, cols[k]:cols[k] + m].add(ju[k])
            s = jz[k] @ s + cv[k]
    return jnp.stack(W_rows), jnp.stack(v_rows)


def solve_qp_nmpc(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF,
                  F0, cols, iters: int = 25, x0=None, q0=None, lam0=None,
                  backend: str = "auto", band_offset: int = None
                  ) -> QPSolution:
    """Condensation-fused NMPC-pass solve: the SQP's sensitivity recursion,
    W/v assembly, AND the interior point run inside one Pallas kernel when
    batched (``ops.pallas.qp_ipm.solve_qp_nmpc_batched``).

    The XLA condensation is a chain of batched-small (nz x nz) matmuls
    plus (B, Np+1, n, nU) stacked HBM round trips -- measured as the
    NMPC's batch-scaling wall (+53% per-lane from B=2048 to 8192 while
    the QP kernel scales flat; scripts/inloop_ablation.py MODEL=nonlinear).
    Per-lane inputs here are just the stage Jacobians + defects.
    Unbatched / non-TPU calls condense in XLA (the parity oracle
    ``_nmpc_condense_assemble``); a batched reference window
    (run_multi_ref) condenses per-lane in XLA but still solves on the
    factored kernel.  ``cols`` is the static per-stage decision-column
    table (move blocking folds to repeated offsets).
    """
    _debug_check_band(A, band_offset)
    return _solve_qp_nmpc(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag,
                          A, cF, F0, tuple(int(c) for c in cols), iters,
                          x0, q0, lam0, backend, band_offset)


@partial(jax.jit,
         static_argnames=("cols", "iters", "backend", "band_offset"))
def _solve_qp_nmpc(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF,
                   F0, cols, iters, x0, q0, lam0, backend, band_offset
                   ) -> QPSolution:
    with jax.default_matmul_precision("highest"):
        use_pallas = (backend != "jax"
                      and jnp.asarray(cF).shape[-1] > 0
                      and jnp.asarray(jz).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        if not use_pallas:
            W, v = _nmpc_condense_assemble(jz, ju, cv, zeta, u_prev, sq,
                                           sqRef, Cz, cols,
                                           u_prev.shape[-1])
            b = cF - F0 @ u_prev
            P, q = _factored_Pq(W, v, r_diag, q0)
            return _solve_qp_impl(P, q, A, b, iters, x0, True, lam0)
        warm = x0 is not None
        if x0 is None:
            x0 = jnp.zeros(A.shape[-1:], jnp.float32)
        has_q0 = q0 is not None
        if q0 is None:
            q0 = jnp.zeros(A.shape[-1:], jnp.float32)
        warm_dual = lam0 is not None
        if lam0 is None:
            lam0 = jnp.ones(cF.shape, jnp.float32)
        f = _nmpc_routed_solver(cols, iters, warm, has_q0, band_offset,
                                warm_dual)
        x, lam, ok, gap = f(jnp.asarray(jz, jnp.float32),
                            jnp.asarray(ju, jnp.float32),
                            jnp.asarray(cv, jnp.float32),
                            jnp.asarray(zeta, jnp.float32),
                            jnp.asarray(u_prev, jnp.float32),
                            jnp.asarray(sq, jnp.float32),
                            jnp.asarray(sqRef, jnp.float32),
                            jnp.asarray(Cz, jnp.float32),
                            jnp.asarray(r_diag, jnp.float32),
                            jnp.asarray(A, jnp.float32),
                            jnp.asarray(cF, jnp.float32),
                            jnp.asarray(F0, jnp.float32),
                            jnp.asarray(x0, jnp.float32),
                            jnp.asarray(q0, jnp.float32),
                            jnp.asarray(lam0, jnp.float32))
        return QPSolution(x=x, lam=lam, ok=ok, gap=gap)


def _nmpc_routed_solver(cols, iters: int, warm: bool, has_q0: bool,
                        band: int, warm_dual: bool):
    """custom_vmap'd condensation-fused NMPC solver: batched Jacobians with
    shared generators hit the fused kernel; a batched sqRef (multi-ref)
    condenses per-lane in XLA and rides the factored kernel; batched
    shared operands fall back to plain vmap."""
    key = ("nmpc", cols, iters, warm, has_q0, band, warm_dual)
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_nmpc_batched,
    )

    def _pure(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
              x0, q0, lam0):
        W, v = _nmpc_condense_assemble(jz, ju, cv, zeta, u_prev, sq, sqRef,
                                       Cz, cols, u_prev.shape[-1])
        b = cF - F0 @ u_prev
        P, q = _factored_Pq(W, v, r_diag, q0 if has_q0 else None)
        sol = _solve_qp_impl(P, q, A, b, iters, x0 if warm else None, True,
                             lam0 if warm_dual else None)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
              x0, q0, lam0):
        return _pure(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag, A,
                     cF, F0, x0, q0, lam0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, jz, ju, cv, zeta, u_prev, sq, sqRef,
              Cz, r_diag, A, cF, F0, x0, q0, lam0):
        (jzb, jub, cvb, zb, ub, sqb, sqRefb, Czb, rb, Ab, cFb, F0b, xb,
         q0b, lb) = in_batched
        if sqb or Czb or rb or Ab or cFb or F0b:
            out = jax.vmap(_pure, in_axes=tuple(
                0 if bi else None for bi in in_batched))(
                    jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag, A,
                    cF, F0, x0, q0, lam0)
            return out, (True, True, True, True)
        bc = lambda val, vib: val if vib else \
            jnp.broadcast_to(val[None], (axis_size,) + val.shape)
        Np, nz = jz.shape[-3], jz.shape[-2]
        # a batched sqRef (run_multi_ref's per-lane trajectories) rides the
        # SAME fused kernel: the wrapper ships it as a per-lane tile and
        # the in-kernel subtraction broadcasts either shape
        x, lam, ok, gap = solve_qp_nmpc_batched(
            bc(jz, jzb), bc(ju, jub), bc(cv, cvb), bc(zeta, zb),
            bc(u_prev, ub), sq,
            bc(sqRef, sqRefb) if sqRefb else sqRef, Cz, r_diag, A, cF, F0,
            x0=bc(x0, xb) if warm else None,
            q0=bc(q0, q0b) if has_q0 else None,
            lam0=bc(lam0, lb) if warm_dual else None,
            Np=Np, nz=nz, nstate=Cz.shape[1], nproj=Cz.shape[0],
            cols=cols, iters=iters, band=band)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


def build_stage_jac_ops(A1, G, tables, pos_x, nz: int, nza: int,
                        degree: int):
    """Host-side generator operands for the stage-Jacobian-fused NMPC
    kernel (``ops.pallas.qp_ipm._nmpc_stage_kernel``).

    From the analytic-Jacobian statics (``kmpc._poly_jacobian_static``):
    reorders G's rows to COLUMN-major (J column j = contiguous rows
    j*nz..(j+1)*nz -- the slices the in-kernel condensation consumes),
    splits its columns per g_low section (x coordinates -> zeta|u column
    groups via ``pos_x``; one block per low monomial degree), builds the
    one-hot monomial selectors, and bf16-splits every GEMM operand for
    the 3-pass in-kernel assembly.  Returns (jac_ops tuple, jlayout).
    """
    import numpy as np

    from koopman_realizations_tpu.ops.pallas.qp_ipm import _split_bf16
    m = nza - nz
    perm = np.empty(nza * nz, np.int64)
    for i in range(nza):
        for o in range(nz):
            perm[i * nz + o] = o * nza + i
    Gc = np.asarray(G, np.float64)[perm]               # (nza*nz, n_low)
    A1c = np.asarray(A1, np.float64).T.reshape(-1, 1)  # [(i, o)] = A1[o, i]
    xsec = Gc[:, np.asarray(pos_x)]                    # (nza*nz, nza)
    ops = [jnp.asarray(A1c, jnp.float32)]
    ops += list(_split_bf16(xsec[:, :nz]))
    ops += list(_split_bf16(xsec[:, nz:]))
    jlayout = []
    off = nza
    mono_tables = tables[: degree - 2]
    prev_rows = nza
    for b, (p_idx, d_idx) in enumerate(mono_tables):
        r = len(p_idx)
        Sdz = np.zeros((r, nz), np.float32)
        Sdu = np.zeros((r, max(m, 1)), np.float32)
        for row_i, di in enumerate(d_idx):
            if int(di) < nz:
                Sdz[row_i, int(di)] = 1.0
            else:
                Sdu[row_i, int(di) - nz] = 1.0
        if b == 0:
            Spz = np.zeros((r, nz), np.float32)
            Spu = np.zeros((r, max(m, 1)), np.float32)
            for row_i, pi in enumerate(p_idx):
                if int(pi) < nz:
                    Spz[row_i, int(pi)] = 1.0
                else:
                    Spu[row_i, int(pi) - nz] = 1.0
            ops += [jnp.asarray(Spz), jnp.asarray(Spu)]
        else:
            Spar = np.zeros((r, prev_rows), np.float32)
            for row_i, pi in enumerate(p_idx):
                Spar[row_i, int(pi)] = 1.0
            ops += [jnp.asarray(Spar)]
        ops += [jnp.asarray(Sdz), jnp.asarray(Sdu)]
        ops += list(_split_bf16(Gc[:, off:off + r]))
        jlayout.append(r)
        off += r
        prev_rows = r
    return tuple(ops), tuple(jlayout)


def build_stage_roll_ops(A1, A2, a0, tables, nz: int, nza: int):
    """Host-side composed-dynamics generators for the IN-KERNEL rollout
    (``_eval_F_rows``): F(x) = A1 x + A2 feats(x) + a0 with x = [zeta; u],
    feats the full degree-blocked monomials.  A1/A2 split per x-section /
    per block; selectors one-hot.  Returns (roll_ops tuple, flayout)."""
    import numpy as np
    m = nza - nz
    A1 = np.asarray(A1, np.float64)
    A2 = np.asarray(A2, np.float64)
    ops = [jnp.asarray(A1[:, :nz], jnp.float32),
           jnp.asarray(A1[:, nz:], jnp.float32),
           jnp.asarray(np.asarray(a0, np.float64).reshape(-1, 1),
                       jnp.float32)]
    flayout = []
    off = 0
    prev_rows = nza
    for b, (p_idx, d_idx) in enumerate(tables):
        r = len(p_idx)
        Sdz = np.zeros((r, nz), np.float32)
        Sdu = np.zeros((r, max(m, 1)), np.float32)
        for row_i, di in enumerate(d_idx):
            if int(di) < nz:
                Sdz[row_i, int(di)] = 1.0
            else:
                Sdu[row_i, int(di) - nz] = 1.0
        if b == 0:
            Spz = np.zeros((r, nz), np.float32)
            Spu = np.zeros((r, max(m, 1)), np.float32)
            for row_i, pi in enumerate(p_idx):
                if int(pi) < nz:
                    Spz[row_i, int(pi)] = 1.0
                else:
                    Spu[row_i, int(pi) - nz] = 1.0
            ops += [jnp.asarray(Spz), jnp.asarray(Spu)]
        else:
            Spar = np.zeros((r, prev_rows), np.float32)
            for row_i, pi in enumerate(p_idx):
                Spar[row_i, int(pi)] = 1.0
            ops += [jnp.asarray(Spar)]
        ops += [jnp.asarray(Sdz), jnp.asarray(Sdu),
                jnp.asarray(A2[:, off:off + r], jnp.float32)]
        flayout.append(r)
        off += r
        prev_rows = r
    return tuple(ops), tuple(flayout)


def _stage_roll_xla(zeta, Ul, roll_ops, flayout, nz, m, Np, mode):
    """Single-lane XLA trajectory generation from the SAME dynamics
    generators the kernel consumes (pure fallback / oracle).  Returns
    (Zl (Np, nz), Ul (Np, m), Fv (Np, nz))."""
    A1z, A1u, a0 = roll_ops[0], roll_ops[1], roll_ops[2][:, 0]

    def F_eval(z, u):
        acc = A1z @ z + A1u @ u + a0
        idx = 3
        prev = None
        for b in range(len(flayout)):
            if b == 0:
                Spz, Spu, Sdz, Sdu, A2b = roll_ops[idx:idx + 5]
                idx += 5
                par = Spz @ z + Spu @ u
            else:
                Spar, Sdz, Sdu, A2b = roll_ops[idx:idx + 4]
                idx += 4
                par = Spar @ prev
            mono = par * (Sdz @ z + Sdu @ u)
            acc = acc + A2b @ mono
            prev = mono
        return acc

    if mode == "hold":
        F0v = F_eval(zeta, Ul[0])
        return (jnp.tile(zeta[None], (Np, 1)), Ul,
                jnp.tile(F0v[None], (Np, 1)))
    zs, fs = [], []
    z = zeta
    for k in range(Np):
        Fk = F_eval(z, Ul[k])
        zs.append(z)
        fs.append(Fk)
        z = Fk
    return jnp.stack(zs), Ul, jnp.stack(fs)


def _stage_jacs_xla(Zl, Ul, jac_ops, jlayout, nz, m):
    """Single-lane XLA evaluation of the stage Jacobians from the SAME
    generator operands the kernel consumes (pure fallback / oracle).
    Zl (Np, nz), Ul (Np, m) -> (jz (Np, nz, nz), ju (Np, nz, m))."""
    nza = nz + m
    f32 = lambda hi, lo: hi.astype(jnp.float32) + lo.astype(jnp.float32)
    A1c = jac_ops[0][:, 0]
    Gxz = f32(jac_ops[1], jac_ops[2])
    Gxu = f32(jac_ops[3], jac_ops[4])
    Jc = A1c[None, :] + Zl @ Gxz.T + Ul @ Gxu.T        # (Np, nza*nz)
    idx = 5
    prev = None
    for b in range(len(jlayout)):
        if b == 0:
            Spz, Spu, Sdz, Sdu, Gmh, Gml = jac_ops[idx:idx + 6]
            idx += 6
            par = Zl @ jnp.asarray(Spz).T + Ul @ jnp.asarray(Spu).T
        else:
            Spar, Sdz, Sdu, Gmh, Gml = jac_ops[idx:idx + 5]
            idx += 5
            par = prev @ jnp.asarray(Spar).T
        dim = Zl @ jnp.asarray(Sdz).T + Ul @ jnp.asarray(Sdu).T
        mono = par * dim
        Jc = Jc + mono @ f32(Gmh, Gml).T
        prev = mono
    Np = Zl.shape[0]
    J = Jc.reshape(Np, nza, nz).transpose(0, 2, 1)     # [k, o, i]
    return J[..., :nz], J[..., nz:]


def solve_qp_nmpc_stages(Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag,
                         A, cF, F0, cols, jac_ops, jlayout,
                         iters: int = 25, x0=None, q0=None, lam0=None,
                         backend: str = "auto", band_offset: int = None,
                         roll_mode: str = "ship", roll_ops=(), flayout=()
                         ) -> QPSolution:
    """Stage-Jacobian-fused NMPC-pass solve: Jacobian/defect GENERATION,
    the sensitivity condensation, W/v assembly, and the interior point
    all run inside one Pallas kernel when batched
    (``ops.pallas.qp_ipm.solve_qp_nmpc_stages_batched``).

    One stage earlier than ``solve_qp_nmpc``: per-lane inputs are the
    SQP linearization trajectory (Zl (Np, nz), Ul (Np, m)) and rollout
    dynamics values Fv (Np, nz) instead of the materialized jz/ju/cv
    stacks -- those (B, Np, nz, nza) Jacobian stacks (~47 MB/pass at
    B=32768) were the NMPC's remaining batch-scaling wall (round-4
    verdict #3).  ``jac_ops``/``jlayout`` come from
    ``build_stage_jac_ops``.  Unbatched / non-TPU calls evaluate the
    Jacobians in XLA from the same generators and take the
    ``solve_qp_nmpc`` pure path.

    ``roll_mode`` 'roll'/'hold' (with ``roll_ops``/``flayout`` from
    ``build_stage_roll_ops``) generates the linearization trajectory
    itself from the plan / held state -- in-kernel on the Pallas route
    (the SQP's between-pass rollout was 26% of the NMPC step at
    B=32768), in XLA on the pure path.  Zl/Fv (and for 'hold' Ul) are
    ignored then.
    """
    _debug_check_band(A, band_offset)
    dummy = jnp.zeros((0,), jnp.float32)
    if roll_mode != "ship":
        Zl, Fv = dummy, dummy
        if roll_mode == "hold":
            Ul = dummy
    return _solve_qp_nmpc_stages(
        Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
        tuple(int(c) for c in cols), jac_ops, tuple(jlayout), iters, x0,
        q0, lam0, backend, band_offset, roll_mode, tuple(roll_ops),
        tuple(flayout))


@partial(jax.jit,
         static_argnames=("cols", "jlayout", "iters", "backend",
                          "band_offset", "roll_mode", "flayout"))
def _solve_qp_nmpc_stages(Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag,
                          A, cF, F0, cols, jac_ops, jlayout, iters, x0,
                          q0, lam0, backend, band_offset,
                          roll_mode="ship", roll_ops=(),
                          flayout=()) -> QPSolution:
    with jax.default_matmul_precision("highest"):
        use_pallas = (backend != "jax"
                      and jnp.asarray(cF).shape[-1] > 0
                      and jnp.asarray(zeta).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        nz = zeta.shape[-1]
        m = u_prev.shape[-1]
        Np = len(cols)
        if not use_pallas:
            if roll_mode != "ship":
                Ul_eff = Ul if roll_mode == "roll" else \
                    jnp.tile(u_prev[None], (Np, 1))
                Zl, Ul, Fv = _stage_roll_xla(zeta, Ul_eff, roll_ops,
                                             flayout, nz, m, Np, roll_mode)
            jz, ju = _stage_jacs_xla(Zl, Ul, jac_ops, jlayout, nz, m)
            cv = Fv - jnp.einsum("kij,kj->ki", jz, Zl) \
                    - jnp.einsum("kij,kj->ki", ju, Ul)
            W, v = _nmpc_condense_assemble(jz, ju, cv, zeta, u_prev, sq,
                                           sqRef, Cz, cols, m)
            b = cF - F0 @ u_prev
            P, q = _factored_Pq(W, v, r_diag, q0)
            return _solve_qp_impl(P, q, A, b, iters, x0, True, lam0)
        warm = x0 is not None
        if x0 is None:
            x0 = jnp.zeros(A.shape[-1:], jnp.float32)
        has_q0 = q0 is not None
        if q0 is None:
            q0 = jnp.zeros(A.shape[-1:], jnp.float32)
        warm_dual = lam0 is not None
        if lam0 is None:
            lam0 = jnp.ones(cF.shape, jnp.float32)
        f = _nmpc_stages_routed_solver(cols, jlayout, iters, warm, has_q0,
                                       band_offset, warm_dual, roll_mode,
                                       flayout)
        x, lam, ok, gap = f(jnp.asarray(Zl, jnp.float32),
                            jnp.asarray(Ul, jnp.float32),
                            jnp.asarray(Fv, jnp.float32),
                            jnp.asarray(zeta, jnp.float32),
                            jnp.asarray(u_prev, jnp.float32),
                            jnp.asarray(sq, jnp.float32),
                            jnp.asarray(sqRef, jnp.float32),
                            jnp.asarray(Cz, jnp.float32),
                            jnp.asarray(r_diag, jnp.float32),
                            jnp.asarray(A, jnp.float32),
                            jnp.asarray(cF, jnp.float32),
                            jnp.asarray(F0, jnp.float32),
                            jac_ops,
                            jnp.asarray(x0, jnp.float32),
                            jnp.asarray(q0, jnp.float32),
                            jnp.asarray(lam0, jnp.float32),
                            tuple(roll_ops))
        return QPSolution(x=x, lam=lam, ok=ok, gap=gap)


def _nmpc_stages_routed_solver(cols, jlayout, iters: int, warm: bool,
                               has_q0: bool, band: int, warm_dual: bool,
                               roll_mode: str = "ship", flayout=()):
    """custom_vmap'd stage-fused NMPC solver (see ``_nmpc_routed_solver``:
    same routing shape, one stage earlier)."""
    key = ("nmpc_stages", cols, jlayout, iters, warm, has_q0, band,
           warm_dual, roll_mode, tuple(flayout))
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_nmpc_stages_batched,
    )

    def _pure(Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
              jac_ops, x0, q0, lam0, roll_ops):
        nz = zeta.shape[-1]
        m = u_prev.shape[-1]
        Np = len(cols)
        if roll_mode != "ship":
            Ul_eff = Ul if roll_mode == "roll" else \
                jnp.tile(u_prev[None], (Np, 1))
            Zl, Ul, Fv = _stage_roll_xla(zeta, Ul_eff, roll_ops,
                                         flayout, nz, m, Np, roll_mode)
        jz, ju = _stage_jacs_xla(Zl, Ul, jac_ops, jlayout, nz, m)
        cv = Fv - jnp.einsum("kij,kj->ki", jz, Zl) \
                - jnp.einsum("kij,kj->ki", ju, Ul)
        W, v = _nmpc_condense_assemble(jz, ju, cv, zeta, u_prev, sq, sqRef,
                                       Cz, cols, m)
        b = cF - F0 @ u_prev
        P, q = _factored_Pq(W, v, r_diag, q0 if has_q0 else None)
        sol = _solve_qp_impl(P, q, A, b, iters, x0 if warm else None, True,
                             lam0 if warm_dual else None)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
              jac_ops, x0, q0, lam0, roll_ops):
        return _pure(Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag, A,
                     cF, F0, jac_ops, x0, q0, lam0, roll_ops)

    @solve.def_vmap
    def _rule(axis_size, in_batched, Zl, Ul, Fv, zeta, u_prev, sq, sqRef,
              Cz, r_diag, A, cF, F0, jac_ops, x0, q0, lam0, roll_ops):
        (Zlb, Ulb, Fvb, zb, ub, sqb, sqRefb, Czb, rb, Ab, cFb, F0b, job,
         xb, q0b, lb, rob) = in_batched
        if sqb or Czb or rb or Ab or cFb or F0b or any(
                jax.tree_util.tree_leaves(job)) or any(
                jax.tree_util.tree_leaves(rob)):
            out = jax.vmap(_pure, in_axes=tuple(
                jax.tree_util.tree_map(lambda bi: 0 if bi else None, bi_)
                for bi_ in in_batched))(
                    Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz, r_diag, A,
                    cF, F0, jac_ops, x0, q0, lam0, roll_ops)
            return out, (True, True, True, True)
        bc = lambda val, vib: val if vib else \
            jnp.broadcast_to(val[None], (axis_size,) + val.shape)
        nz = zeta.shape[-1]
        Np = len(cols)
        ship = roll_mode == "ship"
        x, lam, ok, gap = solve_qp_nmpc_stages_batched(
            bc(Zl, Zlb) if ship else None,
            bc(Ul, Ulb) if roll_mode != "hold" else None,
            bc(Fv, Fvb) if ship else None, bc(zeta, zb),
            bc(u_prev, ub), sq,
            bc(sqRef, sqRefb) if sqRefb else sqRef, Cz, r_diag, A, cF,
            F0, jac_ops,
            x0=bc(x0, xb) if warm else None,
            q0=bc(q0, q0b) if has_q0 else None,
            lam0=bc(lam0, lb) if warm_dual else None,
            roll_ops=roll_ops,
            Np=Np, nz=nz, nstate=Cz.shape[1], nproj=Cz.shape[0],
            cols=cols, jlayout=jlayout, iters=iters, band=band,
            roll_mode=roll_mode, flayout=flayout)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


def solve_qp_nmpc_multipass(zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF,
                            F0, cols, jac_ops, jlayout, roll_ops, flayout,
                            Gup, q0c, n_passes: int, hold0: bool,
                            iters: int = 25, backend: str = "auto",
                            band_offset: int = None) -> QPSolution:
    """Whole-SQP solve: ALL relinearization passes in one Pallas launch
    (``ops.pallas.qp_ipm._nmpc_multipass_kernel``).  Applies in the
    default SQP regime (cold per-pass duals, constant damping, no
    line-search/best-of-passes); the inter-pass warm start, Levenberg
    term, and rollout inputs are all in-kernel functions of the previous
    pass's solution.  Returns the FINAL pass's solution/ok."""
    _debug_check_band(A, band_offset)
    return _solve_qp_nmpc_multipass(
        zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
        tuple(int(c) for c in cols), tuple(jac_ops), tuple(jlayout),
        tuple(roll_ops), tuple(flayout), Gup, q0c, int(n_passes),
        bool(hold0), iters, backend, band_offset)


@partial(jax.jit,
         static_argnames=("cols", "jlayout", "flayout", "n_passes",
                          "hold0", "iters", "backend", "band_offset"))
def _solve_qp_nmpc_multipass(zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF,
                             F0, cols, jac_ops, jlayout, roll_ops,
                             flayout, Gup, q0c, n_passes, hold0, iters,
                             backend, band_offset) -> QPSolution:
    with jax.default_matmul_precision("highest"):
        use_pallas = (backend != "jax"
                      and jnp.asarray(cF).shape[-1] > 0
                      and jnp.asarray(zeta).dtype == jnp.float32
                      and jax.default_backend() in ("tpu", "axon"))
        if not use_pallas:
            sol = _nmpc_multipass_pure(
                zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0, cols,
                jac_ops, jlayout, roll_ops, flayout, Gup, q0c, n_passes,
                hold0, iters)
            return sol
        f = _nmpc_multipass_routed_solver(cols, jlayout, flayout,
                                          n_passes, hold0, iters,
                                          band_offset)
        x, lam, ok, gap = f(jnp.asarray(zeta, jnp.float32),
                            jnp.asarray(u_prev, jnp.float32),
                            jnp.asarray(sq, jnp.float32),
                            jnp.asarray(sqRef, jnp.float32),
                            jnp.asarray(Cz, jnp.float32),
                            jnp.asarray(r_diag, jnp.float32),
                            jnp.asarray(A, jnp.float32),
                            jnp.asarray(cF, jnp.float32),
                            jnp.asarray(F0, jnp.float32),
                            tuple(jac_ops), tuple(roll_ops),
                            jnp.asarray(Gup, jnp.float32),
                            jnp.asarray(q0c, jnp.float32))
        return QPSolution(x=x, lam=lam, ok=ok, gap=gap)


def _nmpc_multipass_pure(zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
                         cols, jac_ops, jlayout, roll_ops, flayout, Gup,
                         q0c, n_passes, hold0, iters):
    """Single-lane XLA mirror of the multipass kernel (pure fallback)."""
    nz = zeta.shape[-1]
    m = u_prev.shape[-1]
    Np = len(cols)
    group_row = [cols[k] - m for k in range(1, Np)]
    xp = jnp.asarray(Gup) @ u_prev
    sol = None
    b = cF - F0 @ u_prev
    for p in range(n_passes):
        Ul = jnp.stack([u_prev] + [xp[g:g + m] for g in group_row])
        mode = "hold" if (p == 0 and hold0) else "roll"
        Zl, Ul, Fv = _stage_roll_xla(zeta, Ul, roll_ops, flayout, nz, m,
                                     Np, mode)
        jz, ju = _stage_jacs_xla(Zl, Ul, jac_ops, jlayout, nz, m)
        cv = Fv - jnp.einsum("kij,kj->ki", jz, Zl) \
                - jnp.einsum("kij,kj->ki", ju, Ul)
        W, v = _nmpc_condense_assemble(jz, ju, cv, zeta, u_prev, sq,
                                       sqRef, Cz, cols, m)
        P, q = _factored_Pq(W, v, r_diag, jnp.asarray(q0c).reshape(-1) * xp)
        sol = _solve_qp_impl(P, q, A, b, iters, xp, True, None)
        xp = sol.x
    return sol


def _nmpc_multipass_routed_solver(cols, jlayout, flayout, n_passes: int,
                                  hold0: bool, iters: int, band: int):
    """custom_vmap'd whole-SQP solver (see the stage-fused sibling)."""
    key = ("nmpc_multipass", cols, jlayout, flayout, n_passes, hold0,
           iters, band)
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_nmpc_multipass_batched,
    )

    def _pure(zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0, jac_ops,
              roll_ops, Gup, q0c):
        sol = _nmpc_multipass_pure(zeta, u_prev, sq, sqRef, Cz, r_diag,
                                   A, cF, F0, cols, jac_ops, jlayout,
                                   roll_ops, flayout, Gup, q0c, n_passes,
                                   hold0, iters)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0, jac_ops,
              roll_ops, Gup, q0c):
        return _pure(zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
                     jac_ops, roll_ops, Gup, q0c)

    @solve.def_vmap
    def _rule(axis_size, in_batched, zeta, u_prev, sq, sqRef, Cz, r_diag,
              A, cF, F0, jac_ops, roll_ops, Gup, q0c):
        (zb, ub, sqb, sqRefb, Czb, rb, Ab, cFb, F0b, job, rob, Gb,
         qb) = in_batched
        if sqb or Czb or rb or Ab or cFb or F0b or Gb or qb or any(
                jax.tree_util.tree_leaves(job)) or any(
                jax.tree_util.tree_leaves(rob)):
            out = jax.vmap(_pure, in_axes=tuple(
                jax.tree_util.tree_map(lambda bi: 0 if bi else None, bi_)
                for bi_ in in_batched))(
                    zeta, u_prev, sq, sqRef, Cz, r_diag, A, cF, F0,
                    jac_ops, roll_ops, Gup, q0c)
            return out, (True, True, True, True)
        bc = lambda val, vib: val if vib else \
            jnp.broadcast_to(val[None], (axis_size,) + val.shape)
        x, lam, ok, gap = solve_qp_nmpc_multipass_batched(
            bc(zeta, zb), bc(u_prev, ub), sq,
            bc(sqRef, sqRefb) if sqRefb else sqRef, Cz, r_diag, A, cF,
            F0, jac_ops, roll_ops, Gup, q0c,
            Np=len(cols), nz=zeta.shape[-1], nstate=Cz.shape[1],
            nproj=Cz.shape[0], cols=cols, jlayout=jlayout,
            flayout=flayout, n_passes=n_passes, hold0=hold0, iters=iters,
            band=band)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


def _pallas_routed_solver(iters: int, warm: bool, band: int = None,
                          warm_dual: bool = False):
    """custom_vmap'd shared-A solver: unbatched calls use the pure-JAX path;
    vmapped calls (the closed-loop scenario batch) hit the lanes-minor Pallas
    kernel with the whole batch at once.  Cached per variant."""
    key = (iters, warm, band, warm_dual)
    f = _ROUTED_CACHE.get(key)
    if f is not None:
        return f
    from jax.custom_batching import custom_vmap

    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_shared_batched,
    )

    def _pure(P, q, A, b, x0, lam0):
        sol = _solve_qp_impl(P, q, A, b, iters, x0 if warm else None, True,
                             lam0 if warm_dual else None)
        return sol.x, sol.lam, sol.ok, sol.gap

    @custom_vmap
    def solve(P, q, A, b, x0, lam0):
        return _pure(P, q, A, b, x0, lam0)

    @solve.def_vmap
    def _rule(axis_size, in_batched, P, q, A, b, x0, lam0):
        Pb, qb, Ab, bb, xb, lb = in_batched
        if Ab:
            # constraint rows vary per lane (e.g. a candidate-model axis):
            # the lane-shared kernel does not apply, fall back to plain vmap
            out = jax.vmap(_pure, in_axes=(0 if Pb else None,
                                           0 if qb else None, 0,
                                           0 if bb else None,
                                           0 if xb else None,
                                           0 if lb else None))(P, q, A, b,
                                                               x0, lam0)
            return out, (True, True, True, True)
        bc = lambda v, vb: v if vb else \
            jnp.broadcast_to(v[None], (axis_size,) + v.shape)
        # a lane-shared Hessian (static condensed MPC) ships to the kernel
        # once instead of as a broadcast (B, n, n) lanes-minor array
        x, lam, ok, gap = solve_qp_shared_batched(
            P, bc(q, qb), A, bc(b, bb),
            x0=bc(x0, xb) if warm else None, iters=iters, band=band,
            lam0=bc(lam0, lb) if warm_dual else None, shared_P=not Pb)
        return (x, lam, ok, gap), (True, True, True, True)

    _ROUTED_CACHE[key] = solve
    return solve


def _solve_qp_impl(P, q, A, b, iters, x0, shared_A, lam0=None):
    P = jnp.asarray(P)
    q = jnp.asarray(q)
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    n = q.shape[-1]
    mc = b.shape[-1]
    dtype = P.dtype

    from koopman_realizations_tpu.ops.batch_linalg import (
        chol_solve_unrolled,
        chol_unrolled,
    )

    if mc == 0:
        # unconstrained QP (all MpcConfig constraints None): quadprog with
        # empty A just solves P x = -q; the IPM reductions over zero rows
        # would be 0/0, so solve the Newton system directly
        obj_scale = jnp.maximum(jnp.max(jnp.abs(P)), 1e-8)
        reg = 1e-11 if dtype == jnp.float64 else 1e-7
        L = chol_unrolled(P / obj_scale + reg * jnp.eye(n, dtype=dtype))
        x = chol_solve_unrolled(L, -q / obj_scale)
        ok = jnp.all(jnp.isfinite(x))
        return QPSolution(x=jnp.where(ok, x, jnp.nan),
                          lam=jnp.zeros((0,), dtype), ok=ok,
                          gap=jnp.zeros((), dtype))

    # equilibrate: normalize the objective scale and constraint rows so the
    # interior-point tolerances are absolute (MPC Hessians scale with the
    # lifted state magnitude and can swing many orders within one batch)
    obj_scale = jnp.maximum(jnp.max(jnp.abs(P)), 1e-8)
    P = P / obj_scale
    q = q / obj_scale
    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)
    A = A / row[:, None]
    b = b / row

    # primal regularization: keeps the Newton system SPD when P is singular
    reg = 1e-11 if dtype == jnp.float64 else 1e-7
    Pr = P + reg * jnp.eye(n, dtype=dtype)

    # cold starts need a well-centered slack (floor 1); warm starts are
    # near-feasible, so a small floor preserves the head start
    slack_floor = 1.0 if x0 is None else 1e-2
    x0 = jnp.zeros((n,), dtype) if x0 is None else jnp.asarray(x0, dtype)
    s0 = jnp.maximum(b - A @ x0, slack_floor)
    if lam0 is None:
        lam0 = jnp.ones((mc,), dtype)
    else:
        # original -> equilibrated units; the square root damps the start
        # halfway (geometrically) toward the cold lam = 1 -- raw previous
        # multipliers start the predictor-corrector too far off the central
        # path when the problem shifts between receding-horizon steps
        # (observed: a load-estimate update at step k stalls the next solve)
        lam0 = jnp.sqrt(jnp.clip(jnp.asarray(lam0, dtype) * row / obj_scale,
                                 1e-4, 1e4))

    if shared_A:
        # row outer products a_c a_c^T flattened: (mc, n*n); lane-shared
        O_flat = jnp.einsum("ci,cj->cij", A, A).reshape(mc, n * n)

    def max_step(v, dv):
        # largest alpha in (0,1] with v + alpha dv >= (1-tau) v
        ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
        return jnp.minimum(1.0, 0.99 * jnp.min(ratio))

    # once the gap is at the numerical floor, further Newton systems go
    # singular (s*lam denormal) -- freeze converged iterates instead.
    mu_floor = 1e-13 if dtype == jnp.float64 else 1e-8

    def body(carry, _):
        x, s, lam = carry
        mu = (s @ lam) / mc
        r_p = A @ x + s - b
        r_d = Pr @ x + q + A.T @ lam
        active = (mu > mu_floor) | (jnp.max(jnp.abs(r_p)) > mu_floor)

        # the Newton matrix depends only on D = lam/s, so it is factored ONCE
        # per iteration and the factor reused for the predictor and corrector
        # directions (quadprog's predictor-corrector does the same)
        D = jnp.clip(lam / s, 1e-14, 1e14)
        if shared_A:
            M = Pr + (D @ O_flat).reshape(n, n)
        else:
            M = Pr + (A.T * D) @ A
        # unrolled small-matrix Cholesky: XLA's batched lapack-style path is
        # the throughput bottleneck of the whole closed loop on TPU
        L = chol_unrolled(M)

        def direction(r_slam):
            rhs = -r_d - A.T @ ((-r_slam + lam * r_p) / s)
            dx = chol_solve_unrolled(L, rhs)
            ds = -r_p - A @ dx
            dlam = (-r_slam - lam * ds) / s
            return dx, ds, dlam

        # affine (predictor) direction
        dx_a, ds_a, dlam_a = direction(s * lam)
        alpha_a = jnp.minimum(max_step(s, ds_a), max_step(lam, dlam_a))
        mu_aff = ((s + alpha_a * ds_a) @ (lam + alpha_a * dlam_a)) / mc
        sigma = (mu_aff / (mu + 1e-30)) ** 3

        # corrector direction
        dx, ds, dlam = direction(s * lam + ds_a * dlam_a - sigma * mu)
        alpha = jnp.where(active,
                          jnp.minimum(max_step(s, ds), max_step(lam, dlam)), 0.0)
        step = lambda v, dv: jnp.where(jnp.isfinite(dv), v + alpha * dv, v)
        return (step(x, dx), step(s, ds), step(lam, dlam)), None

    (x, s, lam), _ = jax.lax.scan(body, (x0, s0, lam0), None, length=iters)

    gap = (s @ lam) / mc
    r_p = jnp.max(jnp.maximum(A @ x - b, 0.0))
    finite = jnp.all(jnp.isfinite(x))
    # "ok" mirrors quadprog's failure semantics (Ksim breaks only on NaN):
    # the lane survives as long as the iterate is finite and primal-feasible
    # to control accuracy; `gap` carries the exact convergence level for
    # callers that need certified optima.
    tol = 1e-4 if dtype == jnp.float64 else 3e-3
    gap_sane = 1e-2 if dtype == jnp.float64 else 5e-2
    ok = finite & (gap < gap_sane) & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b)), 1.0))
    x = jnp.where(finite, x, jnp.nan)
    # multipliers of the original (un-equilibrated) problem
    lam_orig = lam * obj_scale / row
    return QPSolution(x=x, lam=lam_orig, ok=ok, gap=gap)


def solve_qp_batch(P, q, A, b, iters: int = 25) -> QPSolution:
    """vmapped solve over leading batch axes of (P, q, A, b)."""
    return jax.vmap(lambda Pi, qi, Ai, bi: solve_qp(Pi, qi, Ai, bi, iters=iters))(
        P, q, A, b)


def solve_qp_eq(P, q, A, b, E, d, iters: int = 25):
    """QP with additional equality constraints E x = d.

    Handled by null-space elimination: x = x_p + Z v with E x_p = d and
    Z = null(E); the reduced problem is an inequality-only QP in v.
    Shapes must be static; E is assumed full row rank.
    """
    P = jnp.asarray(P); q = jnp.asarray(q)
    A = jnp.asarray(A); b = jnp.asarray(b)
    E = jnp.asarray(E); d = jnp.asarray(d)
    ne, n = E.shape
    # QR-based particular solution and null-space basis
    Qf, Rf = jnp.linalg.qr(E.T, mode="complete")
    R1 = Rf[:ne, :ne]
    x_p = Qf[:, :ne] @ jax.scipy.linalg.solve_triangular(R1.T, d, lower=True)
    Z = Qf[:, ne:]
    Pz = Z.T @ P @ Z
    qz = Z.T @ (q + P @ x_p)
    Az = A @ Z
    bz = b - A @ x_p
    sol = solve_qp(Pz, qz, Az, bz, iters=iters)
    return QPSolution(x=x_p + Z @ sol.x, lam=sol.lam, ok=sol.ok, gap=sol.gap)
