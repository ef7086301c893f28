"""Pallas TPU kernel: the ENTIRE batched Mehrotra interior-point QP solver.

The closed loop's dominant cost is the per-step MPC QP (``ops.qp.solve_qp``
vmapped over thousands of scenario lanes): ~10 fixed iterations, each one
SPD Newton factor + two triangular solve pairs on tiny (n ~ 27) systems.
Under plain vmap those arrays live batch-MAJOR -- (B, n, n) tiles pad the
27x27 minor dims up to (32, 128) vector registers, wasting ~5x of every VPU
op and bouncing iterates through HBM between scan steps.

This kernel runs the whole fixed-iteration predictor-corrector loop in
lanes-MINOR layout: a tile of 128 lanes occupies the 128-wide lane dimension,
matrices are (n, n, 128) VMEM blocks, and every factorization/substitution
step is a perfectly aligned (n, 128) VPU op.  The Newton matrix forms as ONE
MXU contraction (n^2, mc) @ (mc, 128) over precomputed constraint-row outer
products (the lane-shared-A case: every MPC lane shares its constraint rows,
only P, q, b, warm start differ).  All 10 iterations run without touching
HBM.

Semantics match ``ops.qp._solve_qp_impl`` (itself the batched stand-in for
MATLAB ``quadprog`` per control step, ``Kmpc.m:383/:883``): same
equilibration, regularization, mu floor, step rule, and ok criteria.

API: ``solve_qp_shared_batched(P, q, A, b, x0, iters=..., warm=...)`` with
P (B, n, n), q (B, n), b (B, mc) per-lane and A (mc, n) lane-shared.
Use ``interpret=True`` on CPU (tests); on TPU it compiles via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128 is measured optimal for the dense-P kernel: at bench shapes (n=27,
# mc=108, B=8192, iters=8) tile=256 is ~300x slower (Mosaic VMEM scheduling
# collapses once the tile exceeds one vreg lane width) and tile=512 fails
# to compile.  The slimmer FACTORED kernel inverts this: tile=256 measured
# ~16% faster (in-process A/B at n=27, p=22, iters=3), 512 still fails.
LANE_TILE = 128
FACTORED_LANE_TILE = 256
# The move-BLOCKED factored shape is slimmer still (n=12, mc=48): wider
# tiles keep compiling and keep winning -- 768 measured 23% faster than
# 256 (0.703 vs 0.913 ms/solve, B=32768, iters=3, back-to-back in-process
# slope-fetch sweep; 512=0.78, 1024=0.71 a wash, 2048 fails).  The tile
# default is therefore shape-aware: see ``factored_tile_for``.
FACTORED_LANE_TILE_SLIM = 768


def factored_tile_for(n: int) -> int:
    """Measured-optimal lane tile for the factored kernel by decision size.

    n=27 (unblocked bench shape): 256 (512 fails to compile).
    n=12 (blocked (1,1,2,5) shape): 768.  The boundary is untested between
    13 and 26; 16 splits it conservatively (VMEM working set scales ~n^2).
    ``KMPC_FACTORED_TILE`` overrides for A/B experiments.
    """
    import os
    env = os.environ.get("KMPC_FACTORED_TILE")
    if env:
        return int(env)
    return FACTORED_LANE_TILE_SLIM if n <= 16 else FACTORED_LANE_TILE

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    """MXU matmul with full f32 accumulation (bf16 inputs would destroy the
    1e-14..1e14 dynamic range of the scaled slack/multiplier ratios)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=_HI,
                               preferred_element_type=jnp.float32)


def _split_bf16(X):
    """Host-side bf16 hi/lo split of an f32 operand (X ~= hi + lo).

    The pair feeds ``_dot3``'s manual 3-pass assembly GEMMs; shipping
    bf16 halves also halves the operand's VMEM footprint.
    """
    X = jnp.asarray(X, jnp.float32)
    hi = X.astype(jnp.bfloat16)
    lo = (X - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16_val(b):
    """In-kernel bf16 hi/lo split of an f32 VMEM value."""
    hi = b.astype(jnp.bfloat16)
    lo = (b - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot1(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _split3_bf16_val(v):
    """EXACT in-kernel 3-way bf16 split: v == hi + mid + lo bitwise
    (8+8+8 mantissa bits cover f32's 24; each residual is computed in
    f32 and the last fits bf16 exactly)."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_sel(S_ref, v):
    """EXACT one-hot selection matmul in 3 bf16 passes (vs HIGHEST's 6).

    For a 0/1 selection matrix S (bf16-exact), S @ v distributes over the
    exact 3-way split of v, and the per-row sums hi+mid+lo reassemble the
    f32 value exactly (disjoint mantissa fields) -- so monomial-building
    selection GEMMs cost half of a HIGHEST dot with bitwise-f32 results.
    """
    Sb = S_ref[...].astype(jnp.bfloat16)
    hi, mid, lo = _split3_bf16_val(v)
    return _dot1(Sb, hi) + _dot1(Sb, mid) + _dot1(Sb, lo)


def _dot3(ah, al, bh, bl):
    """Manual 3-pass bf16 matmul (== XLA's HIGH algorithm) for the
    ASSEMBLY prologue GEMMs: ah bh + ah bl + al bh with f32 accumulation,
    dropping only the ~2^-18 al*bl term.

    Matches the precision the XLA-side QP assembly always ran at
    (``kmpc.qp_data``: 3-pass recovers f32 to ~1e-6 and the closed loop
    is stable at bench tolerances); the interior-point loop itself stays
    HIGHEST.  Mosaic cannot lower Precision.HIGH, so the split is done by
    hand: generators split host-side (``_split_bf16``), the per-lane
    operand once in-kernel.  At the lifted bench shape the prologue GEMMs
    are most of the kernel's 0.7-0.8 ms fixed cost (kernel_fixed_anatomy;
    DEFAULT-precision probe: fixed 0.77 -> 0.35 ms), and 6-pass vs 3-pass
    is ~2x their MXU time.
    """
    return _dot1(ah, bh) + _dot1(ah, bl) + _dot1(al, bh)


def _chol_lanes(M, n):
    """Lower Cholesky of (n, n, T) lanes-minor SPD blocks, unrolled over n.

    Deliberately FULL-width per column: shrinking-submatrix variants
    (static (n-j, T) slices, ~n^3/3 nominal flops) measured 9% SLOWER for
    the factorization and a wash for the triangular solves at bench shapes
    (n=27, T=128) -- sub-vreg slices still occupy whole (8, 128) vregs and
    the zero-pad concats add ops.  Measured by in-process slope-fetch A/B
    (scripts/ipm_ab_bench.py, scripts/ipm_slope_bench.py).

    A right-looking SUBLANE-blocked variant (8-aligned dim1 blocks, rank-8
    deferred trailing updates, bitwise-identical results; ~30% fewer
    nominal vreg FMAs) also measured 4% SLOWER at the factored bench shape
    (n=27, p=22, band=3, iters=3, B=16384) -- Mosaic's relayouts on the
    block slices eat the savings.  Full-width it stays.
    """
    cols, rds = [], []
    for j in range(n):
        # exact sqrt + one (1, T) divide, NOT lax.rsqrt: the VPU's
        # approximate reciprocal-sqrt loses enough bits per factorization
        # step to destabilize isolated closed-loop lanes vs the pure-JAX
        # path.  The IEEE reciprocal is computed once per column and the
        # (n, T) scaling becomes a multiply (VPU divides are many-cycle).
        d = jnp.sqrt(M[j, j, :])
        rd = 1.0 / d                                   # separate IEEE div --
        col = M[:, j, :] * rd[None, :]                 # not rsqrt-matchable
        cols.append(col)
        rds.append(rd)
        M = M - col[:, None, :] * col[None, :, :]      # rank-1 downdate
    L = jnp.stack(cols, axis=1)                        # (n, n, T)
    rdiag = jnp.stack(rds, axis=0)                     # (n, T) = 1 / diag(L)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return L * (row >= colx).astype(L.dtype)[..., None], rdiag


def _chol_solve_lanes(L, rdiag, rhs, n):
    """Solve L L^T x = rhs; column-oriented so every step is an (n, T) FMA.

    ``rdiag`` is unused (kept for signature stability): the diagonal scaling
    here is (1, T)-sized and on the accuracy-critical final-answer path, so
    it stays an exact IEEE divide.  Round-5 re-check: replacing these 2n
    chained divides with multiplies by the Cholesky's precomputed
    reciprocal diagonal measured a WASH at the bench shape (1.97 vs 1.94
    ms/solve, in-process A/B scripts/solve_recip_ab.py) while growing the
    kernel-vs-kernel worst-lane divergence 6x (test_kernel_factored_q0) --
    Mosaic already hides these divide latencies, same conclusion as the
    round-4 1/s-hoist negative.
    """
    acc = rhs                                          # forward: L y = rhs
    ys = []
    for k in range(n):
        yk = acc[k] / L[k, k, :]
        ys.append(yk)
        if k + 1 < n:
            acc = acc - L[:, k, :] * yk[None, :]       # rows <= k junk, unused
    acc = jnp.stack(ys, axis=0)                        # backward: L^T x = y
    xs = [None] * n
    for i in reversed(range(n)):
        xi = acc[i] / L[i, i, :]
        xs[i] = xi
        if i > 0:
            acc = acc - L[i, :, :] * xi[None, :]       # acc[j] -= L[i,j] x_i
    return jnp.stack(xs, axis=0)


def _make_form_AtDA(band, n, T, rest, eye, rowi, coli):
    """Newton-matrix formation A^T D A closure (dense or banded; see
    ``_ipm_kernel``).  ``rest[0]``/``rest[1]`` carry the precomputed
    structure operands."""
    if band is None:
        OT = rest[0][...]

        def form_AtDA(D):
            return _dot(OT, D).reshape(n, n, T)
    else:
        Wd = rest[0][...]
        Wo = rest[1][...]
        mask_u = (coli == rowi + band).astype(jnp.float32)[..., None]
        mask_l = (rowi == coli + band).astype(jnp.float32)[..., None]

        def form_AtDA(D):
            dg = _dot(Wd, D)                           # (n, T) diagonal
            M = eye[..., None] * dg[:, None, :]
            if band > 0:
                og = _dot(Wo, D)                       # (n - band, T)
                pad = jnp.zeros((n - og.shape[0], T), og.dtype)
                ogp = jnp.concatenate([og, pad], axis=0)
                M = M + mask_u * ogp[:, None, :] + mask_l * ogp[None, :, :]
            return M
    return form_AtDA


def _mehrotra_loop(n, mc, iters, slack_floor, Pr, q, b, A, At, form_AtDA,
                   x0, lam0):
    """The fixed-iteration Mehrotra predictor-corrector on VMEM values.

    Shared by every kernel variant; semantics match
    ``ops.qp._solve_qp_impl`` (same step rule, mu floor, freeze-on-
    converged).  Pr is the regularized, objective-scaled Hessian
    ((n, n, T), or (n, n, 1) broadcasting for the lane-shared case);
    q (n, T) equilibrated; b (mc, T); A/At the row-equilibrated shared
    constraint matrix; x0/lam0 the (already floored/damped) starts.
    Returns (x, s, lam).
    """
    mu_floor = jnp.float32(1e-8)

    def matvec_P(v):                                   # (n, T)
        acc = Pr[:, 0, :] * v[0][None, :]
        for j in range(1, n):
            acc = acc + Pr[:, j, :] * v[j][None, :]
        return acc

    s0 = jnp.maximum(b - _dot(A, x0), jnp.float32(slack_floor))

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
        return jnp.minimum(1.0, 0.99 * jnp.min(ratio, axis=0))   # (T,)

    def body(_, carry):
        x, s, lam = carry
        mu = jnp.sum(s * lam, axis=0) / mc                       # (T,)
        r_p = _dot(A, x) + s - b                                 # (mc, T)
        r_d = matvec_P(x) + q + _dot(At, lam)                    # (n, T)
        active = (mu > mu_floor) | (jnp.max(jnp.abs(r_p), axis=0) > mu_floor)

        # one factor per iteration, shared by predictor + corrector
        D = jnp.clip(lam / s, 1e-14, 1e14)                       # (mc, T)
        M = Pr + form_AtDA(D)
        L, rdiag = _chol_lanes(M, n)

        def direction(r_slam):
            rhs = -r_d - _dot(At, (-r_slam + lam * r_p) / s)
            dx = _chol_solve_lanes(L, rdiag, rhs, n)
            ds = -r_p - _dot(A, dx)
            dlam = (-r_slam - lam * ds) / s
            return dx, ds, dlam

        dx_a, ds_a, dlam_a = direction(s * lam)
        alpha_a = jnp.minimum(max_step(s, ds_a), max_step(lam, dlam_a))
        mu_aff = jnp.sum((s + alpha_a[None] * ds_a)
                         * (lam + alpha_a[None] * dlam_a), axis=0) / mc
        sigma = (mu_aff / (mu + 1e-30)) ** 3

        dx, ds, dlam = direction(s * lam + ds_a * dlam_a - (sigma * mu)[None])
        alpha = jnp.where(active,
                          jnp.minimum(max_step(s, ds), max_step(lam, dlam)),
                          0.0)[None]
        step = lambda v, dv: jnp.where(jnp.isfinite(dv), v + alpha * dv, v)
        return step(x, dx), step(s, ds), step(lam, dlam)

    # NOTE: unrolling this loop for small iters measured no gain (Mosaic
    # does not exploit cross-iteration scheduling here)
    return jax.lax.fori_loop(0, iters, body, (x0, s0, lam0))


def _ipm_kernel(n, mc, iters, slack_floor, tile, band, warm_dual, factored,
                shared_P, has_q0,
                P_ref, q_ref, b_ref, x0_ref, iobj_ref, A_ref, At_ref,
                *rest):
    """One 128-lane tile: full fixed-iteration Mehrotra predictor-corrector.

    All inputs pre-equilibrated except P (scaled in-VMEM by iobj); shapes:
    P (n, n, T), q/x0 (n, T), b (mc, T), iobj (1, T), A (mc, n) shared,
    At = A^T.

    ``factored``: the objective arrives in least-squares form instead --
    P_ref carries W (p, n, T) with P = 2 (W^T W + diag(r)), q_ref carries
    v (p, T) with q = 2 W^T v, and iobj_ref carries r (1, n) shared.  The
    Gram, the objective scale (max |P|), and the equilibrated q are then
    formed IN-KERNEL as lanes-minor VPU ops -- the host-side batched-small
    Gram GEMM this replaces is the MPC assembly's dominant cost.  The
    per-lane objective scale is written to an extra output (after lam) so
    the wrapper can restore original-unit multipliers.

    ``band`` selects the Newton-matrix formation:
    - None: dense -- ``rest`` carries OT (n*n, mc), the flattened row outer
      products a_c a_c^T, and A^T D A forms as one (n^2, mc) @ (mc, T) MXU
      contraction.
    - d >= 0: A^T A has nonzeros only on the diagonal and (for d > 0) the
      +-d off-diagonals (box + single-offset difference rows, the MPC
      input-bound/slope case).  ``rest`` carries Wd (n, mc) with
      Wd[i, c] = A[c, i]^2 and Wo (max(n-d, 1), mc) with
      Wo[i, c] = A[c, i] A[c, i+d]; A^T D A then forms from two (n, mc)
      contractions plus masked embeds -- ~27x fewer MXU flops at MPC shapes.

    ``warm_dual``: a pre-equilibrated multiplier start lam0 (mc, T) follows
    the structure operands in ``rest`` (receding-horizon dual warm start);
    it is floored/capped so stale or deactivated rows cannot start the
    predictor-corrector off the central path.
    """
    T = tile
    reg = jnp.float32(1e-7)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)
    if factored:
        x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
        W = P_ref[...]                                 # (p, n, T)
        v = q_ref[...]                                 # (p, T)
        rdiag_obj = iobj_ref[0, :]                     # (n,) shared
        p = W.shape[0]
        # Gram 2 (W^T W + diag(r)): p lanes-minor rank-1 accumulations.
        # The diag embed stays 2D until the trailing broadcast -- Mosaic
        # rejects the (n,) -> (n, 1, 1) shape cast.
        P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
        qv = jnp.zeros((n, T), jnp.float32)
        for r in range(p):
            P = P + 2.0 * (W[r][:, None, :] * W[r][None, :, :])
            qv = qv + W[r] * v[r][None, :]
        qv = 2.0 * qv
        if has_q0:
            # optional additive linear term, ORIGINAL units (applied before
            # the per-lane objective scaling below); follows the structure
            # operands in ``rest``
            qv = qv + rest[1 if band is None else 2][...]
        # per-lane objective scale, exactly as the host path: max |P|
        # (P is PSD, so the max-abs entry is on the diagonal -- see
        # _diag_obj_scale)
        obj = _diag_obj_scale(P, n)                    # (T,)
        iobj = 1.0 / obj
        obj_ref[...] = obj[None, :]
        Pr = P * iobj[None, None, :] + reg * eye[..., None]
        q = qv * iobj[None, :]
    elif shared_P:
        # lane-shared Hessian (static condensed MPC): P arrives (n, n),
        # pre-equilibrated on the host; Pr stays (n, n, 1) and broadcasts
        # against the per-lane terms -- no (B, n, n) HBM traffic at all
        x_ref, s_ref, lam_ref = rest[-3:]
        Pr = P_ref[...][..., None] + reg * eye[..., None]
        q = q_ref[...]
    else:
        x_ref, s_ref, lam_ref = rest[-3:]
        iobj = iobj_ref[0, :]                          # (T,)
        Pr = P_ref[...] * iobj[None, None, :] + reg * eye[..., None]
        q = q_ref[...]
    b = b_ref[...]
    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)

    x0 = x0_ref[...]
    if warm_dual:
        # unit convention differs by mode: the NON-factored wrapper
        # pre-applies BOTH row and objective scaling on the host
        # (lam0_eq = lam0 * row * iobj), so lam_raw arrives fully
        # equilibrated; the FACTORED wrapper can only row-scale (obj is
        # known once the Gram forms in-kernel), so the iobj factor is
        # applied here.  Then sqrt = geometric damping toward the cold
        # lam = 1 (matches ops.qp._solve_qp_impl; rationale there).
        lam_raw = rest[-5][...] if factored else rest[-4][...]
        if factored:
            lam_raw = lam_raw * iobj[None, :]          # row scaling applied
        lam0 = jnp.sqrt(jnp.clip(lam_raw, 1e-4, 1e4))  # by the wrapper
    else:
        lam0 = jnp.ones((mc, T), jnp.float32)

    x, s, lam = _mehrotra_loop(n, mc, iters, slack_floor, Pr, q, b, A, At,
                               form_AtDA, x0, lam0)
    x_ref[...] = x
    s_ref[...] = s
    lam_ref[...] = lam


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band", "shared_P"))
def solve_qp_shared_batched(P, q, A, b, x0=None, iters: int = 10,
                            interpret: bool = False,
                            tol: float = 3e-3, gap_sane: float = 5e-2,
                            tile: int = None, band: int = None,
                            lam0=None, shared_P: bool = False):
    """Batched lane-shared-A interior-point solve; returns (x, lam, ok, gap).

    P (B, n, n), q (B, n), b (B, mc) per-lane; A (mc, n) SHARED across the
    batch; x0 (B, n) optional warm start.  Matches ``ops.qp.solve_qp``
    semantics lane-for-lane (same equilibration/regularization/ok rules).

    ``band``: static promise that A^T A is nonzero only on the diagonal and
    the +-band off-diagonals (see ``_ipm_kernel``); the Newton matrix then
    forms from structured (n, mc) contractions instead of the dense
    (n^2, mc) one.  Callers derive it from the host-side constraint stack
    (``ops.qp.band_offset_of``); a wrong value silently corrupts A^T D A.

    ``lam0`` (B, mc): optional multiplier warm start in ORIGINAL (pre-
    equilibration) units -- pass the previous receding-horizon step's
    ``lam`` output.  Floored inside the kernel, so a cold caller can also
    pass ones.  Cuts the iterations needed to re-converge between steps.

    ``shared_P``: P is (n, n), shared across all lanes (static condensed
    MPC): the equilibrated Hessian ships to the kernel once as a shared
    block instead of a broadcast (B, n, n) lanes-minor array.
    """
    P = jnp.asarray(P, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    B, n = q.shape
    mc = A.shape[0]
    if tile is None:
        import os
        env = os.environ.get("KMPC_SHARED_TILE")
        # measured: the per-lane-P dense kernel collapses above 128 (n=27,
        # mc=108); the lane-SHARED-P variant at the slim blocked shape
        # (n=12, mc=48) prefers wider tiles like the factored kernel --
        # see the linear-controller sweep note below
        if env:
            tile = int(env)
        elif shared_P and n <= 16:
            tile = FACTORED_LANE_TILE_SLIM
        else:
            tile = LANE_TILE

    # equilibration (ops.qp._solve_qp_impl): per-lane objective scale,
    # shared constraint-row scale
    if shared_P:
        obj = jnp.maximum(jnp.max(jnp.abs(P)), 1e-8)             # scalar
    else:
        obj = jnp.maximum(jnp.max(jnp.abs(P), axis=(1, 2)), 1e-8)  # (B,)
    iobj = (1.0 / obj)
    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)        # (mc,)
    A_eq = A / row[:, None]
    b_eq = b / row[None, :]
    q_eq = q * iobj if shared_P else q * iobj[:, None]

    # cold starts need a well-centered slack; warm starts keep their head
    # start (same rule as ops.qp._solve_qp_impl)
    slack_floor = 1.0 if x0 is None else 1e-2
    if x0 is None:
        x0 = jnp.zeros((B, n), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    warm_dual = lam0 is not None
    if warm_dual:
        # original -> equilibrated units: lam_eq = lam_orig * row / obj
        lam0_eq = jnp.asarray(lam0, jnp.float32) * row[None, :] \
            * (iobj if shared_P else iobj[:, None])

    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq).reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T                                     # (n, mc)
        if band > 0:
            Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T         # (n-band, mc)
        else:
            Wo = jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        if not shared_P:
            P = jnp.concatenate(
                [P, jnp.tile(jnp.eye(n, dtype=P.dtype)[None], (pad, 1, 1))],
                0)
            iobj = jnp.concatenate([iobj, jnp.ones((pad,), iobj.dtype)], 0)
        q_eq = jnp.concatenate([q_eq, jnp.zeros((pad, n), q.dtype)], 0)
        b_eq = jnp.concatenate([b_eq, jnp.ones((pad, mc), b.dtype)], 0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, n), x0.dtype)], 0)
        if warm_dual:
            lam0_eq = jnp.concatenate(
                [lam0_eq, jnp.ones((pad, mc), jnp.float32)], 0)
    Bp = q_eq.shape[0]

    if shared_P:
        Pt = P * iobj                    # (n, n) pre-equilibrated, shared
        P_spec = pl.BlockSpec((n, n), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        iobjt = jnp.ones((1, Bp), jnp.float32)        # unused in-kernel
    else:
        Pt = P.transpose(1, 2, 0)        # (n, n, Bp) lanes-minor
        P_spec = pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
        iobjt = iobj[None, :]            # (1, Bp)
    qt = q_eq.T
    bt = b_eq.T
    x0t = x0.T

    kern = functools.partial(_ipm_kernel, n, mc, iters, slack_floor, tile,
                             band, warm_dual, False, shared_P, False)
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    xt, st, lamt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            P_spec,
            lane2(n), lane2(mc), lane2(n), lane2(1),
            shared(mc, n), shared(n, mc),
            *[shared(r, c) for r, c in struct_specs],
            *([lane2(mc)] if warm_dual else []),
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32)],
        interpret=interpret,
    )(Pt, qt, bt, x0t, iobjt, A_eq, At, *structured,
      *([lam0_eq.T] if warm_dual else []))

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]

    # ok / gap on the equilibrated problem, exactly as the pure-JAX path
    with jax.default_matmul_precision("highest"):
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq[:B], 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq[:B]), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * (obj if shared_P else obj[:, None]) / row[None, :]
    return x, lam_orig, ok, gap


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band"))
def solve_qp_factored_batched(W, v, r_diag, A, b, x0=None, iters: int = 10,
                              interpret: bool = False,
                              tol: float = 3e-3, gap_sane: float = 5e-2,
                              tile: int = None, band: int = None,
                              lam0=None, q0=None):
    """Least-squares-form batched IPM: min ||W x + v||^2_2 + x^T diag(r) x
    (+ q0^T x) s.t. A x <= b, i.e. the dense-form problem with
    P = 2 (W^T W + diag(r)) and q = 2 W^T v + q0.  W (B, p, n) and v (B, p)
    per-lane, r_diag (n,) shared, A (mc, n) shared, q0 (B, n) optional.
    Lane-for-lane equivalent to forming P/q on the host
    and calling ``solve_qp_shared_batched`` (same equilibration/ok rules up
    to Gram summation order), but the Gram, objective scale, and
    equilibrated gradient form IN-KERNEL -- the host-side batched-small
    Gram GEMM is the MPC assembly's dominant cost at bench shapes.
    """
    W = jnp.asarray(W, jnp.float32)
    v = jnp.asarray(v, jnp.float32)
    r_diag = jnp.asarray(r_diag, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    B, p, n = W.shape
    mc = A.shape[0]
    if tile is None:
        tile = factored_tile_for(n)

    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)        # (mc,)
    A_eq = A / row[:, None]
    b_eq = b / row[None, :]

    slack_floor = 1.0 if x0 is None else 1e-2
    if x0 is None:
        x0 = jnp.zeros((B, n), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    has_q0 = q0 is not None
    if has_q0:
        q0 = jnp.asarray(q0, jnp.float32)
    warm_dual = lam0 is not None
    if warm_dual:
        # row scaling here; the per-lane 1/obj factor is applied in-kernel
        # (obj = max |P| is only known once the Gram is formed)
        lam0_row = jnp.asarray(lam0, jnp.float32) * row[None, :]

    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq).reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T
        if band > 0:
            Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T
        else:
            Wo = jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        # padded lanes solve min ||0 x||^2 + x^T r x (plus the in-kernel
        # regularization): trivially feasible and ignored on return
        W = jnp.concatenate([W, jnp.zeros((pad, p, n), W.dtype)], 0)
        v = jnp.concatenate([v, jnp.zeros((pad, p), v.dtype)], 0)
        b_eq = jnp.concatenate([b_eq, jnp.ones((pad, mc), b.dtype)], 0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, n), x0.dtype)], 0)
        if has_q0:
            q0 = jnp.concatenate([q0, jnp.zeros((pad, n), jnp.float32)], 0)
        if warm_dual:
            lam0_row = jnp.concatenate(
                [lam0_row, jnp.ones((pad, mc), jnp.float32)], 0)
    Bp = W.shape[0]

    Wt = W.transpose(1, 2, 0)            # (p, n, Bp) lanes-minor
    vt = v.T
    bt = b_eq.T
    x0t = x0.T
    rt = r_diag[None, :]                 # (1, n) shared

    kern = functools.partial(_ipm_kernel, n, mc, iters, slack_floor, tile,
                             band, warm_dual, True, False, has_q0)
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    xt, st, lamt, objt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((p, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            lane2(p), lane2(mc), lane2(n), shared(1, n),
            shared(mc, n), shared(n, mc),
            *[shared(r, c) for r, c in struct_specs],
            *([lane2(n)] if has_q0 else []),
            *([lane2(mc)] if warm_dual else []),
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32)],
        interpret=interpret,
    )(Wt, vt, bt, x0t, rt, A_eq, At, *structured,
      *([q0.T] if has_q0 else []),
      *([lam0_row.T] if warm_dual else []))

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]
    obj = objt[0, :B]

    with jax.default_matmul_precision("highest"):
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq[:B], 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq[:B]), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * obj[:, None] / row[None, :]
    return x, lam_orig, ok, gap


def _diag_obj_scale(P, n):
    """Per-lane objective scale max |P| for the PSD factored Hessian.

    P = 2 (W^T W + diag(r)) with r >= 0 is PSD, so |P_ij| <=
    sqrt(P_ii P_jj) <= max_k P_kk: the max-abs entry IS the max diagonal
    entry.  Reading n (1, T) diagonal slices replaces the full
    (n, n, T) abs + 2-axis reduce (144 vs ~12 vreg ops at n=12) --
    measured as part of the prologue fixed cost (kernel_fixed_anatomy).
    """
    obj = P[0, 0, :]
    for j in range(1, n):
        obj = jnp.maximum(obj, P[j, j, :])
    return jnp.maximum(obj, 1e-8)                      # (T,)


def _lift_onehot_tables(tables, nz):
    """Static one-hot selection matrices for the in-kernel poly lift.

    Block d of the degree-blocked monomial recurrence is
    ``prev[parent_idx] * zeta[dim_idx]``; as full-width ops that is
    (Spar_d @ prev) * (Sdim_d @ zeta) with one-hot (rows_d, rows_prev) /
    (rows_d, nz) selectors -- two small MXU GEMMs + one vreg multiply
    per block, replacing rows_d SERIAL sub-vreg (1, T) multiplies and
    the (n_mono, T) stack (the stack's cross-sublane relayout was the
    dominant prologue cost: kernel_fixed_anatomy, B=65536).
    """
    import numpy as np
    out = []
    prev_rows = nz
    for parent_idx, dim_idx in tables:
        r = len(parent_idx)
        Spar = np.zeros((r, prev_rows), np.float32)
        Sdim = np.zeros((r, nz), np.float32)
        for i, (pi, di) in enumerate(zip(parent_idx, dim_idx)):
            Spar[i, int(pi)] = 1.0
            Sdim[i, int(di)] = 1.0
        out.append((Spar, Sdim))
        prev_rows = r
    return out


def _lift_assembly_core(tables, p, m, mc, T, zt, up, sqYr, gens, lift_ops,
                        cFr_ref, F0r_ref):
    """In-VMEM degree-blocked poly lift + factored QP assembly (3-pass
    bf16 GEMMs, ``_dot3``).  Shared by ``_bilin_lift_kernel`` and the
    step-fused kernel (``ops.pallas.step_fused``).  ``gens`` = the nine
    z-section generator refs (Gz/Hz/Pz hi+lo, Gb/Hb/Pb); ``lift_ops`` =
    [Gm_d hi/lo, Hm_d hi/lo, Pm_d hi/lo, Spar_d, Sdim_d] per degree
    block.  Returns (Wf (p*n, T), v (p, T), b (mc, T))."""
    nblk = len(tables)
    Gzh, Gzl, Gb, Hzh, Hzl, Hb, Pzh, Pzl, Pb = gens
    zh, zl = _split_bf16_val(zt)
    Wf = _dot3(Gzh[...], Gzl[...], zh, zl) + Gb[...]
    CB0 = _dot3(Hzh[...], Hzl[...], zh, zl) + Hb[...]
    v = _dot3(Pzh[...], Pzl[...], zh, zl) + Pb[...] - sqYr
    prev = zt
    for d in range(nblk):
        (Gmh, Gml, Hmh, Hml, Pmh, Pml, Spar_d,
         Sdim_d) = lift_ops[8 * d:8 * d + 8]
        mono = _dot_sel(Spar_d, prev) * _dot_sel(Sdim_d, zt)
        mh, ml = _split_bf16_val(mono)
        Wf = Wf + _dot3(Gmh[...], Gml[...], mh, ml)
        CB0 = CB0 + _dot3(Hmh[...], Hml[...], mh, ml)
        v = v + _dot3(Pmh[...], Pml[...], mh, ml)
        prev = mono
    for j in range(m):
        v = v + CB0[j * p:(j + 1) * p, :] * up[j][None, :]
    b = jnp.broadcast_to(cFr_ref[...], (mc, T))
    F0r = F0r_ref[...]                                 # (mc, m)
    for j in range(m):
        b = b - F0r[:, j][:, None] * up[j][None, :]
    return Wf, v, b


def _factored_gram(n, T, eye, rdiag_obj, Wf, v, p):
    """Factored Gram P = 2 (W^T W + diag(r)) and gradient qv = 2 W^T v as
    lanes-minor rank-1 accumulations (see ``_ipm_kernel`` factored)."""
    P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
    qv = jnp.zeros((n, T), jnp.float32)
    for r in range(p):
        Wr = Wf[r * n:(r + 1) * n, :]                  # (n, T)
        P = P + 2.0 * (Wr[:, None, :] * Wr[None, :, :])
        qv = qv + Wr * v[r][None, :]
    return P, 2.0 * qv


def _bilin_lift_kernel(n, mc, iters, slack_floor, tile, band, warm_dual, p,
                       m, nz, tables,
                       zt_ref, up_ref, x0_ref, sqYr_ref, rdiag_ref,
                       Gzh_ref, Gzl_ref, Gb_ref, Hzh_ref, Hzl_ref, Hb_ref,
                       Pzh_ref, Pzl_ref, Pb_ref, cFr_ref, F0r_ref,
                       A_ref, At_ref, *rest):
    """Fused bilinear-MPC tile with the POLY LIFT in the prologue.

    One stage earlier than ``_bilin_kernel``: the lane ships its raw
    measurement window zeta (nz, T) instead of the lifted state z (NL, T).
    The degree-blocked monomial recurrence (``poly_parent_tables``: each
    block-d monomial = parent block-(d-1) row x one zeta row) runs as
    one-hot selection GEMMs per degree block (``_lift_onehot_tables``),
    and the PCA econ projection + constant column of
    z = [zeta; pcs^T g; 1] are FOLDED host-side into the assembly
    generators, split per z-section AND per degree block (so no
    sublane-misaligned monomial concat ever forms):

        W  = unflatten(Gz @ zeta + sum_d Gm_d @ mono_d + Gb)   (p*n rows)
        CB0 = Hz @ zeta + sum_d Hm_d @ mono_d + Hb             (m*p rows)
        v  = Pz @ zeta + sum_d Pm_d @ mono_d + Pb - sqYr + CB0 u

    then the factored Gram + Mehrotra loop run as in ``_bilin_kernel``.
    Removes the XLA lift (its monomial/PCA intermediates were ~6% of the
    bilinear step at B=65536) and shrinks the per-lane kernel input
    NL -> nz.

    ``rest`` layout: [Gm_d(hi,lo), Hm_d(hi,lo), Pm_d(hi,lo), Spar_d,
    Sdim_d] * nblk, then the structure operands / optional lam0 / outputs
    as in ``_ipm_kernel``.  The z-section generators Gz/Hz/Pz arrive as
    bf16 hi/lo pairs too (``_split_bf16`` / ``_dot3``).
    """
    T = tile
    reg = jnp.float32(1e-7)
    nblk = len(tables)
    lift_ops = rest[:8 * nblk]
    rest = rest[8 * nblk:]

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
    zt = zt_ref[...]                                   # (nz, T)
    up = up_ref[...]                                   # (m, T)

    gens = (Gzh_ref, Gzl_ref, Gb_ref, Hzh_ref, Hzl_ref, Hb_ref,
            Pzh_ref, Pzl_ref, Pb_ref)
    Wf, v, b = _lift_assembly_core(tables, p, m, mc, T, zt, up,
                                   sqYr_ref[...], gens, lift_ops,
                                   cFr_ref, F0r_ref)
    P, qv = _factored_gram(n, T, eye, rdiag_ref[0, :], Wf, v, p)
    obj = _diag_obj_scale(P, n)                        # (T,)
    iobj = 1.0 / obj
    obj_ref[...] = obj[None, :]
    Pr = P * iobj[None, None, :] + reg * eye[..., None]
    q = qv * iobj[None, :]

    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)

    x0 = x0_ref[...]
    if warm_dual:
        lam0 = jnp.sqrt(jnp.clip(rest[-5][...] * iobj[None, :], 1e-4, 1e4))
    else:
        lam0 = jnp.ones((mc, T), jnp.float32)

    x, s, lam = _mehrotra_loop(n, mc, iters, slack_floor, Pr, q, b, A, At,
                               form_AtDA, x0, lam0)
    x_ref[...] = x
    s_ref[...] = s
    lam_ref[...] = lam


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band", "tables"))
def solve_qp_bilinear_lifted_batched(zeta, u_prev, sqYr, Gz, Gm, Gb, Hz, Hm,
                                     Hb, Pz, Pm, Pb, r_diag, A, cF, F0,
                                     x0=None, iters: int = 10, *,
                                     tables, interpret: bool = False,
                                     tol: float = 3e-3,
                                     gap_sane: float = 5e-2,
                                     tile: int = None, band: int = None,
                                     lam0=None):
    """Lift-fused bilinear batched IPM (see ``_bilin_lift_kernel``).

    Per-lane: zeta (B, nz) raw controller state, u_prev (B, m), x0/lam0.
    Lane-shared: the z-section-folded generators -- Gz (p*n, nz) /
    Gm (p*n, n_monos) / Gb (p*n, 1) for W, H* (m*p, .) for CB0,
    P* (p, .) for v -- plus sqYr, r_diag, A/cF/F0 as in the fused
    bilinear kernel.  ``tables`` are ``poly_parent_tables`` gather pairs
    as nested tuples (static).
    """
    zeta = jnp.asarray(zeta, jnp.float32)
    u_prev = jnp.asarray(u_prev, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    sqYr = jnp.asarray(sqYr, jnp.float32)
    per_ref = sqYr.ndim == 2               # (B, p) per-lane windows
    B = zeta.shape[0]
    nz = zeta.shape[1]
    n = A.shape[1]
    mc = A.shape[0]
    p = Pz.shape[0]
    m = u_prev.shape[1]
    if tile is None:
        tile = factored_tile_for(n)

    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)        # (mc,)
    A_eq = A / row[:, None]
    cFr = jnp.asarray(cF, jnp.float32) / row
    F0r = jnp.asarray(F0, jnp.float32) / row[:, None]

    slack_floor = 1.0 if x0 is None else 1e-2
    if x0 is None:
        x0 = jnp.zeros((B, n), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    warm_dual = lam0 is not None
    if warm_dual:
        lam0_row = jnp.asarray(lam0, jnp.float32) * row[None, :]

    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq).reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T
        if band > 0:
            Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T
        else:
            Wo = jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        zeta = jnp.concatenate(
            [zeta, jnp.zeros((pad, nz), zeta.dtype)], 0)
        u_prev = jnp.concatenate(
            [u_prev, jnp.zeros((pad, m), u_prev.dtype)], 0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, n), x0.dtype)], 0)
        if per_ref:
            sqYr = jnp.concatenate(
                [sqYr, jnp.zeros((pad, p), jnp.float32)], 0)
        if warm_dual:
            lam0_row = jnp.concatenate(
                [lam0_row, jnp.ones((pad, mc), jnp.float32)], 0)
    Bp = zeta.shape[0]

    kern = functools.partial(_bilin_lift_kernel, n, mc, iters, slack_floor,
                             tile, band, warm_dual, p, m, nz, tables)
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    # per-degree-block generator splits + one-hot lift selectors (see
    # _bilin_lift_kernel / _lift_onehot_tables): host-side column slices
    # of Gm/Hm/Pm in monomial-block order (so the kernel never forms the
    # sublane-misaligned (n_mono, T) concat), each as a bf16 hi/lo pair
    # for the 3-pass assembly GEMMs (_dot3)
    onehot = _lift_onehot_tables(tables, nz)
    Gm32 = jnp.asarray(Gm, jnp.float32)
    Hm32 = jnp.asarray(Hm, jnp.float32)
    Pm32 = jnp.asarray(Pm, jnp.float32)
    lift_args, lift_specs = [], []
    off = 0
    for (Spar, Sdim) in onehot:
        r = Spar.shape[0]
        for Mat, rows in ((Gm32, p * n), (Hm32, m * p), (Pm32, p)):
            hi, lo = _split_bf16(Mat[:, off:off + r])
            lift_args += [hi, lo]
            lift_specs += [shared(rows, r), shared(rows, r)]
        lift_args += [jnp.asarray(Spar), jnp.asarray(Sdim)]
        lift_specs += [shared(r, Spar.shape[1]), shared(r, nz)]
        off += r
    Gzh, Gzl = _split_bf16(Gz)
    Hzh, Hzl = _split_bf16(Hz)
    Pzh, Pzl = _split_bf16(Pz)
    xt, st, lamt, objt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane2(nz), lane2(m), lane2(n),
            lane2(p) if per_ref else shared(p, 1), shared(1, n),
            shared(p * n, nz), shared(p * n, nz), shared(p * n, 1),
            shared(m * p, nz), shared(m * p, nz), shared(m * p, 1),
            shared(p, nz), shared(p, nz), shared(p, 1),
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc),
            *lift_specs,
            *[shared(r, c) for r, c in struct_specs],
            *([lane2(mc)] if warm_dual else []),
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32)],
        interpret=interpret,
    )(zeta.T, u_prev.T, x0.T,
      sqYr.T if per_ref else sqYr[:, None],
      jnp.asarray(r_diag, jnp.float32)[None],
      Gzh, Gzl, jnp.asarray(Gb, jnp.float32).reshape(-1, 1),
      Hzh, Hzl, jnp.asarray(Hb, jnp.float32).reshape(-1, 1),
      Pzh, Pzl, jnp.asarray(Pb, jnp.float32).reshape(-1, 1),
      cFr[:, None], F0r, A_eq, At, *lift_args, *structured,
      *([lam0_row.T] if warm_dual else []))

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]
    obj = objt[0, :B]

    with jax.default_matmul_precision("highest"):
        b_eq = cFr[None, :] - jnp.asarray(u_prev[:B], jnp.float32) @ F0r.T
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq, 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * obj[:, None] / row[None, :]
    return x, lam_orig, ok, gap


def _bilin_kernel(n, mc, iters, slack_floor, tile, band, warm_dual, p, m,
                  z_ref, up_ref, x0_ref, sqYr_ref, rdiag_ref,
                  PGWh_ref, PGWl_ref, PG0h_ref, PG0l_ref, PAsqh_ref,
                  PAsql_ref, cFr_ref, F0r_ref,
                  A_ref, At_ref, *rest):
    """Fused bilinear-MPC tile: QP ASSEMBLY + the full interior point.

    The factored kernel still ships a per-lane W (p, n) + v (p) + b (mc)
    from the XLA assembly; but for the iters=1 shared-Beta bilinear
    controller those are all LINEAR in the lane's lifted state z (NL) and
    previous input u_prev (m) against lane-SHARED constants
    (``BilinearKmpc.PG``-derived).  This kernel takes (z, u_prev, x0,
    lam0) per lane -- ~5x less HBM input traffic at bench shapes -- and
    assembles in VMEM:

        W  = [sq * CB[:, m:]]        = unflatten(PGW @ z)     (MXU)
        v  = sq*(CA z - Yr + CB[:, :m] u_prev)
           = PAsq @ z - sqYr + sum_j CB0[:, j] u_prev[j]
        b  = (cF - F[:, :m] u_prev) / row                     (pre-divided)

    then proceeds exactly as the factored kernel (in-kernel Gram,
    objective scale, Mehrotra loop).  Shared operands are pre-scaled on
    the host: PGW/PG0/PAsq carry the sqrt(Q) row scaling, cFr/F0r the
    constraint row equilibration.  PG0 is laid out as m blocks of p rows
    (block j = CB0[:, j] generator) so the u_prev contraction is p-row
    slices, not strided gathers.
    """
    T = tile
    reg = jnp.float32(1e-7)

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
    z = z_ref[...]                                     # (NL, T)
    up = up_ref[...]                                   # (m, T)

    # ---- in-VMEM assembly (3-pass bf16: see _dot3) ------------------------
    zh, zl = _split_bf16_val(z)
    Wf = _dot3(PGWh_ref[...], PGWl_ref[...], zh, zl)   # (p*n, T)
    CB0 = _dot3(PG0h_ref[...], PG0l_ref[...], zh, zl)  # (m*p, T)
    v = _dot3(PAsqh_ref[...], PAsql_ref[...], zh, zl) \
        - sqYr_ref[...]                                # (p, T) - (p, 1)
    for j in range(m):
        v = v + CB0[j * p:(j + 1) * p, :] * up[j][None, :]
    b = jnp.broadcast_to(cFr_ref[...], (mc, T))
    F0r = F0r_ref[...]                                 # (mc, m)
    for j in range(m):
        b = b - F0r[:, j][:, None] * up[j][None, :]

    # ---- factored Gram + objective scale (as the factored kernel) ----------
    rdiag_obj = rdiag_ref[0, :]                        # (n,) shared
    P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
    qv = jnp.zeros((n, T), jnp.float32)
    for r in range(p):
        Wr = Wf[r * n:(r + 1) * n, :]                  # (n, T)
        P = P + 2.0 * (Wr[:, None, :] * Wr[None, :, :])
        qv = qv + Wr * v[r][None, :]
    qv = 2.0 * qv
    obj = _diag_obj_scale(P, n)                        # (T,)
    iobj = 1.0 / obj
    obj_ref[...] = obj[None, :]
    Pr = P * iobj[None, None, :] + reg * eye[..., None]
    q = qv * iobj[None, :]

    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)

    x0 = x0_ref[...]
    if warm_dual:
        # row scaling host-applied; iobj known only now (see _ipm_kernel)
        lam0 = jnp.sqrt(jnp.clip(rest[-5][...] * iobj[None, :], 1e-4, 1e4))
    else:
        lam0 = jnp.ones((mc, T), jnp.float32)

    x, s, lam = _mehrotra_loop(n, mc, iters, slack_floor, Pr, q, b, A, At,
                               form_AtDA, x0, lam0)
    x_ref[...] = x
    s_ref[...] = s
    lam_ref[...] = lam


def _nmpc_condense_core(Np, nz, nstate, m, nproj, nU, cols, T, CzS, sqRef,
                        up, S0, s0, get_Azcol, get_Au, get_cv):
    """In-VMEM sensitivity condensation + W/v assembly shared by the NMPC
    kernels.  S_0 = 0, s_0 = zeta (the affine part carries the current
    state).  All coefficient reads are VECTOR slices (CzS[:, i],
    Az[:, j, :]): Mosaic rejects 0-d scalar extractions from VMEM blocks.
    S_0 ships as a REAL per-lane zero buffer instead of jnp.zeros:
    chaining the recursion onto a constant-zero 3D value lets XLA
    partially fold the early stages into a broadcast shape Mosaic cannot
    lower (bisected `Check failed: limits[i] <= dim(i)` on v5e); loaded
    data is opaque to the folder.

    ``get_Azcol(k, j)`` -> (nz, T) column j of stage k's state Jacobian;
    ``get_Au(k)`` -> (nz, m, T); ``get_cv(k)`` -> (nz, T) -- accessors so
    the Jacobians may come from VMEM refs (``_nmpc_kernel``) or be
    computed in the prologue (``_nmpc_stage_kernel``).
    """
    S = S0                                             # (nz, nU, T) zeros
    s = s0                                             # (nz, T)
    W_rows, v_rows = [], []
    for k in range(Np + 1):
        Ck = CzS[k * nproj:(k + 1) * nproj, :]         # (nproj, nstate)
        # projected rows: P_k = sum_i Ck[:, i] (x) S[i]  (sq pre-folded).
        # The coefficient columns are materialized to (nproj, T) FIRST:
        # Mosaic rejects the (nproj, 1, 1) double-broadcast product
        # (bisected on v5e: `Check failed: limits[i] <= dim(i)`), while
        # (a, 1, T) x (1, b, T) rank-1 products are the supported pattern
        # (same as the Cholesky downdates).
        ck = jnp.broadcast_to(Ck[:, 0][:, None], (nproj, T))
        Pk = ck[:, None, :] * S[0][None, :, :]
        sk = ck * s[0][None, :]
        for i in range(1, nstate):
            ck = jnp.broadcast_to(Ck[:, i][:, None], (nproj, T))
            Pk = Pk + ck[:, None, :] * S[i][None, :, :]
            sk = sk + ck * s[i][None, :]
        vk = sk - sqRef[k * nproj:(k + 1) * nproj, :]  # (nproj, T)
        for j in range(m):
            vk = vk + Pk[:, j, :] * up[j][None, :]     # u0-block fold
        for r in range(nproj):
            W_rows.append(Pk[r, m:, :])                # (n, T)
            v_rows.append(vk[r])                       # (T,)
        if k < Np:
            Azc0 = get_Azcol(k, 0)
            S1 = Azc0[:, None, :] * S[0][None, :, :]
            s1 = Azc0 * s[0][None, :]
            for j in range(1, nz):
                Azcj = get_Azcol(k, j)
                S1 = S1 + Azcj[:, None, :] * S[j][None, :, :]
                s1 = s1 + Azcj * s[j][None, :]
            c0 = cols[k]
            parts = []                         # skip zero-width slices
            if c0 > 0:
                parts.append(S1[:, :c0, :])
            parts.append(S1[:, c0:c0 + m, :] + get_Au(k))
            if c0 + m < nU:
                parts.append(S1[:, c0 + m:, :])
            S = parts[0] if len(parts) == 1 else \
                jnp.concatenate(parts, axis=1)
            s = s1 + get_cv(k)
    return W_rows, v_rows


def _nmpc_kernel(n, mc, iters, slack_floor, tile, band, warm_dual, has_q0,
                 Np, nz, nstate, m, nproj, cols,
                 jz_ref, ju_ref, cv_ref, S0_ref, z0_ref, up_ref, x0_ref,
                 CzS_ref, sqRef_ref, rdiag_ref,
                 cFr_ref, F0r_ref, A_ref, At_ref, *rest):
    """Fused NMPC-pass tile: SENSITIVITY CONDENSATION + assembly + the full
    interior point.

    The SQP's per-pass condensation (S_{k+1} = A_k S_k + B_k Emb_k, then
    W = sqrt(Q) Cz S stacked) is a chain of batched-SMALL (nz x nz) x
    (nz x nU) matmuls plus stacked (B, Np+1, n, nU) HBM round trips in
    XLA -- measured as the NMPC's batch-scaling wall (in-loop ablation:
    per-lane cost +53% from B=2048 to 8192 while the QP kernel itself
    scales flat).  Here the whole recursion runs lanes-minor in VMEM:
    per-lane inputs are just the stage Jacobians (jz (Np*nz, nz, T),
    ju (Np*nz, m, T)), defect offsets cv (Np*nz, T), u_prev, and warm
    starts; ``cols`` is the STATIC decision-column offset each stage's
    B_k writes into (move blocking folds to repeated offsets).  The
    recursion tracks S over the full [u0 | reduced moves] column space
    (nU = m + n); the u0 columns fold into v exactly as the XLA path's
    ``Sy[:, :m] @ u_prev``.  Then the factored Gram + Mehrotra loop of
    ``_ipm_kernel`` run unchanged.
    """
    T = tile
    reg = jnp.float32(1e-7)
    nU = m + n

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
    jz = jz_ref[...]                                   # (Np*nz, nz, T)
    ju = ju_ref[...]                                   # (Np*nz, m, T)
    cv = cv_ref[...]                                   # (Np*nz, T)
    up = up_ref[...]                                   # (m, T)
    CzS = CzS_ref[...]                                 # (p, nstate) sq-folded
    sqRef = sqRef_ref[...]                             # (p, 1) or (p, T)

    # ---- in-VMEM condensation (shared core; accessors slice jz/ju/cv) ---
    W_rows, v_rows = _nmpc_condense_core(
        Np, nz, nstate, m, nproj, nU, cols, T, CzS, sqRef, up,
        S0_ref[...], z0_ref[...],
        get_Azcol=lambda k, j: jz[k * nz:(k + 1) * nz][:, j, :],
        get_Au=lambda k: ju[k * nz:(k + 1) * nz],
        get_cv=lambda k: cv[k * nz:(k + 1) * nz])

    # ---- factored Gram + objective scale (as the factored kernel) -------
    rdiag_obj = rdiag_ref[0, :]                        # (n,) shared
    P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
    qv = jnp.zeros((n, T), jnp.float32)
    for Wr, vr in zip(W_rows, v_rows):
        P = P + 2.0 * (Wr[:, None, :] * Wr[None, :, :])
        qv = qv + Wr * vr[None, :]
    qv = 2.0 * qv
    if has_q0:
        qv = qv + rest[1 if band is None else 2][...]
    obj = _diag_obj_scale(P, n)                        # (T,)
    iobj = 1.0 / obj
    obj_ref[...] = obj[None, :]
    Pr = P * iobj[None, None, :] + reg * eye[..., None]
    q = qv * iobj[None, :]

    b = jnp.broadcast_to(cFr_ref[...], (mc, T))
    F0r = F0r_ref[...]                                 # (mc, m)
    for j in range(m):
        b = b - F0r[:, j][:, None] * up[j][None, :]

    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)

    x0 = x0_ref[...]
    if warm_dual:
        lam0 = jnp.sqrt(jnp.clip(rest[-5][...] * iobj[None, :], 1e-4, 1e4))
    else:
        lam0 = jnp.ones((mc, T), jnp.float32)

    x, s_sl, lam = _mehrotra_loop(n, mc, iters, slack_floor, Pr, q, b, A,
                                  At, form_AtDA, x0, lam0)
    x_ref[...] = x
    s_ref[...] = s_sl
    lam_ref[...] = lam


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band", "Np", "nz", "nstate",
                                    "nproj", "cols"))
def solve_qp_nmpc_batched(jz, ju, cv, zeta, u_prev, sq, sqRef, Cz, r_diag,
                          A, cF, F0, x0=None, q0=None, lam0=None, *,
                          Np: int, nz: int, nstate: int, nproj: int,
                          cols: tuple, iters: int = 10,
                          interpret: bool = False,
                          tol: float = 3e-3, gap_sane: float = 5e-2,
                          tile: int = None, band: int = None):
    """Condensation-fused NMPC batched IPM (see ``_nmpc_kernel``).

    Per-lane: jz (B, Np, nz, nz) / ju (B, Np, nz, m) stage Jacobians,
    cv (B, Np, nz) defect offsets, zeta (B, nz) the current state (the
    affine recursion's start), u_prev (B, m), x0/q0/lam0 warm starts /
    Levenberg linear term.  Lane-shared: sq (p,) = sqrt of the stacked Q
    diagonal, sqRef = sq * stacked reference window -- (p,) lane-shared
    (traced per step) or (B, p) PER-LANE (run_multi_ref's per-lane
    trajectories; the kernel's subtraction broadcasts either shape), Cz (nproj, nstate) output projection, r_diag (n,) the
    R + Levenberg diagonal, A (mc, n) reduced constraint rows with
    b = cF - F0 @ u_prev; ``cols`` the static per-stage decision-column
    offsets (Emb placement).  Lane-for-lane equivalent to the XLA
    condensation + ``solve_qp_factored_batched``.
    """
    jz = jnp.asarray(jz, jnp.float32)
    ju = jnp.asarray(ju, jnp.float32)
    cv = jnp.asarray(cv, jnp.float32)
    zeta = jnp.asarray(zeta, jnp.float32)
    u_prev = jnp.asarray(u_prev, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    sqRef = jnp.asarray(sqRef, jnp.float32)
    per_ref = sqRef.ndim == 2                  # (B, p) per-lane windows
    B = jz.shape[0]
    n = A.shape[1]
    mc = A.shape[0]
    m = u_prev.shape[1]
    p = (Np + 1) * nproj
    nU_cols = n + m
    if tile is None:
        # the condense-fused kernel carries a much larger per-lane VMEM
        # working set than the factored kernel (jz/ju/S stacks): at the
        # blocked shape it prefers 512 (B=8192 full-loop A/B: 512 1642k /
        # 768 1572k / 256 1567k steps/s), capping the factored default
        tile = min(512, factored_tile_for(n))

    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)        # (mc,)
    A_eq = A / row[:, None]
    cFr = jnp.asarray(cF, jnp.float32) / row
    F0r = jnp.asarray(F0, jnp.float32) / row[:, None]
    # fold sq into the per-row projection (no in-kernel scalar reads):
    # CzS[k*nproj + r] = sq[k*nproj + r] * Cz[r]
    CzS = (jnp.asarray(sq, jnp.float32)[:, None]
           * jnp.tile(jnp.asarray(Cz, jnp.float32), (Np + 1, 1)))

    slack_floor = 1.0 if x0 is None else 1e-2
    if x0 is None:
        x0 = jnp.zeros((B, n), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    has_q0 = q0 is not None
    if has_q0:
        q0 = jnp.asarray(q0, jnp.float32)
    warm_dual = lam0 is not None
    if warm_dual:
        lam0_row = jnp.asarray(lam0, jnp.float32) * row[None, :]

    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq).reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T
        if band > 0:
            Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T
        else:
            Wo = jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        # padded lanes condense zero Jacobians (S stays 0, b = cF feasible
        # for MPC box rows) and are dropped on return
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        jz, ju, cv, zeta, u_prev, x0 = map(
            zpad, (jz, ju, cv, zeta, u_prev, x0))
        if per_ref:
            sqRef = zpad(sqRef)
        if has_q0:
            q0 = zpad(q0)
        if warm_dual:
            lam0_row = jnp.concatenate(
                [lam0_row, jnp.ones((pad, mc), jnp.float32)], 0)
    Bp = jz.shape[0]
    # S_0 as a REAL buffer, not an in-kernel constant (see _nmpc_kernel)
    S0 = jnp.zeros((nz, nU_cols, Bp), jnp.float32)

    jzt = jz.reshape(Bp, Np * nz, nz).transpose(1, 2, 0)
    jut = ju.reshape(Bp, Np * nz, m).transpose(1, 2, 0)
    cvt = cv.reshape(Bp, Np * nz).T

    kern = functools.partial(_nmpc_kernel, n, mc, iters, slack_floor, tile,
                             band, warm_dual, has_q0, Np, nz, nstate, m,
                             nproj, tuple(cols))
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    lane3 = lambda r, c: pl.BlockSpec((r, c, tile), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    xt, st, lamt, objt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane3(Np * nz, nz), lane3(Np * nz, m), lane2(Np * nz),
            lane3(nz, nU_cols), lane2(nz), lane2(m), lane2(n),
            shared(p, nstate),
            lane2(p) if per_ref else shared(p, 1),
            shared(1, n),
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc),
            *[shared(r, c) for r, c in struct_specs],
            *([lane2(n)] if has_q0 else []),
            *([lane2(mc)] if warm_dual else []),
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32)],
        interpret=interpret,
    )(jzt, jut, cvt, S0, zeta.T, u_prev.T, x0.T,
      CzS, sqRef.T if per_ref else sqRef[:, None],
      jnp.asarray(r_diag, jnp.float32)[None],
      cFr[:, None], F0r, A_eq, At, *structured,
      *([q0.T] if has_q0 else []),
      *([lam0_row.T] if warm_dual else []))

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]
    obj = objt[0, :B]

    with jax.default_matmul_precision("highest"):
        b_eq = cFr[None, :] - jnp.asarray(u_prev[:B], jnp.float32) @ F0r.T
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq, 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * obj[:, None] / row[None, :]
    return x, lam_orig, ok, gap


def _stage_jac_ops_count(jlayout):
    """Operand count of the per-stage Jacobian generators: A1c + Gx hi/lo
    pairs (z and u sections) + per block (selectors + Gm hi/lo)."""
    return 5 + sum((6 if b == 0 else 5) for b in range(len(jlayout)))


def _stage_roll_ops_count(flayout):
    """Operand count of the in-kernel dynamics generators: A1z/A1u/a0 +
    per full-lift block (selectors + A2 section)."""
    return 3 + sum((5 if b == 0 else 4) for b in range(len(flayout)))


def _eval_F_rows(nz, m, roll_ops, flayout, z, ul):
    """In-VMEM F(z, u) via the composed-map generators: A1z z + A1u u +
    sum_b A2_b mono_b + a0, monomial blocks as one-hot selection GEMMs.
    Value-critical, so every GEMM runs at HIGHEST (the XLA rollout this
    replaces ran under the loop-wide HIGHEST too)."""
    A1z, A1u, a0 = roll_ops[0], roll_ops[1], roll_ops[2]
    acc = _dot(A1z[...], z) + _dot(A1u[...], ul) + a0[...]
    idx = 3
    prev = None
    for b in range(len(flayout)):
        if b == 0:
            Spz, Spu, Sdz, Sdu, A2b = roll_ops[idx:idx + 5]
            idx += 5
            par = _dot_sel(Spz, z) + _dot_sel(Spu, ul)
        else:
            Spar, Sdz, Sdu, A2b = roll_ops[idx:idx + 4]
            idx += 4
            par = _dot_sel(Spar, prev)
        dim = _dot_sel(Sdz, z) + _dot_sel(Sdu, ul)
        mono = par * dim
        acc = acc + _dot(A2b[...], mono)
        prev = mono
    return acc


def _nmpc_multipass_kernel(n, mc, iters, slack_floor, tile, band,
                           n_passes, hold0, Np, nz, nstate, m, nproj,
                           cols, jlayout, flayout,
                           z0_ref, up_ref, S0_ref, Gup_ref, q0c_ref,
                           CzS_ref, sqRef_ref, rdiag_ref,
                           cFr_ref, F0r_ref, A_ref, At_ref, *rest):
    """The ENTIRE NMPC SQP -- all ``n_passes`` relinearization passes --
    in ONE kernel launch.

    Builds on ``_nmpc_stage_kernel``'s in-VMEM rollout/Jacobian/condense
    machinery; the inter-pass glue that previously forced one launch per
    pass is algebraically trivial in-kernel: the within-SQP primal warm
    start is Sel @ (Tb x_prev) = x_prev (Sel Tb = I), the Levenberg
    linear term is q0 = q0_coef * x_prev elementwise (Tb^T Tb diagonal),
    the next rollout's stage inputs are ROW SLICES of x_prev (stage k's
    group block), and the pass-0 plan tile(u_prev) is the same form with
    x_prev0 = Gup @ u_prev (one-hot group tiling).  Requires the default
    SQP regime: cold duals per pass (sqp_dual_warm False), constant
    damping (decay 1), no best-of-passes/line-search/multistart --
    ``kmpc.NonlinearKmpc`` guards.

    ``hold0``: pass 0 linearizes about the held state (sqp_init 'hold')
    instead of the rollout.  ``rest``: jac ops, roll ops, structure
    operands, outputs (x, s, lam, obj).
    """
    T = tile
    reg = jnp.float32(1e-7)
    nU = m + n
    njac = _stage_jac_ops_count(jlayout)
    jac_ops = rest[:njac]
    rest = rest[njac:]
    nroll = _stage_roll_ops_count(flayout)
    roll_ops = rest[:nroll]
    rest = rest[nroll:]

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
    up = up_ref[...]                                   # (m, T)
    zeta0 = z0_ref[...]                                # (nz, T)
    CzS = CzS_ref[...]
    sqRef = sqRef_ref[...]
    q0c = q0c_ref[...]                                 # (n, 1) -2 rho bsz
    rdiag_obj = rdiag_ref[0, :]
    A = A_ref[...]
    At = At_ref[...]
    b = jnp.broadcast_to(cFr_ref[...], (mc, T))
    F0r = F0r_ref[...]
    for j in range(m):
        b = b - F0r[:, j][:, None] * up[j][None, :]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)
    # stage k (1-based in U[1:]) -> its group's first decision row
    group_row = [cols[k] - m for k in range(1, Np)]

    A1c = jac_ops[0]
    Gxzh, Gxzl, Gxuh, Gxul = jac_ops[1:5]
    xp = _dot(Gup_ref[...], up)                        # pass-0 plan rows
    x_out = s_out = lam_out = obj_out = None
    for p in range(n_passes):
        u_rows = [up] + [xp[g:g + m, :] for g in group_row]
        if p == 0 and hold0:
            F0v = _eval_F_rows(nz, m, roll_ops, flayout, zeta0, up)
            zl_rows = [zeta0] * Np
            fv_rows = [F0v] * Np
        else:
            zl_rows, fv_rows = [], []
            z = zeta0
            for k in range(Np):
                Fk = _eval_F_rows(nz, m, roll_ops, flayout, z, u_rows[k])
                zl_rows.append(z)
                fv_rows.append(Fk)
                z = Fk
        Jcols, cvs = [], []
        for k in range(Np):
            zl = zl_rows[k]
            ul = u_rows[k]
            zlh, zll = _split_bf16_val(zl)
            ulh, ull = _split_bf16_val(ul)
            Jc = (A1c[...]
                  + _dot3(Gxzh[...], Gxzl[...], zlh, zll)
                  + _dot3(Gxuh[...], Gxul[...], ulh, ull))
            idx = 5
            prev = None
            for bi in range(len(jlayout)):
                if bi == 0:
                    Spz, Spu, Sdz, Sdu, Gmh, Gml = jac_ops[idx:idx + 6]
                    idx += 6
                    par = _dot_sel(Spz, zl) + _dot_sel(Spu, ul)
                else:
                    Spar, Sdz, Sdu, Gmh, Gml = jac_ops[idx:idx + 5]
                    idx += 5
                    par = _dot_sel(Spar, prev)
                dim = _dot_sel(Sdz, zl) + _dot_sel(Sdu, ul)
                mono = par * dim
                mh, ml = _split_bf16_val(mono)
                Jc = Jc + _dot3(Gmh[...], Gml[...], mh, ml)
                prev = mono
            Jcols.append(Jc)
            cvk = fv_rows[k]
            for j in range(nz):
                cvk = cvk - Jc[j * nz:(j + 1) * nz, :] * zl[j][None, :]
            for j in range(m):
                cvk = cvk - Jc[(nz + j) * nz:(nz + j + 1) * nz, :] \
                    * ul[j][None, :]
            cvs.append(cvk)

        W_rows, v_rows = _nmpc_condense_core(
            Np, nz, nstate, m, nproj, nU, cols, T, CzS, sqRef, up,
            S0_ref[...], zeta0,
            get_Azcol=lambda k, j: Jcols[k][j * nz:(j + 1) * nz, :],
            get_Au=lambda k: jnp.concatenate(
                [Jcols[k][(nz + j) * nz:(nz + j + 1) * nz, :][:, None, :]
                 for j in range(m)], axis=1),
            get_cv=lambda k: cvs[k])

        P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
        qv = jnp.zeros((n, T), jnp.float32)
        for Wr, vr in zip(W_rows, v_rows):
            P = P + 2.0 * (Wr[:, None, :] * Wr[None, :, :])
            qv = qv + Wr * vr[None, :]
        qv = 2.0 * qv + q0c * xp
        obj = _diag_obj_scale(P, n)
        iobj = 1.0 / obj
        Pr = P * iobj[None, None, :] + reg * eye[..., None]
        q = qv * iobj[None, :]
        lam0 = jnp.ones((mc, T), jnp.float32)
        x, s_sl, lam = _mehrotra_loop(n, mc, iters, 1e-2, Pr, q, b, A,
                                      At, form_AtDA, xp, lam0)
        xp = x
        x_out, s_out, lam_out, obj_out = x, s_sl, lam, obj
    x_ref[...] = x_out
    s_ref[...] = s_out
    lam_ref[...] = lam_out
    obj_ref[...] = obj_out[None, :]


def _nmpc_stage_kernel(n, mc, iters, slack_floor, tile, band, warm_dual,
                       has_q0, Np, nz, nstate, m, nproj, cols, jlayout,
                       roll_mode, flayout,
                       Zl_ref, Ul_ref, Fv_ref, S0_ref, z0_ref, up_ref,
                       x0_ref, CzS_ref, sqRef_ref, rdiag_ref,
                       cFr_ref, F0r_ref, A_ref, At_ref, *rest):
    """NMPC-pass tile with the STAGE JACOBIANS generated in the prologue.

    One stage earlier than ``_nmpc_kernel``: the lane ships its SQP
    linearization trajectory (Zl (Np*nz, T), Ul (Np*m, T)) and rollout
    values Fv (Np*nz, T) instead of the materialized jz/ju/cv stacks (a
    4x per-lane input cut, and it removes the (B, Np, nz, nza) Jacobian
    HBM stacks that made B=32768 decline -- round-4 verdict #3).  Per
    stage the analytic poly Jacobian J = A1 + unflatten(G @ g_low)
    (``kmpc._compose_poly_jacobian`` math) forms in VMEM: g_low's
    monomial blocks via one-hot selection GEMMs, G pre-reordered
    host-side to COLUMN-major rows (J column j = contiguous rows
    j*nz..(j+1)*nz, exactly the slices the condensation consumes) and
    split per g_low section (x -> z|u columns; one Gm per block), all as
    bf16 hi/lo 3-pass GEMMs (the XLA path ran at HIGH too).  Defects
    cv_k = Fv_k - Jz_k Zl_k - Ju_k Ul_k form in VMEM; then the shared
    condensation core + factored Gram + Mehrotra loop run unchanged.

    ``rest``: jac generator operands (``_stage_jac_ops_count(jlayout)``),
    dynamics generators when ``roll_mode`` != 'ship'
    (``_stage_roll_ops_count(flayout)``), the banded-structure operands,
    optional q0/lam0, then outputs.

    ``roll_mode`` selects where the linearization trajectory comes from:
    'ship' -- Zl/Ul/Fv arrive as per-lane inputs; 'roll' -- only the
    PLAN Ul ships and the trajectory ROLLS in-VMEM through the composed
    dynamics F (the SQP's between-pass rollout: its XLA poly lift was
    26% of the NMPC step at B=32768); 'hold' -- the cold first pass
    linearizes about the held current state (Zl_k = zeta, Fv_k =
    F(zeta, u_prev); Ul unused, tile of u_prev).
    """
    T = tile
    reg = jnp.float32(1e-7)
    nU = m + n
    njac = _stage_jac_ops_count(jlayout)
    jac_ops = rest[:njac]
    rest = rest[njac:]
    if roll_mode != "ship":
        nroll = _stage_roll_ops_count(flayout)
        roll_ops = rest[:nroll]
        rest = rest[nroll:]

    rowi = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (rowi == coli).astype(jnp.float32)

    x_ref, s_ref, lam_ref, obj_ref = rest[-4:]
    up = up_ref[...]                                   # (m, T)
    zeta0 = z0_ref[...]                                # (nz, T)
    CzS = CzS_ref[...]
    sqRef = sqRef_ref[...]

    # ---- linearization trajectory: shipped, held, or rolled in-VMEM -----
    if roll_mode == "ship":
        Zl = Zl_ref[...]                               # (Np*nz, T)
        Ul = Ul_ref[...]                               # (Np*m, T)
        Fv = Fv_ref[...]                               # (Np*nz, T)
        zl_rows = [Zl[k * nz:(k + 1) * nz, :] for k in range(Np)]
        ul_rows = [Ul[k * m:(k + 1) * m, :] for k in range(Np)]
        fv_rows = [Fv[k * nz:(k + 1) * nz, :] for k in range(Np)]
    elif roll_mode == "hold":
        F0v = _eval_F_rows(nz, m, roll_ops, flayout, zeta0, up)
        zl_rows = [zeta0] * Np
        ul_rows = [up] * Np
        fv_rows = [F0v] * Np
    else:                                              # 'roll'
        Ul = Ul_ref[...]                               # (Np*m, T)
        zl_rows, ul_rows, fv_rows = [], [], []
        z = zeta0
        for k in range(Np):
            ul = Ul[k * m:(k + 1) * m, :]
            Fk = _eval_F_rows(nz, m, roll_ops, flayout, z, ul)
            zl_rows.append(z)
            ul_rows.append(ul)
            fv_rows.append(Fk)
            z = Fk

    A1c = jac_ops[0]                                   # (nza*nz, 1)
    Gxzh, Gxzl, Gxuh, Gxul = jac_ops[1:5]
    Jcols, cvs = [], []
    for k in range(Np):
        zl = zl_rows[k]                                # (nz, T)
        ul = ul_rows[k]                                # (m, T)
        zlh, zll = _split_bf16_val(zl)
        ulh, ull = _split_bf16_val(ul)
        Jc = (A1c[...]
              + _dot3(Gxzh[...], Gxzl[...], zlh, zll)
              + _dot3(Gxuh[...], Gxul[...], ulh, ull))
        idx = 5
        prev = None
        for b in range(len(jlayout)):
            if b == 0:
                Spz, Spu, Sdz, Sdu, Gmh, Gml = jac_ops[idx:idx + 6]
                idx += 6
                par = _dot_sel(Spz, zl) + _dot_sel(Spu, ul)
            else:
                Spar, Sdz, Sdu, Gmh, Gml = jac_ops[idx:idx + 5]
                idx += 5
                par = _dot_sel(Spar, prev)
            dim = _dot_sel(Sdz, zl) + _dot_sel(Sdu, ul)
            mono = par * dim
            mh, ml = _split_bf16_val(mono)
            Jc = Jc + _dot3(Gmh[...], Gml[...], mh, ml)
            prev = mono
        Jcols.append(Jc)
        cvk = fv_rows[k]
        for j in range(nz):
            cvk = cvk - Jc[j * nz:(j + 1) * nz, :] * zl[j][None, :]
        for j in range(m):
            cvk = cvk - Jc[(nz + j) * nz:(nz + j + 1) * nz, :] \
                * ul[j][None, :]
        cvs.append(cvk)

    W_rows, v_rows = _nmpc_condense_core(
        Np, nz, nstate, m, nproj, nU, cols, T, CzS, sqRef, up,
        S0_ref[...], zeta0,
        get_Azcol=lambda k, j: Jcols[k][j * nz:(j + 1) * nz, :],
        get_Au=lambda k: jnp.concatenate(
            [Jcols[k][(nz + j) * nz:(nz + j + 1) * nz, :][:, None, :]
             for j in range(m)], axis=1),
        get_cv=lambda k: cvs[k])

    rdiag_obj = rdiag_ref[0, :]
    P = (eye * (2.0 * rdiag_obj)[None, :])[..., None]
    qv = jnp.zeros((n, T), jnp.float32)
    for Wr, vr in zip(W_rows, v_rows):
        P = P + 2.0 * (Wr[:, None, :] * Wr[None, :, :])
        qv = qv + Wr * vr[None, :]
    qv = 2.0 * qv
    if has_q0:
        qv = qv + rest[1 if band is None else 2][...]
    obj = _diag_obj_scale(P, n)
    iobj = 1.0 / obj
    obj_ref[...] = obj[None, :]
    Pr = P * iobj[None, None, :] + reg * eye[..., None]
    q = qv * iobj[None, :]

    b = jnp.broadcast_to(cFr_ref[...], (mc, T))
    F0r = F0r_ref[...]
    for j in range(m):
        b = b - F0r[:, j][:, None] * up[j][None, :]
    A = A_ref[...]
    At = At_ref[...]
    form_AtDA = _make_form_AtDA(band, n, T, rest, eye, rowi, coli)
    x0 = x0_ref[...]
    if warm_dual:
        lam0 = jnp.sqrt(jnp.clip(rest[-5][...] * iobj[None, :], 1e-4, 1e4))
    else:
        lam0 = jnp.ones((mc, T), jnp.float32)
    x, s_sl, lam = _mehrotra_loop(n, mc, iters, slack_floor, Pr, q, b, A,
                                  At, form_AtDA, x0, lam0)
    x_ref[...] = x
    s_ref[...] = s_sl
    lam_ref[...] = lam


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band", "Np", "nz", "nstate",
                                    "nproj", "cols", "jlayout", "flayout",
                                    "n_passes", "hold0"))
def solve_qp_nmpc_multipass_batched(zeta, u_prev, sq, sqRef, Cz, r_diag,
                                    A, cF, F0, jac_ops, roll_ops, Gup,
                                    q0c, *, Np: int, nz: int, nstate: int,
                                    nproj: int, cols: tuple,
                                    jlayout: tuple, flayout: tuple,
                                    n_passes: int, hold0: bool,
                                    iters: int = 10,
                                    interpret: bool = False,
                                    tol: float = 3e-3,
                                    gap_sane: float = 5e-2,
                                    tile: int = None, band: int = None):
    """Whole-SQP batched solve (see ``_nmpc_multipass_kernel``): all
    ``n_passes`` relinearization passes in one launch.  Per-lane inputs
    shrink to (zeta, u_prev); ``Gup``/``q0c`` are the static pass-0
    plan-tiling map and Levenberg coefficient column."""
    zeta = jnp.asarray(zeta, jnp.float32)
    u_prev = jnp.asarray(u_prev, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    sqRef = jnp.asarray(sqRef, jnp.float32)
    per_ref = sqRef.ndim == 2
    B = zeta.shape[0]
    n = A.shape[1]
    mc = A.shape[0]
    m = u_prev.shape[1]
    p = (Np + 1) * nproj
    nU_cols = n + m
    if tile is None:
        import os
        env = os.environ.get("KMPC_NMPC_TILE")
        # multipass re-sweep (round 5, B=32768): 512 1892k / 640 1871k /
        # 768 1980k / 896 1944k steps/s; 1024 compiles pathologically
        tile = int(env) if env else min(768, factored_tile_for(n))

    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)
    A_eq = A / row[:, None]
    cFr = jnp.asarray(cF, jnp.float32) / row
    F0r = jnp.asarray(F0, jnp.float32) / row[:, None]
    CzS = (jnp.asarray(sq, jnp.float32)[:, None]
           * jnp.tile(jnp.asarray(Cz, jnp.float32), (Np + 1, 1)))
    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq)
                      .reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T
        Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T if band > 0 \
            else jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        zeta, u_prev = zpad(zeta), zpad(u_prev)
        if per_ref:
            sqRef = zpad(sqRef)
    Bp = zeta.shape[0]
    S0 = jnp.zeros((nz, nU_cols, Bp), jnp.float32)

    kern = functools.partial(_nmpc_multipass_kernel, n, mc, iters, 1e-2,
                             tile, band, n_passes, hold0, Np, nz, nstate,
                             m, nproj, tuple(cols), tuple(jlayout),
                             tuple(flayout))
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    lane3 = lambda r, c: pl.BlockSpec((r, c, tile), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    jac_ops = tuple(jnp.asarray(a) for a in jac_ops)
    roll_ops = tuple(jnp.asarray(a) for a in roll_ops)
    jac_specs = [shared(*a.shape) for a in jac_ops]
    roll_specs = [shared(*a.shape) for a in roll_ops]
    xt, st, lamt, objt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane2(nz), lane2(m), lane3(nz, nU_cols),
            shared(n, m), shared(n, 1),
            shared(p, nstate),
            lane2(p) if per_ref else shared(p, 1),
            shared(1, n),
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc),
            *jac_specs, *roll_specs,
            *[shared(r, c) for r, c in struct_specs],
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32)],
        interpret=interpret,
    )(zeta.T, u_prev.T, S0, jnp.asarray(Gup, jnp.float32),
      jnp.asarray(q0c, jnp.float32).reshape(-1, 1),
      CzS, sqRef.T if per_ref else sqRef[:, None],
      jnp.asarray(r_diag, jnp.float32)[None],
      cFr[:, None], F0r, A_eq, At, *jac_ops, *roll_ops, *structured)

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]
    obj = objt[0, :B]
    with jax.default_matmul_precision("highest"):
        b_eq = cFr[None, :] - jnp.asarray(u_prev[:B], jnp.float32) @ F0r.T
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq, 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * obj[:, None] / row[None, :]
    return x, lam_orig, ok, gap


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band", "Np", "nz", "nstate",
                                    "nproj", "cols", "jlayout", "roll_mode",
                                    "flayout"))
def solve_qp_nmpc_stages_batched(Zl, Ul, Fv, zeta, u_prev, sq, sqRef, Cz,
                                 r_diag, A, cF, F0, jac_ops, x0=None,
                                 q0=None, lam0=None, roll_ops=(), *,
                                 Np: int, nz: int,
                                 nstate: int, nproj: int, cols: tuple,
                                 jlayout: tuple, iters: int = 10,
                                 roll_mode: str = "ship",
                                 flayout: tuple = (),
                                 interpret: bool = False, tol: float = 3e-3,
                                 gap_sane: float = 5e-2, tile: int = None,
                                 band: int = None):
    """Stage-Jacobian-fused NMPC batched IPM (see ``_nmpc_stage_kernel``).

    Per-lane: Zl (B, Np, nz) / Ul (B, Np, m) the SQP linearization
    trajectory, Fv (B, Np, nz) the dynamics values along it, zeta/u_prev
    and warm starts as in ``solve_qp_nmpc_batched``.  ``jac_ops``: the
    host-prepared generator tuple from ``ops.qp.build_stage_jac_ops``;
    ``jlayout``: static g_low monomial block row counts.

    ``roll_mode`` 'roll'/'hold' (with ``roll_ops``/``flayout`` from
    ``ops.qp.build_stage_roll_ops``) generates the trajectory IN-KERNEL
    from the plan / held state instead -- Zl/Fv (and for 'hold' Ul) may
    then be None (dummy rows ship in their place).
    """
    zeta = jnp.asarray(zeta, jnp.float32)
    B = zeta.shape[0]
    ship_Zl = roll_mode == "ship"
    ship_Ul = roll_mode != "hold"
    dummy = jnp.zeros((B, 1), jnp.float32)
    Zl = jnp.asarray(Zl, jnp.float32) if ship_Zl else dummy
    Fv = jnp.asarray(Fv, jnp.float32) if ship_Zl else dummy
    Ul = jnp.asarray(Ul, jnp.float32) if ship_Ul else dummy
    u_prev = jnp.asarray(u_prev, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    sqRef = jnp.asarray(sqRef, jnp.float32)
    per_ref = sqRef.ndim == 2
    n = A.shape[1]
    mc = A.shape[0]
    m = u_prev.shape[1]
    p = (Np + 1) * nproj
    nU_cols = n + m
    if tile is None:
        import os
        env = os.environ.get("KMPC_NMPC_TILE")
        # the stage-fused kernel's per-lane VMEM set is ~4x slimmer than
        # the jz/ju-shipping kernel's (512-optimal); re-swept round 5
        tile = int(env) if env else min(512, factored_tile_for(n))

    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)
    A_eq = A / row[:, None]
    cFr = jnp.asarray(cF, jnp.float32) / row
    F0r = jnp.asarray(F0, jnp.float32) / row[:, None]
    CzS = (jnp.asarray(sq, jnp.float32)[:, None]
           * jnp.tile(jnp.asarray(Cz, jnp.float32), (Np + 1, 1)))

    slack_floor = 1.0 if x0 is None else 1e-2
    if x0 is None:
        x0 = jnp.zeros((B, n), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    has_q0 = q0 is not None
    if has_q0:
        q0 = jnp.asarray(q0, jnp.float32)
    warm_dual = lam0 is not None
    if warm_dual:
        lam0_row = jnp.asarray(lam0, jnp.float32) * row[None, :]

    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq)
                      .reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T
        Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T if band > 0 \
            else jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        Zl, Ul, Fv, zeta, u_prev, x0 = map(
            zpad, (Zl, Ul, Fv, zeta, u_prev, x0))
        if per_ref:
            sqRef = zpad(sqRef)
        if has_q0:
            q0 = zpad(q0)
        if warm_dual:
            lam0_row = jnp.concatenate(
                [lam0_row, jnp.ones((pad, mc), jnp.float32)], 0)
    Bp = zeta.shape[0]
    S0 = jnp.zeros((nz, nU_cols, Bp), jnp.float32)

    Zlt = Zl.reshape(Bp, -1).T
    Ult = Ul.reshape(Bp, -1).T
    Fvt = Fv.reshape(Bp, -1).T

    kern = functools.partial(_nmpc_stage_kernel, n, mc, iters, slack_floor,
                             tile, band, warm_dual, has_q0, Np, nz, nstate,
                             m, nproj, tuple(cols), tuple(jlayout),
                             roll_mode, tuple(flayout))
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    lane3 = lambda r, c: pl.BlockSpec((r, c, tile), lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    jac_ops = tuple(jnp.asarray(a) for a in jac_ops)
    jac_specs = [shared(*a.shape) for a in jac_ops]
    roll_ops = tuple(jnp.asarray(a) for a in roll_ops) \
        if roll_mode != "ship" else ()
    roll_specs = [shared(*a.shape) for a in roll_ops]
    xt, st, lamt, objt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane2(Zlt.shape[0]), lane2(Ult.shape[0]), lane2(Fvt.shape[0]),
            lane3(nz, nU_cols), lane2(nz), lane2(m), lane2(n),
            shared(p, nstate),
            lane2(p) if per_ref else shared(p, 1),
            shared(1, n),
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc),
            *jac_specs, *roll_specs,
            *[shared(r, c) for r, c in struct_specs],
            *([lane2(n)] if has_q0 else []),
            *([lane2(mc)] if warm_dual else []),
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32)],
        interpret=interpret,
    )(Zlt, Ult, Fvt, S0, zeta.T, u_prev.T, x0.T,
      CzS, sqRef.T if per_ref else sqRef[:, None],
      jnp.asarray(r_diag, jnp.float32)[None],
      cFr[:, None], F0r, A_eq, At, *jac_ops, *roll_ops, *structured,
      *([q0.T] if has_q0 else []),
      *([lam0_row.T] if warm_dual else []))

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]
    obj = objt[0, :B]

    with jax.default_matmul_precision("highest"):
        b_eq = cFr[None, :] - jnp.asarray(u_prev[:B], jnp.float32) @ F0r.T
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq, 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * obj[:, None] / row[None, :]
    return x, lam_orig, ok, gap


@functools.partial(jax.jit,
                   static_argnames=("iters", "interpret", "tol", "gap_sane",
                                    "tile", "band"))
def solve_qp_bilinear_batched(z, u_prev, sqYr, PGW, PG0, PAsq, r_diag,
                              A, cF, F0, x0=None, iters: int = 10,
                              interpret: bool = False,
                              tol: float = 3e-3, gap_sane: float = 5e-2,
                              tile: int = None,
                              band: int = None, lam0=None):
    """Fused bilinear-MPC batched IPM (see ``_bilin_kernel``).

    Per-lane: z (B, NL) lifted state, u_prev (B, m), x0/lam0 warm starts.
    Lane-shared: sqYr (p,) = sqrt(q) * stacked reference window (traced per
    closed-loop step), PGW (p*n, NL) / PG0 (m*p, NL) / PAsq (p, NL) the
    sq-scaled assembly generators (``BilinearKmpc`` constants), r_diag (n,),
    A (mc, n) the reduced constraint rows, cF (mc,), F0 (mc, m) with
    b = cF - F0 @ u_prev.  Lane-for-lane equivalent to assembling
    (W, v, b) in XLA and calling ``solve_qp_factored_batched``.
    """
    z = jnp.asarray(z, jnp.float32)
    u_prev = jnp.asarray(u_prev, jnp.float32)
    A = jnp.asarray(A, jnp.float32)
    sqYr = jnp.asarray(sqYr, jnp.float32)
    per_ref = sqYr.ndim == 2               # (B, p) per-lane windows
    B = z.shape[0]
    n = A.shape[1]
    mc = A.shape[0]
    p = PAsq.shape[0]
    m = u_prev.shape[1]
    if tile is None:
        tile = factored_tile_for(n)

    row = jnp.maximum(jnp.max(jnp.abs(A), axis=1), 1e-10)        # (mc,)
    A_eq = A / row[:, None]
    cFr = jnp.asarray(cF, jnp.float32) / row
    F0r = jnp.asarray(F0, jnp.float32) / row[:, None]

    slack_floor = 1.0 if x0 is None else 1e-2
    if x0 is None:
        x0 = jnp.zeros((B, n), jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)
    warm_dual = lam0 is not None
    if warm_dual:
        lam0_row = jnp.asarray(lam0, jnp.float32) * row[None, :]

    At = A_eq.T
    if band is None:
        structured = (jnp.einsum("ci,cj->ijc", A_eq, A_eq).reshape(n * n, mc),)
        struct_specs = [(n * n, mc)]
    else:
        Wd = (A_eq * A_eq).T
        if band > 0:
            Wo = (A_eq[:, :n - band] * A_eq[:, band:]).T
        else:
            Wo = jnp.zeros((1, mc), jnp.float32)
        structured = (Wd, Wo)
        struct_specs = [(n, mc), (Wo.shape[0], mc)]

    pad = (-B) % tile
    if pad:
        # padded lanes solve a zero-state instance (W, v, b all finite:
        # b = cF - F0 @ 0 = cF, feasible for the MPC box rows) and are
        # dropped on return
        z = jnp.concatenate([z, jnp.zeros((pad,) + z.shape[1:], z.dtype)], 0)
        u_prev = jnp.concatenate(
            [u_prev, jnp.zeros((pad, m), u_prev.dtype)], 0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, n), x0.dtype)], 0)
        if per_ref:
            sqYr = jnp.concatenate(
                [sqYr, jnp.zeros((pad, p), jnp.float32)], 0)
        if warm_dual:
            lam0_row = jnp.concatenate(
                [lam0_row, jnp.ones((pad, mc), jnp.float32)], 0)
    Bp = z.shape[0]
    NL = z.shape[1]

    kern = functools.partial(_bilin_kernel, n, mc, iters, slack_floor, tile,
                             band, warm_dual, p, m)
    lane2 = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)
    shared = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    xt, st, lamt, objt = pl.pallas_call(
        kern,
        grid=(Bp // tile,),
        in_specs=[
            lane2(NL), lane2(m), lane2(n),
            lane2(p) if per_ref else shared(p, 1), shared(1, n),
            shared(p * n, NL), shared(p * n, NL),
            shared(m * p, NL), shared(m * p, NL),
            shared(p, NL), shared(p, NL),
            shared(mc, 1), shared(mc, m),
            shared(mc, n), shared(n, mc),
            *[shared(r, c) for r, c in struct_specs],
            *([lane2(mc)] if warm_dual else []),
        ],
        out_specs=[lane2(n), lane2(mc), lane2(mc), lane2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((mc, Bp), jnp.float32),
                   jax.ShapeDtypeStruct((1, Bp), jnp.float32)],
        interpret=interpret,
    )(z.T, u_prev.T, x0.T,
      sqYr.T if per_ref else sqYr[:, None], jnp.asarray(r_diag,
                                                        jnp.float32)[None],
      *_split_bf16(PGW), *_split_bf16(PG0), *_split_bf16(PAsq),
      cFr[:, None], F0r,
      A_eq, At, *structured,
      *([lam0_row.T] if warm_dual else []))

    x = xt.T[:B]
    s = st.T[:B]
    lam = lamt.T[:B]
    obj = objt[0, :B]

    with jax.default_matmul_precision("highest"):
        b_eq = cFr[None, :] - jnp.asarray(u_prev[:B], jnp.float32) @ F0r.T
        gap = jnp.sum(s * lam, axis=1) / mc
        r_p = jnp.max(jnp.maximum(x @ A_eq.T - b_eq, 0.0), axis=1)
        finite = jnp.all(jnp.isfinite(x), axis=1)
        ok = finite & (gap < gap_sane) \
            & (r_p < tol * jnp.maximum(jnp.max(jnp.abs(b_eq), axis=1), 1.0))
        x = jnp.where(finite[:, None], x, jnp.nan)
        lam_orig = lam * obj[:, None] / row[None, :]
    return x, lam_orig, ok, gap
