"""Lanes-minor Pallas IPM kernel vs the pure-JAX interior-point path.

Runs the full batched Mehrotra kernel in interpreter mode (CPU) on random
MPC-shaped QPs and checks lane-for-lane agreement with ``ops.qp.solve_qp``
(same equilibration/regularization/step rules, so solutions should agree to
f32 roundoff, not just to solver tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopman_realizations_tpu.ops.pallas.qp_ipm import solve_qp_shared_batched
from koopman_realizations_tpu.ops.qp import solve_qp


def _random_qps(B, n, mc, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    A = rng.normal(size=(mc, n)).astype(np.float32)
    # keep the origin strictly feasible so every lane has an interior
    b = (np.abs(rng.normal(size=(B, mc))) + 0.5).astype(np.float32)
    return jnp.asarray(P), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b)


def _pure_batch(P, q, A, b, x0, iters):
    f = lambda Pi, qi, bi, x0i: solve_qp(Pi, qi, A, bi, iters=iters, x0=x0i,
                                         shared_A=True)
    return jax.vmap(f)(P, q, b, x0)


@pytest.mark.parametrize("B,n,mc", [(64, 12, 30), (130, 27, 108)])
def test_kernel_matches_pure_path(B, n, mc):
    P, q, A, b = _random_qps(B, n, mc, seed=B + n)
    x0 = jnp.zeros((B, n), jnp.float32)
    # 20 iterations so both solvers CONVERGE on every lane: comparing
    # mid-trajectory fixed-iteration states is chaotic near active-set
    # boundaries, converged endpoints are not
    iters = 20

    x_k, lam_k, ok_k, gap_k = solve_qp_shared_batched(
        P, q, A, b, x0=x0, iters=iters, interpret=True)
    sol = _pure_batch(P, q, A, b, x0, iters)

    # converged f64 oracle: the ground truth both f32 solvers approximate
    f64 = lambda Pi, qi, bi: solve_qp(
        jnp.asarray(Pi, jnp.float64), jnp.asarray(qi, jnp.float64),
        jnp.asarray(A, jnp.float64), jnp.asarray(bi, jnp.float64), iters=40)
    ref = jax.vmap(f64)(P, q, b)

    ok_both = np.asarray(ok_k) & np.asarray(sol.ok)
    assert ok_both.mean() > 0.95          # well-posed random QPs solve
    # identical algorithm, different op ordering (rsqrt vs sqrt-divide, MXU
    # contraction order): lanes agree to roundoff except near active-set
    # boundaries where f32 differences amplify to solver tolerance.  The
    # kernel must be AT LEAST as accurate as the pure f32 path vs the oracle.
    dk = np.abs(np.asarray(x_k) - np.asarray(ref.x))[ok_both]
    dp = np.abs(np.asarray(sol.x) - np.asarray(ref.x))[ok_both]
    assert np.median(dk) < 1e-4
    assert dk.max() < 5e-3
    # 2x slack is deliberate headroom for f32 summation-order noise between
    # the kernel and the pure path; the absolute bounds above carry the
    # accuracy guarantee
    assert dk.max() < dp.max() * 2.0 + 1e-4
    dx = np.abs(np.asarray(x_k) - np.asarray(sol.x))[ok_both]
    assert np.median(dx) < 1e-4
    # multipliers back in original units (same amplification caveat)
    dl = np.abs(np.asarray(lam_k) - np.asarray(sol.lam))[ok_both]
    assert np.median(dl) < 1e-3 * max(1.0, np.abs(np.asarray(sol.lam)).max())


def test_kernel_warm_start_and_failure_mask():
    B, n, mc = 64, 8, 20
    P, q, A, b = _random_qps(B, n, mc, seed=3)
    # warm start from the cold solution: must stay at the optimum
    x_c, _, ok_c, _ = solve_qp_shared_batched(P, q, A, b, iters=12,
                                              interpret=True)
    x_w, _, ok_w, _ = solve_qp_shared_batched(P, q, A, b, x0=x_c, iters=6,
                                              interpret=True)
    m = np.asarray(ok_c) & np.asarray(ok_w)
    assert m.mean() > 0.95
    assert np.abs(np.asarray(x_w) - np.asarray(x_c))[m].max() < 5e-3

    # an infeasible lane (contradictory rows) flags not-ok, finite lanes keep
    A_bad = np.asarray(A).copy()
    A_bad[0] = 1.0
    A_bad[1] = -1.0
    b_bad = np.asarray(b).copy()
    b_bad[:, 0] = -2.0    # x.sum() <= -2 AND -x.sum() <= -2
    b_bad[:, 1] = -2.0    # i.e. sum(x) <= -2 and sum(x) >= 2: infeasible
    _, _, ok_bad, _ = solve_qp_shared_batched(
        jnp.asarray(P), jnp.asarray(q), jnp.asarray(A_bad),
        jnp.asarray(b_bad), iters=12, interpret=True)
    assert not np.asarray(ok_bad).any()


def test_kernel_nonmultiple_batch_padding():
    B, n, mc = 37, 10, 24          # B far from a lane-tile multiple
    P, q, A, b = _random_qps(B, n, mc, seed=11)
    x0 = jnp.zeros((B, n), jnp.float32)
    x_k, _, ok_k, _ = solve_qp_shared_batched(P, q, A, b, x0=x0, iters=10,
                                              interpret=True)
    sol = _pure_batch(P, q, A, b, x0, 10)
    m = np.asarray(ok_k) & np.asarray(sol.ok)
    assert m.mean() > 0.9
    dx = np.abs(np.asarray(x_k) - np.asarray(sol.x))[m]
    assert np.median(dx) < 1e-4
    assert dx.max() < 5e-3


def _box_slope_stack(n, m, lim=0.8, slope=0.1):
    """MPC-like reduced constraint stack: box rows on every variable plus
    slope rows coupling variable i to i+m (band offset m after reduction)."""
    rows, rhs = [], []
    eye = np.eye(n, dtype=np.float32)
    for i in range(n):
        rows += [eye[i], -eye[i]]
        rhs += [lim, lim]
    for i in range(n - m):
        d = eye[i + m] - eye[i]
        rows += [d, -d]
        rhs += [slope, slope]
    return np.stack(rows), np.asarray(rhs, np.float32)


def test_kernel_banded_matches_dense():
    from koopman_realizations_tpu.ops.qp import band_offset_of

    B, n, m = 96, 27, 3
    A_np, c = _box_slope_stack(n, m)
    assert band_offset_of(A_np) == m
    mc = A_np.shape[0]
    rng = np.random.default_rng(7)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32) * 0.3
    b = np.tile(c[None], (B, 1))
    P, q, A, b = map(jnp.asarray, (P, q, A_np, b))
    x0 = jnp.zeros((B, n), jnp.float32)

    x_d, lam_d, ok_d, _ = solve_qp_shared_batched(P, q, A, b, x0=x0,
                                                  iters=20, interpret=True)
    x_b, lam_b, ok_b, _ = solve_qp_shared_batched(P, q, A, b, x0=x0,
                                                  iters=20, interpret=True,
                                                  band=m)
    okm = np.asarray(ok_d) & np.asarray(ok_b)
    assert okm.mean() > 0.95
    # identical math, different contraction order for A^T D A
    dx = np.abs(np.asarray(x_b) - np.asarray(x_d))[okm]
    assert np.median(dx) < 1e-5
    assert dx.max() < 5e-3

    # diagonal-only stack (pure box rows) exercises band = 0
    A0, c0 = _box_slope_stack(n, m)
    A0, c0 = A0[: 2 * n], c0[: 2 * n]
    assert band_offset_of(A0) == 0
    b0 = jnp.asarray(np.tile(c0[None], (B, 1)))
    x_d0, _, ok_d0, _ = solve_qp_shared_batched(P, q, jnp.asarray(A0), b0,
                                                x0=x0, iters=20,
                                                interpret=True)
    x_b0, _, ok_b0, _ = solve_qp_shared_batched(P, q, jnp.asarray(A0), b0,
                                                x0=x0, iters=20,
                                                interpret=True, band=0)
    okm0 = np.asarray(ok_d0) & np.asarray(ok_b0)
    assert okm0.mean() > 0.95
    dx0 = np.abs(np.asarray(x_b0) - np.asarray(x_d0))[okm0]
    assert np.median(dx0) < 1e-5


def test_band_offset_of_analyzer():
    from koopman_realizations_tpu.ops.qp import band_offset_of

    n, m = 12, 3
    A, _ = _box_slope_stack(n, m)
    assert band_offset_of(A) == m
    assert band_offset_of(A[: 2 * n]) == 0                 # box only
    assert band_offset_of(np.zeros((0, n))) == 0           # no rows
    # smoothness-style rows add a second offset -> dense
    r = np.zeros((1, n), np.float32)
    r[0, 0], r[0, m], r[0, 2 * m] = 1.0, -2.0, 1.0
    assert band_offset_of(np.concatenate([A, r])) is None
    # dense row -> None
    assert band_offset_of(np.ones((1, n), np.float32)) is None


def test_kernel_dual_warm_start():
    """Damped dual warm start: re-solving from a converged (x, lam) at few
    iterations must stay at the optimum, and a garbage lam0 must not break
    convergence at full iterations (the sqrt/clip damping bounds it)."""
    B, n, mc = 64, 8, 20
    P, q, A, b = _random_qps(B, n, mc, seed=5)
    x_c, lam_c, ok_c, _ = solve_qp_shared_batched(P, q, A, b, iters=14,
                                                  interpret=True)
    x_w, _, ok_w, _ = solve_qp_shared_batched(P, q, A, b, x0=x_c, iters=4,
                                              lam0=lam_c, interpret=True)
    m = np.asarray(ok_c) & np.asarray(ok_w)
    assert m.mean() > 0.95
    assert np.abs(np.asarray(x_w) - np.asarray(x_c))[m].max() < 5e-3

    bad = jnp.full((B, mc), 1e9, jnp.float32)
    x_b, _, ok_b, _ = solve_qp_shared_batched(P, q, A, b, iters=14,
                                              lam0=bad, interpret=True)
    mb = np.asarray(ok_c) & np.asarray(ok_b)
    assert mb.mean() > 0.9
    assert np.abs(np.asarray(x_b) - np.asarray(x_c))[mb].max() < 5e-3


def test_kernel_factored_matches_dense():
    """Least-squares-form kernel == dense-form kernel lane-for-lane (the
    Gram, objective scale, and equilibrated gradient move in-kernel)."""
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
    )

    B, p, n, m = 96, 22, 27, 3
    rng = np.random.default_rng(11)
    W = rng.normal(size=(B, p, n)).astype(np.float32)
    v = rng.normal(size=(B, p)).astype(np.float32)
    r = (np.abs(rng.normal(size=n)) * 0.1).astype(np.float32)
    A_np, cns = _box_slope_stack(n, m)
    b = np.tile(cns[None], (B, 1))
    P = 2.0 * (np.einsum("bpi,bpj->bij", W, W) + np.eye(n) * r)
    q = 2.0 * np.einsum("bpi,bp->bi", W, v)
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, A_np.shape[0]), jnp.float32)

    x_d, lam_d, ok_d, _ = solve_qp_shared_batched(
        jnp.asarray(P.astype(np.float32)), jnp.asarray(q.astype(np.float32)),
        jnp.asarray(A_np), jnp.asarray(b), x0=x0, iters=16, band=m,
        lam0=lam0, interpret=True)
    x_f, lam_f, ok_f, _ = solve_qp_factored_batched(
        jnp.asarray(W), jnp.asarray(v), jnp.asarray(r), jnp.asarray(A_np),
        jnp.asarray(b), x0=x0, iters=16, band=m, lam0=lam0, interpret=True)
    okm = np.asarray(ok_d) & np.asarray(ok_f)
    assert okm.mean() > 0.9
    dx = np.abs(np.asarray(x_f) - np.asarray(x_d))[okm]
    assert np.median(dx) < 2e-5
    assert dx.max() < 5e-3
    dl = np.abs(np.asarray(lam_f) - np.asarray(lam_d))[okm]
    assert np.median(dl) < 1e-3 * max(1.0, np.abs(np.asarray(lam_d)).max())


def test_kernel_factored_q0_matches_dense():
    """The additive linear term q0 (the SQP's folded Levenberg gradient)
    must reproduce the dense-form solve with q = 2 W^T v + q0."""
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
    )

    B, p, n, m = 64, 10, 12, 3
    rng = np.random.default_rng(23)
    W = rng.normal(size=(B, p, n)).astype(np.float32)
    v = rng.normal(size=(B, p)).astype(np.float32)
    rho = 0.05
    r = (np.abs(rng.normal(size=n)) * 0.1 + rho).astype(np.float32)
    q0 = (-2.0 * rho * rng.normal(size=(B, n))).astype(np.float32)
    A_np, cns = _box_slope_stack(n, m)
    b = np.tile(cns[None], (B, 1))
    P = 2.0 * (np.einsum("bpi,bpj->bij", W, W) + np.eye(n) * r)
    q = 2.0 * np.einsum("bpi,bp->bi", W, v) + q0
    x0 = jnp.zeros((B, n), jnp.float32)

    x_d, _, ok_d, _ = solve_qp_shared_batched(
        jnp.asarray(P.astype(np.float32)), jnp.asarray(q.astype(np.float32)),
        jnp.asarray(A_np), jnp.asarray(b), x0=x0, iters=16, band=m,
        interpret=True)
    x_f, _, ok_f, _ = solve_qp_factored_batched(
        jnp.asarray(W), jnp.asarray(v), jnp.asarray(r), jnp.asarray(A_np),
        jnp.asarray(b), x0=x0, iters=16, band=m, q0=jnp.asarray(q0),
        interpret=True)
    okm = np.asarray(ok_d) & np.asarray(ok_f)
    assert okm.mean() > 0.9
    dx = np.abs(np.asarray(x_f) - np.asarray(x_d))[okm]
    assert np.median(dx) < 2e-5
    assert dx.max() < 5e-3


def test_kernel_shared_P_matches_batched_P():
    """Lane-shared Hessian path == per-lane path when all lanes share P."""
    B, n, mc = 96, 12, 30
    P1, q, A, b = _random_qps(1, n, mc, seed=21)
    P1 = P1[0]
    qB, bB = jnp.tile(q, (B, 1)) * jnp.linspace(0.5, 2.0, B)[:, None], \
        jnp.tile(b[:1], (B, 1))
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    x_b, lam_b, ok_b, _ = solve_qp_shared_batched(
        jnp.tile(P1[None], (B, 1, 1)), qB, A, bB, x0=x0, iters=16,
        lam0=lam0, interpret=True)
    x_s, lam_s, ok_s, _ = solve_qp_shared_batched(
        P1, qB, A, bB, x0=x0, iters=16, lam0=lam0, interpret=True,
        shared_P=True)
    m = np.asarray(ok_b) & np.asarray(ok_s)
    assert m.mean() > 0.9
    dx = np.abs(np.asarray(x_s) - np.asarray(x_b))[m]
    assert np.median(dx) < 2e-5
    assert dx.max() < 5e-3


def test_kernel_bilinear_fused_matches_factored():
    """The assembly-fused bilinear kernel (W, v, b built in VMEM from
    (z, u_prev) against shared generators) must match assembling in XLA and
    solving on the factored kernel, lane-for-lane."""
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_bilinear_batched,
        solve_qp_factored_batched,
    )

    B, p, n, m, NL = 96, 22, 27, 3, 34
    rng = np.random.default_rng(31)
    PGW = rng.normal(size=(p * n, NL)).astype(np.float32) * 0.3
    PG0 = rng.normal(size=(m * p, NL)).astype(np.float32) * 0.3
    PAsq = rng.normal(size=(p, NL)).astype(np.float32) * 0.3
    sqYr = rng.normal(size=(p,)).astype(np.float32)
    r = (np.abs(rng.normal(size=n)) * 0.05).astype(np.float32)
    A_np, cns = _box_slope_stack(n, m)
    mc = A_np.shape[0]
    F0 = rng.normal(size=(mc, m)).astype(np.float32) * 0.1
    z = rng.normal(size=(B, NL)).astype(np.float32) * 0.3
    up = rng.normal(size=(B, m)).astype(np.float32) * 0.2
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    # XLA assembly (the _bilin_assemble math)
    W = np.einsum("rk,bk->br", PGW, z).reshape(B, p, n)
    CB0 = np.einsum("rk,bk->br", PG0, z).reshape(B, m, p).transpose(0, 2, 1)
    v = np.einsum("pk,bk->bp", PAsq, z) - sqYr[None] \
        + np.einsum("bpm,bm->bp", CB0, up)
    b = cns[None] - up @ F0.T

    x_f, lam_f, ok_f, _ = solve_qp_factored_batched(
        jnp.asarray(W), jnp.asarray(v), jnp.asarray(r), jnp.asarray(A_np),
        jnp.asarray(b), x0=x0, iters=16, band=m, lam0=lam0, interpret=True)
    x_b, lam_b, ok_b, _ = solve_qp_bilinear_batched(
        jnp.asarray(z), jnp.asarray(up), jnp.asarray(sqYr),
        jnp.asarray(PGW), jnp.asarray(PG0), jnp.asarray(PAsq),
        jnp.asarray(r), jnp.asarray(A_np), jnp.asarray(cns),
        jnp.asarray(F0), x0=x0, iters=16, band=m, lam0=lam0, interpret=True)
    okm = np.asarray(ok_f) & np.asarray(ok_b)
    assert okm.mean() > 0.9
    dx = np.abs(np.asarray(x_b) - np.asarray(x_f))[okm]
    assert np.median(dx) < 5e-5
    assert dx.max() < 5e-3
    dl = np.abs(np.asarray(lam_b) - np.asarray(lam_f))[okm]
    assert np.median(dl) < 1e-3 * max(1.0, np.abs(np.asarray(lam_f)).max())


def test_kernel_bilinear_fused_matches_factored_blocked_shape():
    """Same fused-vs-factored parity at the SHIPPING move-blocked shape:
    n=12 reduced moves, the REAL deduplicated 48-row constraint stack
    (band offset m=3), Tb-folded generators (round-4 blocked fused
    route, ``bilinear_consts`` PGWb)."""
    from koopman_realizations_tpu.config import MpcConfig
    from koopman_realizations_tpu.control.kmpc import (
        input_constraint_rows,
        move_blocking,
    )
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_bilinear_batched,
        solve_qp_factored_batched,
    )

    mI, Np, blocks = 3, 10, (1, 1, 2, 5)
    cfg = MpcConfig(horizon=Np, input_bounds=(-2.7, 2.7),
                    input_slopeConst=1e-1, input_blocks=blocks)

    class S:
        u_factor = np.ones(mI)

        def u_down(self, u):
            return np.asarray(u)

    F, cF = input_constraint_rows(cfg, mI, Np, S())
    _, _, Fr, F0r, cr, _ = move_blocking(blocks, mI, Np, F, cF)
    n = Fr.shape[1]
    mc = Fr.shape[0]
    B, p, NL = 96, 22, 34
    rng = np.random.default_rng(77)
    PGW = rng.normal(size=(p * n, NL)).astype(np.float32) * 0.3
    PG0 = rng.normal(size=(mI * p, NL)).astype(np.float32) * 0.3
    PAsq = rng.normal(size=(p, NL)).astype(np.float32) * 0.3
    sqYr = rng.normal(size=(p,)).astype(np.float32)
    r = (np.abs(rng.normal(size=n)) * 0.05).astype(np.float32)
    z = rng.normal(size=(B, NL)).astype(np.float32) * 0.3
    up = rng.normal(size=(B, mI)).astype(np.float32) * 0.2
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    W = np.einsum("rk,bk->br", PGW, z).reshape(B, p, n)
    CB0 = np.einsum("rk,bk->br", PG0, z).reshape(B, mI, p).transpose(0, 2, 1)
    v = np.einsum("pk,bk->bp", PAsq, z) - sqYr[None] \
        + np.einsum("bpm,bm->bp", CB0, up)
    b = cr[None].astype(np.float32) - up @ F0r.T.astype(np.float32)

    x_f, lam_f, ok_f, _ = solve_qp_factored_batched(
        jnp.asarray(W), jnp.asarray(v), jnp.asarray(r),
        jnp.asarray(Fr, jnp.float32), jnp.asarray(b), x0=x0, iters=16,
        band=mI, lam0=lam0, interpret=True)
    x_b, lam_b, ok_b, _ = solve_qp_bilinear_batched(
        jnp.asarray(z), jnp.asarray(up), jnp.asarray(sqYr),
        jnp.asarray(PGW), jnp.asarray(PG0), jnp.asarray(PAsq),
        jnp.asarray(r), jnp.asarray(Fr, jnp.float32),
        jnp.asarray(cr, jnp.float32), jnp.asarray(F0r, jnp.float32),
        x0=x0, iters=16, band=mI, lam0=lam0, interpret=True)
    okm = np.asarray(ok_f) & np.asarray(ok_b)
    assert okm.mean() > 0.9
    dx = np.abs(np.asarray(x_b) - np.asarray(x_f))[okm]
    assert np.median(dx) < 5e-5
    assert dx.max() < 5e-3


def test_solve_qp_bilinear_routing_matches_pure(rng=None):
    """The custom_vmap routing of ``ops.qp.solve_qp_bilinear`` (vmapped over
    lanes on CPU -> pure fallback) must equal per-lane unbatched solves, and
    the per-lane-Yr branch (multi-ref) must agree too.  Both sides run to
    CONVERGENCE (30 iterations): mid-trajectory fixed-iteration iterates are
    chaotic near active-set boundaries, converged endpoints are not."""
    import jax

    from koopman_realizations_tpu.ops.qp import solve_qp_bilinear

    B, p, n, m, NL = 8, 6, 9, 3, 10
    rng = np.random.default_rng(5)
    PGW = jnp.asarray(rng.normal(size=(p * n, NL)).astype(np.float32) * 0.3)
    PG0 = jnp.asarray(rng.normal(size=(m * p, NL)).astype(np.float32) * 0.3)
    PAsq = jnp.asarray(rng.normal(size=(p, NL)).astype(np.float32) * 0.3)
    sq = jnp.asarray(np.abs(rng.normal(size=p)).astype(np.float32) + 0.5)
    Yr = jnp.asarray(rng.normal(size=(p,)).astype(np.float32))
    Yr_b = jnp.asarray(rng.normal(size=(B, p)).astype(np.float32))
    # r_diag bounded BELOW: W is p=6 rows in n=9 vars, so without a solid
    # diagonal the QP is flat along null(W) directions and "converged"
    # optima legitimately differ by ~1e-3 in x between summation orders
    r = jnp.asarray((np.abs(rng.normal(size=n)) * 0.05 + 0.2).astype(np.float32))
    A_np, cns = _box_slope_stack(n, m)
    A = jnp.asarray(A_np)
    cF = jnp.asarray(cns)
    F0 = jnp.asarray(rng.normal(size=(A_np.shape[0], m)).astype(np.float32)
                     * 0.1)
    z = jnp.asarray(rng.normal(size=(B, NL)).astype(np.float32) * 0.3)
    up = jnp.asarray(rng.normal(size=(B, m)).astype(np.float32) * 0.2)
    it = 30

    sol_v = jax.vmap(lambda zi, ui: solve_qp_bilinear(
        zi, ui, Yr, PGW, PG0, PAsq, sq, r, A, cF, F0, iters=it,
        band_offset=m))(z, up)
    for i in range(B):
        sol_i = solve_qp_bilinear(z[i], up[i], Yr, PGW, PG0, PAsq, sq, r,
                                  A, cF, F0, iters=it, band_offset=m)
        if bool(sol_v.ok[i]) and bool(sol_i.ok):
            np.testing.assert_allclose(np.asarray(sol_v.x[i]),
                                       np.asarray(sol_i.x), rtol=0,
                                       atol=2e-4)
    assert np.asarray(sol_v.ok).mean() > 0.8
    # per-lane Yr branch
    sol_m = jax.vmap(lambda zi, ui, Yi: solve_qp_bilinear(
        zi, ui, Yi, PGW, PG0, PAsq, sq, r, A, cF, F0, iters=it,
        band_offset=m))(z, up, Yr_b)
    for i in range(0, B, 3):
        sol_i = solve_qp_bilinear(z[i], up[i], Yr_b[i], PGW, PG0, PAsq, sq,
                                  r, A, cF, F0, iters=it, band_offset=m)
        if bool(sol_m.ok[i]) and bool(sol_i.ok):
            np.testing.assert_allclose(np.asarray(sol_m.x[i]),
                                       np.asarray(sol_i.x), rtol=0,
                                       atol=2e-4)
    assert np.asarray(sol_m.ok).mean() > 0.8


def test_kernel_nmpc_condense_fused_matches_factored():
    """The condensation-fused NMPC kernel (sensitivity recursion + W/v
    assembly + IPM in VMEM, round 4) must match condensing in XLA and
    solving on the factored kernel, lane-for-lane, at the blocked
    shipping shape."""
    from koopman_realizations_tpu.config import MpcConfig
    from koopman_realizations_tpu.control.kmpc import (
        input_constraint_rows,
        move_blocking,
    )
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
        solve_qp_nmpc_batched,
    )
    from koopman_realizations_tpu.ops.qp import _nmpc_condense_assemble

    mI, Np, blocks = 3, 10, (1, 1, 2, 5)
    nz, nproj = 6, 2
    cfg = MpcConfig(horizon=Np, input_bounds=(-2.7, 2.7),
                    input_slopeConst=1e-1, input_blocks=blocks)

    class S:
        u_factor = np.ones(mI)

        def u_down(self, u):
            return np.asarray(u)

    F, cF = input_constraint_rows(cfg, mI, Np, S())
    _, _, Fr, F0r, cr, _ = move_blocking(blocks, mI, Np, F, cF)
    n = Fr.shape[1]
    mc = Fr.shape[0]
    # stage -> decision column: stage 0 hits the u0 block, later stages
    # their group's move (the NonlinearKmpc Emb placement)
    group_of = np.repeat(np.arange(len(blocks)), blocks)
    cols = tuple([0] + [mI + int(group_of[k - 1]) * mI
                        for k in range(1, Np)])

    B = 96
    rng = np.random.default_rng(5)
    # near-identity stage Jacobians (stable products, like a real SQP)
    jz = (np.eye(nz)[None, None]
          + 0.1 * rng.standard_normal((B, Np, nz, nz))).astype(np.float32)
    ju = (0.2 * rng.standard_normal((B, Np, nz, mI))).astype(np.float32)
    cv = (0.05 * rng.standard_normal((B, Np, nz))).astype(np.float32)
    zeta = (0.3 * rng.standard_normal((B, nz))).astype(np.float32)
    up = (0.2 * rng.standard_normal((B, mI))).astype(np.float32)
    sq = np.sqrt(np.abs(rng.normal(size=(Np + 1) * nproj)) + 0.5) \
        .astype(np.float32)
    sqRef = (0.3 * rng.standard_normal((Np + 1) * nproj)).astype(np.float32)
    Cz = rng.standard_normal((nproj, nz)).astype(np.float32) * 0.5
    r = (np.abs(rng.normal(size=n)) * 0.05).astype(np.float32)
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)
    q0 = (0.01 * rng.standard_normal((B, n))).astype(np.float32)

    # XLA condensation oracle (the pure-path math) per lane
    W, v = jax.vmap(lambda a, b_, c, z, u: _nmpc_condense_assemble(
        a, b_, c, z, u, jnp.asarray(sq), jnp.asarray(sqRef),
        jnp.asarray(Cz), cols, mI))(jz, ju, cv, zeta, up)
    b = cr[None].astype(np.float32) - up @ F0r.T.astype(np.float32)

    x_f, lam_f, ok_f, _ = solve_qp_factored_batched(
        W, v, jnp.asarray(r), jnp.asarray(Fr, jnp.float32), jnp.asarray(b),
        x0=x0, iters=16, band=mI, lam0=lam0, q0=jnp.asarray(q0),
        interpret=True)
    x_n, lam_n, ok_n, _ = solve_qp_nmpc_batched(
        jnp.asarray(jz), jnp.asarray(ju), jnp.asarray(cv),
        jnp.asarray(zeta), jnp.asarray(up), jnp.asarray(sq),
        jnp.asarray(sqRef), jnp.asarray(Cz), jnp.asarray(r),
        jnp.asarray(Fr, jnp.float32), jnp.asarray(cr, jnp.float32),
        jnp.asarray(F0r, jnp.float32), x0=x0, q0=jnp.asarray(q0),
        lam0=lam0, Np=Np, nz=nz, nstate=nz, nproj=nproj, cols=cols,
        iters=16, band=mI, interpret=True)
    okm = np.asarray(ok_f) & np.asarray(ok_n)
    assert okm.mean() > 0.9
    dx = np.abs(np.asarray(x_n) - np.asarray(x_f))[okm]
    assert np.median(dx) < 5e-5
    assert dx.max() < 5e-3


def test_kernel_nmpc_per_lane_ref_matches_shared():
    """Per-lane reference windows (run_multi_ref) ride the same fused NMPC
    kernel: with every lane given the SAME window, the per-lane (B, p)
    sqRef path must match the lane-shared (p,) path exactly; with distinct
    windows it must match the XLA condensation oracle."""
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
        solve_qp_nmpc_batched,
    )
    from koopman_realizations_tpu.ops.qp import _nmpc_condense_assemble

    Np, nz, mI, nproj = 10, 6, 3, 2
    n = 12
    cols = tuple([0] + [mI + 3 * min(k - 1, 3) for k in range(1, Np)])
    B = 64
    rng = np.random.default_rng(9)
    jz = (np.eye(nz)[None, None]
          + 0.1 * rng.standard_normal((B, Np, nz, nz))).astype(np.float32)
    ju = (0.2 * rng.standard_normal((B, Np, nz, mI))).astype(np.float32)
    cv = (0.05 * rng.standard_normal((B, Np, nz))).astype(np.float32)
    zeta = (0.3 * rng.standard_normal((B, nz))).astype(np.float32)
    up = (0.2 * rng.standard_normal((B, mI))).astype(np.float32)
    p = (Np + 1) * nproj
    sq = np.sqrt(np.abs(rng.normal(size=p)) + 0.5).astype(np.float32)
    Cz = rng.standard_normal((nproj, nz)).astype(np.float32) * 0.5
    r = (np.abs(rng.normal(size=n)) * 0.05).astype(np.float32)
    A = np.concatenate([np.eye(n), -np.eye(n)]).astype(np.float32)
    cns = np.full(2 * n, 1.5, np.float32)
    F0 = np.zeros((2 * n, mI), np.float32)
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, 2 * n), jnp.float32)
    kw = dict(Np=Np, nz=nz, nstate=nz, nproj=nproj, cols=cols, iters=16,
              band=0, interpret=True)

    sqRef1 = (0.3 * rng.standard_normal(p)).astype(np.float32)
    x_s, _, ok_s, _ = solve_qp_nmpc_batched(
        jz, ju, cv, zeta, up, sq, sqRef1, Cz, r, A, cns, F0,
        x0=x0, lam0=lam0, **kw)
    x_p, _, ok_p, _ = solve_qp_nmpc_batched(
        jz, ju, cv, zeta, up, sq, np.tile(sqRef1[None], (B, 1)), Cz, r, A,
        cns, F0, x0=x0, lam0=lam0, **kw)
    okm = np.asarray(ok_s) & np.asarray(ok_p)
    assert okm.mean() > 0.9
    np.testing.assert_allclose(np.asarray(x_p)[okm], np.asarray(x_s)[okm],
                               rtol=0, atol=1e-5)

    # distinct windows vs the XLA oracle + factored kernel
    sqRefB = (0.3 * rng.standard_normal((B, p))).astype(np.float32)
    x_k, _, ok_k, _ = solve_qp_nmpc_batched(
        jz, ju, cv, zeta, up, sq, sqRefB, Cz, r, A, cns, F0,
        x0=x0, lam0=lam0, **kw)
    W, v = jax.vmap(lambda a, b_, c, z, u, sr: _nmpc_condense_assemble(
        a, b_, c, z, u, jnp.asarray(sq), sr, jnp.asarray(Cz), cols, mI))(
            jz, ju, cv, zeta, up, jnp.asarray(sqRefB))
    b = cns[None] - up @ F0.T
    x_f, _, ok_f, _ = solve_qp_factored_batched(
        W, v, jnp.asarray(r), jnp.asarray(A), jnp.asarray(b), x0=x0,
        iters=16, band=0, lam0=lam0, interpret=True)
    okm2 = np.asarray(ok_k) & np.asarray(ok_f)
    assert okm2.mean() > 0.9
    dx = np.abs(np.asarray(x_k) - np.asarray(x_f))[okm2]
    assert np.median(dx) < 5e-5
    assert dx.max() < 5e-3


def test_kernel_bilinear_lift_fused_matches_factored():
    """The LIFT-fused bilinear kernel (poly monomials + PCA-folded assembly
    + IPM in VMEM, round 4) must match lifting/assembling in XLA and
    solving on the factored kernel, lane-for-lane, at the blocked
    shipping shape."""
    from koopman_realizations_tpu.config import MpcConfig
    from koopman_realizations_tpu.control.kmpc import (
        input_constraint_rows,
        move_blocking,
    )
    from koopman_realizations_tpu.ops.observables import poly_parent_tables
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_bilinear_lifted_batched,
        solve_qp_factored_batched,
    )
    from koopman_realizations_tpu.ops.qp import _bilin_lift_assemble

    mI, Np, blocks = 3, 10, (1, 1, 2, 5)
    nz, nproj, deg = 6, 2, 3
    cfg = MpcConfig(horizon=Np, input_bounds=(-2.7, 2.7),
                    input_slopeConst=1e-1, input_blocks=blocks)

    class S:
        u_factor = np.ones(mI)

        def u_down(self, u):
            return np.asarray(u)

    F, cF = input_constraint_rows(cfg, mI, Np, S())
    _, _, Fr, F0r, cr, _ = move_blocking(blocks, mI, Np, F, cF)
    n = Fr.shape[1]
    mc = Fr.shape[0]
    p = (Np + 1) * nproj
    _, tab = poly_parent_tables(nz, deg)
    tables = tuple((tuple(int(x) for x in a), tuple(int(x) for x in b_))
                   for a, b_ in tab)
    n_mono = sum(len(a) for a, _ in tables)

    B = 96
    rng = np.random.default_rng(17)
    mk = lambda *sh: (0.2 * rng.standard_normal(sh)).astype(np.float32)
    Gz, Gm, Gb = mk(p * n, nz), mk(p * n, n_mono), mk(p * n)
    Hz, Hm, Hb = mk(mI * p, nz), mk(mI * p, n_mono), mk(mI * p)
    Pz, Pm, Pb = mk(p, nz), mk(p, n_mono), mk(p)
    sqYr = mk(p)
    r = (np.abs(rng.normal(size=n)) * 0.05).astype(np.float32)
    zeta = (0.4 * rng.standard_normal((B, nz))).astype(np.float32)
    up = mk(B, mI)
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    W, v = jax.vmap(lambda zi, ui: _bilin_lift_assemble(
        zi, ui, jnp.asarray(sqYr), jnp.asarray(Gz), jnp.asarray(Gm),
        jnp.asarray(Gb), jnp.asarray(Hz), jnp.asarray(Hm), jnp.asarray(Hb),
        jnp.asarray(Pz), jnp.asarray(Pm), jnp.asarray(Pb), tables, p))(
            jnp.asarray(zeta), jnp.asarray(up))
    b = cr[None].astype(np.float32) - up @ F0r.T.astype(np.float32)
    x_f, _, ok_f, _ = solve_qp_factored_batched(
        W, v, jnp.asarray(r), jnp.asarray(Fr, jnp.float32), jnp.asarray(b),
        x0=x0, iters=16, band=mI, lam0=lam0, interpret=True)
    x_l, _, ok_l, _ = solve_qp_bilinear_lifted_batched(
        jnp.asarray(zeta), jnp.asarray(up), jnp.asarray(sqYr),
        Gz, Gm, Gb, Hz, Hm, Hb, Pz, Pm, Pb, jnp.asarray(r),
        jnp.asarray(Fr, jnp.float32), jnp.asarray(cr, jnp.float32),
        jnp.asarray(F0r, jnp.float32), x0=x0, iters=16, tables=tables,
        band=mI, lam0=lam0, interpret=True)
    okm = np.asarray(ok_f) & np.asarray(ok_l)
    assert okm.mean() > 0.9
    dx = np.abs(np.asarray(x_l) - np.asarray(x_f))[okm]
    assert np.median(dx) < 5e-5
    assert dx.max() < 5e-3
