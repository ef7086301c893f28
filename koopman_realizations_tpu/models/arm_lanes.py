"""Lane-structured (struct-of-arrays) batched arm plant step.

Why this exists: under plain ``vmap`` every intermediate of the per-lane
dynamics carries the tiny physics dims in the TRAILING axes.  TPU tiles the
last two dims of every array onto (8, 128) vector registers, so a
``(B, 3, 3)`` mass-matrix op pads 3x3 -> 8x128 (>100x wasted VPU work), a
``(B, 6)`` state op pads 6 -> 128 lanes (21x), and the autodiff Lagrangian
(``jacfwd`` over the mass matrix) materializes a ``(B, N, N, N)`` tensor per
RHS eval.  The plant step was the largest phase of the closed-loop MPC step
(~3.3 ms of ~6.9 ms at B=8192) almost entirely due to this padding.

Here every scalar component is its OWN flat ``(B,)`` array (struct of
arrays): each op is a perfectly lane-tiled vector op and XLA fuses the whole
chain.  The Euler-Lagrange terms use the closed-form planar-chain reduction
instead of autodiff:

    th = J a (J lower-triangular ones),  thd = J ad
    M_th[p][q] = cf[p][q] cos(th_p - th_q) + i delta_pq,
                 cf[p][q] = l^2 (m G[p][q] + w1)
    Dq = J^T M_th J                                  (suffix sums)
    (Dq_dt ad - dKE/da)[k] = sum_{p>=k, q} S[p][q] thd_q^2      (Coriolis)
                 S[p][q] = cf[p][q] sin(th_p - th_q)
    dPE/da[k] = g l sum_{j>=k} (m b[j] + w1) sin(th_j - w2) + k_spring a_k

(the Coriolis line follows from S antisymmetric: Dq_dt ad = J^T dM_th/dt thd
with dM_th[p][q]/dt = -S[p][q](thd_p - thd_q), and dKE/da_k =
-sum_{p>=k,q} S[p][q] thd_p thd_q; their difference telescopes to
sum S thd_q^2).  Cross-validated against the autodiff path
(``models.arm.Arm.rhs``, itself validated vs the reference's symbolic EOM,
``Arm.set_EOM:111-222``) in ``tests/test_arm_lanes.py``.

The SDIRK2 here mirrors ``ops.integrators.sdirk2`` (same gamma, stage
structure, modified-Newton semantics for jac_mode 'step'/'substep'); the
stage Jacobian comes from n forward-mode ``jax.jvp`` basis passes through
the closed-form RHS -- still tuples of (B,) arrays throughout.

Routed automatically: ``Arm.simulate_Ts`` is a ``custom_vmap`` -- unbatched
calls take the per-lane autodiff path, vmapped calls (the closed-loop
scenario batch) land here with the whole batch at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ------------------------------------------------------------- small solvers


def chol_soa(M, n):
    """Cholesky of an SPD matrix given as list-of-lists of (B,) entries."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        for i in range(j + 1, n):
            s = M[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / d
    return L


def chol_solve_soa(L, rhs, n):
    """Solve L L^T x = rhs; rhs and result are lists of (B,) entries."""
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for j in range(i):
            s = s - L[i][j] * y[j]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for j in range(i + 1, n):
            s = s - L[j][i] * x[j]
        x[i] = s / L[i][i]
    return x


# ------------------------------------------------------------------ dynamics


def rhs_soa(cfg, G, bvec, a, ad, u, w1, w2):
    """Joint accelerations, all components (B,) arrays.

    a, ad: length-N lists; u: length-Nmods list; w1/w2: (B,) load mass and
    gravity tilt.  G, bvec: the host numpy inertia/lever coefficient tables
    from ``Arm.__init__``.  Returns the length-N accel list.
    """
    N = cfg.Nlinks
    l2 = cfg.l ** 2
    i_rot = cfg.i

    th, thd = [], []
    run_a = None
    run_d = None
    for i in range(N):
        run_a = a[i] if run_a is None else run_a + a[i]
        run_d = ad[i] if run_d is None else run_d + ad[i]
        th.append(run_a)
        thd.append(run_d)

    # pairwise trig, computed once per unordered pair
    cos_pq = [[None] * N for _ in range(N)]
    sin_pq = [[None] * N for _ in range(N)]
    for p in range(N):
        cos_pq[p][p] = None                     # cos(0)=1 handled inline
        for q in range(p):
            dth = th[p] - th[q]
            cos_pq[p][q] = cos_pq[q][p] = jnp.cos(dth)
            s = jnp.sin(dth)
            sin_pq[p][q] = s
            sin_pq[q][p] = -s

    def cf(p, q):
        return l2 * (cfg.m * float(G[p, q])) + l2 * w1

    # M_th entries (symmetric)
    M_th = [[None] * N for _ in range(N)]
    for p in range(N):
        M_th[p][p] = cf(p, p) + i_rot
        for q in range(p):
            M_th[p][q] = M_th[q][p] = cf(p, q) * cos_pq[p][q]

    # Dq = J^T M_th J via double suffix sums
    T1 = [[None] * N for _ in range(N)]         # T1[p][j] = sum_{q>=j} M_th
    for p in range(N):
        run = None
        for j in reversed(range(N)):
            run = M_th[p][j] if run is None else run + M_th[p][j]
            T1[p][j] = run
    Dq = [[None] * N for _ in range(N)]         # Dq[i][j] = sum_{p>=i} T1
    for j in range(N):
        run = None
        for i in reversed(range(N)):
            run = T1[i][j] if run is None else run + T1[i][j]
            Dq[i][j] = run

    # Coriolis: C[k] = sum_{p>=k} sum_q S[p][q] thd_q^2
    thd2 = [t * t for t in thd]
    s_row = []
    for p in range(N):
        acc = None
        for q in range(N):
            if q == p:
                continue
            term = cf(p, q) * sin_pq[p][q] * thd2[q]
            acc = term if acc is None else acc + term
        s_row.append(acc if acc is not None else jnp.zeros_like(th[0]))
    C = [None] * N
    run = None
    for k in reversed(range(N)):
        run = s_row[k] if run is None else run + s_row[k]
        C[k] = run

    # gravity + springs: dPE/da[k]
    grav = []
    for j in range(N):
        lever = cfg.m * float(bvec[j]) + w1
        grav.append(lever * jnp.sin(th[j] - w2))
    dPE = [None] * N
    run = None
    for k in reversed(range(N)):
        run = grav[k] if run is None else run + grav[k]
        dPE[k] = cfg.g * cfg.l * run + cfg.k * a[k]

    # input torque tau = -ku (kron(u, 1_nlinks) - a)  (Arm.m:211-213)
    rhs = []
    for k in range(N):
        tau_k = -cfg.ku * (u[k // cfg.nlinks] - a[k])
        non_inert = C[k] + dPE[k] + cfg.d * ad[k] + tau_k
        rhs.append(-non_inert)

    L = chol_soa(Dq, N)
    return chol_solve_soa(L, rhs, N)


def make_rhs_tuple(cfg, G, bvec, us, w1, w2):
    """RHS over the state tuple xs = (a_0..a_{N-1}, ad_0..ad_{N-1})."""
    N = cfg.Nlinks

    def f(*xs):
        a = list(xs[:N])
        ad = list(xs[N:])
        addot = rhs_soa(cfg, G, bvec, a, ad, us, w1, w2)
        return tuple(ad) + tuple(addot)

    return f


# ---------------------------------------------------------------- integrator


def sdirk2_soa(cfg, G, bvec, X, U, W, Ts, substeps, newton_iters, jac_mode):
    """Batched SDIRK2 step over one control period; X (B, nx) -> (B, nx).

    Thin layout adapter over ``sdirk2_rows`` (the tuple-level integrator
    shared with the step-fused Pallas kernel, ``ops.pallas.arm_step``).
    """
    n = 2 * cfg.Nlinks
    xs0 = tuple(X[:, i] for i in range(n))
    us = [U[:, j] for j in range(cfg.Nmods)]
    xs = sdirk2_rows(cfg, G, bvec, xs0, us, W[:, 0], W[:, 1], Ts, substeps,
                     newton_iters, jac_mode)
    return jnp.stack(xs, axis=1)


def sdirk2_rows(cfg, G, bvec, xs0, us, w1, w2, Ts, substeps, newton_iters,
                jac_mode, unroll: bool = False):
    """SDIRK2 over one control period on TUPLES of same-shape arrays.

    Layout-agnostic core: components may be (B,) struct-of-arrays columns
    (the XLA ``sdirk2_soa`` path) or (T,) lanes-minor rows inside a Pallas
    kernel (``ops.pallas.arm_step`` -- pass ``unroll=True`` there: python
    loops instead of ``lax.scan`` keep Mosaic's lowering simple).  Mirrors
    ``ops.integrators.sdirk2`` exactly (gamma = 1 - 1/sqrt(2), modified
    Newton with a normal-equation factorization of the iteration matrix,
    jac_mode 'step' = one factor per Ts / 'substep' = one per substep).
    """
    N = cfg.Nlinks
    n = 2 * N
    # gamma pinned to the component dtype: a weak/64-bit scalar would
    # promote every stage op (and break the f32-only Pallas stores of the
    # step-fused kernel under x64 test configs)
    gamma = 1.0 - 1.0 / jnp.sqrt(jnp.asarray(2.0, xs0[0].dtype))
    dt = Ts / substeps

    f = make_rhs_tuple(cfg, G, bvec, list(us), w1, w2)

    zeros = jnp.zeros_like(xs0[0])
    ones = jnp.ones_like(xs0[0])

    def factor(xs):
        # J columns via n forward-mode basis passes (per-lane Jacobian)
        cols = []
        for i in range(n):
            tang = tuple(ones if j == i else zeros for j in range(n))
            _, jc = jax.jvp(f, xs, tang)
            cols.append(jc)                      # d f / d x_i, tuple of (B,)
        # M = I - gamma dt J ; entries M[r][c]
        M = [[(1.0 if r == c else 0.0) - gamma * dt * cols[c][r]
              for c in range(n)] for r in range(n)]
        # normal equations (matches solve path of ops.integrators.sdirk2)
        Nm = [[None] * n for _ in range(n)]
        for r in range(n):
            for c in range(r + 1):
                s = None
                for k in range(n):
                    t = M[k][r] * M[k][c]
                    s = t if s is None else s + t
                Nm[r][c] = Nm[c][r] = s
        return M, chol_soa(Nm, n)

    def solve_normal(M, L, r):
        Mtr = []
        for i in range(n):
            s = None
            for k in range(n):
                t = M[k][i] * r[k]
                s = t if s is None else s + t
            Mtr.append(s)
        return chol_solve_soa(L, Mtr, n)

    def substep(xs, M, L):
        def stage(x_base, k_init):
            def newton(k, _):
                xk = tuple(x_base[i] + gamma * dt * k[i] for i in range(n))
                fx = f(*xk)
                res = [k[i] - fx[i] for i in range(n)]
                delta = solve_normal(M, L, res)
                return tuple(k[i] - delta[i] for i in range(n)), None

            if unroll:
                k = k_init
                for _ in range(newton_iters):
                    k, _ = newton(k, None)
            else:
                k, _ = jax.lax.scan(newton, k_init, None,
                                    length=newton_iters)
            return k

        k1 = stage(xs, f(*xs))
        k2 = stage(tuple(xs[i] + (1.0 - gamma) * dt * k1[i]
                         for i in range(n)), k1)
        return tuple(xs[i] + dt * ((1.0 - gamma) * k1[i] + gamma * k2[i])
                     for i in range(n))

    if jac_mode == "step":
        M0, L0 = factor(xs0)

        def body(xs, _):
            return substep(xs, M0, L0), None
    else:                                        # 'substep'

        def body(xs, _):
            M, L = factor(xs)
            return substep(xs, M, L), None

    if unroll:
        xs = xs0
        for _ in range(substeps):
            xs, _ = body(xs, None)
    else:
        xs, _ = jax.lax.scan(body, xs0, None, length=substeps)
    return xs
