"""L1-constrained Koopman regression (the reference's LASSO QP).

``Ksysid.solve_KoopmanQP:1095-1176`` solves

    min ||Px K - Py||_F^2   s.t.  ||vec(K)||_1 <= t,
    (+ delay constraints pinning shift-structure entries of K to 1)

by splitting vec(K) into +/- parts and calling ``quadprog`` on a dense QP in
2(N+m)^2 variables (15k+ for the paper config).  On TPU the same problem is
solved directly as projected accelerated gradient (FISTA) on the matrix
variable: gradient = 2 (PxTPx K - PxTPy) (one N x N matmul per iteration,
MXU-friendly), projection = Duchi L1-ball projection (sort + prefix sum).
Semantics match the reference formulation; the method does not.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def project_l1_ball(v, t):
    """Euclidean projection of v onto {x : ||x||_1 <= t} (Duchi et al.)."""
    v = jnp.asarray(v)
    abs_v = jnp.abs(v)
    inside = jnp.sum(abs_v) <= t

    u = jnp.sort(abs_v)[::-1]
    css = jnp.cumsum(u)
    k = jnp.arange(1, v.shape[0] + 1, dtype=v.dtype)
    cond = u * k > (css - t)
    rho = jnp.max(jnp.where(cond, jnp.arange(v.shape[0]), -1))
    theta = (css[rho] - t) / (rho + 1.0)
    proj = jnp.sign(v) * jnp.maximum(abs_v - theta, 0.0)
    return jnp.where(inside, v, proj)


@partial(jax.jit, static_argnames=("iters",))
def lasso_constrained_lstsq(Px, Py, t, pin_mask=None, pin_value=1.0,
                            iters: int = 2000):
    """FISTA for min ||Px K - Py||_F^2 s.t. ||vec(K)||_1 <= t.

    pin_mask: optional boolean (Nm, Nm) matrix of entries held at
    ``pin_value`` (the reference's delay constraints,
    ``Ksysid.m:1139-1164``); their absolute values consume L1 budget.
    """
    Px = jnp.asarray(Px)
    Py = jnp.asarray(Py)
    G = Px.T @ Px
    H = Px.T @ Py
    nm = G.shape[0]

    # Lipschitz constant of the gradient: 2 * lambda_max(G), via power iter.
    def pw(v, _):
        v = G @ v
        return v / jnp.linalg.norm(v), None
    v0 = jnp.ones((nm,), G.dtype) / jnp.sqrt(nm)
    v, _ = jax.lax.scan(pw, v0, None, length=30)
    L = 2.0 * jnp.maximum(v @ (G @ v), 1e-12)

    if pin_mask is not None:
        pin_mask = jnp.asarray(pin_mask)
        budget = t - pin_value * jnp.sum(pin_mask)
    else:
        budget = t

    def proj(K):
        if pin_mask is not None:
            free = jnp.where(pin_mask, 0.0, K)
            free = project_l1_ball(free.reshape(-1), budget).reshape(K.shape)
            return jnp.where(pin_mask, pin_value, free)
        return project_l1_ball(K.reshape(-1), t).reshape(K.shape)

    K0 = proj(jnp.zeros_like(H))

    def body(carry, _):
        K_prev, Z, tk = carry
        grad = 2.0 * (G @ Z - H)
        K_new = proj(Z - grad / L)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk ** 2))
        Z_new = K_new + ((tk - 1.0) / t_new) * (K_new - K_prev)
        return (K_new, Z_new, t_new), None

    (K, _, _), _ = jax.lax.scan(body, (K0, K0, jnp.asarray(1.0, G.dtype)), None,
                                length=iters)
    return K


def lasso_constrained_lstsq_f64(Px, Py, t, pin_mask=None, pin_value=1.0,
                                iters: int = 2000):
    """Host numpy float64 mirror of ``lasso_constrained_lstsq``.

    The Koopman regression must run in float64 (f32 visibly degrades
    models); with x64 off -- the default TPU session -- the JAX FISTA above
    silently runs f32, so Ksysid routes through this host implementation,
    exactly like ``Ksysid._lstsq64`` does for the plain least squares.
    Same algorithm step for step; parity-tested against the JAX version
    under the x64 test env.
    """
    import numpy as np

    def proj_ball(v, tt):
        av = np.abs(v)
        if av.sum() <= tt:
            return v
        u = np.sort(av)[::-1]
        css = np.cumsum(u)
        k = np.arange(1, v.shape[0] + 1, dtype=v.dtype)
        cond = u * k > (css - tt)
        rho = np.max(np.where(cond, np.arange(v.shape[0]), -1))
        theta = (css[rho] - tt) / (rho + 1.0)
        return np.sign(v) * np.maximum(av - theta, 0.0)

    Px = np.asarray(Px, np.float64)
    Py = np.asarray(Py, np.float64)
    G = Px.T @ Px
    H = Px.T @ Py
    nm = G.shape[0]
    v = np.ones((nm,)) / np.sqrt(nm)
    for _ in range(30):
        v = G @ v
        v = v / np.linalg.norm(v)
    L = 2.0 * max(float(v @ (G @ v)), 1e-12)

    if pin_mask is not None:
        pin_mask = np.asarray(pin_mask)
        budget = float(t) - pin_value * float(pin_mask.sum())
    else:
        budget = float(t)

    def proj(K):
        if pin_mask is not None:
            free = np.where(pin_mask, 0.0, K)
            free = proj_ball(free.reshape(-1), budget).reshape(K.shape)
            return np.where(pin_mask, pin_value, free)
        return proj_ball(K.reshape(-1), float(t)).reshape(K.shape)

    K = proj(np.zeros_like(H))
    Z, tk = K, 1.0
    for _ in range(iters):
        grad = 2.0 * (G @ Z - H)
        K_new = proj(Z - grad / L)
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * tk ** 2))
        Z = K_new + ((tk - 1.0) / t_new) * (K_new - K)
        K, tk = K_new, t_new
    return K
