"""Feature-sharded PCA: dimension reduction for huge dictionaries.

SURVEY 2.6 maps the reference's "TP-like" axis to sharding the lifted
dimension N across chips for large dictionaries (full fourier bases grow as
(1+2d)^nzeta).  This module computes the top-k principal components of a
lifted snapshot matrix X (K, N) with the FEATURE axis sharded over the
``model`` mesh axis, via blocked subspace iteration:

    W   = X V            -- per-device partial X_d V_d, psum over 'model'
    V'  = X^T W          -- local feature rows, no communication
    V   = V' (V'^T V')^{-1/2}  -- k x k Gram psum + replicated Cholesky

Only (K, k) activations and (k, k) Grams cross the interconnect; the (K, N)
feature matrix and the (N, k) components stay sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P




def _orthonormalize(V_local):
    """Column-orthonormalize a row-sharded matrix via its psum'd Gram."""
    G = jax.lax.psum(V_local.T @ V_local, "model")        # (k, k) replicated
    L = jnp.linalg.cholesky(G + 1e-12 * jnp.eye(G.shape[0], dtype=G.dtype))
    return jax.scipy.linalg.solve_triangular(L, V_local.T, lower=True).T


def pca_feature_sharded(X, k: int, mesh, iters: int = 30, seed: int = 0):
    """Top-k principal components of centered X (K, N), N sharded.

    Returns (components (N, k) gathered to host, explained_frac (k,)).
    The ``data`` axis of the mesh is unused here (X's snapshot axis is
    replicated); combine with snapshot sharding for the general case.
    """
    X = np.asarray(X, np.float64 if jax.config.jax_enable_x64 else np.float32)
    X = X - X.mean(axis=0, keepdims=True)
    ndev = mesh.shape["model"]
    N0 = X.shape[1]
    padc = (-N0) % ndev
    # zero-pad the feature axis (repeating columns would perturb the
    # covariance and rotate the recovered subspace)
    Xp = np.concatenate([X, np.zeros((X.shape[0], padc), X.dtype)], axis=1)
    rng = np.random.default_rng(seed)
    V0 = rng.standard_normal((Xp.shape[1], k)).astype(X.dtype)

    def local(X_d, V_d):
        def body(V_loc, _):
            W = jax.lax.psum(X_d @ V_loc, "model")         # (K, k)
            V_new = X_d.T @ W                              # local rows
            return _orthonormalize(V_new), None

        V_loc, _ = jax.lax.scan(body, _orthonormalize(V_d), None, length=iters)
        # eigenvalue estimates for explained variance
        W = jax.lax.psum(X_d @ V_loc, "model")
        lam = jnp.sum(W * W, axis=0)
        total = jax.lax.psum(jnp.sum(X_d * X_d), "model")
        return V_loc, lam / total

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "model"), P("model", None)),
                   out_specs=(P("model", None), P()), check_vma=False)
    V, expl = jax.jit(fn)(jnp.asarray(Xp), jnp.asarray(V0))
    return np.asarray(V)[:N0], np.asarray(expl)
