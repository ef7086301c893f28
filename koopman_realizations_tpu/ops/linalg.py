"""Dense linear-algebra helpers: PCA, matrix powers, matrix log.

Replaces the closed-source MATLAB kernels the reference calls:
``pca`` (``Ksysid.m:1498``), ``logm`` (``Ksysid.m:1187,1309``), and the
``A^i`` power loops in the MPC prediction-matrix assembly
(``Kmpc.m:168-190``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pca_explained(X: np.ndarray):
    """Principal components + explained-variance percentages.

    Matches MATLAB ``pca``'s convention (centered data, SVD, loadings as
    columns).  Host-side numpy: runs once during training.
    Returns (coeffs [d, d], explained [d]).
    """
    X = np.asarray(X, np.float64)
    Xc = X - X.mean(axis=0, keepdims=True)
    # economy SVD of the centered data
    _, s, Vt = np.linalg.svd(Xc, full_matrices=False)
    var = s ** 2
    explained = 100.0 * var / var.sum()
    return Vt.T, explained


def pcs_for_explained(X: np.ndarray, threshold: float = 99.0) -> np.ndarray:
    """First principal components explaining > threshold % of variance.

    Mirrors ``Ksysid.get_econ_observables:1498-1507`` (while-loop semantics:
    smallest k with cumulative explained >= threshold).
    """
    coeffs, explained = pca_explained(X)
    cum = np.cumsum(explained)
    k = int(np.searchsorted(cum, threshold) + 1)
    k = min(k, coeffs.shape[1])
    return coeffs[:, :k]


def matrix_powers(A, p: int):
    """[A^0, A^1, ..., A^p] stacked, via scan (jit-friendly).

    Used for the MPC prediction matrices; p is the horizon (<= ~20), N is
    small, so a sequential scan of matmuls is cheap and exact.
    """
    A = jnp.asarray(A)
    eye = jnp.eye(A.shape[-1], dtype=A.dtype)

    def step(prev, _):
        nxt = prev @ A
        return nxt, nxt

    _, rest = jax.lax.scan(step, eye, None, length=p)
    return jnp.concatenate([eye[None], rest], axis=0)


def logm_host(K: np.ndarray) -> np.ndarray:
    """Real matrix logarithm on the host (scipy Schur-based).

    The continuous-time model path (``Ksysid.m:1186-1190``) computes
    ``logm(K' + 1e-12 I)/Ts`` once at training time; there is no jit-time
    use, so a host call is the right tool (jax has no logm primitive).
    """
    import scipy.linalg

    return np.real(scipy.linalg.logm(np.asarray(K, np.float64)))
