"""Pallas kernels, exercised in interpreter mode on the CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from koopman_realizations_tpu.ops.pallas.batch_chol import solve_spd_pallas


def _spd_batch(rng, B, n):
    G = rng.standard_normal((B, n, n))
    return G @ np.swapaxes(G, 1, 2) + n * np.eye(n)


def test_solve_spd_pallas_matches_numpy(rng):
    B, n = 64, 27          # deliberately not a multiple of the 128-lane tile
    M = _spd_batch(rng, B, n)
    b = rng.standard_normal((B, n))
    x = np.asarray(solve_spd_pallas(jnp.asarray(M, jnp.float32),
                                    jnp.asarray(b, jnp.float32),
                                    interpret=True))
    ref = np.stack([np.linalg.solve(Mi, bi) for Mi, bi in zip(M, b)])
    np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)  # f32 kernel


def test_solve_spd_pallas_large_tile(rng):
    B, n = 256, 8
    M = _spd_batch(rng, B, n)
    b = rng.standard_normal((B, n))
    x = np.asarray(solve_spd_pallas(jnp.asarray(M), jnp.asarray(b),
                                    interpret=True))
    ref = np.stack([np.linalg.solve(Mi, bi) for Mi, bi in zip(M, b)])
    np.testing.assert_allclose(x, ref, rtol=1e-6, atol=1e-8)
