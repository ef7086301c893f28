"""Pallas TPU kernel: batched small-SPD solve in lanes-minor layout.

The closed loop's hottest op is solving thousands of small (n ~ 20-40) SPD
Newton systems per scan step.  ``ops.batch_linalg`` unrolls the algorithm in
pure JAX; this kernel goes one step further and fixes the layout: matrices
live as (n, n, TILE) blocks with the BATCH as the 128-wide lane dimension,
so every factorization step is a perfectly-aligned (n, 128) VPU op with all
intermediates held in VMEM (no HBM round-trips between the n unrolled
steps).

API: ``solve_spd_pallas(M, b)`` with M (B, n, n), b (B, n) -> x (B, n).
Use ``interpret=True`` on CPU (tests); on TPU the kernel compiles via Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 128


def _chol_solve_kernel(n: int, M_ref, b_ref, x_ref):
    """One batch tile: factor + solve, fully unrolled over n."""
    M = M_ref[...]                     # (n, n, TILE) lanes-minor
    b = b_ref[...]                     # (n, TILE)

    cols = []
    for j in range(n):
        # exact sqrt + divide, NOT lax.rsqrt: the approximate rsqrt
        # destabilizes isolated closed-loop lanes (same rule as qp_ipm)
        d = 1.0 / jnp.sqrt(M[j, j, :])             # (TILE,)
        col = M[:, j, :] * d[None, :]              # (n, TILE)
        cols.append(col)
        M = M - col[:, None, :] * col[None, :, :]  # rank-1 downdate
    L = jnp.stack(cols, axis=1)                    # (n, n, TILE): L[i, k]
    # lower-triangular mask built in-kernel (captured constants are not
    # allowed in pallas kernels)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    colx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    L = L * (row >= colx).astype(L.dtype)[..., None]

    # forward substitution L y = b: explicit partial sums (functional row
    # updates lower to `scatter`, which Mosaic does not implement; a Python
    # list of lane-rows keeps everything as plain VPU adds in VMEM)
    ys = []
    for i in range(n):
        acc = b[i, :]
        for k in range(i):
            acc = acc - L[i, k, :] * ys[k]
        ys.append(acc / L[i, i, :])
    # backward substitution L^T x = y
    xs = [None] * n
    for i in reversed(range(n)):
        acc = ys[i]
        for k in range(i + 1, n):
            acc = acc - L[k, i, :] * xs[k]
        xs[i] = acc / L[i, i, :]
    x_ref[...] = jnp.stack(xs, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def solve_spd_pallas(M, b, interpret: bool = False):
    """x = M^-1 b for a batch of SPD systems; M (B, n, n), b (B, n)."""
    M = jnp.asarray(M)
    b = jnp.asarray(b)
    B, n, _ = M.shape
    pad = (-B) % LANE_TILE
    if pad:
        eye = jnp.tile(jnp.eye(n, dtype=M.dtype)[None], (pad, 1, 1))
        M = jnp.concatenate([M, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)], axis=0)
    Bp = M.shape[0]

    Mt = M.transpose(1, 2, 0)          # (n, n, Bp) lanes-minor
    bt = b.T                           # (n, Bp)

    out = pl.pallas_call(
        functools.partial(_chol_solve_kernel, n),
        grid=(Bp // LANE_TILE,),
        in_specs=[
            pl.BlockSpec((n, n, LANE_TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANE_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, LANE_TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), M.dtype),
        interpret=interpret,
    )(Mt, bt)
    return out.T[:B]
