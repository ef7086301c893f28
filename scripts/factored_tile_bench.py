"""Lane-tile A/B for the FACTORED IPM kernel at the shipping bench shape.

Slope-fetch timing (chained dependent solves + one scalar host fetch, the
only axon-safe method for Pallas programs), all variants jitted in ONE
process.  Shapes: n=27 reduced decision, p=22 residual rows, box+slope
stack (band offset 3), qp_iters from QP_ITERS (default 2, the shipping
config), dual warm start on.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/factored_tile_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def box_slope_A(n, off):
    rows = []
    for i in range(n):
        e = np.zeros(n, np.float32); e[i] = 1.0
        rows += [e, -e]
    for i in range(n - off):
        e = np.zeros(n, np.float32); e[i + off] = 1.0; e[i] = -1.0
        rows += [e, -e]
    return np.stack(rows)


def blocked_A(blocks=(1, 1, 2, 5), m=3, Np=10):
    """The REAL move-blocked reduced constraint stack of the shipping
    config (12 vars, 48 rows, band offset m) via the kmpc builders."""
    from koopman_realizations_tpu.config import MpcConfig
    from koopman_realizations_tpu.control.kmpc import (
        input_constraint_rows,
        move_blocking,
    )

    class S:
        u_factor = np.ones(m)

        def u_down(self, u):
            return np.asarray(u)

    cfg = MpcConfig(horizon=Np, input_bounds=(-2.7, 2.7),
                    input_slopeConst=1e-1, input_blocks=blocks)
    F, cF = input_constraint_rows(cfg, m, Np, S())
    Tb, Sel, Fr, F0, cr, kept = move_blocking(blocks, m, Np, F, cF)
    return Fr.astype(np.float32)


def main():
    from koopman_realizations_tpu.ops.pallas.qp_ipm import (
        solve_qp_factored_batched,
    )

    rng = np.random.default_rng(0)
    B = int(os.environ.get("BENCH_BATCH", "16384"))
    iters = int(os.environ.get("QP_ITERS", "2"))
    if os.environ.get("BLOCKED"):
        # shipping round-3+ shape: blocked (1,1,2,5) -> n=12 vars, mc=48
        # rows (real reduced stack), band offset m=3, p=22 residual rows
        n, p, band = 12, 22, 3
        A = blocked_A()
        from koopman_realizations_tpu.ops.qp import band_offset_of
        assert band_offset_of(A) == band, band_offset_of(A)
    else:
        n, p, band = 27, 22, 3
        A = box_slope_A(n, band)
    W = rng.normal(size=(B, p, n)).astype(np.float32)
    v = rng.normal(size=(B, p)).astype(np.float32)
    rd = (0.01 * np.ones(n)).astype(np.float32)
    mc = A.shape[0]
    b = (np.abs(rng.normal(size=(B, mc))) + 0.5).astype(np.float32)
    W, v, rd, A, b = map(jnp.asarray, (W, v, rd, A, b))
    x0 = jnp.zeros((B, n), jnp.float32)
    lam0 = jnp.ones((B, mc), jnp.float32)

    def chained(k, tile):
        @jax.jit
        def f(W, v, rd, A, b, x0, lam0):
            def body(carry, _):
                x, lam = carry
                xn, lamn, ok, gap = solve_qp_factored_batched(
                    W, v, rd, A, b, x0=0.99 * x, iters=iters, band=band,
                    lam0=lam, tile=tile)
                return (xn, lamn), ()
            (x, lam), _ = jax.lax.scan(body, (x0, lam0), None, length=k)
            return jnp.sum(x[0]) + 0.0
        return f

    ks = (2, 16)
    tiles = tuple(int(t) for t in os.environ.get(
        "TILES", "128,256,384,512").split(","))
    for tile in tiles:
        try:
            walls = {}
            for k in ks:
                f = chained(k, tile)
                float(f(W, v, rd, A, b, x0, lam0))
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(f(W, v, rd, A, b, x0, lam0))
                    ts.append(time.perf_counter() - t0)
                walls[k] = min(ts)
            slope = (walls[ks[1]] - walls[ks[0]]) / (ks[1] - ks[0])
            print(f"tile={tile}: {slope*1e3:.3f} ms/solve", flush=True)
        except Exception as e:
            print(f"tile={tile}: FAILED ({type(e).__name__})", flush=True)


if __name__ == "__main__":
    main()
