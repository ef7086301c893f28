"""Microbench: Pallas IPM kernel lane-tile size sweep on TPU.

Times solve_qp_shared_batched at bench-representative shapes
(n=27, mc=108, B=8192, iters=8) for LANE_TILE in {128, 256, 512}.
Run on the TPU (one claim per process).
"""

# NOTE (timing trap): this script times with jax.block_until_ready walls,
# which does NOT reliably sync Pallas programs over the axon tunnel --
# its absolute numbers can read fast.  The 128-vs-256-vs-512 ranking was
# later re-established with the sanctioned slope-fetch method in
# scripts/ipm_slope_bench.py; use that script for any new tile decision.


import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    B, n, mc, iters = 8192, 27, 108, 8
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    A = rng.normal(size=(mc, n)).astype(np.float32)
    b = (np.abs(rng.normal(size=(B, mc))) + 0.5).astype(np.float32)
    P, q, A, b = map(jnp.asarray, (P, q, A, b))
    x0 = jnp.zeros((B, n), jnp.float32)

    from koopman_realizations_tpu.ops.pallas.qp_ipm import solve_qp_shared_batched

    for tile in (128, 256, 512):
        try:
            f = jax.jit(lambda P, q, A, b, x0, t=tile: solve_qp_shared_batched(
                P, q, A, b, x0=x0, iters=iters, tile=t))
            out = jax.block_until_ready(f(P, q, A, b, x0))
            walls = []
            for _ in range(20):
                t0 = time.perf_counter()
                jax.block_until_ready(f(P, q, A, b, x0))
                walls.append(time.perf_counter() - t0)
            ok = float(np.asarray(out[2]).mean())
            print(f"tile={tile}: median {np.median(walls)*1e3:.3f} ms  "
                  f"min {min(walls)*1e3:.3f} ms  ok_frac {ok:.4f}", flush=True)
        except Exception as e:
            print(f"tile={tile}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
