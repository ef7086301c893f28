"""Slope-fetch microbench for the Pallas IPM kernel (axon-safe timing).

BUR does not reliably sync Pallas programs over the axon tunnel (CLAUDE.md
timing trap), so this chains k dependent solves inside one jitted program
(output x feeds the next warm start) and times a HOST FETCH of one scalar.
Per-solve cost = slope of wall vs k.  Run on the TPU, one process.

For kernel-variant A/B, jit BOTH variants in this one process and
alternate reps (tunnel scheduling drifts +-10% between processes, which
swamps one-shot comparisons).  Finding so far: shrinking-slice Cholesky /
triangular solves are NOT faster than full-width (see _chol_lanes doc).
"""

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

    def chained(k):
        @jax.jit
        def f(P, q, A, b, x0):
            def body(x, _):
                xn, lam, ok, gap = solve_qp_shared_batched(
                    P, q, A, b, x0=0.99 * x, iters=iters)
                return xn, ()
            x, _ = jax.lax.scan(body, x0, None, length=k)
            return jnp.sum(x[0]) + 0.0
            # tiny output: fetch forces completion of the whole chain
        return f

    # correctness spot check vs single solve
    xs, lam, ok, gap = jax.jit(
        lambda: solve_qp_shared_batched(P, q, A, b, x0=x0, iters=iters))()
    print(f"single solve ok_frac={float(np.asarray(ok).mean()):.4f}",
          flush=True)

    ks = [2, 8, 32]
    walls = {}
    for k in ks:
        f = chained(k)
        float(f(P, q, A, b, x0))          # compile + first fetch
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(P, q, A, b, x0))      # host fetch = true sync
            ts.append(time.perf_counter() - t0)
        walls[k] = min(ts)
        print(f"k={k}: min wall {walls[k]*1e3:.2f} ms", flush=True)

    slope = (walls[32] - walls[2]) / (32 - 2)
    print(f"PER-SOLVE (slope k=2..32): {slope*1e3:.3f} ms "
          f"({B/slope/1e6:.2f} M lanes/s)", flush=True)


if __name__ == "__main__":
    main()
