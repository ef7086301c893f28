"""Smoke test for the driver benchmark entry (`bench.py`).

The driver runs ``python bench.py`` unattended at the end of every round;
this pins its full path -- train, controller build, batched closed-loop
runner, alive assertion, JSON schema -- at a tiny batch so a refactor
can't silently break the metric between TPU runs.

Runs as a SUBPROCESS in bench.py's real environment (f32, no forced
x64): the conftest's x64 flag promotes the QP assembly to float64, which
flips the ok-gate to the strict f64 thresholds and (correctly, for f64)
flags the aggressive 3-iteration RTI solves -- a test-env artifact the
production f32 path never sees.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cli_tiny_batch():
    env = dict(os.environ)
    # run on the local CPU: drop the axon pool so the bootstrap skips the
    # TPU claim handshake entirely (CLAUDE.md: the env var alone is not
    # enough when the pool is configured)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_BATCH"] = "8"
    env["BENCH_STEPS"] = "12"
    env.pop("JAX_ENABLE_X64", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert res.returncode == 0, res.stderr[-2000:]
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    out = json.loads(lines[0])
    assert out["metric"] == "kmpc_bilinear_closed_loop_steps_per_s_per_chip"
    assert out["unit"] == "mpc_steps/s"
    assert out["value"] > 0 and out["vs_baseline"] > 0
    assert out["detail"]["alive_fraction"] == 1.0
    assert out["detail"]["batch"] == 8 and out["detail"]["steps"] == 12
