"""Scaling harness: closed-loop MPC throughput vs mesh size.

On a pod slice this measures sims/s at 1 chip / 1 host / N hosts (the
BASELINE.md scaling axes).  Without multi-chip hardware it runs on a forced
N-virtual-device CPU mesh to validate the sharded execution path and bound
the sharding overhead of the harness itself: at every mesh size it times
BOTH the shard_map runner and the plain single-device vmap runner on the
same total batch, so the printed table answers "what does spreading lanes
over the mesh cost vs one big vmap" directly.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python examples/scaling_bench.py
      SCALING_BENCH_TPU=1 python examples/scaling_bench.py   # real chip(s)

Env knobs: SCALING_LANES_PER_DEV (default 32), SCALING_STEPS (default 40).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax

# the axon bootstrap pins jax_platforms="axon,cpu"; the env var alone cannot
# force CPU (see .claude/skills/verify/SKILL.md)
if os.environ.get("SCALING_BENCH_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
from koopman_realizations_tpu.control import Ksim, make_kmpc
from koopman_realizations_tpu.models.arm import Arm
from koopman_realizations_tpu.models.edmd import Ksysid
from koopman_realizations_tpu.parallel import make_mesh
from koopman_realizations_tpu.parallel.scenarios import sharded_batch_runner
from koopman_realizations_tpu.utils.matio import load_data4sysid, load_ref_trajectory

REF = "/root/reference"


def _time_runner(fn, X0, W, reps=3):
    out = jax.block_until_ready(fn(X0, W))     # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(X0, W))
    return (time.perf_counter() - t0) / reps, out


def main():
    n_dev_total = len(jax.devices())
    data = load_data4sysid(
        REF + "/datafiles/arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory(
        REF + "/trajectories/files/blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    ks = Ksysid(data, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                  obs_degree=(3,), dim_red=True,
                                  dtype="float32")).train_models()
    # the SHIPPING bench configuration (bench.py round 5: blocked RTI,
    # qp_iters=4 + dual warm) so the recorded scaling evidence matches the
    # program that ships -- round-4 verdict #8
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5),
        qp_iters=4, qp_dual_warm=True, qp_dual_shift=False,
        input_blocks=(1, 1, 2, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    sim = Ksim(arm, mpc)

    steps = int(os.environ.get("SCALING_STEPS", "40"))
    lanes_per_dev = int(os.environ.get("SCALING_LANES_PER_DEV", "32"))
    record = ("Y", "alive")
    print(f"devices available: {n_dev_total} ({jax.devices()[0].platform}), "
          f"steps={steps}, lanes/dev={lanes_per_dev}")
    print(f"{'ndev':>4} {'B':>6} {'sharded steps/s':>16} "
          f"{'vmap steps/s':>14} {'overhead':>9} {'alive':>6}")
    n = 1
    while n <= n_dev_total:
        B = lanes_per_dev * n
        X0 = np.zeros((B, 6), np.float32)
        X0[:, 0] = np.linspace(-0.2, 0.2, B)
        W = np.zeros((B, 2), np.float32)

        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        fn_sh = sharded_batch_runner(sim, ref["y"], mesh, steps=steps,
                                     record=record)
        dt_sh, out = _time_runner(fn_sh, X0, W)

        # baseline: the identical workload as ONE device-local vmap scan
        fn_vm = sim.batched_runner(ref["y"], steps=steps, record=record)
        dt_vm, _ = _time_runner(fn_vm, X0, W)

        sps_sh = B * (steps - 1) / dt_sh
        sps_vm = B * (steps - 1) / dt_vm
        over = (dt_sh - dt_vm) / dt_vm * 100.0
        alive = np.asarray(out["alive"])[:, -1].mean()
        print(f"{n:>4} {B:>6} {sps_sh:>16,.0f} {sps_vm:>14,.0f} "
              f"{over:>+8.1f}% {alive:>6.2f}", flush=True)
        n *= 2


if __name__ == "__main__":
    main()
