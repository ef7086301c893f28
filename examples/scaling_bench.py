"""Scaling harness: closed-loop MPC throughput vs mesh size.

On a pod slice this measures sims/s at 1 chip / 1 host / N hosts (the
BASELINE.md scaling axes). Without multi-chip hardware it runs on a forced
N-virtual-device CPU mesh to validate the sharded execution path and
measure parallel efficiency of the harness itself.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python examples/scaling_bench.py
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


def main():
    n_dev_total = len(jax.devices())
    data = load_data4sysid(
        REF + "/datafiles/arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory(
        REF + "/trajectories/files/blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    ks = Ksysid(data, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                  obs_degree=(3,), dim_red=True,
                                  dtype="float32")).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(3e-3, 2e-3, 1e-3), proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3))
    sim = Ksim(arm, mpc)

    steps = 8
    lanes_per_dev = 32
    print(f"devices available: {n_dev_total} "
          f"({jax.devices()[0].platform})")
    n = 1
    while n <= n_dev_total:
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        B = lanes_per_dev * n
        X0 = np.zeros((B, 6), np.float32)
        X0[:, 0] = np.linspace(-0.2, 0.2, B)
        W = np.zeros((B, 2), np.float32)
        fn = sharded_batch_runner(sim, ref["y"], mesh, steps=steps)
        out = jax.block_until_ready(fn(X0, W))     # compile + warmup
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(X0, W))
        dt = time.perf_counter() - t0
        sps = B * (steps - 1) / dt
        print(f"  {n} device(s): B={B:4d}  {sps:10,.0f} mpc steps/s  "
              f"alive={np.asarray(out['alive'])[:, -1].mean():.2f}")
        n *= 2


if __name__ == "__main__":
    main()
