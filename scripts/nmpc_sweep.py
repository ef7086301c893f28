"""NMPC closed-loop quality/throughput sweep over (sqp_iters, qp_iters).

Full 301-step blockM at B lanes on the TPU; prints err mean/max, alive,
steps/s per config.  Golden K-NMPC mean is 0.0192; the repo's reference
config (sqp=5, qp=8) measures ~0.0142.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/nmpc_sweep.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_ref_trajectory,
    )

    B = int(os.environ.get("BENCH_BATCH", "2048"))
    steps = 301
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="nonlinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    pca_explained=99.99,
                                    dtype="float32")).train_models()
    base = MpcConfig(horizon=10,
                     input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
                     input_slopeConst=1e-1, cost_running=10.0,
                     cost_terminal=100.0,
                     cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
                     proj_idx=(4, 5),
                     input_blocks=tuple(
                         int(b) for b in os.environ["BLOCKS"].split(","))
                     if os.environ.get("BLOCKS") else None)
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))

    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)

    configs = [(5, 8, False, 1), (5, 8, False, 2), (5, 8, False, 3),
               (5, 8, False, 5), (6, 8, False, 2), (4, 8, False, 2)]
    import json
    cfg_env = os.environ.get("NMPC_SWEEP_CONFIGS")
    if cfg_env:
        configs = [tuple(c) for c in json.loads(cfg_env)]
    for sqp, qp, dw, jp in configs:
        cfg = dataclasses.replace(base, sqp_iters=sqp, qp_iters=qp,
                                  sqp_dual_warm=dw, sqp_jac_period=jp)
        sim = Ksim(arm, make_kmpc(ks.model, ks.scaler, cfg))
        runner = sim.batched_runner(ref["y"], steps=steps,
                                    record=("Y", "R", "alive"))
        o = jax.block_until_ready(runner(X0, W))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            o = jax.block_until_ready(runner(X0, W))
        dt = (time.perf_counter() - t0) / reps
        alive = float(np.asarray(o["alive"])[:, -1].mean())
        Y, R = np.asarray(o["Y"]), np.asarray(o["R"])
        err = np.sqrt(((R - Y[..., 4:6]) ** 2).sum(-1))
        print(f"sqp={sqp} qp={qp} dw={int(dw)} jp={jp}: "
              f"{B*(steps-1)/dt:9.0f} steps/s  "
              f"alive={alive:.4f}  err_mean={err.mean():.4f}  "
              f"worst_lane={err.mean(1).max():.4f}", flush=True)


if __name__ == "__main__":
    main()
