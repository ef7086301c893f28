"""Quality/throughput sweep: receding-horizon dual warm start +- stage shift.

For each (qp_iters, qp_dual_shift) variant, runs the FULL 301-step blockM
closed loop at the bench configuration and reports mean/worst lane tracking
error, alive fraction, and steps/s.  Golden bilinear reference: mean 0.0203.

  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/dual_shift_sweep.py
"""

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

    B = int(os.environ.get("BENCH_BATCH", "16384"))
    steps = 301
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)

    variants = os.environ.get("SWEEP", "3,0 3,1 2,1 2,0")
    for iters, shift in [tuple(int(x) for x in v.split(","))
                         for v in variants.split()]:
        mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
            horizon=10, qp_iters=iters, qp_dual_warm=True,
            qp_dual_shift=shift,
            input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
            input_slopeConst=1e-1,
            cost_running=10.0, cost_terminal=100.0,
            cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
            proj_idx=(4, 5)))
        sim = Ksim(arm, mpc)
        runner = sim.batched_runner(ref["y"], steps=steps,
                                    record=("Y", "R", "alive"))
        out = jax.block_until_ready(runner(X0, W))
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(runner(X0, W))
            walls.append(time.perf_counter() - t0)
        dt = float(np.median(walls))
        # same error reduction as scripts/perf_report.py (golden mean 0.0203)
        Y = np.asarray(out["Y"])[..., 4:6]
        R = np.asarray(out["R"])
        alive = np.asarray(out["alive"])[:, -1]
        err = np.sqrt(((Y - R) ** 2).sum(-1)).mean(axis=1)
        print(f"iters={iters} shift={int(shift)}: "
              f"err_mean={err.mean():.4f} err_worst={err.max():.4f} "
              f"alive={alive.mean():.4f} "
              f"steps/s={B*(steps-1)/dt/1e6:.2f}M", flush=True)


if __name__ == "__main__":
    main()
