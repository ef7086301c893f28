"""One-process TPU performance evidence: phases, controllers, batch curve.

Runs (serially, one TPU claim):
1. per-phase cost breakdown at the bench configuration,
2. closed-loop throughput for all three controller types,
3. throughput vs batch size for the bilinear bench config.

Use JAX_COMPILATION_CACHE_DIR=/root/.jax_cache to amortize compiles.
All numbers land in README.md's "Benchmark" section.
"""

import json
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
    from koopman_realizations_tpu.utils.timing import phase_breakdown

    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    # the SHIPPING bench configuration (bench.py, round 4: move blocking
    # (1,1,2,5) + qp_iters=3 + dual warm (shift dropped: neutral blocked), verified
    # golden-class tracking, alive 1.0; qp_dual_warm is a no-op for the
    # NMPC controller)
    cfg = MpcConfig(horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
                    input_slopeConst=1e-1, cost_running=10.0,
                    cost_terminal=100.0,
                    cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
                    proj_idx=(4, 5), qp_iters=3, qp_dual_warm=True,
                    qp_dual_shift=False, input_blocks=(1, 1, 2, 5))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    steps = 301

    def train(mt):
        pca = 99.99 if mt == "nonlinear" else 99.0
        with jax.default_device(jax.devices("cpu")[0]):
            return Ksysid(ds, SysidConfig(
                model_type=mt, obs_type=("poly",), obs_degree=(3,),
                dim_red=True, pca_explained=pca,
                dtype="float32")).train_models()

    def run(sim, B):
        X0 = np.zeros((B, 6), np.float32)
        X0[:, 0] = np.linspace(-0.2, 0.2, B)
        W = np.zeros((B, 2), np.float32)
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
        err = float(np.sqrt(((R - Y[..., 4:6]) ** 2).sum(-1)).mean())
        return B * (steps - 1) / dt, alive, err

    ks_b = train("bilinear")
    sim_b = Ksim(arm, make_kmpc(ks_b.model, ks_b.scaler, cfg))

    print("== roofline model (shipping blocked config) ==")
    from koopman_realizations_tpu.utils.roofline import (
        bilinear_step_cost,
        roofline_summary,
    )
    cost = bilinear_step_cost(sim_b.mpc, arm.cfg)
    print(json.dumps(cost))
    # interpret at the recorded bench rate when available
    bench_sps = float(os.environ.get("ROOFLINE_STEPS_PER_S", "0")) or None
    if bench_sps:
        roof = roofline_summary(bench_sps, cost,
                                getattr(jax.devices()[0], "device_kind", "?"))
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in roof.items()}))

    print("== phases (bilinear bench config, B=8192) ==")
    ph = phase_breakdown(sim_b, ref["y"], B=8192, steps=12, reps=10)
    print(json.dumps({k: (round(v["s_per_step"] * 1e3, 3)
                          if isinstance(v, dict) else round(v, 5) if
                          isinstance(v, float) else v)
                      for k, v in ph.items()}))

    print("== controllers ==")
    import dataclasses
    for mt, B in (("linear", 8192), ("bilinear", 8192), ("nonlinear", 2048)):
        ks = ks_b if mt == "bilinear" else train(mt)
        # per-controller VERIFIED RTI floors (scripts/rti_floor_sweep.py +
        # scripts/nmpc_sweep.py; round-4 re-measured after the fused
        # kernels -- cliffs unchanged), all with move blocking (1,1,2,5):
        #   bilinear : blocked qp_iters=3 + dual warm, NO stage shift
        #              (round-4 A/B: shift neutral blocked; 192-lane
        #              multi-ref grid all alive, err 0.0187)
        #   linear   : blocked qp_iters=3, NO dual warm/shift (err 0.1313
        #              / worst 0.1408 / alive 1.0 -- unblocked qp=3 LOST
        #              lanes at worst 0.5363, and the shift degrades
        #              linear tracking either way)
        #   nonlinear: qp_iters=8, sqp_iters=5 -- fused-kernel re-sweep:
        #              qp=6 err 0.0360 / sqp=4 0.0367 vs 0.0312; the SQP
        #              relinearizes about the inner QP's answer, so a
        #              partially-converged QP moves the linearization
        #              point the WRONG way and the next pass amplifies it
        if mt == "bilinear":
            c = cfg
        elif mt == "linear":
            c = dataclasses.replace(cfg, qp_iters=3, qp_dual_warm=False,
                                    qp_dual_shift=False)
        else:
            c = dataclasses.replace(cfg, qp_iters=8)
        sim = Ksim(arm, make_kmpc(ks.model, ks.scaler, c))
        sps, alive, err = run(sim, B)
        print(f"{mt:10s} B={B:5d}: {sps:9.0f} steps/s  alive={alive:.4f}  "
              f"err={err:.4f}")

    print("== bilinear throughput vs batch ==")
    for B in (4096, 8192, 16384, 32768, 65536):
        sps, alive, _ = run(sim_b, B)
        print(f"B={B:6d}: {sps:9.0f} steps/s  alive={alive:.4f}")


if __name__ == "__main__":
    main()
