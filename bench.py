"""Benchmark: batched closed-loop Koopman-MPC throughput on one chip.

Pipeline: train the paper's bilinear realization (poly-3, dim-reduced) from
the shipped arm datafile on the host CPU, then run a batch of closed-loop
20 Hz MPC scenarios (lift -> condensed QP via interior point -> SDIRK2 plant
step, all one fused scan) on the accelerator and measure MPC steps/s.

Baseline: the reference's K-BMPC solves one 50 ms control step in 9.6 ms of
MATLAB quadprog time (BASELINE.md) => ~104 closed-loop MPC steps/s on a
desktop CPU.  vs_baseline = our steps/s / 104.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_STEPS_PER_S = 1.0 / 0.0096   # reference bilinear comp_time mean

DATAFILE = "/root/reference/datafiles/arm-3link-markers-noload-50trials_train-10_val-5.mat"
REFTRAJ = "/root/reference/trajectories/files/blockM_c0p45-0p35_0p5x0p5_15sec.mat"


def main():
    import jax

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import load_data4sysid, load_ref_trajectory

    # steps=301 runs the FULL 15 s blockM trajectory (like the reference's
    # experiments) -- it also amortizes the ~35 ms axon tunnel dispatch that
    # a 30-step loop pays as ~1.2 ms/step of phantom cost.  B=65536 is the
    # round-4 throughput peak of the blocked ASSEMBLY-FUSED config (the
    # smaller per-lane kernel state keeps moving the peak up a batch size:
    # 16384 unblocked -> 32768 blocked -> 65536 fused; back-to-back A/B
    # 22.46M vs 21.17M at 32768, error/alive identical across 4k-64k).
    # round 5: the STEP-FUSED runner (one Pallas launch per closed-loop
    # step, ops/pallas/step_fused.py) moves the batch peak up again:
    # 65536 24.2M / 131072 25.6M / 262144 25.9M (tile=1024, qp=3) vs the
    # unfused runner's 22.3M at 65536; at the shipping qp=4 + newton=1
    # config 262144 is the peak (23.3M; 524288 declines to 20.8M).
    # BENCH_FUSED=0 opts back into the general batched_runner.
    batch = int(os.environ.get("BENCH_BATCH", "262144"))
    steps = int(os.environ.get("BENCH_STEPS", "301"))

    ds = load_data4sysid(DATAFILE)
    ref = load_ref_trajectory(REFTRAJ)

    # train on host CPU (one-time; f32 is fine for the rollout benchmark)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()

    # The shipping RTI regime (round 3): input move-blocking (1,1,2,5)
    # shrinks the condensed QP 27 -> 12 vars / 108 -> 48 rows at
    # golden-class tracking (CPU + 192-lane TPU multi-ref grids: blocked
    # qp=3+dual shift err 0.0188 vs 0.0186 for the old unblocked qp=2
    # config, alive 1.0 in every scenario cell), and qp_iters=3 + the
    # dual warm start holds the bench workload at err_mean 0.0207 /
    # worst lane 0.0286 (vs 0.0203 golden mean and the old config's
    # 0.0349 worst).  The STAGE SHIFT is dropped blocked (round-4
    # verdict #7 A/B: 192-lane multi-ref grid shift-on 0.0188 vs
    # shift-off 0.0187, identical alive -- the shift is a heuristic for
    # the 5-long tail group and buys nothing; it remains REQUIRED for
    # the retired UNBLOCKED qp=2 config).  Iteration cliffs PER REGIME
    # (they move
    # with the kernel shape -- re-measure after kernel changes): blocked
    # needs qp_iters=3 (blocked qp=2 degrades err ~13%); the retired
    # UNBLOCKED config's floor was qp_iters=2 with dual shift (11.2M
    # steps/s round 2), and unblocked qp_iters=1 collapses (alive 0.87).
    # The library default is qp_iters=12, unblocked: the MEASURED snake-
    # fourier floor (round 4, rti_floor_sweep MODE=snake -- unblocked
    # qp=10 loses 16% of a 0.15-spread grid; 12 is the smallest
    # all-alive count, blocked holds at 10).
    # Round 5: the bench ships qp_iters=4 -- with the step-fused runner it
    # BEATS GOLDEN ON BOTH AXES (err_mean 0.0199 vs the reference's 0.0203
    # AND 22.3M steps/s vs the round-4 record 21.96M; round-4 verdict #5),
    # and the err gate below pins the quality axis in the driver run.
    # qp_iters=3 trades ~4% mean error for the last ~17% of throughput
    # (26.0M at 0.0207) -- use BENCH_QP_ITERS=3 for the throughput-peak
    # A/B.
    blocks_env = os.environ.get("BENCH_BLOCKS", "1,1,2,5")  # "" = unblocked
    blocks = tuple(int(b) for b in blocks_env.split(",")) if blocks_env \
        else None
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=int(os.environ.get("BENCH_QP_ITERS", "4")),
        qp_dual_warm=os.environ.get("BENCH_DUAL_WARM", "1") != "0",
        qp_dual_shift=False,
        input_blocks=blocks,
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
        proj_idx=(4, 5),
    ))
    # substeps=3 is the cheapest SDIRK2 resolution at which ALL 8192 lanes
    # survive: at substeps=2 the ~6 most extreme initial states push the
    # stiff plant integrator into a divergence the ok-mask then freezes
    # (root-caused round 2: the QP solves were fine, the plant step wasn't).
    # newton_iters=2 + jac_mode='step' (one Jacobian/factorization per Ts):
    # closed-loop error and one-step accuracy vs a fine reference are
    # identical to exact Newton (the floor is substep resolution), +20%
    # newton_iters=1 (round 5): IN the step-fused kernel one chord Newton
    # per stage is +4.4% at identical quality (bench err 0.0199, 192-lane
    # multi-ref grid alive 1.0 / err 0.0184 / worst 0.0360 vs 0.0357) --
    # the round-3 finding that newton=1 was 10% SLOWER was an XLA
    # scheduling artifact of the unfused loop and does not apply in-kernel
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers",
                        substeps=int(os.environ.get("BENCH_SUBSTEPS", "3")),
                        newton_iters=int(os.environ.get("BENCH_NEWTON", "1")),
                        jac_mode="step"))
    sim = Ksim(arm, mpc)

    X0 = np.zeros((batch, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, batch)
    W = np.zeros((batch, 2), np.float32)

    # benchmark records only what the metric needs: stacking the full X/Z
    # trails costs HBM bandwidth the loop never reads back (the B>8192
    # cliff); round 4 trims further -- only the PROJECTED outputs are
    # recorded (the err metric reads nothing else), and R is not recorded
    # at all (it is lane-constant here and reproducible from the input
    # reference: R_k = ref row k-1 through the scale round trip)
    use_fused = os.environ.get("BENCH_FUSED", "1") != "0" \
        and sim.fused_step_eligible()
    if use_fused:
        runner = sim.fused_runner(ref["y"], steps=steps,
                                  record=("Yp", "alive"))
    else:
        runner = sim.batched_runner(ref["y"], steps=steps,
                                    record=("Yp", "alive"))
    # warmup / compile
    out = runner(X0, W)
    jax.block_until_ready(out)

    # median of per-rep walls: host/tunnel scheduling adds +-20% run-to-run
    # noise on this box that a single mean absorbs badly
    reps = 7
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(runner(X0, W))
        walls.append(time.perf_counter() - t0)
    dt = float(np.median(walls))

    alive_frac = float(np.asarray(out["alive"])[:, -1].mean())
    # tracking quality alongside throughput (golden bilinear mean is 0.0203)
    Yl = np.asarray(out["Yp"])
    # R_k = scaleup(ref_sc[k-1]) = the input reference row through the
    # [-1,1] scale round trip (exact to fp eps) -- Ksim.m:199,254 semantics
    Rl = np.broadcast_to(np.asarray(ref["y"], np.float32)[None, : steps - 1],
                         Yl.shape)
    lane_err = np.sqrt(((Yl - Rl) ** 2).sum(-1)).mean(axis=1)
    err_mean, err_worst = float(lane_err.mean()), float(lane_err.max())
    # every lane must survive: a silent lane loss would inflate steps/s
    # (explicit raise, not assert: python -O must not disable the gate)
    # BENCH_ALLOW_DEAD=1 bypasses the gate for ABLATION measurements only
    # (e.g. qp_iters=1 marginal-cost runs); the driver never sets it
    if alive_frac != 1.0 and not os.environ.get("BENCH_ALLOW_DEAD"):
        raise RuntimeError(f"alive_fraction {alive_frac} != 1.0")
    # quality gate (round-4 verdict #5): the SHIPPING config must beat the
    # reference's golden bilinear mean (0.0203, Ksim.m:258 err field of the
    # shipped blockM run).  Skipped when env knobs select an ablation
    # config (qp_iters != default, custom blocks, dead-lane ablations).
    GOLDEN_ERR = 0.0203
    default_cfg = (os.environ.get("BENCH_QP_ITERS") in (None, "", "4")
                   and os.environ.get("BENCH_BLOCKS") in (None, "1,1,2,5")
                   and os.environ.get("BENCH_STEPS") in (None, "", "301")
                   and not os.environ.get("BENCH_ALLOW_DEAD"))
    if default_cfg and err_mean > GOLDEN_ERR:
        raise RuntimeError(
            f"err_mean {err_mean} exceeds the golden bilinear mean "
            f"{GOLDEN_ERR} at the shipping config")
    mpc_steps = batch * (steps - 1)
    steps_per_s = mpc_steps / dt
    realtime_sims_20hz = steps_per_s / 20.0

    # roofline accounting (round-4 verdict #5): analytic per-lane-step
    # FLOPs/bytes vs the chip's published peaks -- answers "how far from
    # the hardware ceiling" alongside the steps/s headline
    from koopman_realizations_tpu.utils.roofline import (
        bilinear_step_cost,
        roofline_summary,
    )
    cost = bilinear_step_cost(mpc, arm.cfg)
    roof = roofline_summary(steps_per_s, cost,
                            getattr(jax.devices()[0], "device_kind", "?"))

    result = {
        "metric": "kmpc_bilinear_closed_loop_steps_per_s_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "mpc_steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
        "detail": {
            "batch": batch, "steps": steps, "wall_s": round(dt, 4),
            "equivalent_realtime_20hz_sims": round(realtime_sims_20hz, 1),
            "alive_fraction": alive_frac,
            "err_mean": round(err_mean, 5), "err_worst": round(err_worst, 5),
            "platform": jax.devices()[0].platform,
            "fused_step": use_fused,
            # the reference-comparable single-solve latency on this setup is
            # the AMORTIZED per-lane step time of the fused batched scan
            # (one-lane dispatch is ~30 ms of axon tunnel latency, see
            # README "Reference-format per-step solve times")
            "amortized_us_per_lane_step": round(1e6 / steps_per_s, 4),
            # roofline: analytic model in utils/roofline.py; interpretation
            # in README "Roofline accounting"
            "flops_per_lane_step": cost["flops_total"],
            "hbm_bytes_per_lane_step_est": cost["bytes_est"],
            # None (not NaN) when the device peak is unknown (CPU smoke
            # runs): NaN is not strict JSON
            "mfu": (round(roof["mfu_vs_bf16_peak"], 6)
                    if np.isfinite(roof.get("mfu_vs_bf16_peak",
                                            float("nan"))) else None),
            "hbm_gbps": round(roof["hbm_gbps_est"], 1),
        },
    }
    print(json.dumps(result))


def _main_with_retry():
    """Re-exec on TPU-claim failure.

    The axon claim handshake intermittently fails with 'Unable to
    initialize backend' (observed: transient pool outages); JAX memoizes
    backend-init errors for the process lifetime, so the retry must be a
    fresh process.  Bounded by BENCH_CLAIM_RETRIES (default 2).
    """
    try:
        main()
    except RuntimeError as e:
        if "Unable to initialize backend" not in str(e):
            raise
        tries = int(os.environ.get("_BENCH_CLAIM_TRY", "0"))
        limit = int(os.environ.get("BENCH_CLAIM_RETRIES", "2"))
        if tries >= limit:
            raise
        print(f"TPU claim failed ({e}); retry {tries + 1}/{limit} in 60 s",
              file=sys.stderr, flush=True)
        time.sleep(60)
        os.environ["_BENCH_CLAIM_TRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _main_with_retry()
