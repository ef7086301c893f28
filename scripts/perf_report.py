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
    # the SHIPPING round-5 bench config: blocked qp=4 + dual warm + the
    # step-fused runner (newton=1 chord plant in-kernel)
    cfg = MpcConfig(horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
                    input_slopeConst=1e-1, cost_running=10.0,
                    cost_terminal=100.0,
                    cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
                    proj_idx=(4, 5), qp_iters=4, qp_dual_warm=True,
                    qp_dual_shift=False, input_blocks=(1, 1, 2, 5))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=1,
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
        if sim.fused_step_eligible():
            runner = sim.fused_runner(ref["y"], steps=steps)
            o = jax.block_until_ready(runner(X0, W))
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                o = jax.block_until_ready(runner(X0, W))
            dt = (time.perf_counter() - t0) / reps
            alive = float(np.asarray(o["alive"])[:, -1].mean())
            Yp = np.asarray(o["Yp"])
            R = np.broadcast_to(
                np.asarray(ref["y"], np.float32)[None, : steps - 1],
                Yp.shape)
            err = float(np.sqrt(((R - Yp) ** 2).sum(-1)).mean())
            return B * (steps - 1) / dt, alive, err
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

    print("== bilinear throughput vs batch (step-fused runner) ==")
    for B in (8192, 32768, 65536, 131072, 262144):
        sps, alive, _ = run(sim_b, B)
        print(f"B={B:6d}: {sps:9.0f} steps/s  alive={alive:.4f}")

    print("== model families at their verified floors ==")
    family_rates()


def family_rates():
    """Throughput at the MEASURED iteration floors for the reference's
    other model families (round-4 verdict #7): snake fourier
    (``Ksysid.m:694-767``; floors from rti_floor_sweep MODE=snake:
    qp=12 unblocked / qp=10 blocked, COLD duals) and the loaded arm
    (``Ksysid.m:539-626``; floors from round 4: blocked qp=5 with dual
    warm+shift, or qp=3 cold).
    """
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import (
        Ksim,
        make_kmpc,
        make_load_observer,
    )
    from koopman_realizations_tpu.control.ksim import KoopmanPlant
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.types import DataSet, Trial
    from koopman_realizations_tpu.utils.data import chop, get_data4sysid
    from koopman_realizations_tpu.utils.matio import load_data4sysid
    from koopman_realizations_tpu.utils.trajectories import (
        get_circle,
        make_trajectory,
    )

    def timed_batch(sim, ref, X0, W, steps):
        runner = sim.batched_runner(ref, steps=steps,
                                    record=("Y", "R", "alive"))
        o = jax.block_until_ready(runner(X0, W))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            o = jax.block_until_ready(runner(X0, W))
        dt = (time.perf_counter() - t0) / reps
        alive = float(np.asarray(o["alive"])[:, -1].mean())
        proj = list(sim.mpc.proj_idx)
        err = float(np.sqrt(((np.asarray(o["R"])
                              - np.asarray(o["Y"])[..., proj]) ** 2)
                            .sum(-1)).mean())
        return X0.shape[0] * (steps - 1) / dt, alive, err

    # ---- snake fourier (model-in-the-loop; no physical snake sim) -------
    ds0 = load_data4sysid("/root/reference/datafiles/snake-data.mat")
    train = chop(ds0.train[0], num=6, length_s=40.0)
    val = [ds0.val[0].replace(y=ds0.val[0].y[:500], u=ds0.val[0].u[:500],
                              t=ds0.val[0].t[:500])]
    with jax.default_device(jax.devices("cpu")[0]):
        ks_s = Ksysid(get_data4sysid(train, val),
                      SysidConfig(model_type="bilinear",
                                  obs_type=("fourier_sparser",),
                                  obs_degree=(1,),
                                  dtype="float32")).train_models()
    t = np.linspace(0, 2 * np.pi, 200)
    y0 = np.asarray(ks_s.scaler.y_up(np.zeros(3)))
    ref_s = np.stack([y0[0] + 0.1 * np.cos(t) - 0.1,
                      y0[1] + 0.1 * np.sin(t)], axis=1)
    rng = np.random.default_rng(0)
    B = 8192
    zetas = 0.15 * rng.standard_normal((B, 3)).astype(np.float32)
    X0s = np.asarray(jax.vmap(ks_s.model.basis.lift)(jnp.asarray(zetas)))
    for blocks, qp in ((None, 12), ((1, 1, 2, 5), 10)):
        cfg_s = MpcConfig(horizon=10, input_bounds=(-10.0, 10.0),
                          input_slopeConst=0.5, cost_running=10.0,
                          cost_terminal=100.0, cost_input=(1e-3,),
                          proj_idx=(0, 1), qp_iters=qp,
                          qp_dual_warm=False, input_blocks=blocks)
        sim = Ksim(KoopmanPlant(ks_s.model, ks_s.scaler),
                   make_kmpc(ks_s.model, ks_s.scaler, cfg_s))
        sps, alive, err = timed_batch(sim, ref_s, X0s,
                                      np.zeros((B, 2), np.float32), 150)
        tag = "blocked" if blocks else "unblocked"
        print(f"snake-fourier {tag:9s} qp={qp} cold B={B}: "
              f"{sps:9.0f} steps/s  alive={alive:.4f}  err={err:.4f}")

    # ---- loaded arm (observer in the loop) ------------------------------
    arm2 = Arm(ArmConfig(Nmods=2, nlinks=1, L=1.0, m=0.1,
                         output_type="markers", substeps=5))
    rng = np.random.default_rng(7)
    loads = [(a, b) for a in (0.0, 0.33, 0.66, 1.0)
             for b in (-1.0, -0.33, 0.33, 1.0)]
    sims = arm2.simulate_rampNhold_batch(rng, tf=30.0, Tramp=2.0,
                                         W=np.asarray(loads))
    trials = [Trial(t=s["t"], y=s["y"], u=s["u"], x=s["x"], w=s["w"])
              for s in sims]
    ds_l = DataSet(train=trials[:-1], val=trials[-1:],
                   params={"sysName": "perf"})
    with jax.default_device(jax.devices("cpu")[0]):
        ks_l = Ksysid(ds_l, SysidConfig(model_type="bilinear",
                                        obs_type=("poly",), obs_degree=(2,),
                                        loaded=True, dim_red=True)
                      ).train_models()
    circle = get_circle([0.0, -0.7], 0.3)
    ref_l = make_trajectory(circle, T=15.0, Ts=0.05, flip_y=True,
                            preamble_from=(0.0, 1.0))["y"]
    B = 2048
    X0l = np.zeros((B, 4), np.float32)
    X0l[:, 0] = np.linspace(-0.15, 0.15, B)
    # the round-4 floor grid's load cases (test_loaded _rti_grid), cycled
    # over lanes -- the floor was verified on this composition, not on
    # every lane at the hardest load
    grid_loads = np.asarray([[0.9, -0.6], [0.4, 0.2], [0.0, 0.0]],
                            np.float32)
    Wl = grid_loads[np.arange(B) % 3]
    # round-5 f32 finding: the 6-lane qp=3-cold floor does NOT transfer to
    # a 2048-lane f32 spread (alive 0.917); qp=5 warm+shift holds alive
    # 1.0 at converged-class err, qp=10 cold is the margin row
    for qp, warm, shift in ((5, True, True), (3, False, False),
                            (10, False, False)):
        cfg_l = MpcConfig(horizon=10,
                          input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
                          input_slopeConst=1e-1, cost_running=10.0,
                          cost_terminal=100.0, cost_input=(3e-3, 2e-3),
                          proj_idx=(2, 3), load_obs_horizon=10,
                          load_obs_period=2, qp_iters=qp,
                          qp_dual_warm=warm, qp_dual_shift=shift,
                          input_blocks=(1, 1, 2, 5))
        mpc = make_kmpc(ks_l.model, ks_l.scaler, cfg_l)
        obs = make_load_observer(ks_l.model, cfg_l)
        sim = Ksim(arm2, mpc, observer=obs)
        sps, alive, err = timed_batch(sim, ref_l, X0l, Wl, 150)
        tag = "warm+shift" if warm else "cold"
        print(f"loaded-arm blocked qp={qp} {tag:10s} B={B}: "
              f"{sps:9.0f} steps/s  alive={alive:.4f}  err={err:.4f}")


if __name__ == "__main__":
    main()
