"""Per-controller RTI iteration-floor validation (round-2 verdict #3).

Two parts, selected by MODE:

MODE=linear   LinearKmpc on the full 301-step blockM at B lanes:
              qp_iters x (dual warm start + stage shift) grid, reporting
              err mean / worst lane / alive / steps/s per variant.  Golden
              linear K-MPC mean err is 0.743; the repo reference config
              (qp_iters=10, no warm start) measures 0.134.

MODE=multiref BilinearKmpc at the SHIPPING RTI config (qp_iters x dual
              shift) on a scenario grid: {blockM, circle, pacman, polygon}
              x X0 spread x unmodeled loads, one compiled run_multi_ref
              batch.  Hardens the bench-validated iteration floor across
              trajectories the bench never sees.  The qp_iters=10 column is
              the model-capability baseline: lanes it cannot track are a
              model limit, not an RTI artifact.

Run (TPU):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache MODE=linear python scripts/rti_floor_sweep.py
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache MODE=multiref python scripts/rti_floor_sweep.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(model_type: str):
    import jax

    from koopman_realizations_tpu.config import SysidConfig
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_ref_trajectory,
    )

    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type=model_type, obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()
    return ks, ref


def mpc_cfg(**kw):
    from koopman_realizations_tpu.config import MpcConfig
    blocks = tuple(int(b) for b in os.environ["BLOCKS"].split(",")) \
        if os.environ.get("BLOCKS") else None
    return MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5),
        input_blocks=blocks, **kw)


def bench_arm():
    from koopman_realizations_tpu.config import ArmConfig
    from koopman_realizations_tpu.models.arm import Arm
    return Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                         output_type="markers",
                         substeps=int(os.environ.get("ARM_SUBSTEPS", "3")),
                         newton_iters=int(os.environ.get("ARM_NEWTON", "2")),
                         jac_mode="step"))


def linear_floor():
    import jax

    from koopman_realizations_tpu.control import Ksim, make_kmpc

    B = int(os.environ.get("BENCH_BATCH", "8192"))
    steps = 301
    ks, ref = build("linear")
    arm = bench_arm()
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)
    variants = os.environ.get(
        "SWEEP", "10,0 4,0 4,1 3,1 2,1 1,1")
    for iters, warm in [tuple(int(x) for x in v.split(","))
                        for v in variants.split()]:
        cfg = mpc_cfg(qp_iters=iters, qp_dual_warm=bool(warm),
                      qp_dual_shift=bool(warm))
        sim = Ksim(arm, make_kmpc(ks.model, ks.scaler, cfg))
        runner = sim.batched_runner(ref["y"], steps=steps,
                                    record=("Y", "R", "alive"))
        out = jax.block_until_ready(runner(X0, W))
        walls = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.block_until_ready(runner(X0, W))
            walls.append(time.perf_counter() - t0)
        dt = float(np.median(walls))
        Y = np.asarray(out["Y"])[..., 4:6]
        R = np.asarray(out["R"])
        alive = np.asarray(out["alive"])[:, -1]
        err = np.sqrt(((Y - R) ** 2).sum(-1)).mean(axis=1)
        print(f"linear qp={iters:2d} dual_shift={warm}: "
              f"err_mean={err.mean():.4f} worst={err.max():.4f} "
              f"alive={alive.mean():.4f} steps/s={B*(steps-1)/dt/1e6:.2f}M",
              flush=True)


def multiref_floor():
    import jax

    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.utils.trajectories import (
        get_circle,
        get_pacman,
        get_polygon,
        make_trajectory,
    )

    ks, blockM = build("bilinear")
    arm = bench_arm()
    steps = 301
    trajs = {
        "blockM": blockM["y"],
        "circle": make_trajectory(get_circle([0.0, -0.7], 0.3),
                                  T=15.0, Ts=0.05)["y"],
        "pacman": make_trajectory(get_pacman([0.0, -0.65], 0.3),
                                  T=15.0, Ts=0.05)["y"],
        "polygon": make_trajectory(get_polygon(
            [[-0.3, -0.5], [0.3, -0.5], [0.3, -0.9], [-0.3, -0.9]]),
            T=15.0, Ts=0.05)["y"],
    }
    n_x0 = int(os.environ.get("N_X0", "16"))
    loads = [(0.0, 0.0), (0.2, 0.1), (0.4, 0.2)]   # unmodeled disturbances
    names, refs, X0s, Ws = [], [], [], []
    for tname, y in trajs.items():
        for x00 in np.linspace(-0.2, 0.2, n_x0):
            for ld in loads:
                names.append((tname, float(x00), ld))
                refs.append(y)
                x0 = np.zeros(6, np.float32)
                x0[0] = x00
                X0s.append(x0)
                Ws.append(ld)
    X0 = np.stack(X0s)
    W = np.asarray(Ws, np.float32)
    print(f"{len(refs)} lanes: {len(trajs)} trajs x {n_x0} X0 x "
          f"{len(loads)} loads", flush=True)

    # variant = "iters,warm" (shift follows warm) or "iters,warm,shift"
    # (explicit, for the shift-on/off A/B at fixed warm -- verdict #7)
    variants = os.environ.get("SWEEP", "10,0 4,1 3,1 2,1")
    for v in variants.split():
        parts = tuple(int(x) for x in v.split(","))
        iters, warm = parts[0], parts[1]
        shift = parts[2] if len(parts) > 2 else warm
        cfg = mpc_cfg(qp_iters=iters, qp_dual_warm=bool(warm),
                      qp_dual_shift=bool(shift))
        sim = Ksim(arm, make_kmpc(ks.model, ks.scaler, cfg))
        out = sim.run_multi_ref(refs, X0, load=W, steps=steps)
        alive = out["alive"][:, -1]
        err = out["err"].mean(axis=1)
        print(f"bilinear qp={iters:2d} warm={warm} shift={shift}: "
              f"alive={alive.mean():.4f} err_mean={err.mean():.4f} "
              f"worst={err.max():.4f}", flush=True)
        # per-(traj, load) means at this config
        for tname in trajs:
            for ld in loads:
                sel = [i for i, (tn, _, l) in enumerate(names)
                       if tn == tname and l == ld]
                print(f"    {tname:8s} load={ld}: err={err[sel].mean():.4f} "
                      f"alive={alive[sel].mean():.3f}", flush=True)


def snake_floor():
    """Measured iteration floor for the SNAKE fourier model (round-4
    verdict #4): the library default qp_iters=10 has been justified since
    round 1 by "the snake fourier model needs the margin" without a
    recorded sweep.  Model-in-the-loop (no physical snake simulator
    exists; ``Kmpc.run_simulation`` semantics), B lanes with spread lifted
    initial states tracking a circle in the first two outputs, qp_iters x
    dual-warm x blocking grid.  Reference basis: ``Ksysid.m:694-767``.
    """
    import jax
    import jax.numpy as jnp

    from koopman_realizations_tpu.config import MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.control.ksim import KoopmanPlant
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.data import chop, get_data4sysid
    from koopman_realizations_tpu.utils.matio import load_data4sysid

    ds0 = load_data4sysid("/root/reference/datafiles/snake-data.mat")
    train = chop(ds0.train[0], num=6, length_s=40.0)
    val = [ds0.val[0].replace(y=ds0.val[0].y[:500], u=ds0.val[0].u[:500],
                              t=ds0.val[0].t[:500])]
    ds = get_data4sysid(train, val)
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear",
                                    obs_type=("fourier_sparser",),
                                    obs_degree=(1,),
                                    dtype="float32")).train_models()
    B = int(os.environ.get("BENCH_BATCH", "64"))
    steps = int(os.environ.get("STEPS", "150"))
    # circle reference in the first two output dims (test_snake config)
    t = np.linspace(0, 2 * np.pi, 200)
    y0 = np.asarray(ks.scaler.y_up(np.zeros(3)))
    ref = np.stack([y0[0] + 0.1 * np.cos(t) - 0.1, y0[1] + 0.1 * np.sin(t)],
                   axis=1)
    # spread lifted initial states: zeta perturbations in scaled space
    rng = np.random.default_rng(0)
    spread = float(os.environ.get("SPREAD", "0.15"))
    zetas = spread * rng.standard_normal((B, 3)).astype(np.float32)
    X0 = np.asarray(jax.vmap(ks.model.basis.lift)(jnp.asarray(zetas)))

    variants = os.environ.get("SWEEP", "10,0 8,0 5,1 4,1 3,1 2,1")
    for blocks in (None, (1, 1, 2, 5)):
        for iters, warm in [tuple(int(x) for x in v.split(","))
                            for v in variants.split()]:
            cfg = MpcConfig(horizon=10, input_bounds=(-10.0, 10.0),
                            input_slopeConst=0.5, cost_running=10.0,
                            cost_terminal=100.0, cost_input=(1e-3,),
                            proj_idx=(0, 1), qp_iters=iters,
                            qp_dual_warm=bool(warm),
                            qp_dual_shift=bool(warm), input_blocks=blocks)
            sim = Ksim(KoopmanPlant(ks.model, ks.scaler),
                       make_kmpc(ks.model, ks.scaler, cfg))
            out = sim.run_batch(ref, X0, steps=steps)
            alive = out["alive"][:, -1]
            err = out["err"].mean(axis=1)
            # death-step distribution: first step whose alive flag is
            # False per dead lane (start-infeasible vs late drift)
            dead = ~alive
            if dead.any():
                first = np.argmin(out["alive"], axis=1)[dead]
                dd = (f" death_steps p10/50/90="
                      f"{np.percentile(first, [10, 50, 90]).astype(int)}")
            else:
                dd = ""
            print(f"snake blocks={blocks} qp={iters:2d} dual={warm}: "
                  f"alive={alive.mean():.4f} err_mean={err.mean():.4f} "
                  f"worst={err.max():.4f}{dd}", flush=True)


def main():
    import jax

    if os.environ.get("FORCE_CPU"):
        # run the quality grid on the local CPU (e.g. while the TPU pool
        # is claimed); pair with `env -u PALLAS_AXON_POOL_IPS`
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    mode = os.environ.get("MODE", "linear")
    if mode == "linear":
        linear_floor()
    elif mode == "multiref":
        multiref_floor()
    elif mode == "snake":
        snake_floor()
    else:
        raise SystemExit(f"unknown MODE={mode}")


if __name__ == "__main__":
    main()
