"""Concurrent scenarios with per-lane reference trajectories."""

import numpy as np
import pytest

from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
from koopman_realizations_tpu.control import Ksim, make_kmpc
from koopman_realizations_tpu.models.arm import Arm
from koopman_realizations_tpu.models.edmd import Ksysid
from koopman_realizations_tpu.utils.trajectories import (
    get_circle,
    get_pacman,
    make_trajectory,
)


def test_run_multi_ref_trajectories(arm_dataset, blockM_ref):
    ks = Ksysid(arm_dataset, SysidConfig(model_type="bilinear",
                                         obs_type=("poly",), obs_degree=(3,),
                                         dim_red=True)).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(3e-3, 2e-3, 1e-3), proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=5))
    sim = Ksim(arm, mpc)

    circle = make_trajectory(get_circle([0.0, -0.7], 0.3), T=15.0, Ts=0.05)
    pac = make_trajectory(get_pacman([0.0, -0.65], 0.3), T=15.0, Ts=0.05)
    refs = [blockM_ref["y"], circle["y"], pac["y"]]
    X0 = np.zeros((3, 6))
    out = sim.run_multi_ref(refs, X0, steps=100)
    assert out["alive"][:, -1].all()
    # every trajectory tracked in the bilinear accuracy class
    assert out["err"].mean(axis=1).max() < 0.06
    # lane 0 matches a truncated single-ref run away from the horizon tail
    res0 = sim.run_trial_mpc(blockM_ref["y"], steps=100)
    np.testing.assert_allclose(out["err"][0][:85], res0["err"][:85],
                               atol=1e-9)


def test_diverging_lane_freezes_finite(arm_dataset, blockM_ref):
    """A lane whose plant state diverges freezes with finite records."""
    ks = Ksysid(arm_dataset, SysidConfig(model_type="bilinear",
                                         obs_type=("poly",), obs_degree=(3,),
                                         dim_red=True)).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(3e-3, 2e-3, 1e-3), proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=2))
    sim = Ksim(arm, mpc)
    # absurd initial joint velocities push the integrator into divergence
    X0 = np.zeros((2, 6))
    X0[1, 3:] = 1e6
    out = sim.run_batch(blockM_ref["y"], X0, steps=40)
    assert out["alive"][0, -1]            # normal lane unaffected
    assert not out["alive"][1, -1]        # diverging lane frozen
    assert np.isfinite(out["err"][0]).all()
    # the WHOLE error trace stays finite -- including every step after the
    # freeze point (masking by alive would exclude exactly the frozen
    # entries the freeze logic must protect)
    assert np.isfinite(out["err"][1]).all()
    assert np.isfinite(out["Y"][1]).all()


def test_batch_matches_single_with_nonzero_x0(arm_dataset, blockM_ref):
    """run_batch lanes must reproduce run_trial_mpc(x0=...) exactly for
    NONZERO initial states (regression: the batched runners re-seeded only
    (x, y) from each lane's x0 and left the measurement window ywin on the
    zero state, so every lane's first solve used the wrong current state)."""
    ks = Ksysid(arm_dataset, SysidConfig(model_type="bilinear",
                                         obs_type=("poly",), obs_degree=(3,),
                                         dim_red=True)).train_models()
    cfg = MpcConfig(horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
                    input_slopeConst=1e-1, cost_running=10.0,
                    cost_terminal=100.0,
                    cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2),
                    proj_idx=(4, 5))
    sim = Ksim(Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                             output_type="markers", substeps=5)),
               make_kmpc(ks.model, ks.scaler, cfg))
    X0 = np.zeros((3, 6))
    X0[1, 0] = 0.15
    X0[2, 0] = -0.2
    out = sim.run_batch(blockM_ref["y"], X0, steps=25)
    for b in (1, 2):
        single = sim.run_trial_mpc(blockM_ref["y"], x0=X0[b], steps=25)
        np.testing.assert_allclose(out["Y"][b], np.asarray(single["Y"]),
                                   rtol=0, atol=1e-5)


def test_run_multi_ref_nmpc(arm_dataset, blockM_ref):
    """Per-lane reference trajectories through the NMPC controller (the
    fused kernel's per-lane sqRef path on TPU; pure path here)."""
    ks = Ksysid(arm_dataset, SysidConfig(model_type="nonlinear",
                                         obs_type=("poly",), obs_degree=(3,),
                                         dim_red=True, pca_explained=99.99,
                                         dtype="float32")).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5),
        input_blocks=(1, 1, 2, 5), qp_iters=8))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    sim = Ksim(arm, mpc)
    circle = make_trajectory(get_circle([0.0, -0.7], 0.3), T=15.0, Ts=0.05)
    out = sim.run_multi_ref([blockM_ref["y"], circle["y"]], np.zeros((2, 6)),
                            steps=60)
    assert out["alive"][:, -1].all()
    assert np.isfinite(out["err"]).all()
    assert out["err"].mean(axis=1).max() < 0.08


@pytest.mark.parametrize("blocks,qp_iters,shift", [
    (None, 2, True),            # retired round-2 unblocked floor: the
                                # stage shift is REQUIRED there
    ((1, 1, 2, 5), 3, False),   # SHIPPING blocked bench config (round 4:
                                # shift dropped, A/B-neutral blocked)
], ids=["unblocked-qp2", "blocked-qp3"])
def test_multi_ref_rti_floor_config(arm_dataset, blockM_ref, blocks,
                                    qp_iters, shift):
    """The bilinear RTI regimes (dual warm, bench.py) must hold every-lane
    survival and near-qp=10 tracking across trajectories x initial
    conditions x unmodeled loads -- the CI-sized version of
    scripts/rti_floor_sweep.py MODE=multiref (round-3 verdict #3).
    Measured full-grid references (192 lanes, 301 steps): unblocked
    qp=2+shift alive 1.0, err_mean 0.0186 vs 0.0179 at qp=10, worst
    0.0387; blocked (1,1,2,5) qp=3 err_mean 0.0187 (shift off; round-4
    A/B: shift-on 0.0188 -- neutral), alive 1.0 everywhere."""
    ks = Ksysid(arm_dataset, SysidConfig(model_type="bilinear",
                                         obs_type=("poly",), obs_degree=(3,),
                                         dim_red=True)).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8),
        input_slopeConst=1e-1, cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5),
        qp_iters=qp_iters, qp_dual_warm=True, qp_dual_shift=shift,
        input_blocks=blocks))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    sim = Ksim(arm, mpc)

    circle = make_trajectory(get_circle([0.0, -0.7], 0.3), T=15.0, Ts=0.05)
    pac = make_trajectory(get_pacman([0.0, -0.65], 0.3), T=15.0, Ts=0.05)
    refs, X0s, Ws = [], [], []
    for y in (blockM_ref["y"], circle["y"], pac["y"]):
        for x00 in (-0.2, 0.2):
            for ld in ((0.0, 0.0), (0.4, 0.2)):
                refs.append(y)
                x0 = np.zeros(6)
                x0[0] = x00
                X0s.append(x0)
                Ws.append(ld)
    out = sim.run_multi_ref(refs, np.stack(X0s),
                            load=np.asarray(Ws, np.float32), steps=150)
    alive = out["alive"][:, -1]
    assert alive.all(), \
        f"lanes died at qp_iters={qp_iters}: {np.where(~alive)[0]}"
    err = out["err"].mean(axis=1)
    assert err.mean() < 0.04, err.mean()
    assert err.max() < 0.08, err.max()
