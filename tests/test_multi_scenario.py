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
