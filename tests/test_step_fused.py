"""Parity of the single-launch step-fused closed loop vs the general
runner (``ops.pallas.step_fused`` / ``Ksim.fused_runner``).

The fused kernel must reproduce the unfused path's closed-loop behavior
lane-for-lane: same alive masks, same tracked outputs to f32
kernel-vs-pure tolerance (the QP runs on the Pallas core in interpret
mode here, the general runner on the pure-JAX solver, so trajectories
drift at f32 roundoff rate -- bounded, not bitwise).
"""

import numpy as np
import pytest

import jax

from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
from koopman_realizations_tpu.control import Ksim, make_kmpc
from koopman_realizations_tpu.models.arm import Arm
from koopman_realizations_tpu.models.edmd import Ksysid
from koopman_realizations_tpu.utils.matio import (
    load_data4sysid,
    load_ref_trajectory,
)

DATAFILE = ("/root/reference/datafiles/"
            "arm-3link-markers-noload-50trials_train-10_val-5.mat")
REFTRAJ = ("/root/reference/trajectories/files/"
           "blockM_c0p45-0p35_0p5x0p5_15sec.mat")


@pytest.fixture(scope="module")
def bench_sim():
    ds = load_data4sysid(DATAFILE)
    ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                obs_degree=(3,), dim_red=True,
                                dtype="float32")).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=3, qp_dual_warm=True, qp_dual_shift=False,
        input_blocks=(1, 1, 2, 5),
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8), input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=2,
                        jac_mode="step"))
    return Ksim(arm, mpc), load_ref_trajectory(REFTRAJ)


def test_fused_runner_matches_general(bench_sim):
    sim, ref = bench_sim
    assert sim.fused_step_eligible()
    B, steps = 4, 30
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)
    out_f = jax.block_until_ready(
        sim.fused_runner(ref["y"], steps=steps)(X0, W))
    out_b = jax.block_until_ready(
        sim.batched_runner(ref["y"], steps=steps,
                           record=("Yp", "alive"))(X0, W))
    af = np.asarray(out_f["alive"])
    ab = np.asarray(out_b["alive"])
    assert af.shape == ab.shape == (B, steps - 1)
    assert af.all() and ab.all()
    Yf = np.asarray(out_f["Yp"])
    Yb = np.asarray(out_b["Yp"])
    d = np.abs(Yf - Yb)
    # kernel-vs-pure f32 drift over 30 closed-loop steps (measured 1.5e-4
    # max at head commit; bound leaves headroom without hiding blowups)
    assert d.max() < 2e-3, d.max()
    assert d[:, :5].max() < 2e-5, d[:, :5].max()


def test_fused_runner_rejects_ineligible(bench_sim):
    sim, ref = bench_sim
    import dataclasses

    from koopman_realizations_tpu.control.kmpc import BilinearKmpc
    # unblocked controller: not eligible (no lift-fused generators)
    cfg2 = dataclasses.replace(sim.mpc.cfg, input_blocks=None)
    mpc2 = BilinearKmpc(sim.mpc.model, sim.scaler, cfg2)
    sim2 = Ksim(sim.plant, mpc2)
    assert not sim2.fused_step_eligible()
    with pytest.raises(ValueError):
        sim2.fused_runner(ref["y"], steps=10)
    # unsupported record set on the eligible sim
    with pytest.raises(ValueError):
        sim.fused_runner(ref["y"], steps=10, record=("Y", "alive"))


@pytest.fixture(scope="module")
def linear_sim():
    ds = load_data4sysid(DATAFILE)
    ks = Ksysid(ds, SysidConfig(model_type="linear", obs_type=("poly",),
                                obs_degree=(3,), dim_red=True,
                                dtype="float32")).train_models()
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=3, qp_dual_warm=False,
        input_blocks=(1, 1, 2, 5),
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8), input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3, newton_iters=1,
                        jac_mode="step"))
    return Ksim(arm, mpc), load_ref_trajectory(REFTRAJ)


def test_linear_fused_runner_matches_general(linear_sim):
    """LINEAR-controller fused step (shared-Hessian kernel + plant in one
    launch).  The verified linear floor runs qp_iters=3 COLD, so single
    solves are far from convergence and the kernel-vs-pure iterate gap is
    wider than the bilinear case (the gradient generators themselves are
    exact to 1.5e-8 -- verified in-round); the bound here catches wiring
    errors, and large-batch TPU runs pin floor-class closed-loop quality
    (err 0.1310 vs the recorded 0.1313 floor, alive 1.0 at B=262144)."""
    sim, ref = linear_sim
    assert sim.fused_step_eligible()
    B, steps = 4, 30
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W = np.zeros((B, 2), np.float32)
    out_f = jax.block_until_ready(
        sim.fused_runner(ref["y"], steps=steps)(X0, W))
    out_b = jax.block_until_ready(
        sim.batched_runner(ref["y"], steps=steps,
                           record=("Yp", "alive"))(X0, W))
    assert np.asarray(out_f["alive"]).all()
    assert np.asarray(out_b["alive"]).all()
    d = np.abs(np.asarray(out_f["Yp"]) - np.asarray(out_b["Yp"]))
    assert d.max() < 0.06, d.max()
    assert d[:, :5].max() < 0.02, d[:, :5].max()
