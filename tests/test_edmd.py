"""Tests for the EDMD trainer (Ksysid equivalent)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from koopman_realizations_tpu.config import SysidConfig
from koopman_realizations_tpu.models.edmd import Ksysid
from koopman_realizations_tpu.models.koopman import rollout
from koopman_realizations_tpu.ops.lasso import lasso_constrained_lstsq, project_l1_ball
from koopman_realizations_tpu.types import DataSet, Trial


def _linear_system_dataset(rng, T=300, trials=4):
    """Ground-truth linear system y+ = A y + B u (poly-1 EDMD is exact)."""
    A = np.array([[0.9, 0.1], [-0.05, 0.8]])
    B = np.array([[0.1], [0.2]])
    out = []
    for _ in range(trials):
        y = np.zeros((T, 2))
        u = rng.uniform(-1, 1, (T, 1))
        for k in range(T - 1):
            y[k + 1] = A @ y[k] + B @ u[k]
        out.append(Trial(t=np.arange(T) * 0.1, y=y, u=u))
    return DataSet(train=out[:-1], val=out[-1:]), A, B


def test_linear_edmd_recovers_true_system(rng):
    ds, A, B = _linear_system_dataset(rng)
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(1,))
    ks = Ksysid(ds, cfg).train_models()
    # model works in scaled coordinates: A_sc = S A S^-1, B_sc = S B Su^-1
    # with diagonal scalings; check the rollout instead of raw matrices.
    res = ks.val_model(ks.model, ks.valdata[0])
    assert float(jnp.max(res["error"]["abs"])) < 1e-8


def test_c_times_lift_recovers_state(arm_dataset):
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(2,))
    ks = Ksysid(arm_dataset, cfg)
    z = np.asarray(ks.traindata.y)[17]
    g = ks.basis.lift(jnp.asarray(z))
    # C selects the first n lifted coordinates == zeta
    np.testing.assert_allclose(np.asarray(g)[: ks.n], z, rtol=1e-12)


def test_snapshot_pairs_drop_trial_boundaries(arm_dataset):
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(1,))
    ks = Ksysid(arm_dataset, cfg)
    sp = ks.snapshot_pairs
    # 10 trials x 1201 steps: 12010 rows -> 12009 candidate pairs, minus 9
    # boundary pairs, reference drops one more (num_max = P-1)
    assert sp.alpha.shape[0] == 12010 - 1 - 9 - 1
    # every pair must be a true one-step transition within some trial
    y = np.asarray(ks.traindata.y)
    i = 137
    row = np.where((y == sp.alpha[i]).all(axis=1))[0]
    assert len(row) >= 1
    assert any((y[r + 1] == sp.beta[i]).all() for r in row)


def test_snapshot_subsampling(arm_dataset):
    """``snapshots=N`` subsamples N pairs without replacement
    (``get_snapshotPairs:973-975``; seeded Generator instead of the
    reference's mlfg6331_64 stream) and the model still trains."""
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(2,),
                      snapshots=500)
    ks = Ksysid(arm_dataset, cfg)
    sp = ks.snapshot_pairs
    assert sp.alpha.shape[0] == 500
    # pairs remain true one-step transitions after subsampling
    y = np.asarray(ks.traindata.y)
    row = np.where((y == sp.alpha[42]).all(axis=1))[0]
    assert any((y[r + 1] == sp.beta[42]).all() for r in row)
    ks.train_models()
    assert np.all(np.isfinite(np.asarray(ks.model.A)))


def test_arm_bilinear_beats_linear(arm_dataset):
    lin = Ksysid(arm_dataset, SysidConfig(model_type="linear",
                                          obs_type=("poly",), obs_degree=(3,),
                                          dim_red=True)).train_models()
    bil = Ksysid(arm_dataset, SysidConfig(model_type="bilinear",
                                          obs_type=("poly",), obs_degree=(3,),
                                          dim_red=True)).train_models()
    e_lin = float(lin.val_model(lin.model, lin.valdata[0])["error"]["euclid_mean"])
    e_bil = float(bil.val_model(bil.model, bil.valdata[0])["error"]["euclid_mean"])
    # paper story: bilinear realization is far more accurate than linear
    assert e_bil < 0.25
    assert e_bil < e_lin / 2


def test_dim_red_basis_dimensions(arm_dataset):
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(3,),
                      dim_red=True)
    ks = Ksysid(arm_dataset, cfg)
    assert ks.basis.pcs is not None
    npcs = ks.basis.pcs.shape[1]
    assert ks.N == ks.nzeta + npcs + 1       # Ksysid.m:1516
    assert ks.N < 84                          # smaller than the full basis


def test_project_l1_ball():
    v = jnp.asarray(np.array([3.0, -1.0, 0.5]))
    p = project_l1_ball(v, 10.0)
    np.testing.assert_allclose(np.asarray(p), np.asarray(v))  # inside: no-op
    p2 = np.asarray(project_l1_ball(v, 2.0))
    assert abs(np.abs(p2).sum() - 2.0) < 1e-9
    np.testing.assert_allclose(p2, [2.0, 0.0, 0.0])  # soft-threshold by 1


def test_lasso_matches_lstsq_for_large_budget(rng):
    A = rng.standard_normal((200, 10))
    X = rng.standard_normal((10, 10))
    B = A @ X
    K = np.asarray(lasso_constrained_lstsq(A, B, 1e6, iters=500))
    np.testing.assert_allclose(K, X, atol=1e-6)


def test_lasso_budget_respected(rng):
    A = rng.standard_normal((100, 8))
    B = rng.standard_normal((100, 8))
    t = 3.0
    K = np.asarray(lasso_constrained_lstsq(A, B, t, iters=1000))
    assert np.abs(K).sum() <= t + 1e-8


def test_lasso_f64_mirror_matches_jax(rng):
    """The host float64 FISTA (used by Ksysid regardless of the x64 flag)
    must reproduce the JAX implementation step for step (here both run
    f64 under the test env's x64)."""
    from koopman_realizations_tpu.ops.lasso import lasso_constrained_lstsq_f64

    A = rng.standard_normal((120, 9))
    B = rng.standard_normal((120, 9))
    pin = np.zeros((9, 9), bool)
    pin[0, 0] = True
    for t, mask in ((4.0, None), (6.0, pin)):
        Kj = np.asarray(lasso_constrained_lstsq(A, B, t, pin_mask=mask,
                                                iters=800))
        Kn = lasso_constrained_lstsq_f64(A, B, t, pin_mask=mask, iters=800)
        np.testing.assert_allclose(Kn, Kj, atol=1e-9)


def test_delays_pipeline_runs(arm_dataset):
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(1,),
                      delays=1)
    ks = Ksysid(arm_dataset, cfg).train_models()
    assert ks.nzeta == 6 * 2 + 3
    res = ks.val_model(ks.model, ks.valdata[0])
    assert np.isfinite(float(res["error"]["euclid_mean"]))


def test_nonlinear_model_runs(arm_dataset):
    # dim_red as in example_sysid.m; the raw deg-2 nonlinear rollout can
    # diverge without regularization (reference uses lasso=4 in the ensemble)
    cfg = SysidConfig(model_type="nonlinear", obs_type=("poly",), obs_degree=(2,),
                      dim_red=True)
    ks = Ksysid(arm_dataset, cfg).train_models()
    res = ks.val_model(ks.model, ks.valdata[0])
    assert float(res["error"]["euclid_mean"]) < 0.5


def test_loaded_pipeline(rng):
    """Loaded system: dynamics scale with a constant per-trial load w."""
    trials = []
    for w0 in [0.2, 0.5, -0.4, 0.9]:
        T = 200
        y = np.zeros((T, 1))
        u = rng.uniform(-1, 1, (T, 1))
        for k in range(T - 1):
            # load enters the state dynamics: representable as the w-block of
            # the loaded A matrix (B itself is load-independent, as in the
            # reference's loaded linear realization)
            y[k + 1] = (0.8 - 0.3 * w0) * y[k] + 0.3 * u[k]
        trials.append(Trial(t=np.arange(T) * 0.1, y=y, u=u,
                            w=np.full((T, 1), w0)))
    ds = DataSet(train=trials[:3], val=trials[-1:])
    cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(2,),
                      loaded=True)
    ks = Ksysid(ds, cfg).train_models()
    assert ks.nw == 1
    assert ks.model.A.shape[0] == ks.N * 2
    res = ks.val_model(ks.model, ks.valdata[0])
    assert float(res["error"]["euclid_mean"]) < 0.05
