"""Prototype for tests/test_lasso_cert.py: calibrate tolerances/runtime."""
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from koopman_realizations_tpu.config import SysidConfig
from koopman_realizations_tpu.models.edmd import Ksysid
from koopman_realizations_tpu.ops.lasso import (
    lasso_constrained_lstsq_f64,
    lasso_oracle_constrained,
    lasso_oracle_penalized,
)
from koopman_realizations_tpu.utils.matio import load_data4sysid

REF = "/root/reference/datafiles/arm-3link-markers-noload-50trials_train-10_val-5.mat"


def main():
    data = load_data4sysid(REF)
    cfg = SysidConfig(model_type="linear", obs_type=("poly",),
                      obs_degree=(3,))
    ks = Ksysid(data, cfg)
    Px, Py = ks.lift_snapshot_matrices()
    Px = np.asarray(Px, np.float64)
    Py = np.asarray(Py, np.float64)
    G, H = Px.T @ Px, Px.T @ Py
    K_ls = np.linalg.lstsq(Px, Py, rcond=None)[0]
    budget = 0.5 * np.abs(K_ls).sum()
    obj = lambda K: float(((Px @ K - Py) ** 2).sum())

    t0 = time.time()
    K_f = lasso_constrained_lstsq_f64(Px, Py, budget,
                                      iters=cfg.lasso_iters,
                                      tol=cfg.lasso_tol)
    tf = time.time() - t0
    f_f = obj(K_f)
    l1_f = np.abs(K_f).sum()
    print(f"FISTA(default cfg): {tf:.1f}s  obj={f_f:.12g}  L1={l1_f:.9g} "
          f"(budget {budget:.9g})")

    # multiplier estimate from FISTA's own KKT gradient
    g = 2.0 * (G @ K_f - H)
    nz = np.abs(K_f) > 1e-9
    mu_hat = float(np.median(-g[nz] * np.sign(K_f[nz])))
    print(f"mu_hat from FISTA KKT: {mu_hat:.6g}")

    t0 = time.time()
    K_o, mu = lasso_oracle_constrained(G, H, budget, 0.5 * mu_hat,
                                       2.0 * mu_hat, K_f,
                                       bisect_steps=25)
    to = time.time() - t0
    f_o, l1_o = obj(K_o), np.abs(K_o).sum()
    print(f"oracle: {to:.1f}s  mu={mu:.6g}  obj={f_o:.12g}  L1={l1_o:.9g}")

    # oracle KKT certificate at mu
    g_o = 2.0 * (G @ K_o - H)
    nzo = np.abs(K_o) > 1e-12
    kkt_nz = np.abs(g_o[nzo] + mu * np.sign(K_o[nzo])).max()
    kkt_z = max(0.0, np.abs(g_o[~nzo]).max() - mu)
    print(f"oracle KKT: nz dev {kkt_nz:.3g}  z excess {kkt_z:.3g}")

    # weak-duality lower bound on the constrained optimum
    lower = f_o + mu * (l1_o - budget)
    gap = f_f - lower
    print(f"duality gap: {gap:.3g} abs, {gap / f_f:.3e} rel")
    print(f"elementwise max |K_f - K_o| = {np.abs(K_f - K_o).max():.3e}")


if __name__ == "__main__":
    main()
