"""FISTA convergence at paper scale: iters sweep + adaptive restart."""
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
from koopman_realizations_tpu.ops.lasso import lasso_constrained_lstsq_f64
from koopman_realizations_tpu.utils.matio import load_data4sysid

REF = "/root/reference/datafiles/arm-3link-markers-noload-50trials_train-10_val-5.mat"

data = load_data4sysid(REF)
cfg = SysidConfig(model_type="linear", obs_type=("poly",), obs_degree=(3,))
ks = Ksysid(data, cfg)
Px, Py = ks.lift_snapshot_matrices()
Px = np.asarray(Px, np.float64)
Py = np.asarray(Py, np.float64)
G = Px.T @ Px
print("cond(G) =", np.linalg.cond(G))
K_ls = np.linalg.lstsq(Px, Py, rcond=None)[0]
budget = 0.5 * np.abs(K_ls).sum()
obj = lambda K: float(((Px @ K - Py) ** 2).sum())

for iters in (2000, 8000, 32000, 100000):
    t0 = time.time()
    K = lasso_constrained_lstsq_f64(Px, Py, budget, iters=iters)
    print(f"iters={iters:7d}  {time.time()-t0:6.1f}s  obj={obj(K):.12g}  "
          f"L1={np.abs(K).sum():.9g}")


def fista_restart(Px, Py, t, iters):
    """FISTA with function-value adaptive restart (O'Donoghue-Candes)."""
    from koopman_realizations_tpu.ops.lasso import lasso_constrained_lstsq_f64 as _
    G = Px.T @ Px
    H = Px.T @ Py
    nm = G.shape[0]
    v = np.ones(nm) / np.sqrt(nm)
    for _i in range(30):
        v = G @ v
        v /= np.linalg.norm(v)
    L = 2.0 * max(float(v @ (G @ v)), 1e-12)

    def proj_ball(v, tt):
        av = np.abs(v)
        if av.sum() <= tt:
            return v
        u = np.sort(av)[::-1]
        css = np.cumsum(u)
        k = np.arange(1, v.shape[0] + 1, dtype=v.dtype)
        cond = u * k > (css - tt)
        rho = np.max(np.where(cond, np.arange(v.shape[0]), -1))
        theta = (css[rho] - tt) / (rho + 1.0)
        return np.sign(v) * np.maximum(av - theta, 0.0)

    proj = lambda K: proj_ball(K.reshape(-1), t).reshape(K.shape)
    K = proj(np.zeros_like(H))
    Z, tk = K, 1.0
    for _i in range(iters):
        grad = 2.0 * (G @ Z - H)
        K_new = proj(Z - grad / L)
        # gradient-mapping restart: momentum fighting descent direction
        if np.vdot(Z - K_new, K_new - K) > 0:
            tk = 1.0
        t_new = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * tk ** 2))
        Z = K_new + ((tk - 1.0) / t_new) * (K_new - K)
        K, tk = K_new, t_new
    return K


for iters in (2000, 8000, 32000):
    t0 = time.time()
    K = fista_restart(Px, Py, budget, iters)
    print(f"restart iters={iters:7d}  {time.time()-t0:6.1f}s  "
          f"obj={obj(K):.12g}  L1={np.abs(K).sum():.9g}")
