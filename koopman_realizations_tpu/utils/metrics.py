"""Error metrics for validation rollouts (``Ksysid.get_error:1882-1898``)."""

from __future__ import annotations

import jax.numpy as jnp


def get_error(ysim, yreal, scaler=None) -> dict:
    """Error struct between simulated and real outputs (scaled space).

    Matches the reference fields: abs, mean, rmse, nrmse, euclid,
    euclid_mean, and unscaled.euclid(_mean) when a scaler is provided.
    """
    ysim = jnp.asarray(ysim)
    yreal = jnp.asarray(yreal)
    T = yreal.shape[0]
    err = {}
    err["abs"] = jnp.abs(ysim - yreal)
    err["mean"] = jnp.mean(err["abs"], axis=0)
    err["rmse"] = jnp.sqrt(jnp.sum((ysim - yreal) ** 2, axis=0) / T)
    rng = jnp.abs(jnp.max(yreal, axis=0) - jnp.min(yreal, axis=0))
    err["nrmse"] = err["rmse"] / rng
    err["euclid"] = jnp.sqrt(jnp.sum((ysim - yreal) ** 2, axis=1))
    err["euclid_mean"] = jnp.sum(err["euclid"]) / T
    if scaler is not None:
        ys, yr = scaler.y_up(ysim), scaler.y_up(yreal)
        eu = jnp.sqrt(jnp.sum((ys - yr) ** 2, axis=1))
        err["unscaled"] = {"euclid": eu, "euclid_mean": jnp.sum(eu) / T}
    return err


def tracking_error(R, Y, proj_idx) -> jnp.ndarray:
    """Per-step Euclidean tracking error (``Ksim.m:258``), unscaled space."""
    Y = jnp.asarray(Y)[:, jnp.asarray(proj_idx)]
    return jnp.sqrt(jnp.sum((jnp.asarray(R) - Y) ** 2, axis=-1))
