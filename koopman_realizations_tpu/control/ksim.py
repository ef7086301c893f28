"""Closed-loop plant-in-the-loop MPC simulation (reference class ``Ksim``).

``Ksim.run_trial_mpc:47-262`` is a MATLAB while-loop doing, per 50 ms step:
estimate load -> slice reference horizon -> solve MPC QP -> step the true
plant -> record.  Here the entire loop is ONE ``lax.scan`` body, so it jits
to a single XLA program; ``vmap`` over the scan runs thousands of scenarios
per chip and ``shard_map`` spreads lanes across the mesh (see
``parallel.scenarios``).

Reference bookkeeping quirks reproduced for golden-file parity:
- the plant consumes the input chosen at the *previous* step
  (``Ksim.m:239-246``: ``u_k = results.U(end,:)``),
- the applied input each step is the *second* row of the MPC plan
  (``Ksim.m:225``),
- the recorded reference row at step k is ``ref[k-1]`` (``Ksim.m:254``), so
  the error trace compares ``Y[k]`` with ``ref[k-1]``.
- infeasible solves: the reference breaks the loop (``:220-222``); here the
  lane freezes and reports ``alive=False`` from that step on.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from koopman_realizations_tpu.models.koopman import NonlinearModel
from koopman_realizations_tpu.utils.metrics import tracking_error


class Ksim:
    """Closed-loop harness binding a plant, a controller, and scaling."""

    def __init__(self, plant, mpc, observer=None):
        self.plant = plant
        self.mpc = mpc
        self.scaler = mpc.scaler
        self.observer = observer     # optional load observer (control.observer)
        self.meta = mpc.meta
        self.nd = self.meta.nd

    # ------------------------------------------------------------------
    def _lift_current(self, zeta, what):
        model = self.mpc.model
        if isinstance(model, NonlinearModel):
            return zeta
        basis = model.basis
        if self.meta.nw > 0:
            return basis.lift_loaded(zeta, what)
        return basis.lift(zeta)

    def step_fn(self, ref_padded, w_seq):
        """Build the jittable scan body closed over the reference and loads.

        ref_padded: (K + Np + 1, nproj) scaled reference with the last row
        repeated; w_seq: (K, nw_plant) true load per step (zeros if none).
        """
        mpc = self.mpc
        plant = self.plant
        scaler = self.scaler
        nd = self.nd
        Np = mpc.Np
        nproj = mpc.nproj

        def body(carry, k):
            x, ywin, uwin, u_prev, what, alive = carry

            # zeta from the trailing windows (newest last)
            parts = [ywin[-1]]
            for j in range(1, nd + 1):
                parts.append(ywin[-1 - j])
            for j in range(1, nd + 1):
                parts.append(uwin[-1 - j])
            zeta = jnp.concatenate(parts)

            # load estimate (observer wired via self.observer)
            if self.observer is not None:
                what = self.observer(k, ywin, uwin, what)

            z = self._lift_current(zeta, what)
            refhor = jax.lax.dynamic_slice(
                ref_padded, (k, 0), (Np + 1, nproj))
            U, ok = mpc.solve(z, uwin[-1], refhor)
            u_next_sc = U[1]
            u_next = scaler.u_up(u_next_sc)

            # plant step with the previously chosen input (Ksim.m:239-246)
            w_k = w_seq[k]
            x_new = plant.simulate_Ts(x, u_prev, w_k)
            y_new = plant.get_y(x_new)

            # freeze dead lanes (reference: break on NaN solution)
            alive = alive & ok
            keep = lambda new, old: jnp.where(alive, new, old)
            x1 = keep(x_new, x)
            y1 = plant.get_y(x1)
            ywin1 = keep(jnp.concatenate([ywin[1:], scaler.y_down(y_new)[None]]),
                         ywin)
            uwin1 = keep(jnp.concatenate([uwin[1:], u_next_sc[None]]), uwin)
            u_prev1 = keep(u_next, u_prev)

            ref_rec = refhor[0]
            out = {
                "U": keep(u_next, jnp.nan * u_next),
                "Y": y1,
                "X": x1,
                "R": scaler.ref_up(ref_rec, mpc.proj_idx),
                "Z": z,
                "what": what,
                "alive": alive,
            }
            return (x1, ywin1, uwin1, u_prev1, what, alive), out

        return body

    def run_trial_mpc(self, ref, x0=None, u0=None, load=None,
                      steps: Optional[int] = None) -> dict:
        """Run one closed-loop trial (``Ksim.run_trial_mpc``).

        ref: (K, nproj) UNscaled reference trajectory; x0 (nx,), u0 (m,)
        initial plant state / input (default zeros); load: None, (nw,), or
        (K, nw) true load trajectory applied to the plant.
        """
        fn, init, xs = self._build(ref, x0, u0, load, steps)
        carry, out = jax.lax.scan(fn, init, xs)
        return self._package(ref, out)

    def _build(self, ref, x0, u0, load, steps):
        mpc, plant, scaler = self.mpc, self.plant, self.scaler
        nd, Np = self.nd, mpc.Np
        K = ref.shape[0] if steps is None else steps
        dtype = jnp.asarray(np.asarray(mpc.model.C)).dtype

        ref_sc = np.asarray(scaler.ref_down(ref, mpc.proj_idx), float)
        ref_padded = np.concatenate(
            [ref_sc, np.tile(ref_sc[-1:], (Np + 1, 1))], axis=0)

        if load is None:
            w_seq = np.zeros((K, 2))
        else:
            load = np.asarray(load, float)
            w_seq = np.tile(load, (K, 1)) if load.ndim == 1 else load[:K]

        x0 = np.zeros(plant.cfg.nx) if x0 is None else np.asarray(x0, float)
        u0 = np.zeros(self.meta.m) if u0 is None else np.asarray(u0, float)
        y0 = np.asarray(plant.get_y(jnp.asarray(x0)))

        ywin0 = jnp.tile(jnp.asarray(scaler.y_down(y0), dtype)[None],
                         (nd + 1, 1))
        uwin0 = jnp.tile(jnp.asarray(scaler.u_down(u0), dtype)[None],
                         (nd + 1, 1))
        what0 = jnp.zeros((self.meta.nw,), dtype)
        init = (jnp.asarray(x0, dtype), ywin0, uwin0, jnp.asarray(u0, dtype),
                what0, jnp.asarray(True))
        body = self.step_fn(jnp.asarray(ref_padded, dtype),
                            jnp.asarray(w_seq, dtype))
        ks = jnp.arange(1, K)     # reference loop runs k = 1 .. K-1
        return body, init, ks

    def _package(self, ref, out) -> dict:
        """Assemble the reference's results-struct schema (``Ksim.m:129-258``)."""
        Y = np.asarray(out["Y"])
        R = np.asarray(out["R"])
        err = np.asarray(tracking_error(R, Y, self.mpc.proj_idx))
        Ts = self.meta.Ts
        K1 = Y.shape[0]
        return {
            "T": np.arange(1, K1 + 1) * Ts,
            "U": np.asarray(out["U"]),
            "Y": Y,
            "R": R,
            "X": np.asarray(out["X"]),
            "Z": np.asarray(out["Z"]),
            "What": np.asarray(out["what"]),
            "alive": np.asarray(out["alive"]),
            "err": err,
        }

    # ------------------------------------------------------ batched variant

    def run_batch(self, ref, X0, U0=None, load=None, steps=None) -> dict:
        """vmap the whole closed loop over scenario axis 0 of X0 (and load).

        All scenarios share the reference trajectory; X0: (B, nx);
        load: optional (B, nw).  Returns stacked results (leading axis B).
        """
        body, init, xs = self._build(ref, None, U0, None, steps)
        K = xs.shape[0] + 1

        def one(x0, w):
            w_seq = jnp.tile(w[None, :], (K, 1))
            fn = self.step_fn(*self._ref_and_w(ref, w_seq, K))
            x0c = (jnp.asarray(x0),) + init[1:]
            _, out = jax.lax.scan(fn, x0c, xs)
            return out

        B = X0.shape[0]
        if load is None:
            load_b = jnp.zeros((B, 2))
        else:
            load_b = jnp.asarray(load)
        out = jax.jit(jax.vmap(one))(jnp.asarray(X0), load_b)
        Y = np.asarray(out["Y"])
        R = np.asarray(out["R"])
        err = np.sqrt(((R - Y[..., list(self.mpc.proj_idx)]) ** 2).sum(-1))
        return {"Y": Y, "R": R, "U": np.asarray(out["U"]),
                "alive": np.asarray(out["alive"]), "err": err}

    def _ref_and_w(self, ref, w_seq, K):
        mpc, scaler = self.mpc, self.scaler
        ref_sc = np.asarray(scaler.ref_down(ref, mpc.proj_idx), float)
        ref_padded = np.concatenate(
            [ref_sc, np.tile(ref_sc[-1:], (mpc.Np + 1, 1))], axis=0)
        return jnp.asarray(ref_padded), w_seq
