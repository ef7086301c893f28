"""Core data containers (pytrees) shared across the framework.

The reference passes around MATLAB structs; here every container is a frozen
dataclass registered as a JAX pytree so it can flow through jit / vmap / scan.

Reference schema being mirrored:
- trial struct with fields t [T], y [T,n], u [T,m], optional x, w
  (``Ksysid.m:37-66``, ``Data.m:93-143``)
- the ``data4sysid`` struct ``{train: [...], val: [...]}``
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np


def pytree_dataclass(cls):
    """Register a dataclass as a JAX pytree node (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return [getattr(obj, n) for n in fields], None

    def unflatten(_, children):
        return cls(**dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def static_dataclass(cls):
    """Register a dataclass as a pytree with *no* children (all static aux).

    Use for configuration-like objects whose fields must be trace-time
    constants (shapes, exponent tables, flags).
    """
    cls = dataclasses.dataclass(frozen=True, eq=True)(cls)

    def flatten(obj):
        return (), obj

    def unflatten(aux, _):
        return aux

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@pytree_dataclass
class Trial:
    """One experiment/simulation trial (reference: trial struct).

    t: [T]    time stamps
    y: [T,n]  measured outputs
    u: [T,m]  inputs
    x: [T,nx] optional full internal state
    w: [T,nw] optional load condition
    """

    t: Any
    y: Any
    u: Any
    x: Optional[Any] = None
    w: Optional[Any] = None

    @property
    def n(self) -> int:
        return self.y.shape[-1]

    @property
    def m(self) -> int:
        return self.u.shape[-1]

    @property
    def T(self) -> int:
        return self.y.shape[-2]

    @property
    def Ts(self) -> float:
        t = np.asarray(self.t)
        return float(np.mean(np.diff(t)))

    def replace(self, **kw) -> "Trial":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class DataSet:
    """The ``data4sysid`` container: train + validation trials.

    Plain dataclass (not a pytree): it lives on the host and holds lists.
    ``params`` marks a simulated ("fake") system, mirroring
    ``Ksysid.m:60-66``.
    """

    train: list
    val: list
    params: Optional[dict] = None
    # optional pre-extracted snapshot pairs carried by the datafile
    # ({alpha, beta, u[, w]}; reference ``Ksysid.m:931-938``)
    snapshots: Optional[dict] = None

    @property
    def isfake(self) -> bool:
        return self.params is not None


@pytree_dataclass
class SnapshotPairs:
    """EDMD snapshot pairs (reference: ``Ksysid.get_snapshotPairs:910-984``).

    alpha: [K, nzeta]  state (with delays) before the step
    beta:  [K, nzeta]  state after the step
    u:     [K, m]      input applied between them
    w:     [K, nw]     optional load during the step
    """

    alpha: Any
    beta: Any
    u: Any
    w: Optional[Any] = None


def merge_trials(trials: list) -> Trial:
    """Concatenate several trials into one long Trial.

    Mirrors ``Ksysid.merge_trials:380-401``: plain row-concat of every numeric
    field. The time vector restarts at trial boundaries, which is what
    ``get_snapshotPairs`` uses to drop pairs straddling a boundary.
    """
    if len(trials) == 1:
        return trials[0]
    cat = lambda xs: None if xs[0] is None else np.concatenate([np.asarray(x) for x in xs], axis=0)
    return Trial(
        t=cat([tr.t for tr in trials]),
        y=cat([tr.y for tr in trials]),
        u=cat([tr.u for tr in trials]),
        x=cat([tr.x for tr in trials]) if all(tr.x is not None for tr in trials) else None,
        w=cat([tr.w for tr in trials]) if all(tr.w is not None for tr in trials) else None,
    )
