"""Data wrangling utilities (reference class ``Data``).

Static helpers mirroring ``Data.m``: resample to a new timestep, chop a long
recording into trials, and pack train/val splits into a DataSet
(``get_data4sysid``).  Host-side numpy -- these run once at corpus-prep time.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from koopman_realizations_tpu.types import DataSet, Trial, merge_trials


def resample(trial: Trial, Ts: float) -> Trial:
    """Linear-interpolation resampling (``Data.resample:20-37``)."""
    t = np.asarray(trial.t)
    tq = np.arange(t[0], t[-1] + 1e-12, Ts)

    def interp(v):
        if v is None:
            return None
        v = np.asarray(v)
        return np.stack([np.interp(tq, t, v[:, j]) for j in range(v.shape[1])],
                        axis=1)

    return Trial(t=tq, y=interp(trial.y), u=interp(trial.u),
                 x=interp(trial.x), w=interp(trial.w))


def chop(trial: Trial, num: int, length_s: float) -> List[Trial]:
    """Split one long recording into ``num`` trials of ``length_s`` seconds
    (``Data.chop:40-67``; the chop length is capped at duration/num)."""
    t = np.asarray(trial.t)
    Ts = float(np.mean(np.diff(t)))
    maxlen = t[-1] / num
    length_s = min(length_s, maxlen)
    lenk = int(np.sum(t < length_s))
    maxlenk = int(np.sum(t < maxlen))
    # guard the reference's arithmetic: when the duration doesn't divide
    # evenly the MATLAB index set would overrun the recording
    maxlenk = min(maxlenk, len(t) // num)
    lenk = min(lenk, maxlenk)

    out = []
    for i in range(num):
        idx = i * maxlenk + np.arange(lenk)
        pick = lambda v: None if v is None else np.asarray(v)[idx]
        out.append(Trial(t=np.arange(lenk) * Ts, y=pick(trial.y),
                         u=pick(trial.u), x=pick(trial.x), w=pick(trial.w)))
    return out


def get_data4sysid(train: List[Trial], val: List[Trial],
                   params: Optional[dict] = None) -> DataSet:
    """Pack train/val trial lists (``Data.get_data4sysid:93-143``)."""
    return DataSet(train=list(train), val=list(val), params=params)


def merge_files(datasets: List[DataSet]) -> DataSet:
    """Concatenate several DataSets' splits (``Data.merge_files:70-90``)."""
    train = [tr for ds in datasets for tr in ds.train]
    val = [tr for ds in datasets for tr in ds.val]
    params = datasets[0].params
    return DataSet(train=train, val=val, params=params)


__all__ = ["resample", "chop", "get_data4sysid", "merge_files", "merge_trials"]
