"""Save-collision avoidance and model naming (reference ``auto_rename.m``,
``Ksysid.save_class:406-450``)."""

from __future__ import annotations

import os
import re
import time
from typing import Optional


def auto_rename(path: str) -> str:
    """Append " (2)", " (3)", ... until the path does not exist.

    Mirrors ``auto_rename.m:80-98`` (files keep their extension; directories
    get the suffix at the end).
    """
    if not os.path.exists(path):
        return path
    root, ext = os.path.splitext(path)
    k = 2
    while True:
        cand = f"{root} ({k}){ext}"
        if not os.path.exists(cand):
            return cand
        k += 1


def model_classname(model_type: str, obs_type: str, obs_degree, n: int,
                    m: int, nd: int, timestamp: Optional[str] = None) -> str:
    """``modeltype_obstype-deg_n-_m-_del-_timestamp`` (``Ksysid.m:431-433``)."""
    if timestamp is None:
        timestamp = time.strftime("%Y-%m-%d_%H-%M")
    if not isinstance(obs_degree, (list, tuple)):
        obs_degree = (obs_degree,)
    deg = "-".join(str(d) for d in obs_degree)
    return f"{model_type}_{obs_type}-{deg}_n-{n}_m-{m}_del-{nd}_{timestamp}"
