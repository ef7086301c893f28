"""Reference trajectory generators.

Ports of the waypoint generators in ``trajectories/functions/`` and the
assembly logic of ``trajectories/def_trajectory.m`` (resting-config preamble,
y-flip, interpolation to the control rate).
"""

from __future__ import annotations

import numpy as np

__all__ = ["get_blockM", "get_circle", "get_pacman", "get_polygon", "make_trajectory"]


def get_blockM(center, width: float, height: float) -> np.ndarray:
    """81-point outline of the block M (``functions/get_blockM.m``)."""
    dw = width / 18.0
    dh = height / 11.0
    o = np.zeros((81, 2))
    o[0] = np.asarray(center, float)

    def seg(i0, i1, step):
        for i in range(i0, i1):
            o[i] = o[i - 1] + step

    seg(1, 5, [dw, dh])
    seg(5, 10, [dw, 0])
    seg(10, 13, [0, -dh])
    o[13] = o[12] + [-dw, 0]
    seg(14, 19, [0, -dh])
    o[19] = o[18] + [dw, 0]
    seg(20, 23, [0, -dh])   # MATLAB runs its 21:23 loop twice
    seg(20, 23, [0, -dh])   # (get_blockM.m:27-33) -- a NO-OP: o[20] is
                            # unchanged between passes, so the recurrence
                            # reproduces identical values (kept for
                            # line-by-line parity, not because it doubles)
    seg(23, 29, [-dw, 0])
    seg(29, 32, [0, dh])
    o[32] = o[31] + [dw, 0]
    seg(33, 37, [0, dh])
    seg(37, 41, [-dw, -dh])
    seg(41, 45, [-dw, dh])
    seg(45, 49, [0, -dh])
    o[49] = o[48] + [dw, 0]
    seg(50, 53, [0, -dh])
    seg(53, 59, [-dw, 0])
    seg(59, 62, [0, dh])
    o[62] = o[61] + [dw, 0]
    seg(63, 68, [0, dh])
    o[68] = o[67] + [-dw, 0]
    seg(69, 72, [0, dh])
    seg(72, 77, [dw, 0])
    seg(77, 81, [dw, -dh])
    return o


def get_circle(center, radius: float) -> np.ndarray:
    """Circle outline starting at the bottom (``functions/get_circle.m``)."""
    t = np.arange(-np.pi / 2, 3 * np.pi / 2 + 1e-12, np.pi / 50)
    return np.stack([radius * np.cos(t) + center[0],
                     radius * np.sin(t) + center[1]], axis=1)


def get_pacman(center, radius: float) -> np.ndarray:
    """Pacman outline (``functions/get_pacman.m``)."""
    center = np.asarray(center, float)
    t1 = np.arange(0, 1 + 1e-12, 1 / 30)[:, None]
    t2 = np.arange(np.pi / 6, 2 * np.pi - np.pi / 6 + 1e-12, np.pi / 50)
    t3 = np.arange(0, 1 + 1e-12, 1 / 30)[:, None]
    mouth_dir = np.array([radius * np.cos(np.pi / 6), radius * np.sin(np.pi / 6)])
    top = center + t1 * mouth_dir
    body = np.stack([radius * np.cos(t2) + center[0],
                     radius * np.sin(t2) + center[1]], axis=1)
    bot_dir = np.array([radius * np.cos(-np.pi / 6), radius * np.sin(-np.pi / 6)])
    bottom = (center + bot_dir) - t3 * bot_dir
    return np.concatenate([top, body, bottom], axis=0)


def get_polygon(vertices) -> np.ndarray:
    return np.asarray(vertices, float)


def make_trajectory(waypoints: np.ndarray, T: float, Ts: float,
                    name: str = "traj", flip_y: bool = True,
                    preamble_from=(0.0, 1.0), preamble_pts: int = 10) -> dict:
    """Assemble a ref struct from waypoints (``def_trajectory.m:24-36``).

    - optionally flip the y-coordinate sign (planar arm convention),
    - prepend a linear ramp from the resting configuration,
    - interpolate to the control timestep Ts.
    Returns {name, T, Ts, t [K], y [K,2]}.
    """
    y_old = np.asarray(waypoints, float)
    if flip_y:
        y_old = np.stack([y_old[:, 0], -y_old[:, 1]], axis=1)
    if preamble_from is not None:
        pre = np.stack(
            [np.linspace(preamble_from[0], y_old[0, 0], preamble_pts),
             np.linspace(preamble_from[1], y_old[0, 1], preamble_pts)], axis=1)
        y_old = np.concatenate([pre[:-1], y_old], axis=0)
    t_old = np.linspace(0.0, T, y_old.shape[0])
    t = np.arange(0.0, T + 1e-12, Ts)
    y = np.stack([np.interp(t, t_old, y_old[:, k]) for k in range(y_old.shape[1])], axis=1)
    return {"name": name, "T": T, "Ts": Ts, "t": t, "y": y}
