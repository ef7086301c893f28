"""Plotting and animation (reference figure/MP4 writers).

Equivalents of ``Ksysid.plot_comparison:1901-1925``, the example scripts'
trajectory plots, and the Arm animation writers (``Arm.animate_arm:494-570``
and variants).  Matplotlib with the Agg backend; animations save to MP4 (if
ffmpeg is present) or GIF.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_comparison(simdata_y, realdata_y, t, nrmse=None, path=None,
                    title: str = ""):
    """Per-dimension real-vs-Koopman comparison (``plot_comparison``)."""
    plt = _plt()
    y_sim = np.asarray(simdata_y)
    y_real = np.asarray(realdata_y)
    n = y_real.shape[1]
    fig, axes = plt.subplots(n, 1, figsize=(8, 1.8 * n), sharex=True)
    axes = np.atleast_1d(axes)
    for i, ax in enumerate(axes):
        ax.plot(t, y_real[:, i], "b", label="Real")
        ax.plot(t, y_sim[:, i], "r", label="Koopman")
        ax.set_ylabel(f"y{i + 1}")
        ax.set_ylim(-1, 1)
        if nrmse is not None:
            ax.set_title(f"NRMSE = {float(np.asarray(nrmse)[i]):.4f}",
                         fontsize=8)
    axes[0].legend(loc="upper right", fontsize=8)
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig


def plot_tracking(ref_xy, y_xy, path=None, title: str = "",
                  reverse_y: bool = True):
    """Reference-vs-controller xy plot (``example_control.m:73-108``)."""
    plt = _plt()
    ref_xy = np.asarray(ref_xy)
    y_xy = np.asarray(y_xy)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(ref_xy[:, 0], ref_xy[:, 1], label="Reference")
    ax.plot(y_xy[:, 0], y_xy[:, 1], label="K-MPC")
    if reverse_y:
        ax.invert_yaxis()
    ax.grid(True)
    ax.legend(loc="lower right")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig


def animate_arm(arm, alpha_traj, path: str, ref_xy=None, y_xy=None,
                fps: int = 20, stride: int = 1):
    """Animate the arm following a trajectory (``Arm.animate_arm_refvmpc``).

    alpha_traj: (T, Nlinks) joint angles; optional reference/actual
    end-effector traces are drawn underneath.  Writes MP4 (ffmpeg) or falls
    back to GIF (pillow).
    """
    plt = _plt()
    from matplotlib import animation

    alpha_traj = np.asarray(alpha_traj)[::stride]
    L = arm.cfg.L
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.set_xlim(-L, L)
    ax.set_ylim(-0.5 * L, 1.5 * L)
    ax.invert_yaxis()                      # reference display convention
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    if ref_xy is not None:
        ref_xy = np.asarray(ref_xy)
        ax.plot(ref_xy[:, 0], ref_xy[:, 1], "k--", lw=1, label="ref")
    trace, = ax.plot([], [], "r-", lw=1, alpha=0.6)
    line, = ax.plot([], [], "o-", lw=2, color="tab:blue")
    ys = np.asarray(y_xy)[::stride] if y_xy is not None else None

    def draw(i):
        joints, _ = arm.joint_positions(alpha_traj[i])
        joints = np.asarray(joints)
        line.set_data(joints[:, 0], joints[:, 1])
        if ys is not None:
            trace.set_data(ys[: i + 1, 0], ys[: i + 1, 1])
        return line, trace

    ani = animation.FuncAnimation(fig, draw, frames=len(alpha_traj),
                                  blit=True)
    try:
        ani.save(path, writer="ffmpeg", fps=fps)
    except Exception:
        if not path.endswith(".gif"):
            path = path.rsplit(".", 1)[0] + ".gif"
        ani.save(path, writer="pillow", fps=fps)
    plt.close(fig)
    return path


def plot_rand_models_summary(results: dict, path=None):
    """Median normed error vs basis count per family
    (``evaluate_rand_models.m:209-292``)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    for fam, style in (("linear", "o-"), ("bilinear", "s-"),
                       ("nonlinear", "^-")):
        o = results[fam]
        ax.plot(o["dims"], o["median"], style, label=fam)
    ax.set_xlabel("number of basis functions")
    ax.set_ylabel("median normalized error")
    ax.set_yscale("log")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path
    return fig
