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
    return _save_anim(ani, fig, path, fps)


def animate_arm_refvmpc(arm, alpha_traj, ref_xy, path: str, y_xy=None,
                        fps: int = 20, stride: int = 1):
    """Arm animation with reference overlay (``Arm.animate_arm_refvmpc:
    573-653``).

    Named counterpart of the reference writer; the implementation is
    ``animate_arm`` with the reference/actual end-effector traces enabled
    (the general form subsumes the refvmpc-specific one).
    """
    return animate_arm(arm, alpha_traj, path, ref_xy=ref_xy, y_xy=y_xy,
                       fps=fps, stride=stride)


def _save_anim(ani, fig, path, fps):
    plt = _plt()
    try:
        ani.save(path, writer="ffmpeg", fps=fps)
    except Exception:
        if not path.endswith(".gif"):
            path = path.rsplit(".", 1)[0] + ".gif"
        ani.save(path, writer="pillow", fps=fps)
    plt.close(fig)
    return path


def animate_arm_refendeff(arm, alpha_traj, ref_xy, path: str, y_xy=None,
                          fps: int = 20, stride: int = 1,
                          window_buffer: float = 0.5):
    """Arm animation framed around the reference trajectory with the desired
    AND actual end-effector paths drawn (``Arm.animate_arm_refendeff:
    656-768``): axis window = ref bounding box + buffer, y reversed, growing
    end-effector trace in the reference's orange over the full ref path.
    """
    plt = _plt()
    from matplotlib import animation

    alpha_traj = np.asarray(alpha_traj)[::stride]
    ref_xy = np.asarray(ref_xy)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.set_xlim(ref_xy[:, 0].min() - window_buffer,
                ref_xy[:, 0].max() + window_buffer)
    # the reference shaves 0.3 off the lower buffer (``Arm.m:693``)
    ax.set_ylim(ref_xy[:, 1].min() - window_buffer,
                ref_xy[:, 1].max() + window_buffer - 0.3)
    ax.invert_yaxis()
    ax.set_xlabel(r"$\hat{\alpha}$ (m)")
    ax.set_ylabel(r"$\hat{\beta}$ (m)")
    ax.set_aspect("equal")
    ax.plot(ref_xy[:, 0], ref_xy[:, 1], "--", color="0.4", lw=1.5,
            label="reference")
    # reference colormap: green arm, orange end-effector path (Arm.m:679-683)
    trace, = ax.plot([], [], "-", color=(217 / 255, 95 / 255, 2 / 255), lw=2)
    line, = ax.plot([], [], "o-", lw=5, color=(27 / 255, 158 / 255, 119 / 255))

    if y_xy is not None:
        ee = np.asarray(y_xy)[::stride]
    else:
        ee = np.stack([np.asarray(arm.joint_positions(a)[0])[-1]
                       for a in alpha_traj])

    def draw(i):
        joints = np.asarray(arm.joint_positions(alpha_traj[i])[0])
        line.set_data(joints[:, 0], joints[:, 1])
        trace.set_data(ee[: i + 1, 0], ee[: i + 1, 1])
        return line, trace

    ani = animation.FuncAnimation(fig, draw, frames=len(alpha_traj),
                                  blit=True)
    return _save_anim(ani, fig, path, fps)


def animate_arm_validation(arm, alpha_real, y_model_xy, path: str,
                           fps: int = 20, stride: int = 1):
    """Real arm vs identified-model markers side by side in one animation
    (``Arm.animate_arm_validation:771-861``): the true arm is drawn from
    joint angles, the model's marker predictions overlay as points.
    """
    plt = _plt()
    from matplotlib import animation

    alpha_real = np.asarray(alpha_real)[::stride]
    y_model_xy = np.asarray(y_model_xy)[::stride]
    L = arm.cfg.L
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.set_xlim(-1.25 * L, 1.25 * L)
    ax.set_ylim(-1.25 * L, 1.25 * L)
    ax.invert_yaxis()
    ax.set_aspect("equal")
    ax.set_xlabel("x (m)")
    ax.set_ylabel("y (m)")
    line, = ax.plot([], [], "o-", lw=3, color=(27 / 255, 158 / 255, 119 / 255),
                    label="real")
    pts, = ax.plot([], [], "s", ms=7, color=(217 / 255, 95 / 255, 2 / 255),
                   label="model")
    ax.legend(loc="upper right")

    def draw(i):
        joints = np.asarray(arm.joint_positions(alpha_real[i])[0])
        line.set_data(joints[:, 0], joints[:, 1])
        m = y_model_xy[i].reshape(-1, 2)       # marker pairs
        pts.set_data(m[:, 0], m[:, 1])
        return line, pts

    ani = animation.FuncAnimation(fig, draw, frames=len(alpha_real),
                                  blit=True)
    return _save_anim(ani, fig, path, fps)


def animate_timeseries(t, data, time_window: float, path: str,
                       x_label: str = "t", y_label: str = "y",
                       fps: int = 30, subplots: bool = False):
    """Moving-window animation of a timeseries (``Data.animate_timeseries``,
    ``Data.m:146-254``): the plot window slides so the newest sample sits at
    the right edge; one axis or one subplot per column.
    """
    plt = _plt()
    from matplotlib import animation

    t = np.asarray(t).reshape(-1)
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    ncols = data.shape[1]
    tot_frames = max(int(fps * (t[-1] - t[0])), 2)
    idx = np.minimum((np.arange(tot_frames) * (len(t) / tot_frames)
                      ).astype(int), len(t) - 1)
    lo, hi = float(data.min()), float(data.max())
    pad = 0.05 * (hi - lo or 1.0)

    if subplots:
        fig, axes = plt.subplots(ncols, 1, figsize=(7, 2.0 * ncols),
                                 sharex=True)
        axes = np.atleast_1d(axes)
    else:
        fig, ax0 = plt.subplots(figsize=(7, 4))
        axes = np.asarray([ax0] * ncols)
    lines = []
    for j in range(ncols):
        ln, = axes[j].plot([], [], lw=2)
        lines.append(ln)
        axes[j].set_ylim(lo - pad, hi + pad)
        axes[j].set_ylabel(y_label)
    axes[-1].set_xlabel(x_label)

    def draw(i):
        k = idx[i]
        for j, ln in enumerate(lines):
            ln.set_data(t[: k + 1], data[: k + 1, j])
        for ax in (axes if subplots else axes[:1]):
            ax.set_xlim(t[k] - time_window, max(t[k], t[0] + time_window))
        return lines

    ani = animation.FuncAnimation(fig, draw, frames=tot_frames, blit=False)
    return _save_anim(ani, fig, path, fps)


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
