"""Analytic FLOPs / HBM-bytes model of the closed-loop MPC step (roofline).

The driver metric is closed-loop MPC steps/s; this module answers the
follow-up the raw rate cannot: how far from the hardware ceiling is it?
It counts, per scenario lane per control step, (a) the floating-point work
of every phase of the fused scan body (lift -> QP assembly -> interior-point
kernel -> plant step) and (b) the HBM traffic, as two brackets:

- ``bytes_min``  : the perfect-fusion lower bound -- only the scan carry
  round-trip plus the Pallas kernel's per-lane in/out tiles (a Pallas call
  is an HBM->VMEM->HBM boundary XLA cannot fuse across),
- ``bytes_est``  : each named inter-phase intermediate (lifted state,
  assembly GEMM output, reduced W/v) additionally spills to HBM once
  (write + read) -- the realistic ceiling-ward estimate for this program
  shape, where the big assembly GEMM and the Pallas call cannot fuse.

FLOP conventions: one multiply-add = 2 FLOPs; (mc,)/(n,)-sized vector
bookkeeping below ~1% of a phase is folded into per-phase constants; the
plant count is a documented coarse model (+-50%, <10% of the total).

Everything is derived from the live controller/plant objects, so the model
tracks config changes (horizon, blocking, qp_iters, substeps) instead of
hard-coding the bench shape.  Used by ``bench.py`` (mfu / hbm_gbps detail
fields) and ``scripts/perf_report.py`` (phase table).

No reference counterpart (the reference publishes no performance
accounting at all); the methodology is the standard TPU roofline recipe
(arithmetic intensity vs the chip's published peaks).
"""

from __future__ import annotations

import numpy as np

# Published per-chip peaks: dense bf16 MXU FLOP/s and HBM bandwidth.
# MFU here is quoted against the bf16 MXU peak (the conventional MFU
# denominator).  The QP kernel's matmuls run at HIGHEST precision
# (6-pass bf16 decomposition of f32), so its *attainable* MXU rate is
# ~peak/6 -- quoted alongside as ``peak_f32_matmul``.
CHIP_SPECS = {
    # device_kind (jax.devices()[0].device_kind) -> spec
    "TPU v4": {"peak_bf16": 275e12, "hbm_gbps": 1228.0},
    "TPU v5 lite": {"peak_bf16": 197e12, "hbm_gbps": 819.0},
    "TPU v5e": {"peak_bf16": 197e12, "hbm_gbps": 819.0},
    "TPU v5p": {"peak_bf16": 459e12, "hbm_gbps": 2765.0},
    "TPU v6 lite": {"peak_bf16": 918e12, "hbm_gbps": 1640.0},
    "TPU v6e": {"peak_bf16": 918e12, "hbm_gbps": 1640.0},
}


def chip_specs(device_kind: str) -> dict:
    spec = CHIP_SPECS.get(device_kind)
    if spec is None:
        return {"peak_bf16": float("nan"), "hbm_gbps": float("nan"),
                "known": False}
    return {**spec, "peak_f32_matmul": spec["peak_bf16"] / 6.0, "known": True}


def _ipm_iter_flops(n: int, mc: int, band) -> int:
    """One Mehrotra iteration of the Pallas IPM (``ops.pallas.qp_ipm``).

    Counted per lane from the kernel source: residuals, banded/dense
    A^T D A formation, one full-width Cholesky, two direction solves
    (predictor + corrector, each one pair of triangular solves + A/At
    matvecs), and the steplength/centering vector bookkeeping.
    """
    f = 0
    f += 2 * mc * n                    # r_p = A x
    f += 2 * n * n + 2 * n * mc        # r_d = P x + At lam
    if band is None:
        f += 2 * n * n * mc            # dense (n^2, mc) @ D
    else:
        f += 2 * n * mc                # diagonal contraction Wd @ D
        if band > 0:
            f += 2 * (n - band) * mc   # off-band contraction Wo @ D
    f += 2 * n ** 3 + 2 * n * n        # full-width Cholesky (rank-1 downdates)
    # two directions: rhs At matvec, fwd+bwd triangular solve, ds = A dx,
    # dlam vector ops
    f += 2 * (2 * n * mc + 4 * n * n + 2 * mc * n + 4 * mc)
    f += 12 * mc + 8 * n               # slack ratios, steplengths, updates
    return f


def bilinear_step_cost(mpc, plant_cfg, dual_warm: bool = True) -> dict:
    """Per-lane-per-step FLOPs and HBM bytes of the SHIPPING bilinear loop.

    ``mpc``: a constructed ``BilinearKmpc`` (blocked or not);
    ``plant_cfg``: the ``ArmConfig`` of the plant in the loop.
    Returns {"flops": {phase: FLOPs}, "flops_total", "mxu_flops"
    (the GEMM-routed subset), "bytes_min", "bytes_est"}.
    """
    meta = mpc.meta
    NL, m, Np, nproj = meta.NL, meta.m, mpc.Np, mpc.nproj
    p = (Np + 1) * nproj                       # stacked projected rows
    ncols = Np * m                             # full stacked input columns
    blocked = getattr(mpc, "_Tb", None) is not None
    nred = mpc._Tb.shape[1] if blocked else (Np - 1) * m
    mc = mpc.n_con
    iters = mpc.cfg.qp_iters
    band = mpc._band

    basis = mpc.model.basis
    N_full = basis.pcs.shape[0] if basis.pcs is not None else NL
    npcs = basis.pcs.shape[1] if basis.pcs is not None else 0
    nza = basis.nzeta_aug

    fl = {}
    # lift: degree-blocked poly products (one multiply per monomial of
    # degree >= 2) + the PCA projection GEMM
    fl["lift"] = (N_full - nza - 1) + 2 * N_full * npcs
    # assembly: lane-shared PG GEMM (CB stack), CA z, CB0 u_prev fold,
    # blocked Tb reduction of W
    fl["qp_assembly"] = (2 * (p * ncols) * NL            # PG @ z
                         + 2 * p * NL + 2 * p * m        # v terms
                         + (2 * p * (ncols - m) * nred if blocked else 0))
    # kernel prologue: in-kernel Gram (p rank-1 updates), gradient, scale
    fl["qp_kernel_gram"] = 2 * nred * nred * p + 2 * nred * p + nred * nred
    fl["qp_kernel_iters"] = iters * _ipm_iter_flops(nred, mc, band)
    # plant: coarse closed-form 3-link model -- one EOM residual ~600 FLOPs
    # (mass matrix + suffix-sum Coriolis + gravity), one 6x6 Jacobian +
    # LU per step (jac_mode='step'), newton_iters residual+solve per
    # SDIRK2 substep (2 implicit stages)
    nx = 6
    resid = 600
    substeps = getattr(plant_cfg, "substeps", 3)
    newton = getattr(plant_cfg, "newton_iters", 2)
    fl["plant"] = (nx * resid + 2 * nx ** 3 // 3           # Jacobian + LU
                   + substeps * 2 * newton * (resid + 2 * nx * nx))
    fl["harness"] = 40 * NL                    # windows, freezes, scaling

    total = int(sum(fl.values()))
    # the GEMM-routed subset (what the MXU can actually run; the kernel's
    # Gram/Cholesky/solves are VPU work in lanes-minor layout)
    mxu = fl["lift"] + fl["qp_assembly"]

    # ---- HBM bytes ------------------------------------------------------
    f32 = 4
    # scan carry (read + write once per step): x, y, ywin, uwin, u_prev,
    # U_plan, lam (dual warm), alive
    win = 1 + meta.nd
    carry = (nx + meta.n + win * meta.n + win * m + m + Np * m
             + (mc if dual_warm else 0)) * f32 + 1
    # blocked controllers default to the ASSEMBLY-FUSED kernel (round 4):
    # the kernel consumes (z, u_prev) directly, so neither the per-lane W/v
    # nor the PG-GEMM output ever exist in HBM
    import os
    fused = blocked and os.environ.get("KMPC_FUSED_ASSEMBLY") != "0"
    if fused:
        kernel_in = NL + m + nred + (mc if dual_warm else 0)
        spill_terms = NL + nred + Np * m          # z, solution, expanded U
    else:
        kernel_in = p * nred + p + nred + (mc if dual_warm else 0)
        spill_terms = NL + p * ncols + p * nred + p + nred + Np * m
    kernel_io = (kernel_in + nred + 2 * mc + 1) * f32
    bytes_min = 2 * carry + kernel_io
    # each named intermediate additionally spills once (write+read)
    bytes_est = bytes_min + spill_terms * 2 * f32
    return {"flops": fl, "flops_total": total, "mxu_flops": int(mxu),
            "bytes_min": int(bytes_min), "bytes_est": int(bytes_est)}


def roofline_summary(steps_per_s: float, cost: dict, device_kind: str) -> dict:
    """MFU + achieved-bandwidth numbers for a measured throughput."""
    spec = chip_specs(device_kind)
    flops_s = steps_per_s * cost["flops_total"]
    mxu_s = steps_per_s * cost["mxu_flops"]
    bw_est = steps_per_s * cost["bytes_est"] / 1e9
    bw_min = steps_per_s * cost["bytes_min"] / 1e9
    out = {
        "flops_per_lane_step": cost["flops_total"],
        "hbm_bytes_per_lane_step_est": cost["bytes_est"],
        "achieved_flops_per_s": flops_s,
        "achieved_mxu_flops_per_s": mxu_s,
        "hbm_gbps_est": bw_est,
        "hbm_gbps_min": bw_min,
    }
    if spec["known"]:
        out["mfu_vs_bf16_peak"] = flops_s / spec["peak_bf16"]
        out["mxu_util_vs_f32_matmul_peak"] = mxu_s / spec["peak_f32_matmul"]
        out["hbm_frac_est"] = bw_est / spec["hbm_gbps"]
    return out
