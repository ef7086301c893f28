"""Real device profile of the shipping bench loop (round-4 verdict #4).

Runs the exact bench.py configuration under ``jax.profiler.trace`` and
attributes device wall time per XLA op category from the captured xplane,
reconciling the analytic roofline model (utils/roofline.py) and the
in-loop ablation shares (scripts/inloop_ablation.py) against a measured
kernel-level breakdown.  The slope-fetch timing method is sound for WALLS
but cannot attribute within a launch; this can.

Run on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/device_profile.py

Env: BENCH_BATCH (default 65536), BENCH_STEPS (301), PROFILE_DIR
(default /tmp/kmpc_trace), TOP (default 40 rows).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_runner():
    import jax

    from koopman_realizations_tpu.config import ArmConfig, MpcConfig, SysidConfig
    from koopman_realizations_tpu.control import Ksim, make_kmpc
    from koopman_realizations_tpu.models.arm import Arm
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_ref_trajectory,
    )

    B = int(os.environ.get("BENCH_BATCH", "65536"))
    steps = int(os.environ.get("BENCH_STEPS", "301"))
    ds = load_data4sysid("/root/reference/datafiles/"
                         "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    ref = load_ref_trajectory("/root/reference/trajectories/files/"
                              "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    with jax.default_device(jax.devices("cpu")[0]):
        ks = Ksysid(ds, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                    obs_degree=(3,), dim_red=True,
                                    dtype="float32")).train_models()
    blocks_env = os.environ.get("BENCH_BLOCKS", "1,1,2,5")
    blocks = tuple(int(b) for b in blocks_env.split(",")) if blocks_env \
        else None
    mpc = make_kmpc(ks.model, ks.scaler, MpcConfig(
        horizon=10, qp_iters=int(os.environ.get("BENCH_QP_ITERS", "4")),
        qp_dual_warm=True, qp_dual_shift=False, input_blocks=blocks,
        input_bounds=(-7 * np.pi / 8, 7 * np.pi / 8), input_slopeConst=1e-1,
        cost_running=10.0, cost_terminal=100.0,
        cost_input=(0.1 * 3e-2, 0.1 * 2e-2, 0.1 * 1e-2), proj_idx=(4, 5)))
    arm = Arm(ArmConfig(Nmods=3, nlinks=1, L=1.0, m=0.1,
                        output_type="markers", substeps=3,
                        newton_iters=int(os.environ.get("BENCH_NEWTON",
                                                        "1")),
                        jac_mode="step"))
    sim = Ksim(arm, mpc)
    X0 = np.zeros((B, 6), np.float32)
    X0[:, 0] = np.linspace(-0.2, 0.2, B)
    W0 = np.zeros((B, 2), np.float32)
    # trace the SHIPPING program: the step-fused runner when eligible
    # (BENCH_FUSED=0 falls back to the general runner for comparisons)
    if os.environ.get("BENCH_FUSED", "1") != "0" \
            and sim.fused_step_eligible():
        runner = sim.fused_runner(ref["y"], steps=steps)
    else:
        runner = sim.batched_runner(ref["y"], steps=steps,
                                    record=("Yp", "alive"))
    return runner, X0, W0, B, steps


def parse_xplane(logdir, top=40):
    """Attribute device time per op from the captured trace-viewer JSON
    (written alongside the xplane.pb by jax.profiler)."""
    paths = glob.glob(os.path.join(logdir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("NO trace captured (device tracing unavailable?)")
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    # pid -> process name (device vs host threads)
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "?")
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower() or "Device" in n}
    # EXCLUSIVE (self) time: events nest within a (pid, tid) line; a span's
    # self time is its duration minus its direct children's durations.
    per_line = defaultdict(list)
    tmin, tmax = np.inf, -np.inf
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        ts = float(e.get("ts", 0.0))
        dur = float(e.get("dur", 0.0))
        per_line[(e["pid"], e.get("tid", 0))].append(
            (ts, ts + dur, e.get("name", "?")))
        tmin = min(tmin, ts)
        tmax = max(tmax, ts + dur)
    self_us = defaultdict(float)
    total_us = defaultdict(float)
    total = 0.0
    for line, evs in per_line.items():
        # sort by start asc, end desc => parents come before children
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []     # (end, name, child_time_accum) -- mutable lists
        for ts, te, name in evs:
            while stack and stack[-1][0] <= ts + 1e-9:
                fin = stack.pop()
                self_t = (fin[0] - fin[3]) - fin[2]
                self_us[fin[1]] += max(self_t, 0.0)
            if stack:
                stack[-1][2] += te - ts
            else:
                total += te - ts
            total_us[name] += te - ts
            stack.append([te, name, 0.0, ts])
        while stack:
            fin = stack.pop()
            self_t = (fin[0] - fin[3]) - fin[2]
            self_us[fin[1]] += max(self_t, 0.0)
    return {"per_op": dict(self_us), "total_op": dict(total_us),
            "busy_us": total,
            "span_us": (tmax - tmin) if tmax > tmin else 0.0,
            "device_pids": {p: pids[p] for p in dev_pids},
            "all_pids": pids, "path": path}


def main():
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    logdir = os.environ.get("PROFILE_DIR", "/tmp/kmpc_trace")
    top = int(os.environ.get("TOP", "40"))

    runner, X0, W0, B, steps = build_runner()
    out = jax.block_until_ready(runner(X0, W0))     # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(runner(X0, W0))
    wall = time.perf_counter() - t0
    print(f"unprofiled wall: {wall:.4f} s  "
          f"({1e3 * wall / (steps - 1):.3f} ms/step, B={B})", flush=True)

    with jax.profiler.trace(logdir):
        jax.block_until_ready(runner(X0, W0))

    res = parse_xplane(logdir, top)
    if res is None:
        return
    print(f"xplane: {res['path']}")
    print(f"device pids: {res['device_pids']}")
    if not res["device_pids"]:
        print("pids seen:", res["all_pids"])
        return
    busy = res["per_op"]
    total = res["busy_us"]
    print(f"device busy {total / 1e6:.4f} s over span {res['span_us'] / 1e6:.4f} s "
          f"(duty {100 * total / max(res['span_us'], 1):.1f}%)")
    rows = sorted(busy.items(), key=lambda kv: -kv[1])
    print(f"{'op':60s} {'ms total':>10s} {'ms/step':>9s} {'%busy':>6s}")
    for name, us in rows[:top]:
        print(f"{name[:60]:60s} {us / 1e3:10.2f} "
              f"{us / 1e3 / (steps - 1):9.4f} {100 * us / total:6.2f}")
    # category rollup
    cats = defaultdict(float)
    for name, us in busy.items():
        ln = name.lower()
        if "custom-call" in ln or "tpu_custom_call" in ln or "mosaic" in ln:
            cats["pallas_kernel"] += us
        elif ln.startswith("fusion") or ".fusion" in ln:
            cats["fusion"] += us
        elif "copy" in ln or "transpose" in ln or "bitcast" in ln:
            cats["copy/transpose"] += us
        elif "dot" in ln or "conv" in ln:
            cats["matmul"] += us
        elif "dynamic" in ln and "slice" in ln:
            cats["dyn-slice"] += us
        else:
            cats["other"] += us
    print("-- category rollup --")
    for k, us in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{k:20s} {us / 1e3:10.2f} ms  {us / 1e3 / (steps - 1):8.4f} "
              f"ms/step  {100 * us / total:5.1f}%")


if __name__ == "__main__":
    main()
