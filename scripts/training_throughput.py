"""Training-side throughput evidence (round-4 verdict #6).

Times the framework's two training workloads against the reference's
serial-MATLAB shape:

1. The 460-fit rand-models sweep (``evaluate_rand_models.m:45-144`` -- the
   reference's biggest batch workload: 20 systems x (13 linear + 6
   bilinear + 4 nonlinear) sequential Ksysid fits).  Here each (family,
   degree) trains ALL systems in one vmapped program (23 programs total),
   on the HOST CPU in float64 BY DESIGN: the Koopman regression is the
   f64-invariant part of the pipeline (f32 regression visibly degrades
   models -- README invariant), and the per-degree problems are tiny
   (N <= 15), far below MXU shapes.  Also timed mesh-sharded over the
   virtual device mesh (system axis).

2. One full-scale arm Ksysid fit (poly-3 bilinear, dim-red, ~12k snapshot
   pairs, N=84 -> 336 lifted-input columns): the paper-config training the
   examples run.

Run (CPU; set FORCE_CPU=1 outside pytest):
  env -u PALLAS_AXON_POOL_IPS FORCE_CPU=1 \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/training_throughput.py
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)   # host-f64 training invariant

    from koopman_realizations_tpu.config import SysidConfig
    from koopman_realizations_tpu.models.edmd import Ksysid
    from koopman_realizations_tpu.utils.matio import (
        load_data4sysid,
        load_rsys_all,
    )
    from koopman_realizations_tpu.workflows import evaluate_rand_models

    # ---- 460-fit rand-models sweep -------------------------------------
    ds = None
    for folder in sorted(glob.glob(
            "/root/reference/datafiles/rand-systems_*")):
        files = glob.glob(folder + "/rsys-all_*.mat")
        if files:
            cand = load_rsys_all(files[0])
            if len(cand) >= 20:
                ds = cand
                break
    if ds is None:
        raise SystemExit("no shipped rsys-all ensemble found")
    n_sys = len(ds)
    kw = dict(max_degree_linear=13, max_degree_bilinear=6,
              max_degree_nonlinear=4)
    n_fits = n_sys * (13 + 6 + 4)

    t0 = time.perf_counter()
    out = evaluate_rand_models(ds, **kw)
    jax.effects_barrier()
    t_host = time.perf_counter() - t0
    # second run: steady-state (compiles cached in-process)
    t0 = time.perf_counter()
    out = evaluate_rand_models(ds, **kw)
    t_host2 = time.perf_counter() - t0
    print(f"rand-models sweep ({n_fits} fits, {n_sys} systems, host f64 "
          f"CPU): {t_host:.2f} s first (incl. compile), {t_host2:.2f} s "
          f"steady-state -> {n_fits / t_host2:.0f} fits/s", flush=True)
    for fam in ("linear", "bilinear", "nonlinear"):
        print(f"  {fam}: kept {out[fam]['kept']}/{n_sys}, median err "
              f"{np.asarray(out[fam]['median'])[:3].round(4)}...", flush=True)

    ndev = jax.device_count()
    if ndev > 1:
        from koopman_realizations_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(n_data=ndev)
        t0 = time.perf_counter()
        out_m = evaluate_rand_models(ds, mesh=mesh, **kw)
        t_mesh = time.perf_counter() - t0
        t0 = time.perf_counter()
        out_m = evaluate_rand_models(ds, mesh=mesh, **kw)
        t_mesh2 = time.perf_counter() - t0
        print(f"rand-models sweep mesh-sharded over {ndev} virtual "
              f"devices: {t_mesh:.2f} s first, {t_mesh2:.2f} s steady",
              flush=True)

    # ---- one paper-config arm fit --------------------------------------
    arm = load_data4sysid(
        "/root/reference/datafiles/"
        "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    t0 = time.perf_counter()
    ks = Ksysid(arm, SysidConfig(model_type="bilinear", obs_type=("poly",),
                                 obs_degree=(3,),
                                 dim_red=True)).train_models()
    t_arm = time.perf_counter() - t0
    print(f"arm poly-3 bilinear Ksysid fit (~12k snapshots, N=84, "
          f"dim-red, f64): {t_arm:.2f} s", flush=True)


if __name__ == "__main__":
    main()
