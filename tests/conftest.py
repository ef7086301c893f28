"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-device sharding paths (psum / all_gather over a Mesh) are exercised
without TPU hardware via ``xla_force_host_platform_device_count``; numeric
parity tests need float64, which is fast on CPU.
"""

import os

# The container env pins JAX_PLATFORMS=axon (tunneled TPU); tests must run
# on the local CPU with a forced 8-device mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen intermittently segfaults/aborts deep
    # into a long one-process suite (observed at >40 compiled programs;
    # state-dependent, moves between tests).  Single-split codegen trades a
    # little compile time for a deterministic suite.
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon bootstrap (sitecustomize in /root/.axon_site) pins
# jax_platforms="axon,cpu" via jax.config.update at interpreter start, which
# wins over the env var. Pin it back to cpu-only for the test suite so jit
# compiles stay local instead of round-tripping through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="session")
def arm_datafile():
    path = os.path.join(REF, "datafiles",
                        "arm-3link-markers-noload-50trials_train-10_val-5.mat")
    if not os.path.exists(path):
        pytest.skip("reference arm datafile not available")
    return path


@pytest.fixture(scope="session")
def arm_dataset(arm_datafile):
    from koopman_realizations_tpu.utils.matio import load_data4sysid
    return load_data4sysid(arm_datafile)


@pytest.fixture(scope="session")
def blockM_ref():
    path = os.path.join(REF, "trajectories", "files",
                        "blockM_c0p45-0p35_0p5x0p5_15sec.mat")
    if not os.path.exists(path):
        pytest.skip("reference blockM trajectory not available")
    from koopman_realizations_tpu.utils.matio import load_ref_trajectory
    return load_ref_trajectory(path)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order
    return np.random.default_rng(0)
