"""Test harness configuration (SURVEY.md §4).

All tests run on CPU-JAX with float64 enabled (the parity ladder: f64 oracle vs
f64 JAX at 1e-9, documented in SURVEY.md §7 "hard parts") and with 8 virtual XLA
host devices so multi-chip sharding (shard_map/pjit over a Mesh) is exercised
without TPU hardware (SURVEY.md §4 item 4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# --xla_cpu_parallel_codegen_split_count=1: XLA:CPU's parallel LLVM codegen
# races in long many-compilation processes (observed: SIGSEGV inside
# backend_compile_and_load ~45 compilations into the suite, never in the
# same test run alone); serial codegen removes the crash at a small
# compile-time cost
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_cpu_parallel_codegen_split_count=1"
)

import jax

jax.config.update("jax_enable_x64", True)
# persistent compile cache: the unrolled tree sweeps are trace-heavy; caching
# keeps repeated suite runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

from rbdtpu.model import load_asset
from rbdtpu.oracle import OracleRobotAdapter, load_reference_class


@pytest.fixture(scope="module", autouse=True)
def _bound_executable_accumulation():
    """XLA:CPU aborts/segfaults sporadically when a big compile happens with
    hundreds of live JITed executables in the process (observed ~115 tests
    into the suite, always at the first large DDP compile; never in a fresh
    process).  Dropping jax's executable caches at module boundaries keeps
    the live-executable count bounded; the persistent compile cache makes
    the recompiles cheap disk loads."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def arm7():
    return load_asset("arm7", dtype=np.float64)


@pytest.fixture(scope="session")
def quadruped12fb():
    return load_asset("quadruped12", dtype=np.float64, floating_base=True)


@pytest.fixture(scope="session")
def quadruped12quat():
    return load_asset(
        "quadruped12", dtype=np.float64, floating_base=True, root_quat=True
    )


@pytest.fixture(scope="session")
def humanoid30fb():
    return load_asset("humanoid30", dtype=np.float64, floating_base=True)


@pytest.fixture(scope="session")
def oracle_fb(quadruped12fb):
    """Reference bound to the FLOATING-BASE quadruped (rpy root).

    Only the reference's *trusted* fb paths may be asserted against this:
    fb rnea (RBDReference.py:585-593) and fb crba (:1045-1089).  fb minv/
    aba/grad carry known bugs (SURVEY.md §2.1) — property tests cover those.
    """
    cls = load_reference_class()
    if cls is None:
        pytest.skip("reference oracle not available")
    return cls(OracleRobotAdapter(quadruped12fb))


@pytest.fixture(scope="session")
def oracle_fb_humanoid(humanoid30fb):
    cls = load_reference_class()
    if cls is None:
        pytest.skip("reference oracle not available")
    return cls(OracleRobotAdapter(humanoid30fb))


@pytest.fixture(scope="session")
def oracle(arm7):
    """Reference RBDReference instance bound to our arm7 model data."""
    cls = load_reference_class()
    if cls is None:
        pytest.skip("reference oracle not available")
    return cls(OracleRobotAdapter(arm7))


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream regardless
    # of execution order
    return np.random.default_rng(20260816)


def random_state(rng, model, batch=()):
    q = rng.uniform(-1.0, 1.0, batch + (model.nq,))
    if model.floating_base and model.root_quat:
        # root quaternion slots must be unit norm
        quat = rng.standard_normal(batch + (4,))
        q[..., 3:7] = quat / np.linalg.norm(quat, axis=-1, keepdims=True)
    qd = rng.uniform(-1.0, 1.0, batch + (model.nv,))
    tau = rng.uniform(-1.0, 1.0, batch + (model.nv,))
    return q, qd, tau
