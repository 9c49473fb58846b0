"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count) since real multi-chip TPU hardware is
not available in CI; the same pjit programs run unchanged on a TPU mesh.

Note: the environment's sitecustomize registers the axon TPU plugin and
re-exports JAX_PLATFORMS=axon, so the env var alone is not enough — we must
also flip jax's config after import (before any backend initialization).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Cap XLA:CPU codegen at AVX2: this VM's reported CPU features are
    # RICHER at compile time than the loader honors at run time
    # (cpu_aot_loader logs "Compile machine features [+amx-avx512, ...]
    # vs host machine features" on every persistent-cache hit), and a
    # cached executable that actually exercises one of those instructions
    # segfaults — observed twice as a fatal crash ~85 min into the full
    # suite, stack in jax compilation_cache get_executable_and_time.
    # AVX2-only artifacts are loadable under any feature reporting, and
    # the flag participates in the cache key so stale full-ISA entries
    # are never hit.
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: OFF by default for the suite.  Three
# fatal native crashes deep into one-process full-suite runs (r4) all had
# their faulting frame inside the jax compilation-cache code: two in the
# READ path (get_executable_and_time — stale AOT entries whose machine
# features outran what the loader honors, addressed by the AVX2 cap
# above, which participates in the cache key) and, after that fix, one in
# the WRITE path (put_executable_and_time, .full_suite_diag2.log:963 —
# XLA:CPU executable serialization segfaulting ~80 min / ~350 tests into
# the process).  The serializer is not controllable from Python, so the
# canonical full-suite runs go cache-free; the suite then trades ~20 min
# of warm-rerun savings for a crash-free invariant.  Local iteration can
# opt back in with BOFICAP_TEST_CPU_CACHE=1 (short runs never hit the
# long-process failure mode).
if os.environ.get("BOFICAP_TEST_CPU_CACHE", "") == "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), "..",
                              ".jax_cache_cpu")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _sweep_prefetch_threads():
    """Stop prefetch workers leaked by tests that drop a CaptionData
    without close() — the r4 full-suite crash dump showed ~50 such
    threads from long-finished tests still polling their queues."""
    yield
    try:
        from boficap_tpu.data.dataset import close_all_prefetchers
        close_all_prefetchers()
    except Exception:
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end integration tests")
