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


def _n_memory_maps() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


# ROOT CAUSE of the one-process full-suite segfaults (r4: 2 crashes, r5:
# 2 more, all with the faulting frame inside XLA:CPU compile/serialize
# paths ~350 tests in): every XLA:CPU executable holds ~3 mmap'd regions
# for the life of the process (measured: 1500 tiny compiles -> +4566
# maps), and the suite compiles thousands of programs — the process
# exhausts vm.max_map_count (65530 default), at which point LLVM's next
# mmap fails and it SEGFAULTS rather than erroring.  The crash location
# drifted between runs (cache read, cache write, raw backend_compile)
# because it lands on whichever compile crosses the limit.
# jax.clear_caches() provably releases the mappings (measured 1107 -> 507,
# stable over repeated cycles), so: cap the map count by clearing compiled
# programs whenever the process crosses a threshold comfortably below the
# limit.  Costs a few recompiles per suite run; held jax.jit wrappers
# simply recompile on next call.
_MAPS_CLEAR_THRESHOLD = 30000


@pytest.fixture(autouse=True)
def _cap_executable_maps():
    yield
    if _n_memory_maps() > _MAPS_CLEAR_THRESHOLD:
        import sys as _sys
        _sys.stderr.write(
            f"\n[conftest] memory maps > {_MAPS_CLEAR_THRESHOLD} "
            f"({_n_memory_maps()}): clearing jax executable caches to "
            "stay below vm.max_map_count\n")
        jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end integration tests")
