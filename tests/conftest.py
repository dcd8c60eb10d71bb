"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware."""

import os

# Zero-egress environment: make HF loaders fail fast (local cache only)
# instead of stalling ~40 s/file on network retries before their hermetic
# fallbacks kick in (tokenizer fallback paths are still exercised).
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The suite is compile-bound (hundreds of tiny-shape programs on a 2-CPU
# host); dialing LLVM optimization to 0 halves compile time (measured
# 94.7 s -> 47.1 s on the grad-accum test) without changing semantics —
# correctness tolerances are unaffected, and perf is only ever measured on
# the TPU via bench.py / mb_*.py, never under pytest.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment's sitecustomize registers the TPU backend unconditionally;
# override post-import so unit tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Guard against memory-map exhaustion: XLA's CPU backend JIT-loads every
# compiled program via LLVM ORC, whose code/data mmaps stay mapped for the
# executable's lifetime. Across ~290 tests this grows past the kernel's
# vm.max_map_count (65530 default) and the FIRST compile past the limit
# segfaults inside backend_compile_and_load (observed deterministically at
# test_streaming_with_masked_video_windows, ~272 tests in; the same test
# passes in isolation because a fresh process has ~5k maps). Clearing the
# JAX compilation caches releases the mappings; tests transparently
# recompile. See sam_audio_tpu/utils/map_guard.py.
def pytest_runtest_teardown(item, nextitem):
    from sam_audio_tpu.utils.map_guard import maybe_clear_caches

    maybe_clear_caches()


if os.environ.get("SAM_AUDIO_RSS_LOG"):
    # Diagnostic mode: append per-test peak RSS so late-suite XLA-compile
    # crashes can be correlated with process memory growth.
    import pytest

    def _rss_kb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])
        return -1

    @pytest.hookimpl(hookwrapper=True)
    def pytest_runtest_call(item):
        yield
        with open(os.environ["SAM_AUDIO_RSS_LOG"], "a") as f:
            f.write(f"{_rss_kb()}\t{item.nodeid}\n")
