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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the TPU backend unconditionally;
# override post-import so unit tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

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
