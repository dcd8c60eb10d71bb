import time

import jax.numpy as jnp

from sam_audio_tpu.utils.profiling import StageTimer, device_sync, trace


def test_stage_timer_accumulates():
    timer = StageTimer()
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("a"):
        time.sleep(0.01)
    with timer.stage("b"):
        x = jnp.ones((8, 8)) * 2
        timer.sync(x)
    s = timer.summary()
    assert s["a"] >= 0.02
    assert timer.counts["a"] == 2
    assert "b" in s
    report = timer.report()
    assert "a" in report and "%" in report
    timer.reset()
    assert timer.summary() == {}


def test_stage_timer_disabled():
    timer = StageTimer(enabled=False)
    with timer.stage("x"):
        pass
    assert timer.summary() == {}


def test_device_sync_smoke():
    device_sync(jnp.ones((4,)))
    device_sync({"a": jnp.zeros((2, 2))})
    device_sync(None)


def test_trace_noop_without_logdir():
    with trace(None):
        pass
