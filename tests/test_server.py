"""Online serving: continuous batcher + HTTP front end (server.py).

The reference documents only single-batch `model.separate` (reference
README.md:40-62); online request coalescing is part of this framework's
production-serving surface, so its contract is pinned here hermetically
with the tiny model.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.server import ContinuousBatcher, SeparationServer
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


def test_batcher_coalesces_queued_requests():
    # Queue 4 same-length requests BEFORE starting the device thread: the
    # first dispatch must take all of them as one full batch.
    batcher = make_batcher(autostart=False, max_wait_ms=50.0)
    rng = np.random.RandomState(0)
    futs = [
        batcher.submit(SeparationRequest(
            description=f"req{i}",
            audio=rng.randn(1, 64).astype(np.float32) * 0.1))
        for i in range(4)
    ]
    batcher.start()
    outs = [f.result(timeout=300) for f in futs]
    batcher.shutdown()
    for out in outs:
        assert out.target.shape == (64,)
        assert np.isfinite(out.target).all()
        assert out.metadata["batch_size"] == 4
    stats = batcher.stats_snapshot()
    assert stats["requests"] == 4
    assert stats["batches"] == 1
    assert stats["occupancy"] == 1.0
    assert stats["batch_size_hist"] == {4: 1}
    assert stats["p50_latency_ms"] > 0


def test_batcher_buckets_mixed_lengths():
    batcher = make_batcher(autostart=False, max_batch=2)
    rng = np.random.RandomState(1)
    lengths = [64, 200, 60, 210]
    futs = [
        batcher.submit(SeparationRequest(
            description=f"req{i}",
            audio=rng.randn(1, n).astype(np.float32) * 0.1))
        for i, n in enumerate(lengths)
    ]
    batcher.start()
    outs = [f.result(timeout=300) for f in futs]
    batcher.shutdown()
    for out, n in zip(outs, lengths):
        assert out.target.shape == (-(-n // 8) * 8,)  # hop=8 in tiny config
    # similar lengths coalesced into the same bucket
    assert outs[0].metadata["bucket"] == outs[2].metadata["bucket"]
    assert outs[0].metadata["batch_size"] == 2


def test_batcher_isolates_per_request_decode_failure():
    batcher = make_batcher(autostart=False)
    bad = batcher.submit(SeparationRequest(
        description="bad", audio="/nonexistent/file.wav"))
    good = batcher.submit(SeparationRequest(
        description="good", audio=np.zeros((1, 64), np.float32)))
    batcher.start()
    out = good.result(timeout=300)
    assert np.isfinite(out.target).all()
    with pytest.raises(Exception):
        bad.result(timeout=10)
    stats = batcher.stats_snapshot()
    assert stats["failed_requests"] == 1
    assert stats["requests"] == 2
    batcher.shutdown()


def test_batcher_max_wait_zero_dispatches_singletons():
    batcher = make_batcher(max_wait_ms=0.0)
    out = batcher.separate(SeparationRequest(
        description="solo", audio=np.zeros((1, 64), np.float32)),
        timeout=300)
    assert out.metadata["batch_size"] == 1
    batcher.shutdown()


def test_batcher_shutdown_drains_queue():
    batcher = make_batcher(autostart=False)
    futs = [batcher.submit(SeparationRequest(
        description="x", audio=np.zeros((1, 64), np.float32)))
        for _ in range(2)]
    batcher.start()
    batcher.shutdown()  # must not drop already-queued work
    for f in futs:
        assert f.result(timeout=10).target.shape == (64,)


@pytest.fixture(scope="module")
def http_server():
    batcher = ContinuousBatcher(make_model(), bucket_seconds=0.01,
                                max_batch=4, max_wait_ms=5.0)
    server = SeparationServer(batcher, host="127.0.0.1", port=0)
    server.start()
    yield server
    server.shutdown()
    batcher.shutdown()


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, json.loads(r.read())


def _get(server, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def test_http_healthz_and_stats(http_server):
    status, body = _get(http_server, "/healthz")
    assert status == 200 and body == {"ok": True}
    status, body = _get(http_server, "/v1/stats")
    assert status == 200
    assert {"requests", "batches", "occupancy"} <= set(body)


def test_http_separate_json_audio(http_server):
    rng = np.random.RandomState(0)
    wav = (rng.randn(64) * 0.1).astype(np.float32)
    status, body = _post(http_server, "/v1/separate", {
        "description": "a tone", "audio": wav.tolist(),
        "sample_rate": http_server.batcher.model.sample_rate,
    })
    assert status == 200
    assert len(body["target"]) == 64
    assert len(body["residual"]) == 64
    assert body["sample_rate"] == http_server.batcher.model.sample_rate
    assert np.isfinite(body["target"]).all()


def test_http_separate_wav_b64_resamples(http_server):
    import base64
    import io
    import wave

    sr_in = http_server.batcher.model.sample_rate * 2
    n_in = 128
    x = (0.25 * np.sin(np.linspace(0, 40, n_in))).astype(np.float32)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr_in)
        w.writeframes((x * 32767).astype(np.int16).tobytes())
    status, body = _post(http_server, "/v1/separate", {
        "description": "tone",
        "audio_wav_b64": base64.b64encode(buf.getvalue()).decode(),
    })
    assert status == 200
    # resampled 2x down -> 64 samples at the model rate
    assert len(body["target"]) == 64


def test_http_wav_b64_response_format(http_server):
    import base64

    rng = np.random.RandomState(3)
    wav = (rng.randn(64) * 0.1).astype(np.float32)
    status, body = _post(http_server, "/v1/separate", {
        "description": "tone", "audio": wav.tolist(),
        "response_format": "wav_b64",
    })
    assert status == 200
    assert "target" not in body
    from sam_audio_tpu.server import _wav_b64_to_array

    decoded, sr = _wav_b64_to_array(body["target_wav_b64"])
    assert sr == http_server.batcher.model.sample_rate
    assert decoded.shape == (1, 64)
    assert np.isfinite(decoded).all()
    # base64 int16 WAV round-trips the waveform to quantization error
    assert np.abs(decoded).max() <= 1.0


def test_http_concurrent_requests_batch(http_server):
    before = http_server.batcher.stats_snapshot()["requests"]
    rng = np.random.RandomState(2)
    wavs = [(rng.randn(64) * 0.1).astype(np.float32) for _ in range(4)]
    results = [None] * 4
    errs = []

    def post(i):
        try:
            results[i] = _post(http_server, "/v1/separate", {
                "description": f"r{i}", "audio": wavs[i].tolist()})
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
    assert not errs
    assert all(r is not None and r[0] == 200 for r in results)
    stats = http_server.batcher.stats_snapshot()
    assert stats["requests"] >= before + 4
    # at least one multi-request batch formed under concurrent load OR the
    # chip was fast enough to drain singletons; assert only the accounting
    assert sum(k * v for k, v in
               stats["batch_size_hist"].items()) == stats["requests"] - \
        http_server.batcher.stats.failed_requests


def test_http_bad_request_is_400(http_server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{http_server.port}/v1/separate",
        data=json.dumps({"audio": [0.0]}).encode(),  # missing description
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_http_unknown_path_is_404(http_server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            f"http://127.0.0.1:{http_server.port}/nope", timeout=30)
    assert ei.value.code == 404
