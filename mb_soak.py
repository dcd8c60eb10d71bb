"""On-chip serving SOAK: mixed production traffic against one batcher.

The per-feature probes (mb_server.py throughput, mb_map_guard.py guard
recovery, test_server_hardening.py policies on CPU) each exercise one
behavior in isolation; this probe runs them TOGETHER against the flagship
model on the real chip, the way production would hit them:

  * closed-loop clients streaming 10 s text requests (steady load),
  * a long clip routed through streaming windows mid-traffic,
  * an open-loop burst that overflows the admission queue (429s),
  * a forced map_guard cache clear with traffic in flight (auto re-warm),

then asserts the accounting invariants the dashboards rely on: every
admitted request completed, every rejection was counted exactly once,
re-warm completed without failures, and the queue drained.

Run: python mb_soak.py [soak_seconds]   (from /root/repo; TPU via axon;
~10-15 min total, dominated by the 3 warmup compiles)
"""

import json
import sys
import threading
import time

import jax
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.server import ContinuousBatcher, ServerOverloadedError
from sam_audio_tpu.serving import SeparationRequest
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer
from sam_audio_tpu.utils import map_guard

SECONDS = 10.0
MAX_BATCH = 2
MAX_QUEUE = 8
N_CLIENTS = 4


def req(t_wav, seed=0, desc="a dog barking in the distance"):
    rng = np.random.RandomState(seed)
    return SeparationRequest(
        description=desc, audio=(rng.randn(1, t_wav) * 0.1).astype(np.float32))


def main():
    soak_s = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = SAMAudioConfig(span_predictor=None, compute_dtype="bfloat16",
                         param_dtype="bfloat16")
    t0 = time.time()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size))
    print(f"init {time.time() - t0:.1f}s", file=sys.stderr)
    t_wav = int(SECONDS * model.sample_rate) // model.hop_length \
        * model.hop_length

    batcher = ContinuousBatcher(
        model, max_batch=MAX_BATCH, bucket_seconds=SECONDS, max_wait_ms=20.0,
        reranking_candidates=1, max_queue=MAX_QUEUE, max_seconds=SECONDS,
        long_policy="stream", max_stream_seconds=60.0,
        streaming_window_s=SECONDS, autostart=False)
    t0 = time.time()
    batcher.warmup(seconds=[SECONDS])  # (10 s, b=1), (10 s, b=2), streaming
    batcher.start()
    print(f"warmup {time.time() - t0:.1f}s "
          f"({len(batcher._warmed)} shapes)", file=sys.stderr)

    stop = threading.Event()
    lock = threading.Lock()
    lats = []
    client_errors = []
    n_done = [0]
    n_client_429 = [0]

    def client(cid):
        i = 0
        while not stop.is_set():
            t1 = time.perf_counter()
            try:
                batcher.separate(req(t_wav, seed=cid * 10000 + i),
                                 timeout=600)
            except ServerOverloadedError:
                # expected under the burst: back off and retry, the way a
                # real client treats a 429
                with lock:
                    n_client_429[0] += 1
                time.sleep(0.25)
                continue
            except Exception as e:  # noqa: BLE001 — soak records, then fails
                with lock:
                    client_errors.append(repr(e))
                return
            with lock:
                lats.append((time.perf_counter() - t1) * 1e3)
                n_done[0] += 1
            i += 1

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(N_CLIENTS)]
    t_soak0 = time.perf_counter()
    for t in threads:
        t.start()

    # -- long clip through streaming windows, with traffic in flight
    long_req = req(int(2.5 * t_wav), seed=7, desc="rain on a tin roof")
    long_fut = batcher.submit(long_req)

    # -- open-loop burst: overflow the admission queue
    time.sleep(soak_s * 0.3)
    burst_futs, n_429 = [], 0
    for i in range(MAX_QUEUE * 4):
        try:
            burst_futs.append(batcher.submit(req(t_wav, seed=90000 + i)))
        except ServerOverloadedError:
            n_429 += 1
    print(f"burst: {len(burst_futs)} admitted, {n_429} x 429",
          file=sys.stderr)

    # -- forced cache clear mid-soak; the device thread must detect it and
    # re-warm the whole shape grid while clients keep hitting it
    time.sleep(soak_s * 0.3)
    rewarms_before = batcher.stats_snapshot()["map_guard_rewarms"]
    map_guard.maybe_clear_caches(threshold=1)
    print("forced map_guard clear", file=sys.stderr)

    deadline = time.time() + soak_s * 0.4
    while time.time() < deadline:
        time.sleep(1.0)
    stop.set()
    for t in threads:
        t.join(timeout=700)
    wall = time.perf_counter() - t_soak0

    burst_ok = sum(1 for f in burst_futs if f.result(timeout=700))
    long_res = long_fut.result(timeout=700)
    assert long_res.target.shape[-1] == long_req.audio.shape[-1], (
        long_res.target.shape, long_req.audio.shape)

    # give the re-warm a moment if the clear landed late
    for _ in range(120):
        if batcher.stats_snapshot()["map_guard_rewarms"] > rewarms_before:
            break
        time.sleep(1.0)
    stats = batcher.stats_snapshot()
    batcher.shutdown(timeout=120)

    # -- invariants
    assert not client_errors, client_errors[:3]
    assert stats["failed_requests"] == 0, stats
    assert stats["rejected_overload"] == n_429 + n_client_429[0], (
        stats, n_429, n_client_429)
    assert stats["rejected_too_long"] == 0, stats
    assert stats["streamed_requests"] == 1, stats
    assert stats["map_guard_rewarms"] > rewarms_before, stats
    assert stats["rewarm_failures"] == 0, stats
    assert stats["queue_depth"] == 0, stats
    # every admitted request is accounted: closed-loop + burst + streamed
    assert stats["requests"] == n_done[0] + burst_ok + 1, (stats, n_done,
                                                          burst_ok)

    lat = sorted(lats)
    out = {
        "soak_s": round(wall, 1),
        "completed": n_done[0] + burst_ok + 1,
        "sustained_x": round((n_done[0] + burst_ok) * SECONDS / wall, 2),
        "p50_ms": round(lat[len(lat) // 2], 1) if lat else None,
        "p99_ms": round(lat[int(len(lat) * 0.99)], 1) if lat else None,
        "rejected_429": n_429 + n_client_429[0],
        "streamed_long_ok": True,
        "map_guard_rewarms": stats["map_guard_rewarms"],
        "mean_batch": round(stats["mean_batch_size"], 2),
    }
    print(json.dumps(out))
    print("SOAK PASS", file=sys.stderr)


if __name__ == "__main__":
    main()
