"""On-chip probe: online serving throughput through ContinuousBatcher + HTTP.

Measures, at flagship scale (1.36B random-init params, bf16, k=1 on a real
TPU chip):
  1. single-request latency through the batcher (server overhead over the
     raw jitted program, which bench.py measures at ~262 ms p50),
  2. sustained throughput with continuous batching at max_batch=1 vs 4
     (does coalescing k=1 traffic into batch-4 programs beat sequential
     dispatch on one chip?),
  3. one HTTP round-trip through SeparationServer (JSON transport cost).

Run: python mb_server.py [n_requests]   (from /root/repo; TPU via axon)
"""

import json
import sys
import threading
import time

import jax
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models.sam_audio import SAMAudio
from sam_audio_tpu.server import ContinuousBatcher, SeparationServer
from sam_audio_tpu.serving import SeparationRequest
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

SECONDS = 10.0


def make_reqs(n, t_wav, seed=0):
    rng = np.random.RandomState(seed)
    return [
        SeparationRequest(
            description="a dog barking in the distance",
            audio=(rng.randn(1, t_wav) * 0.1).astype(np.float32))
        for _ in range(n)
    ]


def drive(batcher, reqs, threads=8):
    """Fire all requests from `threads` client threads; return wall seconds."""
    lock = threading.Lock()
    it = iter(reqs)
    futs = []

    def client():
        while True:
            with lock:
                req = next(it, None)
            if req is None:
                return
            futs.append(batcher.submit(req))

    t0 = time.perf_counter()
    ts = [threading.Thread(target=client) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for f in list(futs):
        f.result(timeout=1200)
    return time.perf_counter() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = SAMAudioConfig(span_predictor=None, compute_dtype="bfloat16",
                         param_dtype="bfloat16")
    t0 = time.time()
    model = SAMAudio.init_random(
        jax.random.PRNGKey(0), cfg,
        tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size))
    print(f"init: {time.time()-t0:.1f}s", file=sys.stderr)
    t_wav = int(SECONDS * model.sample_rate)
    t_wav = (t_wav // model.hop_length) * model.hop_length
    out = {"n": n, "seconds": SECONDS}

    for max_batch in (1, 4):
        batcher = ContinuousBatcher(
            model, max_batch=max_batch, bucket_seconds=SECONDS,
            max_wait_ms=25.0, reranking_candidates=1)
        # warm the (bucket, b) shapes this mode serves
        t0 = time.time()
        batcher.separate(make_reqs(1, t_wav)[0], timeout=1800)
        if max_batch > 1:
            for f in [batcher.submit(r)
                      for r in make_reqs(max_batch, t_wav)]:
                f.result(timeout=1800)
        print(f"[b<={max_batch}] warm/compile: {time.time()-t0:.1f}s",
              file=sys.stderr)
        # single-request latency (3 samples, p50)
        lats = []
        for i in range(3):
            t0 = time.perf_counter()
            batcher.separate(make_reqs(1, t_wav, seed=i)[0], timeout=600)
            lats.append((time.perf_counter() - t0) * 1e3)
        # sustained throughput, 8 client threads
        wall = drive(batcher, make_reqs(n, t_wav, seed=99))
        stats = batcher.stats_snapshot()
        out[f"b{max_batch}_single_p50_ms"] = sorted(lats)[1]
        out[f"b{max_batch}_sustained_x"] = round(n * SECONDS / wall, 2)
        out[f"b{max_batch}_mean_batch"] = round(stats["mean_batch_size"], 2)
        print(f"[b<={max_batch}] single p50 {sorted(lats)[1]:.0f} ms; "
              f"{n} reqs in {wall:.1f}s -> "
              f"{n*SECONDS/wall:.2f}x realtime/chip "
              f"(mean batch {stats['mean_batch_size']:.2f})",
              file=sys.stderr)
        if max_batch == 1:
            # HTTP round-trip on the warmed b=1 shape
            server = SeparationServer(batcher, port=0)
            server.start()
            import urllib.request

            wav = make_reqs(1, t_wav)[0].audio[0]
            body = json.dumps({
                "description": "a dog barking in the distance",
                "audio": wav.tolist()}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v1/separate", data=body,
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            with urllib.request.urlopen(req, timeout=600) as r:
                resp = json.loads(r.read())
            http_ms = (time.perf_counter() - t0) * 1e3
            assert len(resp["target"]) == t_wav
            out["http_roundtrip_ms"] = round(http_ms, 1)
            print(f"HTTP round-trip: {http_ms:.0f} ms "
                  f"(JSON transport of {t_wav} f32 samples incl.)",
                  file=sys.stderr)
            server.shutdown()
        batcher.shutdown()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
