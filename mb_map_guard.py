"""Measure a map_guard cache clear mid-serving on the real chip (VERDICT r4
next-step #5): how long does recovery take when `utils/map_guard` drops every
compiled program in a serving process, and does the ContinuousBatcher's
automatic re-warm (server._maybe_rewarm) bound the stall?

Method: flagship-shaped random model (like bench.py), ContinuousBatcher with
one warmed (10 s, b=1) shape; measure steady-state request latency, force a
cache clear (exactly what maybe_clear_caches does at the 75% map threshold),
then measure (a) the first post-clear request with NO mitigation — it pays
the recompile inline — and (b) a second clear where the batcher's re-warm
absorbs the recompile before traffic resumes. Also reports /proc/self/maps
counts so the released-mapping claim is on record for the serving process.

Run: python mb_map_guard.py   (~4-8 min incl. compiles)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models.sam_audio import SAMAudio, sam_audio_init
from sam_audio_tpu.serving import SeparationRequest
from sam_audio_tpu.server import ContinuousBatcher
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer
from sam_audio_tpu.utils import map_guard

from bench import _gen_random_like


def main():
    cfg = SAMAudioConfig(span_predictor=None, compute_dtype="bfloat16",
                         param_dtype="bfloat16")
    t0 = time.time()
    params = _gen_random_like(
        lambda k: sam_audio_init(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    model = SAMAudio(cfg, params,
                     tokenizer=ByteFallbackTokenizer(
                         cfg.text_encoder.vocab_size),
                     allow_random_towers=True)
    print(f"init {time.time()-t0:.1f}s; maps={map_guard.map_count()}",
          file=sys.stderr)

    sr = cfg.audio_codec.sample_rate
    wav = (np.random.RandomState(0).randn(1, 10 * sr) * 0.1).astype(np.float32)

    batcher = ContinuousBatcher(model, max_batch=1, bucket_seconds=10.0,
                                max_wait_ms=0.0, autostart=False)
    t0 = time.time()
    batcher.warmup(seconds=[10.0])
    print(f"warmup (compile) {time.time()-t0:.1f}s; "
          f"maps={map_guard.map_count()}", file=sys.stderr)
    batcher.start()

    def req_ms():
        t0 = time.time()
        batcher.separate(SeparationRequest(description="a dog", audio=wav),
                         timeout=1200)
        return (time.time() - t0) * 1e3

    steady = [req_ms() for _ in range(3)]
    print(f"steady-state p50 {np.median(steady):.0f} ms "
          f"(maps={map_guard.map_count()})", file=sys.stderr)

    # --- clear WITHOUT mitigation: the next request pays recovery inline.
    # Disable the batcher's re-warm by forgetting the warmed set.
    warmed, batcher._warmed = batcher._warmed, []
    maps_before = map_guard.map_count()
    cleared = map_guard.maybe_clear_caches(threshold=1)  # force: 1 <= count
    assert cleared
    inline = req_ms()
    steady2 = [req_ms() for _ in range(2)]
    print(f"clear #1 (no mitigation): maps {maps_before}->"
          f"{map_guard.map_count()}; first request {inline:.0f} ms "
          f"(recovery stall {inline - np.median(steady):.0f} ms); "
          f"back to {np.median(steady2):.0f} ms", file=sys.stderr)

    # --- clear WITH the batcher's automatic re-warm: the device thread
    # detects the clear after the NEXT dispatch and re-warms the grid, so
    # the stall is paid once by one request and absorbed for the rest.
    batcher._warmed = warmed
    map_guard.maybe_clear_caches(threshold=1)
    first = req_ms()   # this request pays its own shape's recompile
    t0 = time.time()
    # Wait for the device thread to FINISH re-warming before measuring:
    # map_guard_rewarms is incremented only after the re-warm work completes
    # (map_guard_clears ticks at the START of the re-warm, so polling it
    # would race the multi-second re-warm and fold its tail into `after`).
    while batcher.stats_snapshot()["map_guard_rewarms"] < 1 and \
            time.time() - t0 < 1200:
        time.sleep(0.5)
    after = [req_ms() for _ in range(2)]
    print(f"clear #2 (auto re-warm): first request {first:.0f} ms; "
          f"post-rewarm p50 {np.median(after):.0f} ms; "
          f"maps={map_guard.map_count()}", file=sys.stderr)
    batcher.shutdown()

    import json
    print(json.dumps({
        "steady_ms": round(float(np.median(steady)), 1),
        "clear_recovery_inline_ms": round(inline, 1),
        "post_rewarm_ms": round(float(np.median(after)), 1),
        "map_guard_clears": batcher.stats_snapshot()["map_guard_clears"],
    }))


if __name__ == "__main__":
    main()
