"""Streaming separation of 120 s audio on the chip with the flagship model:
validates streaming.py on hardware and measures sustained long-audio
throughput (one compiled 10 s-window program reused across windows)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models.sam_audio import SAMAudio, sam_audio_init
from sam_audio_tpu.streaming import separate_streaming
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

cfg = SAMAudioConfig(span_predictor=None, compute_dtype="bfloat16",
                     param_dtype="bfloat16")
shapes = jax.eval_shape(
    lambda k: sam_audio_init(k, cfg, dtype=jnp.bfloat16), jax.random.PRNGKey(0))
leaves, treedef = jax.tree_util.tree_flatten(shapes)


@jax.jit
def _gen(key):
    keys = jax.random.split(key, len(leaves))
    return [jax.random.normal(k, s.shape, s.dtype) * 0.02
            for k, s in zip(keys, leaves)]


params = jax.tree_util.tree_unflatten(treedef, _gen(jax.random.PRNGKey(0)))
model = SAMAudio(cfg, params,
                 tokenizer=ByteFallbackTokenizer(cfg.text_encoder.vocab_size))

import sys

BW = int(sys.argv[1]) if len(sys.argv) > 1 else 1
# optional: "visual [stride]" after BW streams a masked-video prompt
# (1 frame per latent frame @336^2) through the per-window PE encode
VISUAL = len(sys.argv) > 2 and sys.argv[2] == "visual"
VSTRIDE = int(sys.argv[3]) if len(sys.argv) > 3 else 1
seconds = 120.0
sr = cfg.audio_codec.sample_rate
wav = (np.random.RandomState(0).randn(int(seconds * sr)) * 0.1).astype(
    np.float32)

extra = {}
if VISUAL:
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder

    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(3), cfg.vision_encoder)
    n_frames = int(seconds * sr) // cfg.audio_codec.hop_length
    s = cfg.vision_encoder.image_size
    extra = dict(
        masked_video=np.random.RandomState(1).randint(
            0, 255, (n_frames, 3, s, s)).astype(np.uint8),
        visual_stride=VSTRIDE,
    )
    print(f"visual streaming: {n_frames} frames @{s}^2, stride {VSTRIDE}")

t0 = time.time()
res = separate_streaming(model, "a dog barking", wav, window_s=10.0,
                         overlap_s=1.0, rng=jax.random.PRNGKey(1),
                         batch_windows=BW, **extra)
dt = time.time() - t0
print(f"first pass (incl. compile): {res.num_windows} windows, {dt:.1f}s")
t0 = time.time()
res = separate_streaming(model, "a dog barking", wav, window_s=10.0,
                         overlap_s=1.0, rng=jax.random.PRNGKey(2),
                         batch_windows=BW, **extra)
dt = time.time() - t0
assert res.target.shape[-1] == wav.shape[-1]
assert np.isfinite(res.target).all()
print(f"steady state (bw={BW}): {seconds:.0f}s audio in {dt:.1f}s -> "
      f"{seconds/dt:.2f}x realtime ({res.num_windows} windows)")
