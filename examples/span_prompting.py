"""Span prompting walkthrough (script form of the reference's
examples/span_prompting.ipynb).

Demonstrates the three prompting modes on a synthetic mixture:
  1. text-only separation,
  2. explicit temporal anchors ("+" spans marking where the target sound is),
  3. predicted spans (predict_spans=True with a span predictor attached).

Run: python examples/span_prompting.py [--model <snapshot-dir-or-repo>]
Without --model, a small randomly initialized model demonstrates the API.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS=cpu even where a site plugin overrides it (some
# environments register a TPU backend in every interpreter)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from sam_audio_tpu import SAMAudio, SAMAudioProcessor
from sam_audio_tpu.audio_io import write_wav


def make_demo_model():
    from sam_audio_tpu.config import (
        DACVAEConfig,
        SAMAudioConfig,
        TransformerConfig,
    )
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    cfg = SAMAudioConfig(
        transformer=TransformerConfig(dim=256, n_heads=4, n_layers=2,
                                      dropout=0.0, context_dim=256,
                                      out_channels=256),
        # real 48 kHz / hop-1920 codec semantics but a small net, so the
        # demo runs in seconds on CPU; a real snapshot uses the full DAC-VAE
        audio_codec=DACVAEConfig(encoder_dim=8, decoder_dim=64),
        span_predictor=None,
        compute_dtype="bfloat16",
    )
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg,
                                 tokenizer=ByteFallbackTokenizer())
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="snapshot dir or HF repo; default: random demo model")
    ap.add_argument("--out", default="/tmp/sam_audio_demo")
    args = ap.parse_args()

    if args.model:
        model = SAMAudio.from_pretrained(args.model)
        processor = SAMAudioProcessor.from_pretrained(args.model)
    else:
        model = make_demo_model()
        processor = SAMAudioProcessor(
            audio_hop_length=model.hop_length,
            audio_sampling_rate=model.sample_rate,
        )

    # synthetic mixture: a 440 Hz tone during [1, 2]s over noise
    sr = model.sample_rate
    t = np.arange(3 * sr) / sr
    tone = 0.4 * np.sin(2 * np.pi * 440 * t) * ((t >= 1.0) & (t < 2.0))
    mix = (tone + 0.05 * np.random.RandomState(0).randn(t.size)).astype(
        np.float32
    )

    import os

    os.makedirs(args.out, exist_ok=True)
    write_wav(f"{args.out}/mixture.wav", mix, sr)

    # 1. text-only prompting
    batch = processor(descriptions=["a steady tone"], audios=[mix[None]])
    result = model.separate(batch, rng=jax.random.PRNGKey(1))
    write_wav(f"{args.out}/target_text.wav", result.target[0], sr)
    write_wav(f"{args.out}/residual_text.wav", result.residual[0], sr)
    print("text-only:", result.target[0].shape)

    # 2. explicit span anchors: "+" marks where the target occurs
    batch = processor(
        descriptions=["a steady tone"],
        audios=[mix[None]],
        anchors=[[("+", 1.0, 2.0)]],
    )
    result = model.separate(batch, rng=jax.random.PRNGKey(1))
    write_wav(f"{args.out}/target_span.wav", result.target[0], sr)
    print("span-prompted:", result.target[0].shape)

    # 3. predicted spans (requires a span predictor; random demo for API shape)
    if model.span_predictor is None:
        from sam_audio_tpu.models.span_predictor import (
            SpanPredictor,
            SpanPredictorConfig,
        )

        model.span_predictor = SpanPredictor.init_random(
            jax.random.PRNGKey(2),
            SpanPredictorConfig(
                audio_dim=model.cfg.audio_codec.codebook_dim,
                text_dim=model.cfg.text_encoder.dim,
                hidden=128, n_layers=2, n_heads=4,
            ),
        )
    batch = processor(descriptions=["a steady tone"], audios=[mix[None]])
    result = model.separate(batch, predict_spans=True,
                            rng=jax.random.PRNGKey(1))
    print("predicted spans:", batch.anchors)
    write_wav(f"{args.out}/target_predicted.wav", result.target[0], sr)
    print(f"outputs in {args.out}/")


if __name__ == "__main__":
    main()
