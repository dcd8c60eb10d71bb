"""End-to-end drive of the package boundary on the real TPU chip.

Builds a small-but-real snapshot (full codec rates, 48 kHz, 512-dim / 4-layer
DiT), runs separate() with k=2 incl. anchors, checks unpadded lengths /
finiteness / writability per the verify recipe.
"""
import dataclasses
import json
import os
import tempfile

import jax
import numpy as np

# Relay-down fallback: the axon sitecustomize forces the TPU backend; honor
# an explicit platform request (must be set AFTER importing jax, CLAUDE.md).
if os.environ.get("SAM_AUDIO_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["SAM_AUDIO_BENCH_PLATFORM"])

from sam_audio_tpu import SAMAudio, SAMAudioProcessor
from sam_audio_tpu import checkpoint
from sam_audio_tpu.audio_io import write_wav
from sam_audio_tpu.config import (
    DACVAEConfig,
    PerceptionEncoderConfig,
    SAMAudioConfig,
    T5EncoderConfig,
    TransformerConfig,
)
from sam_audio_tpu.models.sam_audio import sam_audio_init


def main():
    print("devices:", jax.devices())
    tmp = tempfile.mkdtemp(prefix="verify_snap_")
    cfg = SAMAudioConfig(
        in_channels=192,
        audio_codec=DACVAEConfig(
            encoder_dim=16,
            encoder_rates=(2, 8, 10, 12),
            latent_dim=128,
            decoder_dim=64,
            decoder_rates=(12, 10, 8, 2),
            codebook_dim=32,  # codec features are 2*codebook_dim = 64
            sample_rate=48_000,
        ),
        text_encoder=T5EncoderConfig(
            dim=64, num_layers=2, num_heads=2, head_dim=32, d_ff=128,
            vocab_size=384,
        ),
        vision_encoder=PerceptionEncoderConfig(
            dim=12, width=16, vit_layers=2, vit_heads=2, image_size=28,
            patch_size=14,
        ),
        transformer=TransformerConfig(
            dim=512,
            n_heads=8,
            n_layers=4,
            dropout=0.0,
            context_dim=512,
            max_positions=1024,
            frequency_embedding_dim=64,
            out_channels=64,
            in_channels=None,
        ),
        anchor_embedding_dim=32,
        span_predictor=None,
    )
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    checkpoint.save_params(os.path.join(tmp, "params.npz"), params)
    with open(os.path.join(tmp, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)

    # 2 s stereo 44.1 kHz tone+noise: exercises resample + downmix
    rng = np.random.default_rng(0)
    t = np.arange(int(2.0 * 44100)) / 44100.0
    wav = np.stack(
        [np.sin(2 * np.pi * 440 * t), 0.3 * rng.standard_normal(t.shape)]
    ).astype(np.float32) * 0.5
    wav_path = os.path.join(tmp, "in.wav")
    write_wav(wav_path, wav, 44100)

    model = SAMAudio.from_pretrained(tmp, allow_random_towers=True)
    processor = SAMAudioProcessor.from_pretrained(tmp)

    batch = processor(
        descriptions=["a violin playing", "speech"],
        audios=[wav_path, wav_path],
    )
    result = model.separate(
        batch, reranking_candidates=2, rng=jax.random.PRNGKey(1)
    )
    expect = int(round(2.0 * 48000))  # 96000; divisible by hop 1920
    for i, tgt in enumerate(result.target):
        tgt = np.asarray(tgt)
        assert tgt.shape[-1] == expect, (tgt.shape, expect)
        assert np.isfinite(tgt).all()
        assert float(np.sqrt((tgt.astype(np.float64) ** 2).mean())) > 0
        write_wav(os.path.join(tmp, f"out{i}.wav"), tgt, 48000)
    print("separate k=2 OK:", [np.asarray(x).shape for x in result.target])

    # anchors path
    batch2 = processor(
        descriptions=["a violin playing", "speech"],
        audios=[wav_path, wav_path],
        anchors=[[("+", 0.0, 1.0)], [("-", 0.5, 1.5)]],
    )
    r2 = model.separate(batch2, rng=jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(r2.target[0])).all()
    print("anchors path OK")

    # int8 serving mode: same batch through the quantized model
    model.quantize()
    r3 = model.separate(batch, reranking_candidates=2, rng=jax.random.PRNGKey(1))
    q = np.asarray(r3.target[0])
    assert q.shape[-1] == expect and np.isfinite(q).all()
    print("int8 quantized path OK")

    # mismatched lengths must assert
    try:
        processor(descriptions=["one"], audios=[wav_path, wav_path])
        raise SystemExit("expected AssertionError for mismatched lengths")
    except AssertionError:
        print("mismatch assertion OK")

    print("VERIFY PASS")


if __name__ == "__main__":
    main()
