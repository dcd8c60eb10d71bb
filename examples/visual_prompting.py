"""Visual prompting walkthrough.

Demonstrates the masked-video prompting mode (reference README "visual
prompt": point at the sounding object by masking video frames) and visual
reranking with ImageBind:

  1. build per-frame masks over a synthetic video (mask==0 KEEPS pixels —
     the reference's convention, processor.mask_videos),
  2. separate with the masked video as the prompt (PE vision tower ->
     gated AlignModalities fusion onto the audio tokens),
  3. k-candidate generation reranked by audio<->video ImageBind similarity.

Run: python examples/visual_prompting.py [--model <snapshot-or-repo>]
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
    from sam_audio_tpu.config import SAMAudioConfig, TransformerConfig
    from sam_audio_tpu.models.pe_clip import PerceptionEncoder
    from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer

    from sam_audio_tpu.config import PerceptionEncoderConfig

    from sam_audio_tpu.config import DACVAEConfig

    cfg = SAMAudioConfig(
        transformer=TransformerConfig(dim=256, n_heads=4, n_layers=2,
                                      dropout=0.0, context_dim=256,
                                      out_channels=256),
        # small vision tower so the demo runs in seconds on CPU; a real
        # snapshot uses PE-Core-L14-336
        vision_encoder=PerceptionEncoderConfig(
            dim=64, width=64, vit_layers=2, vit_heads=2, image_size=56,
            patch_size=14),
        # real 48 kHz / hop-1920 codec semantics but a small net (a real
        # snapshot uses the full DAC-VAE)
        audio_codec=DACVAEConfig(encoder_dim=8, decoder_dim=64),
        span_predictor=None,
        compute_dtype="bfloat16",
    )
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg,
                                 tokenizer=ByteFallbackTokenizer())
    # the PE-Core tower ships separately from checkpoint.pt; random here
    model.vision_encoder = PerceptionEncoder.init_random(
        jax.random.PRNGKey(1), cfg.vision_encoder
    )
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="snapshot dir or HF repo; default: random demo model")
    ap.add_argument("--out", default="/tmp/sam_audio_visual_demo")
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

    sr = model.sample_rate
    rng = np.random.RandomState(0)
    seconds = 2.0
    t = np.arange(int(seconds * sr)) / sr
    mix = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    os.makedirs(args.out, exist_ok=True)
    write_wav(f"{args.out}/mixture.wav", mix, sr)

    # synthetic video: ~1 frame per latent frame; the "sounding object" is
    # the left half of the image, so the mask KEEPS the left half (mask==0)
    size = model.cfg.vision_encoder.image_size
    n_frames = max(int(seconds * sr) // model.hop_length, 1)
    video = rng.randint(0, 255, (n_frames, 3, size, size), np.uint8)
    mask = np.ones_like(video)
    mask[:, :, :, : size // 2] = 0  # mask==0 keeps (reference convention)
    masked = processor.mask_videos([video], [mask])

    # 1. visual prompting: the masked frames condition the separation
    batch = processor(descriptions=["the object on the left"],
                      audios=[mix[None]], masked_videos=masked)
    result = model.separate(batch, rng=jax.random.PRNGKey(1))
    write_wav(f"{args.out}/target_visual.wav", result.target[0], sr)
    print("visual-prompted:", result.target[0].shape)

    # 2. visual reranking: k candidates scored by ImageBind audio<->video
    # cosine similarity, best one returned
    if model.visual_ranker is None:
        from sam_audio_tpu.config import ImageBindRankerConfig
        from sam_audio_tpu.models.imagebind import (
            ImageBindConfig,
            ImageBindModel,
        )
        from sam_audio_tpu.ranking.imagebind import ImageBindRanker

        demo_ib = ImageBindConfig(
            num_audio_clips=2, audio_hidden=64, audio_layers=2,
            audio_heads=2, image_size=56, image_patch=14, num_video_clips=2,
            vision_hidden=64, vision_layers=2, vision_heads=2, embed_dim=32,
        )
        model.visual_ranker = ImageBindRanker(
            ImageBindRankerConfig(),
            model=ImageBindModel.init_random(jax.random.PRNGKey(2), demo_ib),
        )
    result = model.separate(batch, reranking_candidates=2,
                            rng=jax.random.PRNGKey(1))
    write_wav(f"{args.out}/target_reranked.wav", result.target[0], sr)
    print("visually reranked best-of-2:", result.target[0].shape)

    # 3. fast serving modes (opt-in, non-parity; they stack):
    #    visual_stride=8 encodes every 8th frame + lerps features
    #    (4.7x -> 8.6x realtime at k=8 on a v5e chip); model.quantize()
    #    adds W8A8 matmuls incl. the PE tower (10.1x stacked); preview_nfe
    #    ranks on cheap solves (see PARITY.md mode table).
    result = model.separate(batch, reranking_candidates=2,
                            rng=jax.random.PRNGKey(1), visual_stride=8)
    write_wav(f"{args.out}/target_strided.wav", result.target[0], sr)
    print("visual_stride=8:", result.target[0].shape)
    print(f"outputs in {args.out}/")


if __name__ == "__main__":
    main()
