"""imagebind_huge weight compatibility: converter coverage + branch
embedding parity vs a key-faithful torch oracle (reference
ranking/imagebind.py:23 loads imagebind_model.imagebind_huge)."""

import numpy as np
import torch

import jax.numpy as jnp

from torch_imagebind_oracle import tiny_imagebind

from sam_audio_tpu.models.imagebind import (
    ImageBindHugeConfig,
    convert_imagebind_state_dict,
    imagebind_encode_audio,
    imagebind_encode_vision,
)

TINY = ImageBindHugeConfig(
    audio_dim=32, audio_layers=2, audio_heads=4, audio_kernel=16,
    audio_stride=10, n_mels=48, target_frames=56, vision_dim=32,
    vision_layers=2, vision_heads=4, vision_patch=14, image_size=28,
    embed_dim=16,
)


def test_imagebind_conversion_and_parity():
    model, audio_branch, vision_branch = tiny_imagebind()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, unconverted, skipped = convert_imagebind_state_dict(sd, TINY)
    assert unconverted == [], unconverted
    assert skipped == [], skipped

    rng = np.random.RandomState(0)
    # audio: (B, clips, F=56 frames, M=48 mels); oracle takes (B*,1,M,F)
    mel = rng.randn(2, 2, 56, 48).astype(np.float32)
    ours_a = np.asarray(imagebind_encode_audio(params, TINY, jnp.asarray(mel)))
    with torch.no_grad():
        img = torch.from_numpy(mel.reshape(4, 1, 56, 48).transpose(0, 1, 3, 2))
        ref_a = audio_branch(img).reshape(2, 2, -1).mean(dim=1)
        ref_a = (ref_a / ref_a.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours_a, ref_a, rtol=3e-4, atol=3e-4)

    # vision: (B, n, 3, 28, 28); oracle repeats to 2 frames for the 3D stem
    clips = rng.rand(2, 3, 3, 28, 28).astype(np.float32)
    ours_v = np.asarray(
        imagebind_encode_vision(params, TINY, jnp.asarray(clips))
    )
    with torch.no_grad():
        x = torch.from_numpy(clips.reshape(6, 3, 1, 28, 28))
        x = x.expand(-1, -1, 2, -1, -1)
        ref_v = vision_branch(x).reshape(2, 3, -1).mean(dim=1)
        ref_v = (ref_v / ref_v.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours_v, ref_v, rtol=3e-4, atol=3e-4)


def test_imagebind_skips_other_modalities():
    model, _, _ = tiny_imagebind()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    sd["modality_preprocessors.text.token_embedding.weight"] = np.zeros(
        (10, 8), np.float32
    )
    sd["modality_trunks.text.blocks.0.attn.in_proj_weight"] = np.zeros(
        (24, 8), np.float32
    )
    params, unconverted, skipped = convert_imagebind_state_dict(sd, TINY)
    assert unconverted == []
    assert len(skipped) == 2


def test_imagebind_huge_model_end_to_end():
    """Transforms + converted towers: wav/video in, cosine-ready
    embeddings out."""
    import jax

    from sam_audio_tpu.models.imagebind import (
        ImageBindConfig,
        ImageBindHugeModel,
        convert_imagebind_state_dict,
    )

    model_t, _, _ = tiny_imagebind(seed=3)
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params, unconverted, _ = convert_imagebind_state_dict(sd, TINY)
    assert unconverted == []
    pipeline = ImageBindConfig(sample_rate=8000, clip_duration_s=0.25,
                               num_audio_clips=2, n_mels=48, target_frames=56,
                               n_fft=128, hop_length=32)
    model = ImageBindHugeModel(TINY, params, pipeline)

    rng = np.random.RandomState(0)
    wavs = [0.3 * rng.randn(4000).astype(np.float32) for _ in range(2)]
    a = np.asarray(model.embed_audio(wavs, sample_rate=8000))
    assert a.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, rtol=1e-4)

    videos = [rng.randint(0, 255, (9, 3, 40, 50)).astype(np.uint8)
              for _ in range(2)]
    v = np.asarray(model.embed_videos(videos, num_crops=3))
    assert v.shape == (2, 16)
    assert np.isfinite(v).all()
    scores = a @ v.T
    assert np.isfinite(scores).all()


def test_video_to_frame_clips_shapes():
    from sam_audio_tpu.models.imagebind import video_to_frame_clips

    frames = np.random.RandomState(1).randint(
        0, 255, (11, 3, 30, 48)).astype(np.uint8)
    clips = video_to_frame_clips(frames, num_clips=5, frames_per_clip=2,
                                 size=28, num_crops=3)
    assert clips.shape == (15, 3, 2, 28, 28)


def test_imagebind_huge_init_matches_converted_layout():
    """The random bench init must produce the exact converted-checkpoint
    pytree (same key paths, same per-leaf element counts) so benchmark
    numbers represent the real imagebind_huge compute."""
    import jax

    from sam_audio_tpu.models.imagebind import imagebind_huge_init

    model_t, _, _ = tiny_imagebind()
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    converted, unconverted, _ = convert_imagebind_state_dict(sd, TINY)
    assert unconverted == []
    rnd = imagebind_huge_init(jax.random.PRNGKey(0), TINY)

    def leaf_map(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {jax.tree_util.keystr(p): int(np.prod(v.shape))
                for p, v in flat}

    assert leaf_map(rnd) == leaf_map(converted)


def test_imagebind_huge_embed_audio_device_matches_host():
    import jax

    from sam_audio_tpu.models.imagebind import (
        ImageBindConfig,
        ImageBindHugeModel,
    )

    pipeline = ImageBindConfig(sample_rate=8000, clip_duration_s=0.25,
                               num_audio_clips=2, n_mels=48, target_frames=56,
                               n_fft=128, hop_length=32)
    model = ImageBindHugeModel.init_random(jax.random.PRNGKey(1), TINY,
                                           pipeline)
    rng = np.random.RandomState(0)
    wavs = (0.3 * rng.randn(3, 4000)).astype(np.float32)
    host = np.asarray(model.embed_audio(list(wavs), sample_rate=8000))
    dev = np.asarray(model.embed_audio_device(jnp.asarray(wavs), 8000))
    np.testing.assert_allclose(dev, host, rtol=2e-3, atol=2e-3)


def test_load_imagebind_model_sniffs_layout(tmp_path):
    """Converted (huge conv-stem) vs structural (light patch_embed) .npz
    checkpoints dispatch to the matching executor class."""
    import jax

    from sam_audio_tpu.checkpoint import save_params
    from sam_audio_tpu.models.imagebind import (
        ImageBindHugeModel,
        ImageBindModel,
        imagebind_huge_init,
        imagebind_init,
        load_imagebind_model,
    )

    huge = tmp_path / "huge.npz"
    save_params(str(huge), imagebind_huge_init(jax.random.PRNGKey(0), TINY))
    m = load_imagebind_model(str(huge))
    assert isinstance(m, ImageBindHugeModel)
    assert "stem" in m.params["audio"]

    from sam_audio_tpu.models.imagebind import ImageBindConfig

    light_cfg = ImageBindConfig(audio_hidden=16, audio_layers=1,
                                audio_heads=2, vision_hidden=16,
                                vision_layers=1, vision_heads=2, embed_dim=8)
    light = tmp_path / "light.npz"
    save_params(str(light),
                imagebind_init(jax.random.PRNGKey(0), light_cfg))
    m2 = load_imagebind_model(str(light))
    assert isinstance(m2, ImageBindModel)


def test_quantize_imagebind_params_close_to_fp():
    """int8 ImageBind scorer: trunk linears quantized, embeddings stay
    strongly correlated with fp on the tiny huge model."""
    import jax

    from sam_audio_tpu.models.imagebind import (
        imagebind_encode_audio,
        imagebind_huge_init,
    )
    from sam_audio_tpu.ops.quant import quantize_imagebind_params

    params = imagebind_huge_init(jax.random.PRNGKey(0), TINY)
    rng = np.random.RandomState(0)
    mel = (rng.randn(2, 2, 56, 48) * 0.5).astype(np.float32)
    ref = np.asarray(imagebind_encode_audio(params, TINY, jnp.asarray(mel)))
    q = quantize_imagebind_params(params)
    assert "w8" in q["audio"]["trunk"]["layers"]["attn"]["wq"]
    assert "w8" in q["vision"]["trunk"]["layers"]["mlp"]["fc1"]
    out = np.asarray(imagebind_encode_audio(q, TINY, jnp.asarray(mel)))
    cos = np.sum(ref * out, axis=-1)  # embeddings are L2-normalized
    assert (cos > 0.98).all(), cos
