"""Eval metrics: Judge / Aesthetic / CLAP / ImageBind
(reference: eval/metrics/{judge,aes,clap,imagebind}.py).

Each metric is a callable taking the eval loop's standard kwargs
(target_wavs, input_wavs, descriptions, videos, target_wavs_sample_rate) and
returning {metric_name: [per-item floats]}.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

COLUMN_MAP = {
    "CE": "ContentEnjoyment",
    "CU": "ContentUsefulness",
    "PC": "ProductionComplexity",
    "PQ": "ProductionQuality",
}


def _require_weights(name: str, staging_hint: str, allow_random: bool):
    """Eval metrics must never silently score with random weights — the
    reference always loads real pretrained metric models, and this repo's
    rankers raise in the same no-weights condition (ranking/clap.py,
    ranking/imagebind.py). Tests pass model=... or allow_random=True."""
    if allow_random:
        import logging

        logging.getLogger(__name__).warning(
            "%s metric running with RANDOM weights (allow_random=True) — "
            "scores are meaningless; for real runs %s", name, staging_hint)
        return
    raise ValueError(
        f"{name} eval metric has no weights: {staging_hint}. Refusing to "
        f"score with random init (the numbers would be meaningless but "
        f"printed as if real); pass allow_random=True only in hermetic "
        f"tests.")


class Judge:
    """4-axis judge scores (reference: eval/metrics/judge.py:23-44)."""

    keys = ("JudgeOverall", "JudgeFaithfulness", "JudgeRecall",
            "JudgePrecision")

    def __init__(self, checkpoint: str = "facebook/sam-audio-judge",
                 model=None, processor=None):
        if model is None:
            from sam_audio_tpu.models.judge import SAMAudioJudgeModel

            model = SAMAudioJudgeModel.from_pretrained(checkpoint)
        if processor is None:
            from sam_audio_tpu.processor import SAMAudioJudgeProcessor

            processor = SAMAudioJudgeProcessor.from_pretrained(checkpoint)
        self.model = model
        self.processor = processor

    def __call__(self, input_wavs, target_wavs, descriptions,
                 target_wavs_sample_rate: int = 48_000, **kwargs):
        processed = self.processor(
            text=descriptions,
            input_audio=[np.asarray(x) for x in input_wavs],
            separated_audio=[np.asarray(x) for x in target_wavs],
            sampling_rate=target_wavs_sample_rate,
        )
        result = self.model(
            input_ids=jnp.asarray(processed["input_ids"]),
            input_values=jnp.asarray(processed["input_values"]),
            separated_values=jnp.asarray(processed["separated_values"]),
            attention_mask=jnp.asarray(processed["attention_mask"]),
            padding_mask=jnp.asarray(processed["padding_mask"]),
        )
        return {
            "JudgeOverall": np.asarray(result.overall)[:, 0].tolist(),
            "JudgeFaithfulness": np.asarray(result.faithfulness)[:, 0].tolist(),
            "JudgeRecall": np.asarray(result.recall)[:, 0].tolist(),
            "JudgePrecision": np.asarray(result.precision)[:, 0].tolist(),
        }


class Aesthetic:
    """CE/CU/PC/PQ (reference: eval/metrics/aes.py:8-49)."""

    keys = tuple(COLUMN_MAP.values())

    def __init__(self, checkpoint: Optional[str] = None, model=None,
                 allow_random: bool = False):
        if model is None:
            if checkpoint and checkpoint.endswith((".pt", ".pth", ".ckpt")):
                # real audiobox-aesthetics torch checkpoint: WavLM tower +
                # per-axis heads (models/aesthetics.AudioboxAesthetics)
                from sam_audio_tpu.models.aesthetics import AudioboxAesthetics

                model = AudioboxAesthetics.from_torch_checkpoint(checkpoint)
            else:
                from sam_audio_tpu.models.aesthetics import AesPredictor

                if checkpoint:
                    model = AesPredictor.from_pretrained(checkpoint)
                else:
                    _require_weights(
                        "Aesthetic", "convert audiobox-aesthetics "
                        "(scripts/convert_checkpoint.py aesthetics) and pass "
                        "checkpoint=", allow_random)
                    model = AesPredictor.init_random(jax.random.PRNGKey(0))
        self.model = model

    def __call__(self, target_wavs, target_wavs_sample_rate: int = 48_000,
                 **kwargs):
        result = self.model(
            [np.asarray(w) for w in target_wavs], target_wavs_sample_rate
        )
        return {
            long_name: [row[short] for row in result]
            for short, long_name in COLUMN_MAP.items()
        }


class CLAP:
    """Text<->audio similarity (reference: eval/metrics/clap.py:14-46)."""

    keys = ("CLAPSimilarity",)

    def __init__(self, checkpoint: Optional[str] = None, model=None,
                 allow_random: bool = False):
        if model is None:
            from sam_audio_tpu.models.clap import ClapModel

            if checkpoint:
                from sam_audio_tpu.checkpoint import load_params
                from sam_audio_tpu.models.clap import ClapConfig

                model = ClapModel(ClapConfig(), load_params(checkpoint))
            else:
                _require_weights(
                    "CLAP", "convert laion_clap 630k-best.pt "
                    "(scripts/convert_checkpoint.py clap) and pass "
                    "checkpoint=", allow_random)
                model = ClapModel.init_random(jax.random.PRNGKey(0))
        self.model = model

    def __call__(self, target_wavs, descriptions,
                 target_wavs_sample_rate: int = 48_000, **kwargs):
        from sam_audio_tpu.models.clap import fit_duration_np
        from sam_audio_tpu.ops.resample import resample_np

        sr = self.model.cfg.sample_rate
        n = self.model.cfg.n_samples
        wavs = []
        for w in target_wavs:
            w = np.asarray(w, np.float32).reshape(-1)
            if target_wavs_sample_rate != sr:
                w = resample_np(w, target_wavs_sample_rate, sr)
            wavs.append(fit_duration_np(w, n))
        batch = np.stack(wavs)
        audio_embs = np.asarray(
            self.model.get_audio_embedding(jnp.asarray(batch))
        )
        text_embs = np.asarray(self.model.get_text_embedding(list(descriptions)))
        sims = np.einsum("bd,bd->b", audio_embs, text_embs)
        return {"CLAPSimilarity": sims.tolist()}


class ImageBind:
    """Audio<->video cosine (reference: eval/metrics/imagebind.py:12-52)."""

    keys = ("ImageBind",)

    def __init__(self, checkpoint: Optional[str] = None, model=None,
                 allow_random: bool = False):
        if model is None:
            from sam_audio_tpu.models.imagebind import ImageBindModel

            if checkpoint:
                from sam_audio_tpu.models.imagebind import load_imagebind_model

                model = load_imagebind_model(checkpoint)
            else:
                _require_weights(
                    "ImageBind", "convert imagebind_huge.pth "
                    "(scripts/convert_checkpoint.py imagebind) and pass "
                    "checkpoint=", allow_random)
                model = ImageBindModel.init_random(jax.random.PRNGKey(0))
        self.model = model

    def __call__(self, target_wavs, videos,
                 target_wavs_sample_rate: int = 48_000, **kwargs):
        audio_embs = np.asarray(self.model.embed_audio(
            [np.asarray(w) for w in target_wavs], target_wavs_sample_rate
        ))
        video_embs = np.asarray(self.model.embed_videos(
            [np.asarray(v) for v in videos]
        ))
        sims = np.einsum("bd,bd->b", audio_embs, video_embs)
        return {"ImageBind": sims.tolist()}
