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


class Judge:
    """4-axis judge scores (reference: eval/metrics/judge.py:23-44)."""

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

    def __init__(self, checkpoint: Optional[str] = None, model=None):
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

    def __init__(self, checkpoint: Optional[str] = None, model=None):
        if model is None:
            from sam_audio_tpu.models.clap import ClapModel

            if checkpoint:
                from sam_audio_tpu.checkpoint import load_params
                from sam_audio_tpu.models.clap import ClapConfig

                model = ClapModel(ClapConfig(), load_params(checkpoint))
            else:
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

    def __init__(self, checkpoint: Optional[str] = None, model=None):
        if model is None:
            from sam_audio_tpu.models.imagebind import ImageBindModel

            if checkpoint:
                from sam_audio_tpu.models.imagebind import load_imagebind_model

                model = load_imagebind_model(checkpoint)
            else:
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
