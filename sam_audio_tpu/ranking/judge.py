"""Judge ranker: scores each candidate with the SAMAudioJudge model
(reference: sam_audio/ranking/judge.py:11-42)."""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import JudgeRankerConfig
from sam_audio_tpu.ranking.ranker import Ranker


class JudgeRanker(Ranker):
    def __init__(self, config: JudgeRankerConfig, model=None, processor=None):
        self.config = config
        self._model = model
        self._processor = processor

    @property
    def model(self):
        if self._model is None:
            from sam_audio_tpu.models.judge import SAMAudioJudgeModel

            self._model = SAMAudioJudgeModel.from_pretrained(
                self.config.checkpoint_or_model_id
            )
        return self._model

    @property
    def processor(self):
        if self._processor is None:
            from sam_audio_tpu.processor import SAMAudioJudgeProcessor

            self._processor = SAMAudioJudgeProcessor.from_pretrained(
                self.config.checkpoint_or_model_id
            )
        return self._processor

    def __call__(
        self,
        extracted_audio: Sequence[np.ndarray],  # per item (k, T)
        input_audio: Sequence[np.ndarray],      # per item (k, T) mixtures
        descriptions: List[str],
        sample_rate: int = 48_000,
        **kwargs,
    ) -> np.ndarray:
        bsz = len(extracted_audio)
        k = int(np.asarray(extracted_audio[0]).shape[0])
        # flatten (bsz x k) pairs (reference ranking/judge.py:29-32)
        separated = [np.asarray(extracted_audio[i][j], np.float32)
                     for i in range(bsz) for j in range(k)]
        mixtures = [np.asarray(input_audio[i][j], np.float32)
                    for i in range(bsz) for j in range(k)]
        texts = [descriptions[i] for i in range(bsz) for _ in range(k)]

        batch = self.processor(
            text=texts,
            input_audio=mixtures,
            separated_audio=separated,
            sampling_rate=sample_rate,
        )
        out = self.model(
            input_ids=jnp.asarray(batch["input_ids"]),
            input_values=jnp.asarray(batch["input_values"]),
            separated_values=jnp.asarray(batch["separated_values"]),
            attention_mask=jnp.asarray(batch["attention_mask"]),
            padding_mask=jnp.asarray(batch["padding_mask"]),
        )
        return np.asarray(out.overall).reshape(bsz, k)
