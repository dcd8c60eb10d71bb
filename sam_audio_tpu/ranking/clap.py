"""CLAP text<->audio ranker (reference: sam_audio/ranking/clap.py:11-86):
score each candidate's audio embedding against its prompt's text embedding."""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import ClapRankerConfig
from sam_audio_tpu.ops.resample import resample_np
from sam_audio_tpu.ranking.ranker import Ranker

CLAP_SAMPLE_RATE = 48_000


class ClapRanker(Ranker):
    def __init__(self, config: ClapRankerConfig, model=None):
        self.config = config
        self._model = model

    @property
    def model(self):
        if self._model is None:
            import jax

            from sam_audio_tpu.models.clap import ClapModel

            if self.config.checkpoint:
                from sam_audio_tpu.checkpoint import load_params
                from sam_audio_tpu.models.clap import ClapConfig

                self._model = ClapModel(ClapConfig(),
                                        load_params(self.config.checkpoint))
            else:
                self._model = ClapModel.init_random(jax.random.PRNGKey(0))
        return self._model

    def __call__(
        self,
        extracted_audio: Sequence[np.ndarray],  # per item (k, T)
        descriptions: List[str],
        sample_rate: int = 48_000,
        **kwargs,
    ) -> np.ndarray:
        from sam_audio_tpu.models.clap import fit_duration_np

        bsz = len(extracted_audio)
        k = int(np.asarray(extracted_audio[0]).shape[0])
        n = self.model.cfg.n_samples
        rows = []
        for item in extracted_audio:
            arr = np.asarray(item, np.float32)
            if sample_rate != CLAP_SAMPLE_RATE:
                arr = resample_np(arr, sample_rate, CLAP_SAMPLE_RATE)
            for j in range(k):
                # per-candidate repeatpad/center-trunc on the TRUE length
                rows.append(fit_duration_np(arr[j], n))
        flat = np.stack(rows)
        audio_emb = np.asarray(self.model.get_audio_embedding(jnp.asarray(flat)))
        text_emb = np.asarray(self.model.get_text_embedding(descriptions))
        # candidate j of item i scored against item i's prompt
        scores = np.einsum("bkd,bd->bk", audio_emb.reshape(bsz, k, -1), text_emb)
        return scores.astype(np.float32)
