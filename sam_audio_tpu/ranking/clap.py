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
    def __init__(self, config: ClapRankerConfig, model=None,
                 allow_random: bool = False, seed: int = 0):
        self.config = config
        self._model = model
        self.allow_random = allow_random
        # rand_trunc seed: the reference scores with laion_clap's
        # data_truncating="rand_trunc" (reference ranking/clap.py:59-61, a
        # uniformly random crop of >10 s audio); we keep that semantics but
        # make it reproducible with an explicit seed.
        self.seed = seed

    @property
    def model(self):
        if self._model is None:
            from sam_audio_tpu.models.clap import ClapModel

            if self.config.checkpoint:
                from sam_audio_tpu.checkpoint import load_params
                from sam_audio_tpu.models.clap import ClapConfig

                self._model = ClapModel(ClapConfig(),
                                        load_params(self.config.checkpoint))
            elif self.allow_random:
                # explicit opt-in for tests/benchmarks only — random weights
                # produce meaningless scores
                import jax

                self._model = ClapModel.init_random(jax.random.PRNGKey(0))
            else:
                raise ValueError(
                    "ClapRanker has no weights: ClapRankerConfig.checkpoint "
                    "is empty (convert a laion_clap checkpoint, e.g. "
                    "`python scripts/convert_checkpoint.py clap --torch "
                    "630k-best.pt --out clap.npz`, and set checkpoint=). The "
                    "reference always loads real ranker weights "
                    "(sam_audio/ranking/clap.py:16-19); pass "
                    "allow_random=True only for tests."
                )
        return self._model

    def __call__(
        self,
        extracted_audio: Sequence[np.ndarray],  # per item (k, T)
        descriptions: List[str],
        sample_rate: int = 48_000,
        seed: int = None,
        **kwargs,
    ) -> np.ndarray:
        from sam_audio_tpu.models.clap import fit_duration_np

        bsz = len(extracted_audio)
        k = int(np.asarray(extracted_audio[0]).shape[0])
        n = self.model.cfg.n_samples
        # seeded rand_trunc, matching the reference's data_truncating=
        # "rand_trunc" (ranking/clap.py:59-61) but reproducible
        rng = np.random.RandomState(self.seed if seed is None else seed)
        rows = []
        for item in extracted_audio:
            arr = np.asarray(item, np.float32)
            if sample_rate != CLAP_SAMPLE_RATE:
                arr = resample_np(arr, sample_rate, CLAP_SAMPLE_RATE)
            for j in range(k):
                # per-candidate repeatpad/rand-trunc on the TRUE length
                rows.append(fit_duration_np(arr[j], n, rand_trunc=True,
                                            rng=rng))
        flat = np.stack(rows)
        audio_emb = np.asarray(self.model.get_audio_embedding(jnp.asarray(flat)))
        text_emb = np.asarray(self.model.get_text_embedding(descriptions))
        # candidate j of item i scored against item i's prompt
        scores = np.einsum("bkd,bd->bk", audio_emb.reshape(bsz, k, -1), text_emb)
        return scores.astype(np.float32)
