"""CLAP text<->audio ranker (reference: sam_audio/ranking/clap.py:11-86):
score each candidate's audio embedding against its prompt's text embedding.

Two scoring paths:
  * `score_on_device` — the serving hot path: decoded candidate waveforms
    stay on the TPU, repeat-padding uses a modular gather on their TRUE
    lengths, and the HTSAT+RoBERTa towers run as one jitted program
    (matching the reference's in-separate reranking compute,
    model.py:306-330, with the scorers compiled on device). Engaged by
    SAMAudio.separate when the clip fits the 10 s CLAP window (no
    truncation -> no rand_trunc randomness to reproduce).
  * `__call__` — host path for arbitrary lengths/sample rates: per-row
    numpy repeatpad + seeded rand_trunc (reference clap.py:59-61).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import ClapRankerConfig
from sam_audio_tpu.ops.resample import resample_np
from sam_audio_tpu.ranking.ranker import Ranker

CLAP_SAMPLE_RATE = 48_000


_score_jit_cache = {}


def _clap_score_jit(params, rows, sizes_r, starts, ids, mask, *, cfg, bsz, k):
    """One jitted scoring program per ClapConfig (shape buckets handled by
    jit's own cache keyed on array shapes)."""
    import jax

    if "fn" not in _score_jit_cache:
        from sam_audio_tpu.models.clap import clap_audio_embed, clap_text_embed

        from functools import partial

        @partial(jax.jit, static_argnames=("cfg", "bsz", "k"))
        def _score(params, rows, sizes_r, starts, ids, mask, *, cfg, bsz, k):
            idx = (starts[:, None] + jnp.arange(cfg.n_samples)[None, :]) \
                % sizes_r[:, None]
            fitted = jnp.take_along_axis(rows, idx, axis=1)
            a_emb = clap_audio_embed(params, cfg, fitted)
            t_emb = clap_text_embed(params, cfg, ids, mask)
            return jnp.einsum("bkd,bd->bk", a_emb.reshape(bsz, k, -1), t_emb)

        _score_jit_cache["fn"] = _score
    return _score_jit_cache["fn"](params, rows, sizes_r, starts, ids, mask,
                                  cfg=cfg, bsz=bsz, k=k)


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

    def supports_on_device(self, sizes, sample_rate: int) -> bool:
        """On-device scoring is exact (vs the host path) when the audio is
        already at the CLAP pipeline's sample rate (48 kHz for the real
        config) and every candidate fits the 10 s window."""
        cfg = self.model.cfg
        return sample_rate == cfg.sample_rate and all(
            0 < int(s) <= cfg.n_samples for s in sizes
        )

    def score_on_device(self, targets, sizes, descriptions,
                        seed: int = None, mixtures=None) -> jnp.ndarray:
        """targets: (bsz, k, Tpad) device array at 48 kHz; sizes: per-item
        TRUE sample counts (<= n_samples). Returns (bsz, k) scores without
        leaving the device.

        Bit-matches the host path's `fit_duration_np(..., rand_trunc=True)`:
        repeat-padding is a cyclic gather `wav[(start + i) % size]` where the
        seeded random crop starts are drawn on host in the same RandomState
        order the host path uses (item-major, then candidate). The int16
        roundtrip and projection/normalization live in clap_audio_embed."""
        model = self.model
        cfg = model.cfg
        n = cfg.n_samples
        bsz, k, t_pad = targets.shape
        ids, mask = model.tokenizer(list(descriptions),
                                    max_length=cfg.max_text_len)
        rng = np.random.RandomState(self.seed if seed is None else seed)
        sizes_np = np.asarray(sizes, np.int64)
        starts = np.zeros((bsz * k,), np.int64)
        for i in range(bsz):
            t = int(sizes_np[i])
            tiled = t * -(-n // t)  # len after np.tile(ceil(n/t))
            for j in range(k):
                if tiled > n:  # same draw sequence as fit_duration_np
                    starts[i * k + j] = rng.randint(0, tiled - n + 1)
        sizes_r = jnp.repeat(jnp.asarray(sizes_np), k)
        return _clap_score_jit(model.params,
                               targets.reshape(bsz * k, t_pad), sizes_r,
                               jnp.asarray(starts), jnp.asarray(ids),
                               jnp.asarray(mask), cfg=cfg, bsz=bsz, k=k)

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
        # 48 kHz for the real config (stub models in tests may omit it)
        clap_sr = getattr(self.model.cfg, "sample_rate", CLAP_SAMPLE_RATE)
        rows = []
        for item in extracted_audio:
            arr = np.asarray(item, np.float32)
            if sample_rate != clap_sr:
                arr = resample_np(arr, sample_rate, clap_sr)
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
