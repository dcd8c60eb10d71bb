"""ImageBind audio<->video ranker (reference: sam_audio/ranking/imagebind.py:
152-197): cosine between each candidate's audio embedding and its prompt
video's embedding."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from sam_audio_tpu.config import ImageBindRankerConfig
from sam_audio_tpu.ranking.ranker import Ranker


class ImageBindRanker(Ranker):
    def __init__(self, config: ImageBindRankerConfig, model=None,
                 allow_random: bool = False):
        self.config = config
        self._model = model
        self.allow_random = allow_random

    @property
    def model(self):
        if self._model is None:
            from sam_audio_tpu.models.imagebind import ImageBindModel

            if self.config.checkpoint:
                from sam_audio_tpu.models.imagebind import load_imagebind_model

                self._model = load_imagebind_model(self.config.checkpoint)
            elif self.allow_random:
                # explicit opt-in for tests/benchmarks only — random weights
                # produce meaningless scores
                import jax

                self._model = ImageBindModel.init_random(jax.random.PRNGKey(0))
            else:
                raise ValueError(
                    "ImageBindRanker has no weights: "
                    "ImageBindRankerConfig.checkpoint is empty (convert an "
                    "imagebind_huge checkpoint with `python "
                    "scripts/convert_checkpoint.py imagebind --torch "
                    "imagebind_huge.pth --out imagebind.npz` and set "
                    "checkpoint=). The reference always loads real ranker "
                    "weights (sam_audio/ranking/imagebind.py:23); pass "
                    "allow_random=True only for tests."
                )
        return self._model

    def supports_on_device(self, sizes, sample_rate: int) -> bool:
        """On-device scoring is exact (vs the host path) when every candidate
        has the same TRUE length — the mel clip start times depend on the
        true duration, which must also equal the decoded array length (the
        caller checks sizes == padded length). May raise ValueError when no
        weights are staged, like the host path's first score."""
        self.model  # fail loudly without weights
        return len({int(s) for s in sizes}) == 1 and int(sizes[0]) > 0

    def score_on_device(self, targets, sizes, videos,
                        sample_rate: int = 48_000):
        """targets: (bsz, k, T) device array of decoded candidates; videos:
        per-item host frames (N, C, H, W). The candidates never round-trip
        through host numpy: resample -> Kaldi mel clips -> audio tower run as
        one compiled program. The video tower also runs on device (its frame
        transforms are host-side numpy, once per call — the reference runs
        the whole VideoTransform on host per call, ranking/imagebind.py:
        89-150)."""
        import jax.numpy as jnp

        bsz, k, t = targets.shape
        video_emb = self.model.embed_videos(videos)
        a_emb = self.model.embed_audio_device(
            targets.reshape(bsz * k, t), sample_rate)
        return jnp.einsum("bkd,bd->bk", a_emb.reshape(bsz, k, -1), video_emb)

    def __call__(
        self,
        extracted_audio: Sequence[np.ndarray],  # per item (k, T)
        videos: Sequence[np.ndarray],           # per item (N, C, H, W)
        sample_rate: int = 48_000,
        **kwargs,
    ) -> np.ndarray:
        bsz = len(extracted_audio)
        k = int(np.asarray(extracted_audio[0]).shape[0])
        flat_wavs = [np.asarray(extracted_audio[i][j], np.float32)
                     for i in range(bsz) for j in range(k)]
        audio_emb = np.asarray(self.model.embed_audio(flat_wavs, sample_rate))
        video_emb = np.asarray(self.model.embed_videos(videos))
        scores = np.einsum("bkd,bd->bk", audio_emb.reshape(bsz, k, -1),
                           video_emb)
        return scores.astype(np.float32)
