"""Ranker factory (reference: sam_audio/ranking/__init__.py:15-30)."""

from __future__ import annotations

from typing import Optional

from sam_audio_tpu.config import (
    ClapRankerConfig,
    EnsembleRankerConfig,
    ImageBindRankerConfig,
    JudgeRankerConfig,
    RankerConfig,
    SoundActivityRankerConfig,
)
from sam_audio_tpu.ranking.ranker import EnsembleRanker, Ranker  # noqa: F401


def create_ranker(config: Optional[RankerConfig],
                  allow_random: bool = False) -> Optional[Ranker]:
    """Build a ranker from its config. `allow_random=True` (tests only) lets
    weightless CLAP/ImageBind configs fall back to random init instead of
    raising; real serving must stage converted checkpoints."""
    if config is None:
        return None
    if isinstance(config, SoundActivityRankerConfig):
        from sam_audio_tpu.ranking.sound_activity import SoundActivityRanker

        return SoundActivityRanker(config)
    if isinstance(config, ClapRankerConfig):
        from sam_audio_tpu.ranking.clap import ClapRanker

        return ClapRanker(config, allow_random=allow_random)
    if isinstance(config, JudgeRankerConfig):
        from sam_audio_tpu.ranking.judge import JudgeRanker

        return JudgeRanker(config)
    if isinstance(config, ImageBindRankerConfig):
        from sam_audio_tpu.ranking.imagebind import ImageBindRanker

        return ImageBindRanker(config, allow_random=allow_random)
    if isinstance(config, EnsembleRankerConfig):
        rankers, weights = [], []
        for _, (sub, weight) in config.items():
            rankers.append(create_ranker(sub, allow_random=allow_random))
            weights.append(weight)
        return EnsembleRanker(rankers, weights)
    raise ValueError(f"Unknown ranker config: {config!r}")
