"""Ranking-layer parity against the real reference code: the EnsembleRanker
weighted sum (ranking/ranker.py:22-36) and parse_ranker_config's recursive
tagged-union semantics (model/config.py:138-201)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from reference_loader import _exec_module, load_reference

from sam_audio_tpu.config import (
    ClapRankerConfig,
    EnsembleRankerConfig,
    SoundActivityRankerConfig,
    parse_ranker_config,
)
from sam_audio_tpu.ranking.ranker import EnsembleRanker


def _load_reference_ranker():
    if "sam_audio.ranking.ranker" in sys.modules:
        return sys.modules["sam_audio.ranking.ranker"]
    load_reference()
    return _exec_module("sam_audio.ranking.ranker",
                        "/root/reference/sam_audio/ranking/ranker.py")


def test_ensemble_weighted_sum_matches_reference():
    rmod = _load_reference_ranker()
    rng = np.random.RandomState(0)
    scores = [rng.randn(2, 4).astype(np.float32) for _ in range(3)]
    weights = [0.5, 1.5, -0.25]

    class _Fixed(rmod.Ranker):
        def __init__(self, arr):
            super().__init__()
            self.arr = torch.from_numpy(arr)

        def forward(self, **kwargs):
            return self.arr

    theirs = rmod.EnsembleRanker(
        [_Fixed(s) for s in scores], weights
    )(audio=None).numpy()

    class _Ours:
        def __init__(self, arr):
            self.arr = arr

        def __call__(self, **kwargs):
            return self.arr

    ours = EnsembleRanker([_Ours(s) for s in scores], weights)(audio=None)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6)


def test_parse_ranker_config_matches_reference_structure():
    ref_cfg = sys.modules.get("sam_audio.model.config") or (
        load_reference() and sys.modules["sam_audio.model.config"])

    d = {
        "kind": "ensemble",
        "rankers": {
            "clap": ({"kind": "clap", "checkpoint": "ckpt.pt"}, 0.75),
            "sa": ({"kind": "sound_activity", "sil_threshold": -35.0,
                    "metric": "recall"}, 0.25),
        },
    }
    import copy

    theirs = ref_cfg.parse_ranker_config(copy.deepcopy(d))
    ours = parse_ranker_config(copy.deepcopy(d))

    assert isinstance(ours, EnsembleRankerConfig)
    assert theirs.kind == ours.kind == "ensemble"
    ours_map = dict(ours.rankers)
    assert set(theirs.rankers) == set(ours_map)
    ref_clap, ref_w = theirs.rankers["clap"]
    our_clap, our_w = ours_map["clap"]
    assert isinstance(our_clap, ClapRankerConfig)
    assert ref_clap.kind == our_clap.kind == "clap"
    assert ref_clap.checkpoint == our_clap.checkpoint == "ckpt.pt"
    assert ref_w == our_w == 0.75
    ref_sa, _ = theirs.rankers["sa"]
    our_sa, _ = ours_map["sa"]
    assert isinstance(our_sa, SoundActivityRankerConfig)
    assert (ref_sa.threshold_mode, ref_sa.sil_threshold, ref_sa.metric) == (
        our_sa.threshold_mode, our_sa.sil_threshold, our_sa.metric)
