"""Eval settings registry: the reference's 14 paper settings plus a hermetic
synthetic smoke setting (reference: eval/dataset/__init__.py:8-70)."""

from __future__ import annotations

from typing import Callable

from sam_audio_tpu.eval.datasets import MUSDB, SAMAudioBench, SyntheticBench

SETTINGS = {
    # Text-only settings
    "sfx": (SAMAudioBench,
            {"span": False, "visual": False, "subset": "others-50:text-only"}),
    "speech": (SAMAudioBench,
               {"span": False, "visual": False,
                "subset": "speech-clean-50:text-only"}),
    "speaker": (SAMAudioBench,
                {"span": False, "visual": False, "subset": "spk-50:text-only"}),
    "music": (SAMAudioBench,
              {"span": False, "visual": False,
               "subset": "music-clean-50:text-only"}),
    "instr-wild": (SAMAudioBench,
                   {"span": False, "visual": False,
                    "subset": "instr-50:text-only"}),
    "instr-pro": (MUSDB, {}),
    # Span settings
    "sfx-span": (SAMAudioBench,
                 {"span": True, "visual": False,
                  "subset": "others-50:text+span"}),
    "speech-span": (SAMAudioBench,
                    {"span": True, "visual": False,
                     "subset": "speech-clean-50:text+span"}),
    "speaker-span": (SAMAudioBench,
                     {"span": True, "visual": False,
                      "subset": "spk-50:text+span"}),
    "music-span": (SAMAudioBench,
                   {"span": True, "visual": False,
                    "subset": "music-clean-50:text+span"}),
    "instr-wild-span": (SAMAudioBench,
                        {"span": True, "visual": False,
                         "subset": "instr-50:text+span"}),
    # Visual settings
    "sfx-visual": (SAMAudioBench,
                   {"span": False, "visual": True,
                    "subset": "others-onscreen-50:visual-only"}),
    "speaker-visual": (SAMAudioBench,
                       {"span": False, "visual": True,
                        "subset": "spk-onscreen-50:visual-only"}),
    "instr-wild-visual": (SAMAudioBench,
                          {"span": False, "visual": True,
                           "subset": "instr-onscreen-50:visual-only"}),
    # Hermetic synthetic smoke setting (ours; no downloads required)
    "synthetic": (SyntheticBench, {}),
    "synthetic-span": (SyntheticBench, {"span": True}),
}


def make_dataset(setting: str, cache_path: str, collate_fn: Callable):
    """Instantiate a registered eval setting by name (raises with the full
    setting list on a typo)."""
    try:
        dataset_cls, dataset_kwargs = SETTINGS[setting]
    except KeyError:
        raise KeyError(
            f"unknown eval setting {setting!r}; choose from {sorted(SETTINGS)}"
        ) from None
    return dataset_cls(cache_path=cache_path, collate_fn=collate_fn,
                       **dataset_kwargs)
