"""Export trained params as a serving snapshot.

Closes the train -> serve loop: the snapshot (config.json + params.npz) is
exactly what `SAMAudio.from_pretrained` / `load_sam_audio` consume
(checkpoint.py:749), so a fine-tuned or pretrained model drops into every
inference surface — separate(), the eval CLI, the HTTP server — with no
conversion step. The reference has no trainer, hence no equivalent; its
snapshots only ever come from the HF hub (sam_audio/model/base.py:27-45).

Frozen towers (codec, T5) ride along in the export, so the snapshot is
self-contained: loading never re-resolves external tower weights.
"""

from __future__ import annotations

import dataclasses
import json
import os

from sam_audio_tpu.checkpoint import save_params
from sam_audio_tpu.config import SAMAudioConfig


def export_snapshot(cfg: SAMAudioConfig, params, out_dir: str) -> str:
    """Write `out_dir/{config.json,params.npz}` and return `out_dir`.

    `params` is the full pytree (trainable + frozen towers) — pass
    `trainer.ema_inference_params()` for EMA-averaged serving weights, or
    `trainer.state.params` for the live ones.
    """
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    save_params(os.path.join(out_dir, "params.npz"), params)
    return out_dir
