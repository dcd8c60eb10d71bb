"""Host-side video decode (the reference uses torchcodec's C++/FFmpeg
VideoDecoder, reference: sam_audio/processor.py:13, 131-155).

Routes through the ffmpeg CLI when present. Array inputs ((N, C, H, W) uint8)
bypass this module entirely and are the hermetic path used in tests.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from typing import Tuple

import numpy as np


def decode_video_frames(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (frames (N, C, H, W) uint8, pts_seconds (N,) float64)."""
    ffmpeg = shutil.which("ffmpeg")
    ffprobe = shutil.which("ffprobe")
    if ffmpeg is None or ffprobe is None:
        raise RuntimeError(
            f"Cannot decode video {path!r}: ffmpeg/ffprobe not on PATH. "
            "Pass video frames as (N, C, H, W) uint8 arrays instead."
        )
    meta = json.loads(
        subprocess.run(
            [ffprobe, "-v", "error", "-select_streams", "v:0", "-show_entries",
             "stream=width,height,r_frame_rate,avg_frame_rate,nb_frames,"
             "duration", "-of", "json", path],
            capture_output=True, text=True, check=True,
        ).stdout
    )["streams"][0]
    w, h = int(meta["width"]), int(meta["height"])

    def _rate(field: str) -> float:
        num, _, den = meta.get(field, "0/0").partition("/")
        try:
            return float(num) / float(den or 1)
        except (ValueError, ZeroDivisionError):
            return 0.0

    # r_frame_rate can be "0/0" for streams with no declared rate (WebM/MKV
    # captures); fall back to avg_frame_rate, then nb_frames/duration. The
    # resulting pts are a CFR approximation (arange/fps) — for heavily
    # variable-frame-rate content the true per-frame pts can diverge; the
    # downstream nearest-frame mapping tolerates small drift.
    fps = _rate("r_frame_rate") or _rate("avg_frame_rate")
    if fps <= 0:
        try:
            fps = float(meta["nb_frames"]) / float(meta["duration"])
        except (KeyError, ValueError, ZeroDivisionError):
            fps = 25.0
    raw = subprocess.run(
        [ffmpeg, "-v", "error", "-i", path, "-f", "rawvideo", "-pix_fmt", "rgb24",
         "-"],
        capture_output=True, check=True,
    ).stdout
    frames = np.frombuffer(raw, np.uint8).reshape(-1, h, w, 3)
    frames = np.transpose(frames, (0, 3, 1, 2)).copy()  # NCHW
    pts = np.arange(frames.shape[0], dtype=np.float64) / fps
    return frames, pts
