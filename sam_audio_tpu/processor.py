"""Preprocessing frontend: files/arrays -> batched, masked numpy tensors.

Mirrors the reference processor's behavior (sam_audio/processor.py:23-260):
load/resample to 48 kHz, downmix to mono, right-pad to a batch, frame-index
math (hop 1920 => 25 latent fps), anchor spans -> per-frame alignment tensors,
video frame selection, video masking.

All of this is host-side numpy — deliberately outside the jitted graph. One
TPU-specific addition: *length bucketing* (`bucket_seconds`), which rounds the
padded waveform length up to a bucket so XLA compiles one program per bucket
instead of one per utterance length.
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np

from sam_audio_tpu.audio_io import load_audio
from sam_audio_tpu.config import SAMAudioConfig, SAMAudioJudgeConfig
from sam_audio_tpu.ops.resample import resample_np

Anchor = Tuple[str, float, float]

ANCHOR_VOCAB = {"<null>": 0, "+": 1, "-": 2, "<pad>": 3}


def batch_audio(
    audios: Sequence[Union[str, np.ndarray]], audio_sampling_rate: int = 48_000
) -> Tuple[np.ndarray, np.ndarray]:
    """Load/resample each item, downmix to mono, right-pad into (B, 1, Tmax).
    reference: sam_audio/processor.py:23-36."""
    wavs = []
    for audio in audios:
        if isinstance(audio, str):
            wav, sr = load_audio(audio)
            if sr != audio_sampling_rate:
                wav = resample_np(wav, sr, audio_sampling_rate)
        else:
            wav = np.asarray(audio, np.float32)
            if wav.ndim == 1:
                wav = wav[None]
        wavs.append(wav.mean(0))
    sizes = np.array([w.shape[-1] for w in wavs], np.int64)
    tmax = int(sizes.max())
    out = np.zeros((len(wavs), 1, tmax), np.float32)
    for i, w in enumerate(wavs):
        out[i, 0, : w.shape[-1]] = w
    return out, sizes


def mask_from_sizes(sizes: np.ndarray, total: Optional[int] = None) -> np.ndarray:
    total = int(sizes.max()) if total is None else total
    return np.arange(total)[None, :] < sizes[:, None]


class Batch:
    """Batched model inputs (reference: sam_audio/processor.py:39-124).

    Everything is numpy; the model moves data on-device inside its jitted
    entry point, so there is no `.to(device)` — `jnp.asarray` at the jit
    boundary does the (single) host->HBM transfer.
    """

    def __init__(
        self,
        audios: np.ndarray,
        sizes: np.ndarray,
        wav_sizes: np.ndarray,
        descriptions: List[str],
        hop_length: int,
        audio_sampling_rate: int,
        anchors: Optional[List[List[Anchor]]] = None,
        audio_pad_mask: Optional[np.ndarray] = None,
        masked_video: Optional[list] = None,
        anchor_pad_to: Optional[int] = None,
    ):
        self.audios = audios
        self.sizes = sizes
        self.wav_sizes = wav_sizes
        self.descriptions = list(descriptions)
        self.audio_pad_mask = audio_pad_mask
        self.masked_video = masked_video
        self.hop_length = hop_length
        self.audio_sampling_rate = audio_sampling_rate
        # minimum anchor-slot width: callers issuing many batches (streaming)
        # pin this so every batch compiles to ONE jit shape regardless of how
        # many anchors land in each window
        self.anchor_pad_to = anchor_pad_to
        self.process_anchors(anchors)
        assert self.audios.shape[0] == len(self.descriptions)

    def _wav_to_feature_idx(self, wav_idx: float) -> int:
        return math.ceil(wav_idx / self.hop_length)

    def to(self, device=None):
        """API-compat no-op (reference processor.py:66-76): arrays are numpy
        and cross to HBM once at the jit boundary."""
        return self

    def process_anchors(self, anchors: Optional[List[List[Anchor]]]):
        """Spans (seconds) -> anchor_ids (B, A) + per-frame alignment (B, T)
        (reference: sam_audio/processor.py:78-124)."""
        batch_size = self.audios.shape[0]
        t_feat = self.audio_pad_mask.shape[-1]
        pad_to = getattr(self, "anchor_pad_to", None)
        anchor_alignment = np.zeros((batch_size, t_feat), np.int32)
        anchor_alignment[~self.audio_pad_mask] = 1  # pad frames -> <pad> slot
        if anchors is None:
            width = max(2, pad_to or 0)
            if pad_to:
                # same multiple-of-4 rounding as the anchors branch: a
                # pinned pad_to must yield ONE jit width whether or not the
                # batch carries anchors (two widths = two compiled programs)
                width = 4 * ((width + 3) // 4)
            anchor_ids = np.full((batch_size, width), ANCHOR_VOCAB["<pad>"],
                                 np.int32)
            anchor_ids[:, 0] = ANCHOR_VOCAB["<null>"]
        else:
            ids = []
            for i, anchor_list in enumerate(anchors):
                current = [ANCHOR_VOCAB["<null>"], ANCHOR_VOCAB["<pad>"]]
                for token, start_time, end_time in anchor_list:
                    start_idx = self._wav_to_feature_idx(
                        start_time * self.audio_sampling_rate
                    )
                    end_idx = self._wav_to_feature_idx(
                        end_time * self.audio_sampling_rate
                    )
                    anchor_alignment[i, start_idx:end_idx] = len(current)
                    current.append(ANCHOR_VOCAB[token])
                ids.append(current)
            longest = max([len(c) for c in ids] + [pad_to or 0])
            # round the anchor-slot axis up to a multiple of 4: unused slots are
            # <pad> (never referenced by the alignment) and this keeps the jit
            # shape stable across prompts with different anchor counts
            longest = 4 * ((longest + 3) // 4)
            anchor_ids = np.full((batch_size, longest), ANCHOR_VOCAB["<pad>"],
                                 np.int32)
            for i, c in enumerate(ids):
                anchor_ids[i, : len(c)] = c
        self.anchor_ids = anchor_ids
        self.anchor_alignment = anchor_alignment
        self.anchors = anchors


def load_video(
    sizes: np.ndarray,
    videos: Sequence[Union[str, np.ndarray]],
    feature_to_wav_idx: Callable,
    audio_sampling_rate: int,
) -> List[np.ndarray]:
    """Pick one video frame per latent audio frame (reference:
    sam_audio/processor.py:131-155). Array inputs are (N, C, H, W) uint8;
    file inputs need ffmpeg (see video_io)."""
    all_frames = []
    for size, video in zip(sizes, videos):
        if isinstance(video, str):
            from sam_audio_tpu.video_io import decode_video_frames

            frames, pts = decode_video_frames(video)
            audio_ts = feature_to_wav_idx(np.arange(int(size))) / audio_sampling_rate
            idxs = np.abs(audio_ts[None, :] - pts[:, None]).argmin(axis=0)
            frames = frames[idxs]
        else:
            video = np.asarray(video)
            assert video.shape[1] == 3, (
                f"Expected video tensor in NCHW format, got {video.shape[1]} channels"
            )
            idx = np.round(np.linspace(0, video.shape[0] - 1, int(size))).astype(int)
            frames = video[idx]
        all_frames.append(frames)
    return all_frames


class Processor:
    config_cls: Callable
    revision: Optional[str] = None

    def __init__(self, audio_hop_length: int, audio_sampling_rate: int,
                 bucket_seconds: float = 0.0):
        self.audio_hop_length = audio_hop_length
        self.audio_sampling_rate = audio_sampling_rate
        self.bucket_seconds = bucket_seconds

    @classmethod
    def _get_config(cls, model_name_or_path: str):
        if os.path.isdir(model_name_or_path):
            config_path = os.path.join(model_name_or_path, "config.json")
        else:
            from huggingface_hub import hf_hub_download

            try:
                # cache-first: on a zero-egress host a warm HF cache serves
                # instantly; going to the network first would pay ~25-40 s
                # of retry backoff for a file already on disk (same policy
                # as checkpoint.load_sam_audio)
                config_path = hf_hub_download(
                    repo_id=model_name_or_path, filename="config.json",
                    revision=cls.revision, local_files_only=True,
                )
            except Exception:
                config_path = hf_hub_download(
                    repo_id=model_name_or_path, filename="config.json",
                    revision=cls.revision,
                )
        with open(config_path) as fin:
            return cls.config_cls.from_dict(json.load(fin))

    @classmethod
    def from_pretrained(cls, model_name_or_path: str, **kwargs) -> "Processor":
        config = cls._get_config(model_name_or_path)
        return cls(
            audio_hop_length=config.audio_codec.hop_length,
            audio_sampling_rate=config.audio_codec.sample_rate,
            **kwargs,
        )

    def feature_to_wav_idx(self, feature_idx):
        return feature_idx * self.audio_hop_length

    def wav_to_feature_idx(self, wav_idx):
        if isinstance(wav_idx, np.ndarray):
            return np.ceil(wav_idx / self.audio_hop_length).astype(np.int64)
        return math.ceil(wav_idx / self.audio_hop_length)

    def mask_videos(self, videos, masks) -> List[np.ndarray]:
        """masked = video * (mask == 0) per frame (reference:
        sam_audio/processor.py:197-204 — pixels are KEPT where mask==0)."""
        out = []
        for v, m in zip(videos, masks):
            if isinstance(v, str) or isinstance(m, str):
                from sam_audio_tpu.video_io import decode_video_frames

                if isinstance(v, str):
                    v = decode_video_frames(v)[0]
                if isinstance(m, str):
                    m = decode_video_frames(m)[0]
            v = np.asarray(v)
            m = np.asarray(m)
            out.append(v * (m == 0))
        return out


class SAMAudioProcessor(Processor):
    config_cls = SAMAudioConfig
    revision = None

    def __call__(
        self,
        descriptions: List[str],
        audios: Sequence[Union[str, np.ndarray]],
        anchors: Optional[List[List[Anchor]]] = None,
        masked_videos: Optional[Sequence[Union[str, np.ndarray]]] = None,
        pad_to_samples: Optional[int] = None,
        pad_anchors_to: Optional[int] = None,
    ) -> Batch:
        """reference: sam_audio/processor.py:211-260. `pad_to_samples` forces
        the padded waveform length (serving pipeline bucket); `pad_anchors_to`
        forces a minimum anchor-slot width so repeated calls with varying
        anchor counts reuse one jit shape."""
        assert len(descriptions) == len(audios)
        assert anchors is None or len(descriptions) == len(anchors)
        assert masked_videos is None or len(descriptions) == len(masked_videos)

        audio_arr, wav_sizes = batch_audio(audios, self.audio_sampling_rate)

        if pad_to_samples is not None:
            tmax = audio_arr.shape[-1]
            assert pad_to_samples >= tmax, (pad_to_samples, tmax)
            if pad_to_samples != tmax:
                audio_arr = np.pad(
                    audio_arr, [(0, 0), (0, 0), (0, pad_to_samples - tmax)]
                )
        elif self.bucket_seconds > 0:
            # Round padded length up to a bucket boundary (a hop multiple) so
            # jit sees few distinct shapes.
            bucket = int(self.bucket_seconds * self.audio_sampling_rate)
            bucket = max(self.audio_hop_length,
                         (bucket // self.audio_hop_length) * self.audio_hop_length)
            tmax = audio_arr.shape[-1]
            padded = int(math.ceil(tmax / bucket) * bucket)
            if padded != tmax:
                audio_arr = np.pad(audio_arr, [(0, 0), (0, 0), (0, padded - tmax)])

        sizes = self.wav_to_feature_idx(wav_sizes)
        t_feat = self.wav_to_feature_idx(int(audio_arr.shape[-1]))
        audio_pad_mask = mask_from_sizes(sizes, total=t_feat)
        masked_video = None
        if masked_videos is not None:
            masked_video = load_video(
                sizes, masked_videos, self.feature_to_wav_idx,
                self.audio_sampling_rate,
            )

        return Batch(
            audios=audio_arr,
            sizes=sizes,
            descriptions=descriptions,
            audio_pad_mask=audio_pad_mask,
            anchors=anchors,
            masked_video=masked_video,
            hop_length=self.audio_hop_length,
            audio_sampling_rate=self.audio_sampling_rate,
            wav_sizes=wav_sizes,
            anchor_pad_to=pad_anchors_to,
        )


class SAMAudioJudgeProcessor(Processor):
    """Judge inputs: tokenized text + reflect-padded, batched audio pairs
    (reference: sam_audio/processor.py:263-379)."""

    config_cls = SAMAudioJudgeConfig
    revision = "sam_audio"

    def __init__(self, audio_hop_length: int, audio_sampling_rate: int,
                 tokenizer=None):
        super().__init__(audio_hop_length, audio_sampling_rate)
        self.tokenizer = tokenizer

    @classmethod
    def from_pretrained(cls, model_name_or_path: str,
                        allow_fallback_tokenizer: bool = False, **kwargs):
        config = cls._get_config(model_name_or_path)
        from sam_audio_tpu.text_tokenizer import get_text_tokenizer

        tokenizer = get_text_tokenizer(
            model_name_or_path, allow_fallback=allow_fallback_tokenizer
        )
        return cls(
            audio_hop_length=config.audio_codec.hop_length,
            audio_sampling_rate=config.audio_codec.sample_rate,
            tokenizer=tokenizer,
        )

    def _reflect_pad(self, wav: np.ndarray) -> np.ndarray:
        if wav.ndim == 1:
            wav = wav[None]
        rem = wav.shape[-1] % self.audio_hop_length
        if rem == 0:
            return wav
        pad = self.audio_hop_length - rem
        return np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)], mode="reflect")

    def _process_audio(self, raw_audio, sampling_rate: Optional[int] = None):
        if isinstance(raw_audio, str):
            raw_audio = [raw_audio]
        elif isinstance(raw_audio, np.ndarray):
            # one bare array is ONE clip (the reference has a dedicated
            # non-list branch): iterating a 1-D array elementwise would
            # crash on 0-d scalars, and a (C, T) stereo array would be
            # silently mis-batched as C mono items
            raw_audio = [raw_audio]
        if isinstance(raw_audio, (list, tuple)) and raw_audio and isinstance(
            raw_audio[0], str
        ):
            loaded = []
            for f in raw_audio:
                wav, sr = load_audio(f)
                if sr != self.audio_sampling_rate:
                    wav = resample_np(wav, sr, self.audio_sampling_rate)
                loaded.append(wav.mean(0, keepdims=True))
            raw_audio = loaded
        elif sampling_rate is not None and sampling_rate != self.audio_sampling_rate:
            raise ValueError(
                f"Expected sampling rate {self.audio_sampling_rate}, got "
                f"{sampling_rate}"
            )
        padded = [self._reflect_pad(np.asarray(x, np.float32)).T for x in raw_audio]
        lengths = np.array([x.shape[0] for x in padded])
        tmax = int(lengths.max())
        input_values = np.zeros((len(padded), padded[0].shape[1], tmax), np.float32)
        for i, x in enumerate(padded):
            input_values[i, :, : x.shape[0]] = x.T
        padding_mask = np.arange(tmax)[None] < lengths[:, None]
        return {"input_values": input_values, "padding_mask": padding_mask}

    def __call__(self, text=None, input_audio=None, separated_audio=None,
                 sampling_rate: Optional[int] = None, **kwargs):
        batch = {}
        if text is not None:
            ids, mask = self.tokenizer(
                text if isinstance(text, (list, tuple)) else [text], max_length=512
            )
            batch["input_ids"] = ids
            batch["attention_mask"] = mask
        if input_audio is not None:
            batch.update(self._process_audio(input_audio, sampling_rate))
        if separated_audio is not None:
            batch["separated_values"] = self._process_audio(
                separated_audio, sampling_rate
            )["input_values"]
        return batch


__all__ = ["SAMAudioProcessor", "SAMAudioJudgeProcessor", "Batch", "batch_audio",
           "mask_from_sizes", "load_video", "ANCHOR_VOCAB"]
