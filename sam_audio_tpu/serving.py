"""Batched serving pipeline: bucketed batching + async host prefetch.

The reference processes one user batch at a time (model.separate). Production
TPU serving needs stable compiled shapes and full batches; this pipeline:

  1. decodes/resamples requests' audio on a host thread pool (overlapping the
     chip's compute, SURVEY.md section 5 'host/device pipeline'),
  2. groups requests into (bucket_length, batch) groups via the native C++
     scheduler (runtime/scheduler.cc) so XLA sees few distinct shapes,
  3. runs `separate` per group and returns results in request order.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Union

import numpy as np

from sam_audio_tpu.processor import Anchor, SAMAudioProcessor
from sam_audio_tpu.runtime.native import plan_batches
from sam_audio_tpu.utils.profiling import StageTimer


@dataclass
class SeparationRequest:
    description: str
    audio: Union[str, np.ndarray]
    anchors: Optional[List[Anchor]] = None
    masked_video: Optional[Any] = None


@dataclass
class SeparationResponse:
    target: np.ndarray
    residual: np.ndarray
    metadata: dict = field(default_factory=dict)


class SeparationPipeline:
    def __init__(self, model, processor: Optional[SAMAudioProcessor] = None,
                 max_batch: int = 4, bucket_seconds: float = 2.0,
                 reranking_candidates: int = 1, predict_spans: bool = False,
                 num_io_threads: int = 4, preview_nfe: Optional[int] = None,
                 visual_stride: int = 1, pad_batch_sizes: bool = True,
                 text_pad_to: Optional[int] = 64):
        self.model = model
        # Pin tokenized-text width to a multiple (pad columns are masked;
        # exact up to float reassociation) so the jit shape does not track
        # each group's longest description — otherwise warmup() can never
        # cover real prompts (see ContinuousBatcher.text_pad_to/mb_soak.py).
        if text_pad_to:
            model.text_pad_multiple = int(text_pad_to)
        self.processor = processor or SAMAudioProcessor(
            audio_hop_length=model.hop_length,
            audio_sampling_rate=model.sample_rate,
        )
        self.max_batch = max_batch
        self.bucket_steps = max(
            1, int(bucket_seconds * model.sample_rate / model.hop_length)
        )
        self.reranking_candidates = reranking_candidates
        self.predict_spans = predict_spans
        self.preview_nfe = preview_nfe  # opt-in fast rerank (separate())
        self.visual_stride = visual_stride  # opt-in strided PE encode
        # pad dispatched groups up to the warmed pow2 grid (1, 2, 4, ...,
        # max_batch) by repeating the last row, so intermediate group sizes
        # reuse a warmed compiled program instead of compiling their own
        self.pad_batch_sizes = bool(pad_batch_sizes)
        self.num_io_threads = num_io_threads
        self.timer = StageTimer()

    def _batch_grid(self) -> List[int]:
        grid, p = [], 1
        while p < self.max_batch:
            grid.append(p)
            p *= 2
        grid.append(self.max_batch)
        return grid

    def warmup(self, seconds: Sequence[float],
               batch_sizes: Optional[Sequence[int]] = None):
        """Pre-compile the jitted separation programs for every
        (bucket_samples, batch) shape that audio of the given durations can
        dispatch, so the first production request never pays the XLA compile
        (minutes for the 1B pipeline on a fresh process). Runs one synthetic
        silent batch per shape through the normal `run` path — exactly the
        programs real traffic hits.

        `seconds` are request durations (mapped to their length buckets);
        `batch_sizes` defaults to the pow2 dispatch grid (1, 2, 4, ...,
        max_batch) — with `pad_batch_sizes` (default) every dispatched group
        is padded to one of these sizes, so warming the grid covers ALL
        group sizes. Only the text-prompting shapes are warmed: anchor
        prompts widen `anchor_ids` and visual prompts add the vision tower,
        each their own compile on first use.
        Returns the list of warmed (bucket_samples, batch_size) shapes."""
        unit = self.model.hop_length * self.bucket_steps
        sizes = sorted({min(max(1, int(b)), self.max_batch)
                        for b in (batch_sizes or self._batch_grid())})
        buckets = sorted({
            max(unit, -(-int(s * self.model.sample_rate) // unit) * unit)
            for s in seconds
        })
        warmed = []
        for bucket in buckets:
            for b in sizes:
                reqs = [
                    SeparationRequest(
                        description="warmup",
                        audio=np.zeros((1, bucket), np.float32),
                    )
                    for _ in range(b)
                ]
                self.run(reqs)
                warmed.append((bucket, b))
        return warmed

    def _load_one(self, req: SeparationRequest) -> np.ndarray:
        from sam_audio_tpu.audio_io import load_audio
        from sam_audio_tpu.ops.resample import resample_np

        if isinstance(req.audio, str):
            wav, sr = load_audio(req.audio)
            if sr != self.model.sample_rate:
                wav = resample_np(wav, sr, self.model.sample_rate)
            return wav.astype(np.float32)
        wav = np.asarray(req.audio, np.float32)
        return wav if wav.ndim == 2 else wav[None]

    def run(self, requests: Sequence[SeparationRequest]
            ) -> List[SeparationResponse]:
        if not requests:
            return []
        # 1. async host decode
        with self.timer.stage("host_decode"):
            with ThreadPoolExecutor(self.num_io_threads) as pool:
                wavs = list(pool.map(self._load_one, requests))

        # 2. bucketed batch plan (native scheduler), then split each planned
        # group by modality: a group mixing visual and non-visual requests
        # would (a) pass None frames to the processor's video loader and
        # (b) change the compiled program shape for everyone — visual
        # conditioning is per-batch, so video and non-video requests must
        # dispatch separately.
        lengths = [w.shape[-1] for w in wavs]
        batches, buckets = plan_batches(
            lengths, hop=self.model.hop_length,
            bucket_steps=self.bucket_steps, max_batch=self.max_batch,
        )
        work = []
        for group, bucket in zip(batches, buckets):
            vid = [i for i in group if requests[i].masked_video is not None]
            plain = [i for i in group if requests[i].masked_video is None]
            for sub in (plain, vid):
                if sub:
                    work.append((sub, bucket))

        # 3. run groups through a double-buffered pipeline: one worker thread
        # keeps the NEXT group's preprocess + device solve in flight while
        # this thread copies out the current group's responses (same pattern
        # as streaming.separate_streaming). Group 0 runs on THIS thread:
        # first-call jit compiles stay on the main thread (the compile
        # discipline from streaming.py — fewer threads racing the compile
        # caches, and warmup() routes through here).
        responses: List[Optional[SeparationResponse]] = [None] * len(requests)

        def run_group(group, bucket):
            n_true = len(group)
            idx = list(group)
            if self.pad_batch_sizes:
                pad_to = next(g for g in self._batch_grid() if g >= n_true)
                idx = idx + [group[-1]] * (pad_to - n_true)
            group_reqs = [requests[i] for i in idx]
            with self.timer.stage("preprocess"):
                batch = self.processor(
                    descriptions=[r.description for r in group_reqs],
                    audios=[wavs[i] for i in idx],
                    # `or []`: a group mixing anchored and anchor-less
                    # requests must not pass None rows to process_anchors
                    anchors=[r.anchors or [] for r in group_reqs]
                    if any(r.anchors for r in group_reqs) else None,
                    masked_videos=[r.masked_video for r in group_reqs]
                    if any(r.masked_video is not None for r in group_reqs)
                    else None,
                    pad_to_samples=bucket,
                )
            with self.timer.stage("separate"):
                result = self.model.separate(
                    batch,
                    reranking_candidates=self.reranking_candidates,
                    predict_spans=self.predict_spans,
                    preview_nfe=self.preview_nfe,
                    visual_stride=self.visual_stride,
                )
            return result, len(idx)

        first_result = run_group(*work[0])  # main-thread first compile
        with ThreadPoolExecutor(max_workers=1) as gpool:
            fut = None
            for gi, (group, bucket) in enumerate(work):
                result, dispatch_size = (first_result if gi == 0
                                         else fut.result())
                fut = (gpool.submit(run_group, *work[gi + 1])
                       if gi + 1 < len(work) else None)
                for j, idx in enumerate(group):
                    responses[idx] = SeparationResponse(
                        target=np.asarray(result.target[j]),
                        residual=np.asarray(result.residual[j]),
                        metadata={"bucket": bucket,
                                  "batch_size": len(group),
                                  "dispatch_size": dispatch_size},
                    )
        return responses  # type: ignore[return-value]
