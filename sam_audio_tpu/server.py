"""Online serving: continuous batching + a dependency-free HTTP front end.

The offline `serving.SeparationPipeline` processes one fixed request list.
Production serving receives requests *continuously*, and TPU efficiency
demands full, stable-shaped batches (one compiled program per
(bucket, batch) shape). This module adds the online half of the serving
story the reference leaves entirely to the user (it only documents
single-batch `model.separate`, reference README.md:40-62):

  ContinuousBatcher — a thread-safe admission queue plus ONE device thread
    that coalesces waiting requests into length-bucketed batches (native
    `runtime.plan_batches` scheduler), waiting at most `max_wait_ms` for a
    batch to fill before dispatching a partial one. A single thread owns
    every dispatch, so first-call XLA compiles happen exactly once per
    shape on that thread (the compile discipline from streaming.py), and
    per-request host decode failures fail only that request's future.

  SeparationServer — an HTTP front end on the stdlib `http.server`
    (zero extra dependencies) exposing
      POST /v1/separate   JSON {"description": str, "audio": [floats],
                                "sample_rate": int, ...}
      GET  /healthz       liveness
      GET  /v1/stats      batching counters (requests, batches, occupancy)
    so the framework is deployable as-is.

Run one:  python -m sam_audio_tpu.server --snapshot <dir> --port 8080
"""

from __future__ import annotations

import base64
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from sam_audio_tpu.processor import SAMAudioProcessor
from sam_audio_tpu.runtime.native import plan_batches
from sam_audio_tpu.serving import SeparationRequest, SeparationResponse

logger = logging.getLogger(__name__)


class ServerOverloadedError(RuntimeError):
    """Admission queue is full — the client should retry later (HTTP 429)."""


class RequestTooLongError(ValueError):
    """Request exceeds the server's max duration policy (HTTP 413)."""


class ClientRequestError(ValueError):
    """A malformed request (bad JSON fields, undecodable audio payload) —
    raised ONLY from request parsing/decoding, never from the model pipeline.
    Errors surfaced from dispatch are deliberately NOT mapped to 400 by
    exception type: a ValueError raised inside model.separate (e.g. a server
    misconfiguration like predict_spans without a span predictor) is a
    server fault and must be a logged 500, not the client's problem."""


@dataclass
class BatcherStats:
    """Counters the device thread updates after every dispatch."""

    requests: int = 0
    failed_requests: int = 0
    rejected_overload: int = 0  # 429s at admission
    rejected_too_long: int = 0  # 413s — NOT counted in requests/failed
    # (over-length rejects bump ONLY rejected_too_long, whether caught at
    # admission or post-decode, so failure-rate dashboards don't shift with
    # how clients encode audio — inline array vs file path)
    streamed_requests: int = 0  # routed through streaming windows
    map_guard_clears: int = 0   # compile-cache clears observed mid-serving
    map_guard_rewarms: int = 0  # re-warms COMPLETED after a clear
    rewarm_failures: int = 0    # shapes that failed to re-warm (loop survives)
    batches: int = 0
    batched_requests: int = 0  # sum of dispatched batch sizes
    batch_size_hist: dict = field(default_factory=dict)
    latency_ms: List[float] = field(default_factory=list)  # rolling, <=1024

    def occupancy(self, max_batch: int) -> float:
        if not self.batches:
            return 0.0
        return self.batched_requests / (self.batches * max_batch)

    def snapshot(self, max_batch: int, queue_depth: int = 0) -> dict:
        lat = sorted(self.latency_ms)
        return {
            "requests": self.requests,
            "failed_requests": self.failed_requests,
            "rejected_overload": self.rejected_overload,
            "rejected_too_long": self.rejected_too_long,
            "streamed_requests": self.streamed_requests,
            "map_guard_clears": self.map_guard_clears,
            "map_guard_rewarms": self.map_guard_rewarms,
            "rewarm_failures": self.rewarm_failures,
            "queue_depth": queue_depth,
            "batches": self.batches,
            "mean_batch_size": (self.batched_requests / self.batches
                                if self.batches else 0.0),
            "occupancy": self.occupancy(max_batch),
            "batch_size_hist": dict(self.batch_size_hist),
            "p50_latency_ms": lat[len(lat) // 2] if lat else None,
        }


class _ShutdownSentinel:
    """Per-start() shutdown marker. Each device-thread generation only obeys
    ITS OWN sentinel: a sentinel left in the queue by a timed-out shutdown()
    of a previous generation is dropped instead of silently killing the next
    device loop (which would leave every later future unresolved)."""


class ContinuousBatcher:
    """Admission queue + single device thread with deadline-based batching.

    submit() is safe from any thread and returns a Future resolving to a
    `SeparationResponse`. The device thread takes the oldest waiting
    request, then waits up to `max_wait_ms` (or until `max_batch` requests
    are queued) before forming length-bucketed batches and dispatching
    them. Latency-sensitive deployments set `max_wait_ms=0` (dispatch
    whatever is waiting); throughput-oriented ones give the queue time to
    fill a whole batch.
    """

    def __init__(self, model, processor: Optional[SAMAudioProcessor] = None,
                 max_batch: int = 4, bucket_seconds: float = 2.0,
                 max_wait_ms: float = 20.0, reranking_candidates: int = 1,
                 predict_spans: bool = False,
                 preview_nfe: Optional[int] = None, visual_stride: int = 1,
                 autostart: bool = True, max_queue: int = 256,
                 max_seconds: Optional[float] = None,
                 long_policy: str = "reject",
                 max_stream_seconds: Optional[float] = 600.0,
                 streaming_window_s: float = 10.0,
                 pad_batch_sizes: bool = True,
                 text_pad_to: Optional[int] = 64):
        """Overload / over-length policy (production-honest serving):

        max_queue — admission bound; submit() past this depth raises
          ServerOverloadedError (HTTP 429) instead of letting requests pile
          up toward the timeout.
        max_seconds — requests longer than this hit `long_policy`:
          "reject" fails them with RequestTooLongError (HTTP 413);
          "stream" routes them through streaming.py windows on the device
          thread, so a long clip reuses the warmed fixed-window program
          instead of compiling an unbounded direct shape (XLA compiles are
          minutes on a relay-backed chip and would stall ALL traffic).
          The limit snaps UP to the bucket grid: a request inside the top
          warmed bucket runs the same compiled program at the same cost,
          and warmup()'s own bucket-rounded dispatches must pass the check.
        max_stream_seconds — hard cap for long_policy="stream" (HTTP 413
          past it). Streamed requests run serially on the single device
          thread; without a cap one multi-hour clip would head-of-line
          block every other request past its timeout.
        pad_batch_sizes — pad each dispatched group up to the next warmed
          batch size (1, 2, 4, ... max_batch) by repeating the last item,
          so intermediate group sizes never trigger a fresh compile once
          `warmup()` has run; padded rows are dropped before reply.
        text_pad_to — pin the tokenized-text width to multiples of this
          (sets `model.text_pad_multiple`; pad columns are masked — exact up
          to float reassociation in the wider reductions).
          Without it the jit shape depends on each batch's LONGEST
          description (reference longest-pad semantics), so the first
          prompt longer than the warmup's would pay a full XLA compile ON
          the device thread, stalling all traffic (observed as a ~170 s
          p50 cliff in mb_soak.py). Prompts over `text_pad_to` tokens
          round up to the next multiple — a rare, bounded compile. None
          leaves the model's tokenization untouched.
        """
        self.model = model
        if text_pad_to:
            model.text_pad_multiple = int(text_pad_to)
        self.processor = processor or SAMAudioProcessor(
            audio_hop_length=model.hop_length,
            audio_sampling_rate=model.sample_rate,
        )
        self.max_batch = int(max_batch)
        self.bucket_steps = max(
            1, int(bucket_seconds * model.sample_rate / model.hop_length))
        self.max_wait_ms = float(max_wait_ms)
        self.reranking_candidates = reranking_candidates
        self.predict_spans = predict_spans
        self.preview_nfe = preview_nfe
        self.visual_stride = visual_stride
        self.max_queue = int(max_queue)
        self.max_seconds = max_seconds
        if long_policy not in ("reject", "stream"):
            raise ValueError(f"long_policy must be reject|stream, "
                             f"got {long_policy!r}")
        self.long_policy = long_policy
        self.max_stream_seconds = max_stream_seconds
        self.streaming_window_s = float(streaming_window_s)
        self.pad_batch_sizes = bool(pad_batch_sizes)
        self.stats = BatcherStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()  # guards stats
        self._admit_lock = threading.Lock()  # makes the bound check atomic
        self._thread: Optional[threading.Thread] = None
        self._sentinel: Optional[_ShutdownSentinel] = None
        self._stopped = threading.Event()
        self._warmed: list = []
        from sam_audio_tpu.utils import map_guard

        self._guard_seen = map_guard.clear_count()
        if autostart:
            self.start()

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        if self._thread is not None:
            if self._thread.is_alive():
                raise RuntimeError(
                    "ContinuousBatcher.start(): previous device thread is "
                    "still running (a shutdown() join timed out — likely a "
                    "long XLA compile in flight). Starting a second device "
                    "thread would race it over the queue; retry shutdown() "
                    "first.")
            self._thread = None
        self._stopped.clear()
        self._sentinel = _ShutdownSentinel()
        self._thread = threading.Thread(
            target=self._device_loop, name="sam-audio-batcher", daemon=True)
        self._thread.start()

    def shutdown(self, timeout: Optional[float] = 30.0):
        """Stop the device thread after draining already-queued requests."""
        if self._thread is None:
            return
        if self._thread.is_alive():
            self._queue.put(self._sentinel)
            self._thread.join(timeout)
        if self._thread.is_alive():
            # Join timed out (e.g. a multi-minute relay compile still in
            # flight). Keep the handle so a premature start() can refuse to
            # spawn a second thread racing this one over the queue.
            logger.warning("shutdown: device thread still running after "
                           "%.0fs; leaving it to drain", timeout or 0)
            return
        self._thread = None
        self._stopped.set()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # -- admission ---------------------------------------------------------

    def queue_depth(self) -> int:
        return self._queue.qsize()

    def submit(self, request: SeparationRequest) -> "Future[SeparationResponse]":
        # Over-length rejection happens at admission when the duration is
        # already known (in-memory audio); file paths are checked after
        # decode on the device thread (_dispatch).
        if not isinstance(request.audio, str):
            n = int(np.asarray(request.audio).shape[-1])
            err = self._too_long_error(n)
            if err is not None:
                with self._lock:
                    self.stats.rejected_too_long += 1
                raise err
        fut: "Future[SeparationResponse]" = Future()
        # Check-then-put must be atomic: without the lock, M concurrent
        # submitters could all observe qsize()==max_queue-1 and push the
        # queue to max_queue-1+M, softening the 429 bound exactly under the
        # overload it exists for.
        with self._admit_lock:
            if self.max_queue and self._queue.qsize() >= self.max_queue:
                with self._lock:
                    self.stats.rejected_overload += 1
                raise ServerOverloadedError(
                    f"admission queue full ({self._queue.qsize()} >= "
                    f"{self.max_queue} waiting requests)")
            self._queue.put((request, fut, time.monotonic()))
        return fut

    def _ceil_to_bucket(self, seconds: float) -> int:
        """`seconds` in samples, rounded UP to the bucket grid (minimum one
        bucket). The over-length limit (`_direct_limit`) and `warmup()`'s
        dispatch sizes MUST share this exact rounding: warmup's own
        bucket-rounded dispatches have to pass the over-length check they
        warm (tests/test_server_hardening.py::test_warmup_passes_over_length
        _policy guards the invariant)."""
        unit = self.bucket_steps * self.model.hop_length
        return max(unit, -(-int(seconds * self.model.sample_rate)
                           // unit) * unit)

    @property
    def _direct_limit(self) -> Optional[int]:
        """`max_seconds` in samples, snapped UP to the bucket grid: a request
        inside the top warmed bucket runs the same compiled program at the
        same cost. Derived (not cached) so max_seconds stays
        runtime-tunable."""
        if self.max_seconds is None:
            return None
        return self._ceil_to_bucket(self.max_seconds)

    @property
    def _stream_limit(self) -> Optional[int]:
        if self.max_stream_seconds is None:
            return None
        return int(self.max_stream_seconds * self.model.sample_rate)

    def _too_long_error(self, n_samples: int) -> Optional[RequestTooLongError]:
        """The over-length policy for an `n_samples`-long request, or None if
        it is admissible. Direct dispatch is bounded by the bucket-aligned
        `max_seconds`; long_policy="stream" extends admission up to
        `max_stream_seconds`."""
        sr = self.model.sample_rate
        if self._direct_limit is None or n_samples <= self._direct_limit:
            return None
        if self.long_policy == "reject":
            return RequestTooLongError(
                f"request is {n_samples / sr:.1f}s; this server accepts at "
                f"most {self._direct_limit / sr:.1f}s (long_policy=reject)")
        if self._stream_limit is not None and n_samples > self._stream_limit:
            return RequestTooLongError(
                f"request is {n_samples / sr:.1f}s; this server streams "
                f"over-length requests only up to "
                f"{self.max_stream_seconds:.0f}s (max_stream_seconds)")
        return None

    def separate(self, request: SeparationRequest,
                 timeout: Optional[float] = None) -> SeparationResponse:
        """Blocking convenience wrapper around submit()."""
        return self.submit(request).result(timeout)

    # -- device thread -----------------------------------------------------

    def _decode(self, req: SeparationRequest) -> np.ndarray:
        from sam_audio_tpu.audio_io import load_audio
        from sam_audio_tpu.ops.resample import resample_np

        if isinstance(req.audio, str):
            wav, sr = load_audio(req.audio)
            if sr != self.model.sample_rate:
                wav = resample_np(wav, sr, self.model.sample_rate)
            return wav.astype(np.float32)
        wav = np.asarray(req.audio, np.float32)
        return wav if wav.ndim == 2 else wav[None]

    def _collect(self) -> Optional[list]:
        """Block for the first request, then give the queue `max_wait_ms`
        to fill. Collects up to 8×max_batch requests (not max_batch: the
        bucket planner may split mixed-length requests into several groups,
        and collecting only max_batch would leave same-bucket requests
        stranded in the queue as singletons). Returns None on shutdown."""
        while True:
            item = self._queue.get()
            if isinstance(item, _ShutdownSentinel):
                if item is self._sentinel:
                    return None
                continue  # stale sentinel from a previous generation
            break
        pending = [item]
        deadline = time.monotonic() + self.max_wait_ms / 1e3
        while len(pending) < 8 * self.max_batch:
            wait = deadline - time.monotonic()
            try:
                nxt = self._queue.get(timeout=max(wait, 0.0))
            except queue.Empty:
                break
            if isinstance(nxt, _ShutdownSentinel):
                if nxt is self._sentinel:
                    # Re-post so the loop exits after this dispatch drains.
                    self._queue.put(nxt)
                    break
                continue  # stale: drop it
            pending.append(nxt)
        return pending

    def _device_loop(self):
        while True:
            pending = self._collect()
            if pending is None:
                return
            self._dispatch(pending)
            try:
                self._maybe_rewarm()
            except Exception:  # noqa: BLE001 — the device loop must survive
                logger.exception("re-warm pass failed; continuing to serve")

    def _batch_grid(self) -> list:
        """Warmed batch sizes: 1, 2, 4, ... plus max_batch itself."""
        grid, p = [], 1
        while p < self.max_batch:
            grid.append(p)
            p *= 2
        grid.append(self.max_batch)
        return grid

    def _dispatch_streaming(self, req, fut, t0, wav: np.ndarray,
                            record_stats: bool = True):
        """Run one over-length request through streaming.py windows (device
        thread): the warmed fixed-window program handles any duration, so a
        10-minute clip never compiles a new direct shape."""
        import jax

        from sam_audio_tpu.streaming import separate_streaming

        try:
            # Fresh noise per request, like the direct path (separate() draws
            # a fresh seed when rng=None; separate_streaming defaults to a
            # FIXED PRNGKey(0), which would give every streamed request the
            # identical noise stream).
            rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
            res = separate_streaming(
                self.model, req.description, wav,
                window_s=self.streaming_window_s,
                rng=rng,
                anchors=req.anchors,
                reranking_candidates=self.reranking_candidates,
                preview_nfe=self.preview_nfe,
                masked_video=req.masked_video,
                visual_stride=self.visual_stride)
        except Exception as e:  # noqa: BLE001 — isolate request faults
            fut.set_exception(e)
            if record_stats:
                with self._lock:
                    self.stats.requests += 1
                    self.stats.failed_requests += 1
            return
        now = time.monotonic()
        fut.set_result(SeparationResponse(
            target=np.asarray(res.target), residual=np.asarray(res.residual),
            metadata={"streamed": True, "num_windows": res.num_windows}))
        if record_stats:
            with self._lock:
                s = self.stats
                s.requests += 1
                s.streamed_requests += 1
                s.latency_ms.append((now - t0) * 1e3)
                del s.latency_ms[:-1024]

    def _dispatch(self, pending: list, record_stats: bool = True):
        # Per-request host decode: a bad file fails ONLY that future — as a
        # client fault (decode is purely a function of the request payload).
        live, wavs = [], []
        for req, fut, t0 in pending:
            try:
                wavs.append(self._decode(req))
                live.append((req, fut, t0))
            except Exception as e:  # noqa: BLE001 — isolate request faults
                fut.set_exception(ClientRequestError(
                    f"audio decode failed: {type(e).__name__}: {e}"))
                if record_stats:
                    with self._lock:
                        self.stats.requests += 1
                        self.stats.failed_requests += 1
        # Over-length policy, post-decode (covers file-path requests whose
        # duration is unknown at admission).
        if self._direct_limit is not None and live:
            short = []
            for (req, fut, t0), wav in zip(live, wavs):
                n = int(wav.shape[-1])
                if n <= self._direct_limit:
                    short.append(((req, fut, t0), wav))
                    continue
                err = self._too_long_error(n)
                if err is None:  # long_policy=stream, within the cap
                    self._dispatch_streaming(req, fut, t0, wav,
                                             record_stats=record_stats)
                else:
                    fut.set_exception(err)
                    if record_stats:
                        # Same accounting as an admission-time 413: ONLY
                        # rejected_too_long — counting it in requests/
                        # failed_requests would make the failure rate depend
                        # on whether the client sent a path or an array.
                        with self._lock:
                            self.stats.rejected_too_long += 1
            live = [lw[0] for lw in short]
            wavs = [lw[1] for lw in short]
        if not live:
            return

        lengths = [w.shape[-1] for w in wavs]
        batches, buckets = plan_batches(
            lengths, hop=self.model.hop_length,
            bucket_steps=self.bucket_steps, max_batch=self.max_batch)
        # Split each planned group by modality: a group mixing visual and
        # non-visual requests would pass None frames to the processor's
        # video loader, and visual conditioning is per-batch anyway (mixing
        # would change the compiled program for the non-visual requests).
        split = []
        for group, bucket in zip(batches, buckets):
            vid = [i for i in group if live[i][0].masked_video is not None]
            plain = [i for i in group if live[i][0].masked_video is None]
            for sub in (plain, vid):
                if sub:
                    split.append((sub, bucket))
        for group, bucket in split:
            # Pad the dispatched batch up to the next warmed size by
            # repeating the last request's audio: intermediate group sizes
            # then reuse a compiled program instead of compiling their own
            # (padded rows are dropped before replying).
            n_true = len(group)
            pad_to = n_true
            if self.pad_batch_sizes:
                pad_to = next(g for g in self._batch_grid() if g >= n_true)
            idx = list(group) + [group[-1]] * (pad_to - n_true)
            reqs = [live[i][0] for i in idx]
            futs = [live[i][1] for i in group]
            t0s = [live[i][2] for i in group]
            try:
                batch = self.processor(
                    descriptions=[r.description for r in reqs],
                    audios=[wavs[i] for i in idx],
                    # `or []`: a batch mixing anchored and anchor-less
                    # requests must not pass None entries to the processor
                    # (process_anchors iterates each row's anchor list; an
                    # empty list yields the same <null> row as no anchors).
                    anchors=[r.anchors or [] for r in reqs]
                    if any(r.anchors for r in reqs) else None,
                    masked_videos=[r.masked_video for r in reqs]
                    if any(r.masked_video is not None for r in reqs)
                    else None,
                    pad_to_samples=bucket,
                )
                result = self.model.separate(
                    batch, reranking_candidates=self.reranking_candidates,
                    predict_spans=self.predict_spans,
                    preview_nfe=self.preview_nfe,
                    visual_stride=self.visual_stride)
            except Exception as e:  # noqa: BLE001 — fail the batch, not the loop
                for fut in futs:
                    fut.set_exception(e)
                if record_stats:
                    with self._lock:
                        self.stats.requests += len(futs)
                        self.stats.failed_requests += len(futs)
                continue
            now = time.monotonic()
            for j, fut in enumerate(futs):
                fut.set_result(SeparationResponse(
                    target=np.asarray(result.target[j]),
                    residual=np.asarray(result.residual[j]),
                    metadata={"bucket": bucket, "batch_size": n_true,
                              "dispatch_size": pad_to}))
            if not record_stats:
                continue
            with self._lock:
                s = self.stats
                s.requests += n_true
                s.batches += 1
                s.batched_requests += n_true
                s.batch_size_hist[n_true] = (
                    s.batch_size_hist.get(n_true, 0) + 1)
                s.latency_ms.extend(
                    (now - t0) * 1e3 for t0 in t0s)
                del s.latency_ms[:-1024]

    # -- warmup / compile-cache hygiene -------------------------------------

    def warmup(self, seconds: Sequence[float] = (10.0,),
               batch_sizes: Optional[Sequence[int]] = None,
               warm_streaming: Optional[bool] = None):
        """Compile every program the serving grid uses BEFORE the device
        thread starts, with exact batch sizes (queue-based warmup could
        coalesce into unintended sizes — ADVICE r4). Also records the warmed
        shape set so a mid-serving map_guard cache clear triggers an
        automatic re-warm on the device thread. Warm dispatches do not touch
        the traffic counters."""
        if self._thread is not None and self._thread.is_alive():
            raise RuntimeError(
                "warmup() must run before start(): warmup compiles must not "
                "race the device thread over the XLA caches")
        sizes = sorted(set(batch_sizes or self._batch_grid()))
        self._warmed = []
        for sec in seconds:
            n = self._ceil_to_bucket(sec)
            for b in sizes:
                self._warm_one(n, b)
                self._warmed.append((n, b))
        if warm_streaming is None:
            warm_streaming = (self.max_seconds is not None
                              and self.long_policy == "stream")
        if warm_streaming:
            self._warm_streaming()
            self._warmed.append(("streaming", 1))
        logger.info("warmup complete (%d shapes)", len(self._warmed))

    def _warm_one(self, n_samples: int, b: int):
        pending = [
            (SeparationRequest(description="warmup",
                               audio=np.zeros((1, n_samples), np.float32)),
             Future(), time.monotonic())
            for _ in range(b)
        ]
        # record_stats=False: warm dispatches must not pollute the traffic
        # counters. (Swapping in a throwaway stats object would also drop
        # CONCURRENT counter updates — e.g. 429s rejected during a
        # mid-serving re-warm — and expose zeroed /v1/stats meanwhile.)
        self._dispatch(pending, record_stats=False)
        for _, fut, _ in pending:
            fut.result(timeout=0)  # surface warmup failures loudly

    def _warm_streaming(self):
        from sam_audio_tpu.streaming import separate_streaming

        sr = self.model.sample_rate
        win = (int(self.streaming_window_s * sr)
               // self.model.hop_length * self.model.hop_length)
        # >1 window forces the windowed path, compiling the (1, win) program
        separate_streaming(self.model, "warmup",
                           np.zeros(int(win * 2.5), np.float32),
                           window_s=self.streaming_window_s,
                           reranking_candidates=self.reranking_candidates,
                           preview_nfe=self.preview_nfe)

    def _maybe_rewarm(self):
        """map_guard (utils/map_guard.py) clears ALL compiled programs when
        the process nears vm.max_map_count — in a serving process that turns
        the next request per shape into a fresh XLA compile (multi-minute on
        a relay-backed chip). Detect the clear on the device thread and
        re-warm the recorded grid immediately, so the stall is paid once,
        proactively, instead of per-request."""
        from sam_audio_tpu.utils import map_guard

        n = map_guard.clear_count()
        if n == self._guard_seen:
            return
        self._guard_seen = n
        with self._lock:
            self.stats.map_guard_clears += 1
        warmed = getattr(self, "_warmed", None)
        if not warmed:
            return
        logger.warning("map_guard cleared compiled programs mid-serving; "
                       "re-warming %d shapes", len(warmed))
        t0 = time.monotonic()
        failures = 0
        for item in warmed:
            # Per-shape isolation: a re-warm failure (e.g. the operator
            # lowered max_seconds at runtime so a recorded shape now trips
            # the over-length policy, or a transient backend error) must
            # degrade to "that shape compiles on first use" — NOT escape
            # _device_loop and kill the single device thread, which would
            # hang every queued and future request forever.
            try:
                if item[0] == "streaming":
                    self._warm_streaming()
                else:
                    self._warm_one(*item)
            except Exception:  # noqa: BLE001 — survive, serve, log
                failures += 1
                logger.exception("re-warm failed for shape %r "
                                 "(will compile on first use)", item)
        with self._lock:
            self.stats.rewarm_failures += failures
            # Incremented AFTER the re-warm work: pollers (mb_map_guard.py)
            # key on this to know post-clear serving is actually warm again.
            self.stats.map_guard_rewarms += 1
        logger.warning("re-warm complete in %.1fs (%d/%d shapes)",
                       time.monotonic() - t0, len(warmed) - failures,
                       len(warmed))

    def stats_snapshot(self) -> dict:
        with self._lock:
            return self.stats.snapshot(self.max_batch, self._queue.qsize())


# ---------------------------------------------------------------------------
# HTTP front end (stdlib only)
# ---------------------------------------------------------------------------


def _array_to_wav_b64(x: np.ndarray, sr: int) -> str:
    """Encode a mono float waveform as base64 16-bit WAV (≈9× smaller on
    the wire than a JSON float list; measured 2.9 s → ~0.5 s per 10 s clip
    round-trip on localhost)."""
    import io
    import wave

    pcm = (np.clip(np.asarray(x, np.float32), -1.0, 1.0)
           * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return base64.b64encode(buf.getvalue()).decode()


def _wav_b64_to_array(b64: str) -> tuple:
    import io
    import wave

    raw = base64.b64decode(b64)
    with wave.open(io.BytesIO(raw), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        data = w.readframes(n)
    if width == 2:
        x = np.frombuffer(data, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(data, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch).T, sr


def _status_for(exc: BaseException) -> int:
    """Error taxonomy: client faults are 4xx, server faults 5xx.

    - 429 overload (bounded admission queue full)
    - 413 over-length (long_policy=reject, or past max_stream_seconds)
    - 504 request timed out in the queue/device pipeline
    - 400 malformed request (ClientRequestError from parsing only)
    - 500 anything else (a server-side fault is NOT the client's error)
    """
    import concurrent.futures

    if isinstance(exc, ServerOverloadedError):
        return 429
    if isinstance(exc, RequestTooLongError):
        return 413
    if isinstance(exc, (concurrent.futures.TimeoutError, TimeoutError)):
        return 504
    if isinstance(exc, (ClientRequestError, json.JSONDecodeError)):
        return 400
    return 500


class SeparationServer:
    """HTTP wrapper over a ContinuousBatcher. stdlib-only by design."""

    def __init__(self, batcher: ContinuousBatcher, host: str = "127.0.0.1",
                 port: int = 8080, request_timeout: float = 600.0):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self.batcher = batcher
        srv = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt, *args):  # quiet by default
                logger.debug("http: " + fmt, *args)

            def _reply(self, code: int, payload: dict, headers=()):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                for k, v in headers:
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 — http.server API
                if self.path == "/healthz":
                    self._reply(200, {"ok": True})
                elif self.path == "/v1/stats":
                    self._reply(200, srv.batcher.stats_snapshot())
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802 — http.server API
                if self.path != "/v1/separate":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n))
                    resp = srv.handle(req)
                except Exception as e:  # noqa: BLE001 — taxonomy below
                    code = _status_for(e)
                    payload = {"error": f"{type(e).__name__}: {e}"}
                    headers = ()
                    if code == 429:
                        payload["queue_depth"] = srv.batcher.queue_depth()
                        headers = (("Retry-After", "1"),)
                    if code >= 500:
                        logger.exception("server fault handling %s",
                                         self.path)
                    self._reply(code, payload, headers)
                    return
                self._reply(200, resp)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.request_timeout = request_timeout
        self._serve_thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def handle(self, req: dict) -> dict:
        """Process one /v1/separate JSON body (also callable in-process)."""
        try:
            desc = req["description"]
            if "audio_wav_b64" in req:
                wav, sr = _wav_b64_to_array(req["audio_wav_b64"])
            else:
                wav = np.asarray(req["audio"], np.float32)
                if wav.ndim == 1:
                    wav = wav[None]
                sr = int(req.get("sample_rate",
                                 self.batcher.model.sample_rate))
            if sr != self.batcher.model.sample_rate:
                from sam_audio_tpu.ops.resample import resample_np

                wav = resample_np(wav, sr, self.batcher.model.sample_rate)
            anchors = None
            if req.get("anchors"):
                anchors = [tuple(a) for a in req["anchors"]]
        except (KeyError, ValueError, TypeError,
                base64.binascii.Error) as e:
            # parsing faults only — see ClientRequestError
            raise ClientRequestError(f"{type(e).__name__}: {e}") from e
        out = self.batcher.separate(
            SeparationRequest(description=desc, audio=wav, anchors=anchors),
            timeout=self.request_timeout)
        sr_out = self.batcher.model.sample_rate
        if req.get("response_format", "json") == "wav_b64":
            return {
                "target_wav_b64": _array_to_wav_b64(out.target, sr_out),
                "residual_wav_b64": _array_to_wav_b64(out.residual, sr_out),
                "sample_rate": sr_out,
                "metadata": out.metadata,
            }
        return {
            "target": np.asarray(out.target, np.float64).tolist(),
            "residual": np.asarray(out.residual, np.float64).tolist(),
            "sample_rate": sr_out,
            "metadata": out.metadata,
        }

    def start(self):
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, name="sam-audio-http",
            daemon=True)
        self._serve_thread.start()

    def serve_forever(self):
        self.httpd.serve_forever()

    def shutdown(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(10)
            self._serve_thread = None


def main(argv: Optional[Sequence[str]] = None):
    import argparse

    ap = argparse.ArgumentParser(description="sam_audio_tpu online server")
    ap.add_argument("--snapshot", required=True,
                    help="local snapshot dir (config.json + params)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-batch", type=int, default=4)
    ap.add_argument("--bucket-seconds", type=float, default=2.0)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--candidates", type=int, default=1)
    ap.add_argument("--warmup-seconds", type=float, nargs="*", default=[10.0],
                    help="durations to pre-compile before accepting traffic")
    ap.add_argument("--max-queue", type=int, default=256,
                    help="admission bound; beyond it requests get HTTP 429")
    ap.add_argument("--max-seconds", type=float, default=None,
                    help="longest request accepted directly; defaults to the "
                         "longest --warmup-seconds (no un-warmed compiles)")
    ap.add_argument("--long-policy", choices=("reject", "stream"),
                    default="stream",
                    help="over-length requests: 413, or streaming windows")
    ap.add_argument("--max-stream-seconds", type=float, default=600.0,
                    help="hard cap for long_policy=stream (413 past it); "
                         "streamed requests run serially on the device "
                         "thread, so an uncapped clip would head-of-line "
                         "block all other traffic")
    ap.add_argument("--text-pad-to", type=int, default=64,
                    help="pin tokenized-text width to multiples of this so "
                         "every prompt shares the warmed program (0 = off)")
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args(argv)

    from sam_audio_tpu.models.sam_audio import SAMAudio

    model = SAMAudio.from_pretrained(args.snapshot)
    if args.int8:
        model = model.quantize()
    # Default max-length policy: anything past the warmed grid would compile
    # a fresh program ON the device thread (multi-minute on a relay-backed
    # chip, stalling all traffic) — so bound direct requests at the longest
    # warmed duration and stream (or 413) the rest.
    max_seconds = args.max_seconds
    if max_seconds is None and args.warmup_seconds:
        max_seconds = max(args.warmup_seconds)
    batcher = ContinuousBatcher(
        model, max_batch=args.max_batch, bucket_seconds=args.bucket_seconds,
        max_wait_ms=args.max_wait_ms,
        reranking_candidates=args.candidates,
        max_queue=args.max_queue, max_seconds=max_seconds,
        long_policy=args.long_policy,
        max_stream_seconds=args.max_stream_seconds,
        streaming_window_s=(max(args.warmup_seconds)
                            if args.warmup_seconds else 10.0),
        text_pad_to=args.text_pad_to or None,
        autostart=False)
    if args.warmup_seconds:
        # Exact-size warmup of the full (bucket, batch-grid) set, plus the
        # streaming window program when long_policy=stream — the first real
        # request never pays an XLA compile (ADVICE r4: queue-based warmup
        # could coalesce into unintended batch sizes).
        batcher.warmup(seconds=args.warmup_seconds)
    batcher.start()
    server = SeparationServer(batcher, host=args.host, port=args.port)
    print(json.dumps({"serving": f"http://{args.host}:{server.port}",
                      "max_batch": args.max_batch}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.shutdown()


if __name__ == "__main__":
    main()
