"""ctypes bindings for the native runtime (wavio + resample + scheduler).

The shared library is built with `make -C sam_audio_tpu/runtime` (plain g++,
no extra deps); every entry point has a numpy fallback so the framework works
without the build step — the native path is a throughput optimization for
host-side preprocessing, mirroring the reference's reliance on torchcodec's
C++ layer (reference: sam_audio/processor.py:13).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libsamaudio_runtime.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            build_native(quiet=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wav_read_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.wav_read_info.restype = ctypes.c_int
        lib.wav_read_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong
        ]
        lib.wav_read_f32.restype = ctypes.c_longlong
        lib.wav_write_pcm16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
        ]
        lib.wav_write_pcm16.restype = ctypes.c_int
        lib.resample_out_size.argtypes = [ctypes.c_longlong, ctypes.c_int,
                                          ctypes.c_int]
        lib.resample_out_size.restype = ctypes.c_longlong
        lib.resample_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ]
        lib.resample_f32.restype = ctypes.c_longlong
        lib.bucket_for_length.argtypes = [ctypes.c_longlong] * 3
        lib.bucket_for_length.restype = ctypes.c_longlong
        lib.plan_batches.argtypes = [
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.plan_batches.restype = ctypes.c_longlong
        lib.padding_waste.argtypes = [
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
        ]
        lib.padding_waste.restype = ctypes.c_double
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def build_native(quiet: bool = False) -> bool:
    """Compile the shared library in-place. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            check=True,
            capture_output=quiet,
        )
        return True
    except Exception:
        return False


def native_available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# WAV I/O
# ---------------------------------------------------------------------------


def read_wav_native(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Returns ((channels, T) float32, sr) or None if unavailable/unparsable."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_longlong()
    bits = ctypes.c_int()
    isf = ctypes.c_int()
    if lib.wav_read_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                         ctypes.byref(frames), ctypes.byref(bits),
                         ctypes.byref(isf)) != 0:
        return None
    n = frames.value * ch.value
    out = np.empty(n, np.float32)
    got = lib.wav_read_f32(path.encode(),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           n)
    if got < 0 or got % max(ch.value, 1):
        # got % ch != 0 means the data chunk was truncated mid-frame; honor
        # the documented "None if unparsable" contract instead of letting
        # reshape raise on callers that only check for None
        return None
    data = out[:got].reshape(-1, ch.value).T.copy()
    return data, sr.value


def write_wav_native(path: str, waveform: np.ndarray, sample_rate: int) -> bool:
    lib = _load()
    if lib is None:
        return False
    wav = np.asarray(waveform, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    inter = np.ascontiguousarray(wav.T.reshape(-1))
    rc = lib.wav_write_pcm16(
        path.encode(), inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wav.shape[1], wav.shape[0], sample_rate,
    )
    return rc == 0


# ---------------------------------------------------------------------------
# Resampling
# ---------------------------------------------------------------------------


def resample_native(wav: np.ndarray, orig_freq: int,
                    new_freq: int) -> Optional[np.ndarray]:
    """(..., T) float32 -> resampled; None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    shape = wav.shape
    flat = np.ascontiguousarray(wav.reshape(-1, shape[-1]), np.float32)
    out_len = int(lib.resample_out_size(shape[-1], orig_freq, new_freq))
    out = np.empty((flat.shape[0], out_len), np.float32)
    for i in range(flat.shape[0]):
        got = lib.resample_f32(
            flat[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            flat.shape[-1], orig_freq, new_freq,
            out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
        )
        if got != out_len:
            return None
    return out.reshape(*shape[:-1], out_len)


# ---------------------------------------------------------------------------
# Bucketing scheduler
# ---------------------------------------------------------------------------


def plan_batches(lengths: List[int], hop: int, bucket_steps: int,
                 max_batch: int):
    """Returns (batches, buckets): batches is a list of index lists, buckets
    the padded length per batch. Native path with numpy fallback."""
    n = len(lengths)
    lib = _load()
    if lib is not None and n:
        arr = np.asarray(lengths, np.int64)
        order = np.empty(n, np.int64)
        sizes = np.empty(n, np.int64)
        buckets = np.empty(n, np.int64)
        nb = lib.plan_batches(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n, hop,
            bucket_steps, max_batch,
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        )
        out, pos = [], 0
        for b in range(nb):
            out.append(order[pos : pos + sizes[b]].tolist())
            pos += sizes[b]
        return out, buckets[:nb].tolist()
    # numpy fallback (same algorithm, incl. the native guard for unit<=0:
    # bucket_for_length returns lengths unchanged when hop*bucket_steps==0)
    unit = hop * bucket_steps
    if unit <= 0:
        bucketed = list(lengths)
    else:
        bucketed = [((l + unit - 1) // unit) * unit for l in lengths]
    idx = sorted(range(n), key=lambda i: (bucketed[i], i))
    batches, buckets_out = [], []
    i = 0
    while i < n:
        b = bucketed[idx[i]]
        group = []
        while i < n and bucketed[idx[i]] == b and len(group) < max_batch:
            group.append(idx[i])
            i += 1
        batches.append(group)
        buckets_out.append(b)
    return batches, buckets_out
