"""Native C++ runtime: build, WAV roundtrip, resampler parity with the
Python/JAX implementation, bucketing scheduler."""

import numpy as np
import pytest

from sam_audio_tpu.ops.resample import resample_np
from sam_audio_tpu.runtime import native


@pytest.fixture(scope="module")
def lib_available():
    ok = native.native_available()
    if not ok:
        pytest.skip("native runtime not buildable in this environment")
    return ok


def test_build_and_load(lib_available):
    assert native.native_available()


def test_wav_roundtrip_native(lib_available, tmp_path):
    wav = (0.5 * np.sin(np.linspace(0, 50, 4000))).astype(np.float32)
    path = str(tmp_path / "n.wav")
    assert native.write_wav_native(path, wav, 16000)
    loaded, sr = native.read_wav_native(path)
    assert sr == 16000
    assert loaded.shape == (1, 4000)
    np.testing.assert_allclose(loaded[0], wav, atol=1e-4)


def test_native_wav_reads_python_wav(lib_available, tmp_path):
    from sam_audio_tpu.audio_io import write_wav

    wav = np.stack([np.linspace(-0.9, 0.9, 100, dtype=np.float32),
                    np.linspace(0.9, -0.9, 100, dtype=np.float32)])
    path = str(tmp_path / "p.wav")
    write_wav(path, wav, 8000)
    loaded, sr = native.read_wav_native(path)
    assert sr == 8000
    assert loaded.shape == (2, 100)
    np.testing.assert_allclose(loaded, wav, atol=1e-3)


def test_resample_native_matches_python(lib_available):
    rng = np.random.RandomState(0)
    wav = rng.randn(3, 1600).astype(np.float32) * 0.3
    ours = native.resample_native(wav, 16000, 8000)
    ref = resample_np(wav, 16000, 8000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_resample_native_upsample(lib_available):
    rng = np.random.RandomState(1)
    wav = rng.randn(1, 441).astype(np.float32)
    ours = native.resample_native(wav, 44100, 48000)
    ref = resample_np(wav, 44100, 48000)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_plan_batches():
    lengths = [100, 1000, 120, 1100, 90, 5000]
    batches, buckets = native.plan_batches(lengths, hop=8, bucket_steps=16,
                                           max_batch=2)
    # all items covered exactly once
    flat = sorted(i for b in batches for i in b)
    assert flat == list(range(6))
    # same-bucket items grouped: 100/120/90 -> bucket 128
    assert buckets[0] == 128
    assert len(batches[0]) == 2  # max_batch respected
    for group, bucket in zip(batches, buckets):
        for i in group:
            assert lengths[i] <= bucket


def test_plan_batches_fallback_matches_native():
    lengths = [37, 250, 129, 4000, 64, 64, 64]
    a = native.plan_batches(lengths, 8, 4, 3)
    # force fallback
    lib = native._lib
    native._lib = None
    native._load_failed = True
    try:
        b = native.plan_batches(lengths, 8, 4, 3)
    finally:
        native._lib = lib
        native._load_failed = False
    assert a == b
