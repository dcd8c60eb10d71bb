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


def _extensible_float32_wav(path, wav, sr):
    """Hand-build a WAVE_FORMAT_EXTENSIBLE float32 WAV (what ffmpeg writes
    for >2ch and sox/DAWs write for float) — stdlib `wave` rejects it."""
    import struct

    data = np.asarray(wav, np.float32).T.reshape(-1).tobytes()
    ch = 1 if np.asarray(wav).ndim == 1 else np.asarray(wav).shape[0]
    # fmt chunk: EXTENSIBLE (0xFFFE), cbSize=22, SubFormat GUID for
    # IEEE_FLOAT (0x0003 + fixed suffix)
    guid = struct.pack("<H", 3) + bytes.fromhex(
        "000000001000800000aa00389b71")
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, ch, sr, sr * ch * 4, ch * 4, 32,
                      22, 32, 0) + guid
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE")
        f.write(chunks)


def test_native_reads_extensible_float32(lib_available, tmp_path):
    """fmt tag 0xFFFE must resolve through the SubFormat GUID: decoding the
    float bit patterns as int32 PCM used to return near-zero garbage."""
    wav = (0.5 * np.sin(np.linspace(0, 40, 500))).astype(np.float32)
    path = str(tmp_path / "ext.wav")
    _extensible_float32_wav(path, wav, 16000)
    loaded, sr = native.read_wav_native(path)
    assert sr == 16000
    np.testing.assert_allclose(loaded[0], wav, atol=1e-6)
    # and load_audio serves it without ffmpeg via the native fallback
    from sam_audio_tpu.audio_io import load_audio

    loaded2, sr2 = load_audio(path)
    np.testing.assert_allclose(loaded2[0], wav, atol=1e-6)


def test_native_returns_none_for_truncated_wav(lib_available, tmp_path):
    """A stereo WAV truncated mid-frame must honor the 'None if unparsable'
    contract instead of raising inside reshape."""
    from sam_audio_tpu.audio_io import write_wav

    wav = np.zeros((2, 100), np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, wav, 8000)
    with open(path, "rb") as f:
        blob = f.read()
    with open(path, "wb") as f:
        f.write(blob[:-2])  # drop one int16 sample -> odd sample count
    assert native.read_wav_native(path) is None


def test_ffmpeg_decode_preserves_stereo_layout(tmp_path):
    """_ffmpeg_decode must NOT reshape interleaved multichannel output as
    mono (half-speed L,R,L,R garbage): channels are probed and the layout
    matches the reshape."""
    import shutil as _sh

    if _sh.which("ffmpeg") is None or _sh.which("ffprobe") is None:
        pytest.skip("ffmpeg not available")
    from sam_audio_tpu.audio_io import _ffmpeg_decode, write_wav

    left = np.full(8000, 0.25, np.float32)
    right = np.linspace(-0.5, 0.5, 8000, dtype=np.float32)
    path = str(tmp_path / "st.wav")
    write_wav(path, np.stack([left, right]), 8000)
    out, sr = _ffmpeg_decode(path)
    assert sr == 8000
    assert out.shape[0] == 2
    # channel identity preserved: L ~constant, R ~ramp
    assert np.std(out[0]) < 0.01
    assert np.std(out[1]) > 0.2


def test_plan_batches_fallback_guards_zero_unit():
    """hop*bucket_steps == 0: the native path returns lengths unchanged; the
    numpy fallback must not divide by zero."""
    lengths = [37, 250]
    lib = native._lib
    native._lib = None
    native._load_failed = True
    try:
        batches, buckets = native.plan_batches(lengths, hop=0,
                                               bucket_steps=4, max_batch=2)
    finally:
        native._lib = lib
        native._load_failed = False
    assert sorted(i for b in batches for i in b) == [0, 1]
    assert set(buckets) == {37, 250}


def test_make_mesh_rejects_impossible_tp():
    import jax

    from sam_audio_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    with pytest.raises(ValueError, match="impossible"):
        make_mesh(tp=n * 2)
