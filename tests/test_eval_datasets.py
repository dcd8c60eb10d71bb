"""Hermetic unit tests for the eval dataset internals (no network): media
path resolution patterns, mask interpolation, batch iterator prefetch."""

import os

import numpy as np

from sam_audio_tpu.eval.datasets import SAMAudioBench
from sam_audio_tpu.eval.main import _shard_indices, iter_batches


class _PathOnlyBench(SAMAudioBench):
    """Bypass __init__ (which requires the HF dataset) to test _get_path."""

    def __init__(self, cache_path):
        self.cache_path = cache_path


def test_get_path_pattern_resolution(tmp_path):
    base = tmp_path / "src"
    base.mkdir()
    ds = _PathOnlyBench(str(tmp_path))

    # pattern 1: plain video id (select_frames=True)
    p1 = base / "vid1.mp4"
    p1.touch()
    path, select = ds._get_path("vid1", "src", 1.5, 2.5)
    assert path == str(p1) and select is True

    # pattern 2: millisecond offsets
    p2 = base / "vid2_1500_2500.mp4"
    p2.touch()
    path, select = ds._get_path("vid2", "src", 1.5, 2.5)
    assert path == str(p2) and select is False

    # pattern 3: second offsets
    p3 = base / "vid3_1_2.mp4"
    p3.touch()
    path, select = ds._get_path("vid3", "src", 1.5, 2.5)
    assert path == str(p3) and select is False

    # pattern 4: zero-padded ms
    p4 = base / "vid4.00001500_00002500.mp4"
    p4.touch()
    path, select = ds._get_path("vid4", "src", 1.5, 2.5)
    assert path == str(p4) and select is False


def test_masked_video_interpolation(tmp_path):
    """Masklet temporal + spatial interpolation (reference
    sam_audio_bench.py:84-112) without any video decode."""
    import io

    ds = _PathOnlyBench(str(tmp_path))
    # 3 mask frames, video has 6 frames of different spatial size
    masklet = np.zeros((3, 4, 4), np.uint8)
    masklet[1] = 1
    buf = io.BytesIO()
    np.savez(buf, video_masklet=masklet)
    item = {"mask_bytes": buf.getvalue(), "start_offset": 0.0,
            "end_offset": 1.0}

    frames = np.full((6, 3, 8, 8), 9, np.uint8)
    pts = np.arange(6) / 6.0

    import sam_audio_tpu.eval.datasets as D

    orig = D.decode_video_frames if hasattr(D, "decode_video_frames") else None

    def fake_decode(path):
        return frames, pts

    import sam_audio_tpu.video_io as V

    real = V.decode_video_frames
    V.decode_video_frames = fake_decode
    try:
        out = ds._get_masked_video(item, "fake.mp4", select_frames=False)
    finally:
        V.decode_video_frames = real
    assert out.shape == (6, 3, 8, 8)
    # mask frame 1 (ones) maps to video frames ~2-3; frame 0/5 masked to zero
    assert (out[0] == 0).all()
    assert out.max() == 9


def test_shard_indices():
    assert _shard_indices(10, 0, 4) == [0, 4, 8]
    assert _shard_indices(10, 3, 4) == [3, 7]
    all_idx = sorted(i for r in range(4) for i in _shard_indices(10, r, 4))
    assert all_idx == list(range(10))


class _CountingDataset:
    def __init__(self, n):
        self.n = n
        self.loads = []

    @property
    def visual(self):
        return False

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.loads.append(i)
        return i

    def collate(self, items):
        return list(items)


def test_iter_batches_prefetch_order_and_coverage():
    ds = _CountingDataset(10)
    batches = list(iter_batches(ds, batch_size=3, rank=0, world=1, prefetch=2))
    assert batches == [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9]]
    ds2 = _CountingDataset(10)
    serial = list(iter_batches(ds2, batch_size=3, rank=0, world=1, prefetch=0))
    assert serial == batches


def test_iter_batches_sharded():
    ds = _CountingDataset(7)
    b0 = list(iter_batches(ds, 2, rank=0, world=2))
    b1 = list(iter_batches(ds, 2, rank=1, world=2))
    got = sorted(x for b in b0 + b1 for x in b)
    assert got == list(range(7))


def test_mask_spatial_resize_matches_torch_interpolate():
    """The masklet's nearest spatial resize must match the reference's
    F.interpolate(mask, size) exactly (sam_audio_bench.py:108-109)."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from sam_audio_tpu.eval.datasets import _nearest_grid as grid

    rng = np.random.RandomState(0)
    # incl. (32, 82): a pair where exact-integer floor(i*in//out) disagrees
    # with torch's float32-scale floor
    sizes = [(5, 7, 12, 13), (3, 3, 8, 8), (10, 4, 7, 9), (32, 32, 82, 82)]
    for (h0, w0, h, w) in sizes:
        mask = (rng.rand(2, 1, h0, w0) > 0.5).astype(np.float32)
        ours = mask[:, :, grid(h, h0)][:, :, :, grid(w, w0)]
        want = F.interpolate(torch.from_numpy(mask), size=(h, w)).numpy()
        np.testing.assert_array_equal(ours, want)
    # exhaustive 1-D sweep against torch
    for h0 in range(1, 40):
        for h in range(1, 60):
            m = torch.arange(h0, dtype=torch.float32).reshape(1, 1, h0, 1)
            want = F.interpolate(m, size=(h, 1)).numpy().reshape(-1)
            np.testing.assert_array_equal(
                np.arange(h0, dtype=np.float32)[grid(h, h0)], want,
                err_msg=f"{h0}->{h}")
