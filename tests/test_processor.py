import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.processor import (
    ANCHOR_VOCAB,
    Batch,
    SAMAudioProcessor,
    batch_audio,
    mask_from_sizes,
)


def make_processor(**kw):
    cfg = tiny_test_config()
    return SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=cfg.audio_codec.sample_rate,
        **kw,
    )


def test_batch_audio_pads_and_downmixes():
    a1 = np.ones((2, 100), np.float32)  # stereo -> mono mean
    a2 = 2 * np.ones((1, 60), np.float32)
    audios, sizes = batch_audio([a1, a2], 8000)
    assert audios.shape == (2, 1, 100)
    np.testing.assert_array_equal(sizes, [100, 60])
    assert audios[1, 0, 59] == 2.0
    assert audios[1, 0, 60] == 0.0  # right pad
    assert audios[0, 0, 0] == 1.0


def test_mask_from_sizes():
    m = mask_from_sizes(np.array([3, 5]))
    assert m.shape == (2, 5)
    assert m[0].tolist() == [True] * 3 + [False] * 2


def test_processor_feature_math():
    p = make_processor()
    # hop = 8 in tiny config
    assert p.wav_to_feature_idx(8) == 1
    assert p.wav_to_feature_idx(9) == 2
    assert p.feature_to_wav_idx(3) == 24


def test_anchor_processing():
    p = make_processor()
    sr = p.audio_sampling_rate  # 8000
    audios = [np.ones((1, 80), np.float32), np.ones((1, 40), np.float32)]
    # spans in seconds; hop=8 -> frame = ceil(sec*8000/8)
    anchors = [[("+", 0.0, 0.002)], [("-", 0.0, 0.001), ("+", 0.003, 0.005)]]
    batch = p(descriptions=["a", "b"], audios=audios, anchors=anchors)
    # item 0: 80 samples -> 10 frames; item 1 -> 5 frames, frames 5..9 padded
    assert batch.anchor_alignment.shape == (2, 10)
    assert batch.audio_pad_mask[1].tolist() == [True] * 5 + [False] * 5
    # pad frames point to slot 1 (<pad>)
    assert (batch.anchor_alignment[1, 5:] == 1).all()
    # item 0: "+" span [0, 0.002]s = wav [0,16] -> frames [0, 2) -> slot 2
    assert batch.anchor_alignment[0, 0] == 2
    assert batch.anchor_alignment[0, 1] == 2
    assert batch.anchor_alignment[0, 2] == 0
    # anchor_ids row 0: [<null>, <pad>, +] padded with <pad> to the longest row
    assert batch.anchor_ids[0].tolist() == [0, 3, 1, 3]
    # item 1: "-" then "+" -> [<null>, <pad>, -, +]
    assert batch.anchor_ids[1].tolist() == [0, 3, 2, 1]
    # "-" span [0,0.001] -> wav [0,8] -> frames [0,1) -> slot 2
    assert batch.anchor_alignment[1, 0] == 2
    # "+" span [0.003,0.005] -> wav [24,40] -> frames [3,5) -> slot 3
    assert batch.anchor_alignment[1, 3] == 3
    assert batch.anchor_alignment[1, 4] == 3


def test_no_anchors_default():
    p = make_processor()
    batch = p(descriptions=["x"], audios=[np.ones((1, 24), np.float32)])
    assert batch.anchor_ids.tolist() == [[ANCHOR_VOCAB["<null>"],
                                          ANCHOR_VOCAB["<pad>"]]]
    assert (batch.anchor_alignment == 0).all()
    assert batch.anchors is None


def test_bucketing_rounds_up_length():
    p = make_processor(bucket_seconds=0.01)  # 80 samples/bucket @8k, hop 8
    batch = p(descriptions=["x"], audios=[np.ones((1, 50), np.float32)])
    assert batch.audios.shape[-1] == 80
    assert batch.sizes[0] == 7  # ceil(50/8)
    assert batch.audio_pad_mask.shape == (1, 10)
    assert batch.audio_pad_mask[0].sum() == 7


def test_mask_videos_keeps_mask_zero_pixels():
    p = make_processor()
    video = np.full((2, 3, 4, 4), 7, np.uint8)
    mask = np.zeros((2, 3, 4, 4), np.uint8)
    mask[0, :, :2] = 1
    out = p.mask_videos([video], [mask])[0]
    # pixels where mask==0 are KEPT (reference processor.py:197-204)
    assert (out[0, :, :2] == 0).all()
    assert (out[0, :, 2:] == 7).all()
    assert (out[1] == 7).all()


def test_wav_file_roundtrip(tmp_path):
    from sam_audio_tpu.audio_io import read_wav, write_wav

    wav = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, wav, 8000)
    loaded, sr = read_wav(path)
    assert sr == 8000
    assert loaded.shape == (1, 8000)
    np.testing.assert_allclose(loaded[0], wav, atol=1e-4)


def test_pad_anchors_to_yields_one_width_with_or_without_anchors():
    """A pinned pad_anchors_to must produce the SAME anchor_ids width whether
    the batch carries anchors or not — two widths would mean two compiled
    programs despite the pin (the anchors branch rounds to a multiple of 4;
    the None branch now rounds identically)."""
    p = SAMAudioProcessor(audio_hop_length=8, audio_sampling_rate=8000)
    wav = np.zeros((1, 64), np.float32)
    with_anchors = p(descriptions=["a"], audios=[wav],
                     anchors=[[("+", 0.0, 0.004)]], pad_anchors_to=6)
    without = p(descriptions=["a"], audios=[wav], pad_anchors_to=6)
    assert with_anchors.anchor_ids.shape[1] == without.anchor_ids.shape[1] == 8
    # default (no pin) keeps the reference's minimal width-2 no-anchor shape
    assert p(descriptions=["a"], audios=[wav]).anchor_ids.shape[1] == 2
