"""Span-predictor training (train/span.py).

The reference always loads the pretrained "pe-a-frame-large" span predictor
(reference: sam_audio/model/model.py:96-102) and ships no trainer for it;
this subsystem trains the TPU-native SpanPredictor from the same
(mixture, target, text) records as flow-matching, with frame labels derived
from target-stem activity.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio, sam_audio_init
from sam_audio_tpu.models.span_predictor import SpanPredictor, SpanPredictorConfig
from sam_audio_tpu.train.data import TrainExample
from sam_audio_tpu.train.span import (
    SpanDataPipeline,
    SpanTrainer,
    frame_activity_labels,
    save_span_predictor,
    span_bce_loss,
    synthetic_span_batch,
)


def test_frame_activity_labels_tone_window():
    hop, t_frames = 8, 12
    wav = np.zeros((2, 1, hop * t_frames), np.float32)
    wav[0, 0, 3 * hop:7 * hop] = 0.5  # active frames 3..6
    # item 1 all silence -> absolute floor keeps every label 0
    labels = np.asarray(frame_activity_labels(wav, hop, t_frames))
    expect = np.zeros((2, t_frames), np.float32)
    expect[0, 3:7] = 1.0
    np.testing.assert_array_equal(labels, expect)


def test_frame_activity_labels_peak_relative_threshold():
    hop, t_frames = 8, 4
    wav = np.zeros((1, 1, hop * t_frames), np.float32)
    wav[0, 0, :hop] = 1.0       # peak frame
    wav[0, 0, hop:2 * hop] = 0.1   # -20 dB: active at -40 dB threshold
    wav[0, 0, 2 * hop:3 * hop] = 0.001  # -60 dB: below threshold
    labels = np.asarray(frame_activity_labels(wav, hop, t_frames))
    np.testing.assert_array_equal(labels[0], [1.0, 1.0, 0.0, 0.0])


def test_trainer_learns_synthetic_rule():
    cfg = tiny_test_config()
    sp_cfg = SpanPredictorConfig(audio_dim=8, text_dim=cfg.text_encoder.dim,
                                 hidden=32, n_layers=2, n_heads=2)
    trainer = SpanTrainer(sp_cfg, rng=jax.random.PRNGKey(0),
                          learning_rate=3e-3)
    batch = synthetic_span_batch(cfg, sp_cfg, jax.random.PRNGKey(1),
                                 batch_size=4, t_frames=16)
    first = float(span_bce_loss(trainer.state.params, sp_cfg, batch))
    last = None
    for _ in range(60):
        last = trainer.step(batch)
    assert float(last["loss"]) < 0.5 * first, (first, float(last["loss"]))
    assert float(last["frame_f1"]) > 0.8, float(last["frame_f1"])


def test_pipeline_labels_follow_target_stem():
    cfg = tiny_test_config()
    model = SAMAudio.init_random(jax.random.PRNGKey(0), cfg)
    sr = cfg.audio_codec.sample_rate
    hop = cfg.audio_codec.hop_length
    t_wav = 40 * hop
    rng = np.random.RandomState(0)
    noise = rng.randn(t_wav).astype(np.float32) * 0.1
    target = np.zeros(t_wav, np.float32)
    lo, hi = 10 * hop, 25 * hop
    target[lo:hi] = np.sin(
        2 * np.pi * 440 * np.arange(hi - lo) / sr).astype(np.float32)
    ex = TrainExample(mixture=noise + target, target=target,
                      residual=noise, description="a tone")
    sp_cfg = SpanPredictorConfig(
        audio_dim=cfg.audio_codec.codebook_dim,
        text_dim=cfg.text_encoder.dim, hidden=32, n_layers=1, n_heads=2)
    pipe = SpanDataPipeline(cfg, model.params, model.tokenizer, sp_cfg)
    batch = pipe.make_batch([ex, ex])
    t_frames = batch["labels"].shape[1]
    assert batch["audio_features"].shape == (2, t_frames, sp_cfg.audio_dim)
    labels = np.asarray(batch["labels"][0])
    active = np.nonzero(labels)[0]
    assert active.size > 0
    # active frames live inside (slightly beyond, codec padding) the window
    assert active.min() >= 10 and active.max() <= 25
    # padded region never labeled
    assert not np.any(labels[~np.asarray(batch["audio_pad_mask"][0])])


def _write_snapshot(cfg, params, path):
    from sam_audio_tpu.checkpoint import save_params

    path.mkdir(parents=True, exist_ok=True)
    with open(path / "config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    save_params(str(path / "params.npz"), jax.device_get(params))


def test_saved_predictor_attaches_and_drives_predict_spans(tmp_path):
    cfg = tiny_test_config()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    snap = tmp_path / "snap"
    _write_snapshot(cfg, params, snap)

    sp_cfg = SpanPredictorConfig(
        audio_dim=cfg.audio_codec.codebook_dim,
        text_dim=cfg.text_encoder.dim, hidden=32, n_layers=1, n_heads=2,
        threshold=0.0,  # random-init logits hover near 0: always some span
        frame_rate=cfg.audio_codec.sample_rate / cfg.audio_codec.hop_length)
    trainer = SpanTrainer(sp_cfg, rng=jax.random.PRNGKey(1))
    sp_dir = save_span_predictor(str(snap), sp_cfg, trainer.state.params)
    assert (snap / "span_predictor" / "params.npz").exists(), sp_dir
    # the save un-gated the parent config (tiny config has span_predictor
    # null, which would block the attach)
    with open(snap / "config.json") as f:
        assert json.load(f)["span_predictor"] == "sam_audio_tpu_span"

    model = SAMAudio.from_pretrained(str(snap), allow_random_towers=True)
    assert isinstance(model.span_predictor, SpanPredictor)

    from sam_audio_tpu.processor import SAMAudioProcessor

    proc = SAMAudioProcessor.from_pretrained(str(snap))
    sr = cfg.audio_codec.sample_rate
    # stay under the tiny config's direct-dispatch limit (max_positions
    # frames): past it separate() auto-streams, which rejects predict_spans
    n = min(sr, cfg.transformer.max_positions * cfg.audio_codec.hop_length)
    wav = np.sin(2 * np.pi * 220 * np.arange(n) / sr,
                 dtype=np.float64).astype(np.float32)[None]
    batch = proc(descriptions=["a tone"], audios=[wav])
    assert batch.anchors is None
    result = model.separate(batch, predict_spans=True,
                            rng=jax.random.PRNGKey(2))
    # spans were predicted and folded back into anchors (reference
    # model.py:259-268 semantics)
    assert batch.anchors is not None
    assert result.target[0].shape[0] > 0


def test_cli_span_task_synthetic_and_export(tmp_path):
    from sam_audio_tpu.train.__main__ import main as train_main

    cfg = tiny_test_config()
    cfg_path = tmp_path / "config.json"
    with open(cfg_path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    export = tmp_path / "snap"
    # flow export first: gives the span predictor a snapshot to live in
    rc = train_main([
        "--synthetic", "1", "--random-init", "--config", str(cfg_path),
        "--batch-size", "2", "--export-dir", str(export), "--log-every", "0",
    ])
    assert rc == 0
    rc = train_main([
        "--task", "span", "--synthetic", "2", "--random-init",
        "--config", str(cfg_path), "--batch-size", "2",
        "--span-hidden", "32", "--span-layers", "1", "--span-heads", "2",
        "--export-dir", str(export), "--log-every", "1",
    ])
    assert rc == 0
    assert (export / "span_predictor" / "params.npz").exists()
    model = SAMAudio.from_pretrained(str(export), allow_random_towers=True)
    assert isinstance(model.span_predictor, SpanPredictor)
