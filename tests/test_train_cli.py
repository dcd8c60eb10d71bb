"""End-to-end tests of the training CLI (python -m sam_audio_tpu.train).

The reference ships no training code (SURVEY.md section 0); the CLI is the
turnkey driver over train/{records,data,flow_matching,checkpoints}. These
tests run it hermetically in-process: random-init tiny model, synthetic or
on-disk record batches, rolling checkpoints, resume, and a dp mesh.
"""

import dataclasses
import json

import numpy as np
import pytest

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.train.__main__ import main as train_main


@pytest.fixture(scope="module")
def tiny_config_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("traincli") / "config.json"
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(tiny_test_config()), f)
    return str(path)


def test_synthetic_smoke_with_checkpoints_and_resume(tiny_config_path,
                                                     tmp_path):
    ckpt = str(tmp_path / "ckpts")
    rc = train_main([
        "--synthetic", "3", "--random-init", "--config", tiny_config_path,
        "--batch-size", "2", "--ckpt-dir", ckpt, "--save-every", "1",
        "--max-to-keep", "2", "--log-every", "1",
    ])
    assert rc == 0

    from sam_audio_tpu.train.checkpoints import TrainCheckpointManager

    with TrainCheckpointManager(ckpt) as mgr:
        assert mgr.latest_step() == 3
        assert len(mgr.all_steps()) <= 2  # retention pruned

    # resume: picks up at step 3 and advances to 5
    rc = train_main([
        "--synthetic", "2", "--random-init", "--config", tiny_config_path,
        "--batch-size", "2", "--ckpt-dir", ckpt, "--save-every", "1",
        "--resume",
    ])
    assert rc == 0
    with TrainCheckpointManager(ckpt) as mgr:
        assert mgr.latest_step() == 5


def test_synthetic_optimizer_flags(tiny_config_path):
    rc = train_main([
        "--synthetic", "2", "--random-init", "--config", tiny_config_path,
        "--batch-size", "2", "--ema", "0.9", "--lr-schedule", "cosine",
        "--warmup-steps", "1", "--accum-steps", "2", "--log-every", "0",
    ])
    assert rc == 0


def test_synthetic_dp_mesh(tiny_config_path):
    rc = train_main([
        "--synthetic", "2", "--random-init", "--config", tiny_config_path,
        "--batch-size", "4", "--dp", "2", "--log-every", "0",
    ])
    assert rc == 0


def test_records_end_to_end(tiny_config_path, tmp_path):
    from sam_audio_tpu.train.data import TrainExample
    from sam_audio_tpu.train.records import write_shards

    rng = np.random.RandomState(0)
    n_samples = 400  # 50 latent frames at hop 8 (tiny codec)
    examples = []
    for i in range(6):
        tgt = rng.randn(n_samples).astype(np.float32) * 0.1
        res = rng.randn(n_samples).astype(np.float32) * 0.1
        examples.append(TrainExample(
            mixture=tgt + res, target=tgt, residual=res,
            description=f"source {i}",
            anchors=[("+", 0.0, 0.01)] if i % 2 else None,
        ))
    records = str(tmp_path / "records")
    write_shards(examples, records, shard_size=4)

    rc = train_main([
        "--records", records, "--random-init", "--config", tiny_config_path,
        "--batch-size", "2", "--epochs", "1", "--max-steps", "2",
        "--bucket-seconds", "0.05", "--log-every", "0",
    ])
    assert rc == 0


def test_requires_data_and_model(tiny_config_path):
    with pytest.raises(SystemExit):
        train_main(["--random-init", "--config", tiny_config_path])
    with pytest.raises(SystemExit):
        train_main(["--synthetic", "1"])


def test_export_serving_snapshot(tiny_config_path, tmp_path):
    """Train -> --export-dir -> SAMAudio.from_pretrained: the exported
    snapshot must serve through the standard loading path with the EMA
    weights that training produced."""
    import jax
    import jax.numpy as jnp

    out = str(tmp_path / "snapshot")
    rc = train_main([
        "--synthetic", "2", "--random-init", "--config", tiny_config_path,
        "--batch-size", "2", "--ema", "0.9", "--export-dir", out,
        "--log-every", "0",
    ])
    assert rc == 0

    from sam_audio_tpu.models.sam_audio import SAMAudio, forward
    from sam_audio_tpu.train.flow_matching import synthetic_batch

    model = SAMAudio.from_pretrained(out, allow_random_towers=True)
    b = synthetic_batch(model.cfg, jax.random.PRNGKey(5), batch_size=1,
                        t_frames=8)
    v = forward(model.params, model.cfg, b["target_latents"],
                b["audio_features"], b["text_features"],
                jnp.full((1,), 0.5), text_mask=b["text_mask"],
                anchor_ids=b["anchor_ids"],
                anchor_alignment=b["anchor_alignment"],
                audio_pad_mask=b["audio_pad_mask"])
    assert v.shape[0] == 1 and bool(jnp.all(jnp.isfinite(v)))


def test_train_towers_is_rejected(tiny_config_path):
    """--train-towers cannot work (towers featurize outside the loss graph,
    so their grads are zero) and used to silently re-enable weight decay on
    them — it must fail loudly up front."""
    with pytest.raises(SystemExit, match="train-towers"):
        train_main([
            "--synthetic", "1", "--random-init", "--config",
            tiny_config_path, "--batch-size", "1", "--train-towers",
        ])


def test_lora_out_without_rank_rejected_before_training(tiny_config_path):
    """The old check fired AFTER the training loop — an hours-long run was
    thrown away before the user learned their flag combination was invalid."""
    with pytest.raises(SystemExit, match="lora-out requires"):
        train_main([
            "--synthetic", "1", "--random-init", "--config",
            tiny_config_path, "--batch-size", "1",
            "--lora-out", "/tmp/never-written.npz",
        ])


def test_accum_steps_counts_optimizer_steps(tiny_config_path, tmp_path):
    """--max-steps and --save-every are documented in OPTIMIZER steps;
    TrainState.step counts micro-steps, so with --accum-steps 2 a
    --max-steps 2 run must execute 4 micro-steps (2 real updates), not stop
    after 2 micro-steps (= only 1 update)."""
    ckpt = str(tmp_path / "ckpts_accum")
    rc = train_main([
        "--synthetic", "8", "--random-init", "--config", tiny_config_path,
        "--batch-size", "1", "--accum-steps", "2", "--max-steps", "2",
        "--ckpt-dir", ckpt, "--log-every", "0",
    ])
    assert rc == 0

    from sam_audio_tpu.train.checkpoints import TrainCheckpointManager

    with TrainCheckpointManager(ckpt) as mgr:
        assert mgr.latest_step() == 4  # 2 optimizer steps x accum 2
