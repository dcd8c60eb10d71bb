"""End-to-end flow-matching training walkthrough.

The reference is inference-only; this example shows the full TPU-native
training story this framework adds on top of it:

  1. write (mixture, target, residual, text) examples to sharded records,
  2. stream them back with per-epoch shuffling + prefetched batching,
  3. train with the dp x tp-shardable CFM Trainer (LR schedule + EMA),
  4. keep rolling checkpoints with retention, restore, and resume,
  5. run the trained (EMA) weights through model.separate().

Runs hermetically on CPU or TPU with a tiny random-init model and synthetic
tone/noise stems. For a real run: point `make_examples` at your stems, size
the config via config.json, and pass a (dp, tp) mesh to Trainer.

Run: python examples/train_flow_matching.py [--steps 30] [--out /tmp/run]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# honor JAX_PLATFORMS=cpu even where a site plugin overrides it (the env's
# sitecustomize registers a TPU backend in every interpreter)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from sam_audio_tpu.config import tiny_test_config
from sam_audio_tpu.models.sam_audio import SAMAudio, sam_audio_init
from sam_audio_tpu.text_tokenizer import ByteFallbackTokenizer
from sam_audio_tpu.train import (
    ShardedRecordDataset,
    TrainCheckpointManager,
    Trainer,
    iter_batches,
    write_shards,
)
from sam_audio_tpu.train.data import FlowMatchingDataPipeline, TrainExample
from sam_audio_tpu.train.flow_matching import TrainState


def make_examples(n: int, sample_rate: int, seconds: float = 0.25, seed: int = 0):
    """Synthetic stems: target = tone burst, residual = noise bed."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    out = []
    for i in range(n):
        f = float(rng.uniform(200, 2000))
        target = (0.3 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        residual = (0.1 * rng.randn(t.size)).astype(np.float32)
        out.append(TrainExample(
            mixture=target + residual, target=target, residual=residual,
            description=f"a {int(f)} Hz tone",
            anchors=[("+", 0.0, seconds)] if i % 2 == 0 else None,
        ))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", default="/tmp/sam_audio_train_demo")
    args = ap.parse_args()

    cfg = tiny_test_config()
    sr = cfg.audio_codec.sample_rate
    tok = ByteFallbackTokenizer(cfg.text_encoder.vocab_size)
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)

    # 1. sharded records on disk
    records_dir = os.path.join(args.out, "records")
    if not os.path.exists(os.path.join(records_dir, "index.json")):
        write_shards(make_examples(64, sr), records_dir, shard_size=16)
    dataset = ShardedRecordDataset(records_dir, seed=0)
    print(f"dataset: {len(dataset)} examples in "
          f"{dataset.index['num_shards']} shards")

    # 2. streaming batches (host featurization overlaps device compute)
    pipeline = FlowMatchingDataPipeline(cfg, params, tok)

    def batches(num_steps):
        done = 0
        epoch = 0
        while done < num_steps:
            for batch in iter_batches(dataset.epoch(epoch), pipeline,
                                      args.batch_size):
                yield batch
                done += 1
                if done >= num_steps:
                    return
            epoch += 1

    # 3. trainer (pass mesh=make_mesh(dp=..., tp=...) for multi-chip)
    trainer = Trainer(cfg, params, learning_rate=3e-4, lr_schedule="cosine",
                      warmup_steps=5, total_steps=args.steps, ema_decay=0.99)

    # 4. rolling checkpoints with retention; resume if one exists
    with TrainCheckpointManager(os.path.join(args.out, "ckpt"),
                                max_to_keep=2, keep_period=10) as mgr:
        if mgr.latest_step() is not None:
            trainer.state = mgr.restore(trainer.state)
            print(f"resumed from step {int(trainer.state.step)}")
        history = trainer.fit(batches(args.steps), jax.random.PRNGKey(1),
                              log_every=10)
        mgr.save(trainer.state, force=True)
        mgr.wait_until_finished()
        print(f"checkpoints kept: {mgr.all_steps()}")

    first, last = history[0]["loss"], history[-1]["loss"]
    print(f"loss: {first:.4f} -> {last:.4f} over {len(history)} steps")

    # 5. the trained EMA weights drive the standard inference API
    model = SAMAudio(cfg, trainer.ema_inference_params(), tokenizer=tok)
    from sam_audio_tpu.processor import SAMAudioProcessor

    processor = SAMAudioProcessor(
        audio_hop_length=cfg.audio_codec.hop_length,
        audio_sampling_rate=sr,
    )
    ex = make_examples(1, sr, seed=7)[0]
    batch = processor(descriptions=[ex.description],
                      audios=[ex.mixture[None]])
    result = model.separate(batch, rng=jax.random.PRNGKey(2))
    print("separated:", np.asarray(result.target[0]).shape)


if __name__ == "__main__":
    main()
