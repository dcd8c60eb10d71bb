"""On-chip probe: flagship flow-matching training step (one v5e chip).

The reference ships inference only; this framework adds a trainer
(train/flow_matching.py: rectified-flow loss, frozen codec/T5 towers,
remat over the DiT layer scan, adamw + EMA). This probe measures the real
cost of one training step at flagship scale — 1.36B-param model, bf16
params, batch of 10 s clips — and reports an approximate MFU.

FLOP model per step (trainable DiT trunk of N params over `tok` tokens):
fwd 2N·tok + bwd 4N·tok + remat re-forward 2N·tok = 8N·tok (matmul-only,
attention excluded — so reported MFU is an overestimate of the matmul
bound by the attention share, a few %).

Run: python mb_train.py [batch_size] [remat] [lora_rank]
(from /root/repo; TPU via axon)
`remat`: full (default) | dots — "dots" saves matmul outputs in the forward
pass so the backward replays only elementwise/attention work (6N·tok matmul
FLOPs instead of 8N·tok, at higher HBM).
`lora_rank` > 0 switches to the LoRA trainer (train/lora.py): optimizer/EMA
state shrinks from the 1.15B trainable params to the adapter factors, which
frees HBM for batch — the point of this probe is where the per-chip batch
knee moves. Backward FLOPs stay ~8N·tok (dL/dW is still computed per merged
weight before contracting to the factors), so MFU is comparable; the win is
state memory, not step FLOPs.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig
from sam_audio_tpu.models.sam_audio import num_params, sam_audio_init
from sam_audio_tpu.train import Trainer
from sam_audio_tpu.train.flow_matching import (DEFAULT_FROZEN_PREFIXES,
                                               synthetic_batch)

V5E_BF16_PEAK = 197e12


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    remat = sys.argv[2] if len(sys.argv) > 2 else "full"
    lora_rank = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    t_frames = 250  # 10 s at 25 latent fps
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = SAMAudioConfig(span_predictor=None, compute_dtype="bfloat16",
                         param_dtype="bfloat16")
    t0 = time.time()
    params = sam_audio_init(jax.random.PRNGKey(0), cfg)
    total = num_params(params)
    trainable = total - sum(
        num_params(params[k]) for k in DEFAULT_FROZEN_PREFIXES if k in params)
    print(f"init {total/1e9:.2f}B params ({trainable/1e9:.2f}B trainable) "
          f"in {time.time()-t0:.1f}s", file=sys.stderr)

    if lora_rank > 0:
        from sam_audio_tpu.train.lora import LoRATrainer

        trainer = LoRATrainer(cfg, params, rank=lora_rank, ema_decay=0.999,
                              remat=remat, rng=jax.random.PRNGKey(7))
        n_adapter = num_params(trainer.adapters)
        print(f"lora rank {lora_rank}: {n_adapter/1e6:.1f}M adapter params "
              f"({n_adapter/trainable*100:.2f}% of trainable)",
              file=sys.stderr)
    else:
        trainer = Trainer(cfg, params, ema_decay=0.999, remat=remat)
    rng = jax.random.PRNGKey(1)
    batch = synthetic_batch(cfg, rng, batch_size=b, t_frames=t_frames,
                            text_len=16)

    t0 = time.time()
    m = trainer.step(batch, jax.random.PRNGKey(2))
    loss0 = float(m["loss"])  # scalar fetch = the only reliable relay sync
    print(f"compile+first step: {time.time()-t0:.1f}s loss={loss0:.4f}",
          file=sys.stderr)

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        m = trainer.step(batch, jax.random.PRNGKey(3 + i))
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]

    tok = b * t_frames
    # full remat re-runs the forward matmuls in the backward (8N·tok);
    # "dots" saves their outputs, so only fwd+bwd matmuls remain (6N·tok).
    flops = (6.0 if remat == "dots" else 8.0) * trainable * tok
    if lora_rank > 0:
        # LoRA's backward computes dL/dW only for TARGETED weights (JAX AD
        # skips the dW matmul where no grad is requested): fwd 2N + remat
        # re-forward 2N + dx backward 2N, plus 2·N_target for the dW term.
        n_target = sum(
            int(np.prod(ab["b"].shape[:-1])) * ab["a"].shape[-1]
            for ab in trainer.adapters.values())
        flops = (6.0 * trainable + 2.0 * n_target) * tok
        print(f"targeted weights: {n_target/1e6:.0f}M "
              f"({n_target/trainable*100:.0f}% of trainable)", file=sys.stderr)
    mfu = flops / p50 / V5E_BF16_PEAK
    clips_per_s = b / p50
    out = {
        "batch": b, "t_frames": t_frames, "remat": remat,
        "lora_rank": lora_rank,
        "trainable_params_b": round(trainable / 1e9, 3),
        "step_p50_ms": round(p50 * 1e3, 1),
        "clips10s_per_s": round(clips_per_s, 2),
        "audio_sec_per_sec_train": round(clips_per_s * 10.0, 2),
        "approx_mfu": round(mfu, 3),
        "loss_finite": bool(np.isfinite(loss0)),
    }
    print(f"step p50 {p50*1e3:.0f} ms at B={b}x{t_frames} tok -> "
          f"{out['audio_sec_per_sec_train']}x realtime training, "
          f"~{mfu*100:.0f}% MFU (matmul-only model)", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
