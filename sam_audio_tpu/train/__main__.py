"""Training CLI: flow-matching fine-tuning / pretraining driver.

  python -m sam_audio_tpu.train --records <dir> --model <snapshot> \
      --batch-size 8 --epochs 1 --ckpt-dir ckpts [--tp 4] [--ema 0.999]

The reference ships inference only (SURVEY.md section 0); this driver
completes the training subsystem as a turnkey loop: sharded record
streaming (train/records.py) -> host batching + on-device featurization
(train/data.py) -> jitted rectified-flow step with frozen codec/T5 towers
(train/flow_matching.py) -> rolling orbax checkpoints with retention
(train/checkpoints.py). Multi-chip: --dp/--tp build a mesh (params sharded
by the Megatron rules in parallel/mesh.py, batches over dp); multi-host
runs shard the record shards by jax.process_index, matching eval/main.py's
data-parallel scheme.

Hermetic smoke (no data, random init):
  python -m sam_audio_tpu.train --synthetic 8 --random-init --batch-size 2
"""

from __future__ import annotations

import argparse
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m sam_audio_tpu.train", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--task", default="flow", choices=("flow", "span"),
                    help="flow = flow-matching separation training; span = "
                         "train the TPU-native span predictor from the same "
                         "records (labels derived from target-stem activity; "
                         "see train/span.py)")
    src = ap.add_argument_group("data")
    src.add_argument("--records", help="ShardWriter directory (index.json)")
    src.add_argument("--synthetic", type=int, default=0, metavar="N",
                     help="train on N random batches (smoke tests)")
    src.add_argument("--batch-size", type=int, default=8)
    src.add_argument("--epochs", type=int, default=1)
    src.add_argument("--max-steps", type=int, default=0,
                     help="stop after this many optimizer steps (0 = off)")
    src.add_argument("--bucket-seconds", type=float, default=2.0,
                     help="length-bucket granularity (compile-shape control)")
    src.add_argument("--prefetch", type=int, default=2)
    src.add_argument("--seed", type=int, default=0)

    mdl = ap.add_argument_group("model")
    mdl.add_argument("--model", "-p", help="snapshot dir or HF repo id")
    mdl.add_argument("--random-init", action="store_true",
                     help="random-init the model (pretraining / smoke)")
    mdl.add_argument("--config", help="config.json for --random-init "
                                      "(default: flagship-shaped defaults)")
    mdl.add_argument("--train-towers", action="store_true",
                     help=argparse.SUPPRESS)  # rejected: see main()

    opt = ap.add_argument_group("optimizer")
    opt.add_argument("--lr", type=float, default=1e-4)
    opt.add_argument("--weight-decay", type=float, default=0.01)
    opt.add_argument("--grad-clip", type=float, default=1.0)
    opt.add_argument("--lr-schedule", default="constant",
                     choices=("constant", "cosine", "linear"))
    opt.add_argument("--warmup-steps", type=int, default=0)
    opt.add_argument("--total-steps", type=int, default=0,
                     help="decay horizon for cosine/linear (default: "
                          "max-steps or epochs*len(data)/batch)")
    opt.add_argument("--final-lr-ratio", type=float, default=0.0)
    opt.add_argument("--ema", type=float, default=0.0, metavar="DECAY")
    opt.add_argument("--accum-steps", type=int, default=1)
    opt.add_argument("--remat", default="full", choices=("full", "dots"),
                     help="backward-pass rematerialization: 'full' = O(1-"
                          "layer) activation memory; 'dots' = save matmul "
                          "outputs (fewer backward FLOPs, more HBM)")

    lora = ap.add_argument_group("lora")
    lora.add_argument("--lora-rank", type=int, default=0, metavar="R",
                      help="train LoRA adapters of rank R instead of full "
                           "fine-tuning (base weights frozen; optimizer "
                           "state shrinks to the adapter factors)")
    lora.add_argument("--lora-alpha", type=float, default=None,
                      help="LoRA scaling numerator (default: rank)")
    lora.add_argument("--lora-targets", default="attention",
                      choices=("attention", "attention+ffn"),
                      help="which weights get adapters")
    lora.add_argument("--lora-out", metavar="FILE.npz",
                      help="write the trained adapters (EMA if --ema) as a "
                           "standalone npz loadable by "
                           "train.lora.merge_lora_checkpoint")

    span = ap.add_argument_group("span (--task span)")
    span.add_argument("--span-hidden", type=int, default=512)
    span.add_argument("--span-layers", type=int, default=4)
    span.add_argument("--span-heads", type=int, default=8)
    span.add_argument("--span-pos-weight", type=float, default=2.0,
                      help="BCE positive-class weight (active frames are "
                           "usually the minority)")

    par = ap.add_argument_group("parallelism")
    par.add_argument("--dp", type=int, default=0,
                     help="data-parallel mesh size (0 = devices//tp)")
    par.add_argument("--tp", type=int, default=1,
                     help="tensor-parallel mesh size")
    par.add_argument("--coordinator", metavar="HOST:PORT",
                     help="multi-host: jax.distributed coordinator address "
                          "(on TPU pods with auto-detection, omit all three)")
    par.add_argument("--num-processes", type=int, default=0)
    par.add_argument("--process-id", type=int, default=-1)

    ck = ap.add_argument_group("checkpoints")
    ck.add_argument("--ckpt-dir", help="rolling TrainState checkpoints")
    ck.add_argument("--save-every", type=int, default=500)
    ck.add_argument("--max-to-keep", type=int, default=3)
    ck.add_argument("--keep-period", type=int, default=0,
                    help="additionally keep every Nth step forever")
    ck.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint before training")
    ck.add_argument("--export-dir", metavar="DIR",
                    help="after training, write a serving snapshot "
                         "(config.json + params.npz; EMA weights if --ema) "
                         "loadable by SAMAudio.from_pretrained")

    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--allow-random-towers", action="store_true",
                    help="tests only: permit byte-fallback tokenizer etc.")
    return ap


def _load_model(args):
    import jax

    from sam_audio_tpu.models.sam_audio import SAMAudio

    if args.random_init:
        from sam_audio_tpu.config import SAMAudioConfig

        cfg = (SAMAudioConfig.from_json(args.config) if args.config
               else SAMAudioConfig())
        return SAMAudio.init_random(jax.random.PRNGKey(args.seed), cfg)
    if not args.model:
        raise SystemExit("one of --model or --random-init is required")
    return SAMAudio.from_pretrained(
        args.model, allow_random_towers=args.allow_random_towers)


def _open_records(args):
    """Returns (dataset, steps_per_epoch_estimate) for --records."""
    import jax

    from sam_audio_tpu.train.records import ShardedRecordDataset

    ds = ShardedRecordDataset(
        args.records,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        seed=args.seed,
    )
    per_epoch = max(len(ds) // (args.batch_size * jax.process_count()), 1)
    return ds, per_epoch


def _run_span(args, model, total_steps) -> int:
    """--task span: train the TPU-native span predictor (train/span.py).
    Labels come from target-stem activity, so the flow-matching records are
    sufficient; --export-dir writes <dir>/span_predictor/ which
    SAMAudio.from_pretrained attaches automatically."""
    import jax

    from sam_audio_tpu.models.span_predictor import SpanPredictorConfig
    from sam_audio_tpu.train.span import (
        SpanDataPipeline,
        SpanTrainer,
        save_span_predictor,
        synthetic_span_batch,
    )

    cfg = model.cfg
    codec = cfg.audio_codec
    sp_cfg = SpanPredictorConfig(
        audio_dim=min(128, codec.codebook_dim),
        text_dim=cfg.text_encoder.dim,
        hidden=args.span_hidden, n_layers=args.span_layers,
        n_heads=args.span_heads,
        frame_rate=codec.sample_rate / codec.hop_length,
    )
    trainer = SpanTrainer(
        sp_cfg, rng=jax.random.PRNGKey(args.seed + 3),
        learning_rate=args.lr, weight_decay=args.weight_decay,
        grad_clip=args.grad_clip, lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps, total_steps=total_steps,
        final_lr_ratio=args.final_lr_ratio,
        pos_weight=args.span_pos_weight,
    )

    mgr = None
    if args.ckpt_dir:
        from sam_audio_tpu.train.checkpoints import TrainCheckpointManager

        mgr = TrainCheckpointManager(
            args.ckpt_dir, max_to_keep=args.max_to_keep,
            keep_period=args.keep_period or None,
            save_interval_steps=args.save_every,
        )
        if args.resume and mgr.latest_step() is not None:
            trainer.state = mgr.restore(trainer.state)
            print(f"resumed from step {int(trainer.state.step)}",
                  file=sys.stderr)

    rng = jax.random.PRNGKey(args.seed + 29)

    def batches():
        nonlocal rng
        if args.synthetic:
            for _ in range(args.epochs):
                for _ in range(args.synthetic):
                    rng, k = jax.random.split(rng)
                    yield synthetic_span_batch(cfg, sp_cfg, k,
                                               batch_size=args.batch_size)
            return
        from sam_audio_tpu.train.records import iter_batches

        pipeline = SpanDataPipeline(cfg, model.params, model.tokenizer,
                                    sp_cfg, bucket_seconds=args.bucket_seconds)
        ds, _ = _open_records(args)
        for epoch in range(args.epochs):
            # same per-process batch-count bound as the flow loop
            yield from iter_batches(
                ds.epoch(epoch), pipeline, args.batch_size,
                prefetch=args.prefetch,
                max_batches=ds.batches_per_epoch(epoch, args.batch_size))

    print(f"span training starts: total_steps~{total_steps} "
          f"batch={args.batch_size}", file=sys.stderr)
    t0 = time.time()
    n = 0
    try:
        for batch in batches():
            rng, step_rng = jax.random.split(rng)
            metrics = trainer.step(batch, step_rng)
            n += 1
            step = int(trainer.state.step)
            # (n-1) % N == 0 logs the first step and every Nth, incl. N=1
            if args.log_every and (n - 1) % args.log_every == 0:
                print(f"step {step}: loss={float(metrics['loss']):.4f} "
                      f"f1={float(metrics['frame_f1']):.3f}", file=sys.stderr)
            if mgr is not None:
                mgr.save(trainer.state)
            if args.max_steps and step >= args.max_steps:
                break
    finally:
        if mgr is not None:
            mgr.save(trainer.state, force=True)
            mgr.wait_until_finished()
            mgr.close()

    if args.export_dir:
        sp_dir = save_span_predictor(args.export_dir, sp_cfg,
                                     trainer.state.params)
        print(f"wrote span predictor to {sp_dir}", file=sys.stderr)

    print(f"done: {n} steps in {time.time() - t0:.1f}s "
          f"(final step {int(trainer.state.step)})", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if not args.records and not args.synthetic:
        raise SystemExit("one of --records or --synthetic is required")
    if args.train_towers:
        # The towers CANNOT be trained in this architecture: codec/T5
        # featurize batches in the DATA PIPELINE (train/data.py), outside
        # the loss graph, so their gradients are identically zero — the flag
        # would only re-enable adamw weight decay on the frozen towers and
        # silently corrupt them (they'd shrink by lr*wd per step while
        # receiving no training signal).
        raise SystemExit(
            "--train-towers is rejected: tower features are precomputed in "
            "the data pipeline, so the towers get zero gradient; enabling "
            "their weight decay would only corrupt them. Train the DiT "
            "(default) or use --lora-rank.")
    if args.lora_out and args.lora_rank <= 0:
        # validate BEFORE training: discovering this after an hours-long run
        # (the old post-loop check) threw the whole run away
        raise SystemExit("--lora-out requires --lora-rank")

    import jax

    if args.coordinator:
        # multi-host: same scheme as tests/test_multiprocess_allgather.py;
        # record shards are read disjointly per process (records.py).
        # Idempotent: an outer launcher (or a prior run in this process) may
        # already have joined the cluster — reuse it instead of failing.
        try:
            jax.distributed.initialize(coordinator_address=args.coordinator,
                                       num_processes=args.num_processes,
                                       process_id=args.process_id)
        except RuntimeError:
            # Reuse a live cluster only if it matches what was asked for;
            # anything else (backend touched before init, wrong topology)
            # is a real error.
            if (jax.process_count() != args.num_processes
                    or jax.process_index() != args.process_id):
                raise

    from sam_audio_tpu.train.flow_matching import (DEFAULT_FROZEN_PREFIXES,
                                                   Trainer, synthetic_batch)

    model = _load_model(args)
    cfg = model.cfg

    mesh = None
    if args.tp > 1 or args.dp > 1:
        from sam_audio_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp or None, tp=args.tp)
        print(f"mesh: dp={mesh.shape['dp']} tp={mesh.shape['tp']}",
              file=sys.stderr)

    # Decay horizon for schedules, before the Trainer builds the optimizer.
    # All step accounting (--max-steps, --save-every, the schedule horizon)
    # is in OPTIMIZER steps: with --accum-steps k, TrainState.step counts
    # micro-steps, but optax.MultiSteps advances the inner schedule once per
    # k micro-steps — so horizons estimated from batch counts divide by k,
    # and micro-step comparisons multiply by k.
    accum = max(int(args.accum_steps), 1)
    total_steps = args.total_steps or args.max_steps
    if not total_steps and args.records:
        _, per_epoch = _open_records(args)
        total_steps = max(per_epoch * args.epochs // accum, 1)
    if not total_steps:
        total_steps = max(args.synthetic * args.epochs // accum, 1)

    if args.task == "span":
        return _run_span(args, model, total_steps)

    trainable_filter = None

    if args.lora_rank > 0:
        from sam_audio_tpu.train.lora import LoRATrainer

        trainer = LoRATrainer(
            cfg, model.params, rank=args.lora_rank, alpha=args.lora_alpha,
            targets=args.lora_targets, rng=jax.random.PRNGKey(args.seed + 7),
            mesh=mesh, learning_rate=args.lr,
            weight_decay=args.weight_decay, grad_clip=args.grad_clip,
            lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
            total_steps=total_steps, final_lr_ratio=args.final_lr_ratio,
            ema_decay=args.ema, accum_steps=args.accum_steps,
            remat=args.remat,
        )
    else:
        trainer = Trainer(
            cfg, model.params, mesh=mesh,
            learning_rate=args.lr, weight_decay=args.weight_decay,
            grad_clip=args.grad_clip, trainable_filter=trainable_filter,
            lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
            total_steps=total_steps, final_lr_ratio=args.final_lr_ratio,
            ema_decay=args.ema, accum_steps=args.accum_steps,
            remat=args.remat,
        )
    del model.params  # the Trainer owns (and donates) the buffers now

    mgr = None
    if args.ckpt_dir:
        from sam_audio_tpu.train.checkpoints import TrainCheckpointManager

        mgr = TrainCheckpointManager(
            args.ckpt_dir, max_to_keep=args.max_to_keep,
            keep_period=args.keep_period or None,
            # state.step counts micro-steps; --save-every is optimizer steps
            save_interval_steps=args.save_every * accum,
        )
        if args.resume and mgr.latest_step() is not None:
            trainer.state = mgr.restore(trainer.state)
            print(f"resumed from step {int(trainer.state.step)}",
                  file=sys.stderr)

    frozen = DEFAULT_FROZEN_PREFIXES
    print(f"training starts: total_steps~{total_steps} "
          f"batch={args.batch_size} frozen={list(frozen)}", file=sys.stderr)

    rng = jax.random.PRNGKey(args.seed + 17)

    def batches():
        nonlocal rng
        if args.synthetic:
            for _ in range(args.epochs):
                for _ in range(args.synthetic):
                    rng, k = jax.random.split(rng)
                    yield synthetic_batch(cfg, k,
                                          batch_size=args.batch_size)
            return
        from sam_audio_tpu.train.data import FlowMatchingDataPipeline
        from sam_audio_tpu.train.records import iter_batches

        # Featurization (codec encode, T5) always uses the frozen base
        # weights; under LoRA the TrainState holds only the adapters.
        feat_params = (trainer.base_params if args.lora_rank > 0
                       else trainer.state.params)
        pipeline = FlowMatchingDataPipeline(
            cfg, feat_params, model.tokenizer,
            bucket_seconds=args.bucket_seconds)
        ds, _ = _open_records(args)
        for epoch in range(args.epochs):
            # bound every process to the same batch count: one extra dp
            # collective step on one process would deadlock the cluster
            yield from iter_batches(
                ds.epoch(epoch), pipeline, args.batch_size,
                prefetch=args.prefetch,
                max_batches=ds.batches_per_epoch(epoch, args.batch_size))

    t0 = time.time()
    n = 0
    try:
        for batch in batches():
            rng, step_rng = jax.random.split(rng)
            metrics = trainer.step(batch, step_rng)
            n += 1
            step = int(trainer.state.step)
            # (n-1) % N == 0 logs the first step and every Nth, incl. N=1
            if args.log_every and (n - 1) % args.log_every == 0:
                loss = float(metrics["loss"])
                gn = float(metrics["grad_norm"])
                rate = n / (time.time() - t0)
                print(f"step {step}: loss={loss:.4f} grad_norm={gn:.3f} "
                      f"({rate:.2f} steps/s)", file=sys.stderr)
            if mgr is not None:
                mgr.save(trainer.state)
            # --max-steps is optimizer steps; state.step counts micro-steps
            if args.max_steps and step >= args.max_steps * accum:
                break
    finally:
        if mgr is not None:
            mgr.save(trainer.state, force=True)
            mgr.wait_until_finished()
            mgr.close()

    if args.lora_out:  # validated with --lora-rank before training started
        trainer.save_adapters(args.lora_out)
        print(f"wrote LoRA adapters to {args.lora_out}", file=sys.stderr)

    if args.export_dir:
        from sam_audio_tpu.train.export import export_snapshot

        # Under LoRA this exports the MERGED weights (base + scaled B@A),
        # so the snapshot serves at exactly the base model's cost.
        export_snapshot(cfg, trainer.ema_inference_params(), args.export_dir)
        print(f"exported serving snapshot to {args.export_dir}",
              file=sys.stderr)

    print(f"done: {n} steps in {time.time() - t0:.1f}s "
          f"(final step {int(trainer.state.step)})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
