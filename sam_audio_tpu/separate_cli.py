"""Command-line separation:

  python -m sam_audio_tpu.separate_cli -p <snapshot-or-repo> \
      -i mixture.wav -d "a dog barking" [-o outdir] [-c 8] [--spans 2.0 4.5]
      [--predict-spans] [--window-s 0]

Writes <outdir>/target.wav and <outdir>/residual.wav. With --window-s > 0,
uses streaming windows (arbitrarily long inputs).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", "-p", required=True,
                    help="snapshot dir or HF repo id")
    ap.add_argument("--input", "-i", required=True, help="mixture audio file")
    ap.add_argument("--description", "-d", required=True,
                    help="text prompt describing the target sound")
    ap.add_argument("--out", "-o", default=".")
    ap.add_argument("--candidates", "-c", type=int, default=1)
    ap.add_argument("--predict-spans", action="store_true")
    ap.add_argument("--spans", type=float, nargs=2, action="append",
                    metavar=("START", "END"),
                    help="temporal anchor in seconds; repeatable")
    ap.add_argument("--window-s", type=float, default=0.0,
                    help=">0 enables streaming windows for long audio")
    ap.add_argument("--batch-windows", type=int, default=1,
                    help="streaming: solve N windows per device call "
                         "(throughput; results are grouping-invariant)")
    ap.add_argument("--preview-nfe", type=int, default=0,
                    help="opt-in fast reranking: rank candidates on cheap "
                         "N-NFE previews, re-solve the winner at full NFE")
    ap.add_argument("--int8", action="store_true",
                    help="opt-in int8 serving mode (model.quantize())")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--allow-random-towers", action="store_true",
                    help="tests/benchmarks only: let missing sub-towers and "
                         "tokenizer assets fall back to random/byte-level "
                         "stand-ins instead of raising")
    args = ap.parse_args(argv)

    import jax

    from sam_audio_tpu import SAMAudio, SAMAudioProcessor
    from sam_audio_tpu.audio_io import write_wav

    model = SAMAudio.from_pretrained(
        args.model, allow_random_towers=args.allow_random_towers)
    if args.int8:
        model.quantize()
    anchors = [("+", s, e) for s, e in (args.spans or [])] or None
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.out, exist_ok=True)

    t0 = time.time()
    if args.window_s > 0:
        from sam_audio_tpu.audio_io import load_audio
        from sam_audio_tpu.ops.resample import resample_np
        from sam_audio_tpu.streaming import separate_streaming

        wav, sr = load_audio(args.input)
        if sr != model.sample_rate:
            wav = resample_np(wav, sr, model.sample_rate)
        res = separate_streaming(
            model, args.description, wav, window_s=args.window_s,
            anchors=anchors, reranking_candidates=args.candidates, rng=rng,
            batch_windows=args.batch_windows,
            preview_nfe=args.preview_nfe or None,
        )
        target, residual = res.target, res.residual
        print(f"streamed {res.num_windows} windows")
    else:
        processor = SAMAudioProcessor.from_pretrained(args.model)
        batch = processor(
            descriptions=[args.description], audios=[args.input],
            anchors=[anchors] if anchors else None,
        )
        result = model.separate(
            batch, reranking_candidates=args.candidates,
            predict_spans=args.predict_spans, rng=rng,
            preview_nfe=args.preview_nfe or None,
        )
        target, residual = result.target[0], result.residual[0]

    write_wav(os.path.join(args.out, "target.wav"), target, model.sample_rate)
    write_wav(os.path.join(args.out, "residual.wav"), residual,
              model.sample_rate)
    dur = target.shape[-1] / model.sample_rate
    print(f"separated {dur:.1f}s in {time.time()-t0:.1f}s -> "
          f"{args.out}/target.wav, {args.out}/residual.wav")


if __name__ == "__main__":
    main()
