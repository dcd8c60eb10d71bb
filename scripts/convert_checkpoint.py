#!/usr/bin/env python
"""Convert reference checkpoints into this framework's formats.

Main model (config.json + checkpoint.pt snapshot -> loadable dir):

  python scripts/convert_checkpoint.py --snapshot <dir-or-hf-repo> \
      --out <dir> [--t5 <t5 state_dict .pt>] [--verify]

The output dir gets config.json + params.npz and loads with
`SAMAudio.from_pretrained(<dir>)`.

Tower subcommands (one documented command per published artifact; --verify
always runs the converter's unconverted-key check plus a forward pass):

  python scripts/convert_checkpoint.py clap --torch 630k-best.pt \
      --out clap.npz                       # laion_clap -> ClapRankerConfig.checkpoint
  python scripts/convert_checkpoint.py imagebind --torch imagebind_huge.pth \
      --out imagebind.npz                  # -> ImageBindRankerConfig.checkpoint
  python scripts/convert_checkpoint.py pe-clip --torch PE-Core-L14-336.pt \
      --out pe_clip.npz                    # -> PerceptionEncoder vision tower
  python scripts/convert_checkpoint.py aesthetics --torch aes_ckpt.pt \
      --out aes_dir/                       # -> eval Aesthetic metric
  python scripts/convert_checkpoint.py span-predictor --torch pe-a-frame.pt \
      --out <snapshot>/span_predictor/     # layout load_sam_audio consumes
  python scripts/convert_checkpoint.py --judge --snapshot <judge-snapshot> \
      --out judge_dir/                     # SAMAudioJudge (revision "sam_audio")
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TOWER_COMMANDS = ("clap", "imagebind", "pe-clip", "aesthetics",
                  "span-predictor")


def main():
    if len(sys.argv) > 1 and sys.argv[1] in TOWER_COMMANDS:
        return convert_tower(sys.argv[1], sys.argv[2:])
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True,
                    help="local snapshot dir or HF repo id")
    ap.add_argument("--out", required=True)
    ap.add_argument("--t5", default=None,
                    help="optional T5 encoder state_dict (.pt); otherwise "
                         "tries the locally-cached HF model")
    ap.add_argument("--verify", action="store_true",
                    help="run a jitted forward pass after conversion")
    ap.add_argument("--no-strict", action="store_true",
                    help="tolerate checkpoint keys the converter does not "
                         "consume (default: fail loudly so a renamed module "
                         "is never silently dropped)")
    ap.add_argument("--judge", action="store_true",
                    help="the snapshot is a SAMAudioJudge checkpoint "
                         "(HF revision 'sam_audio'); sniffs the PE-AV tower "
                         "architecture and records it in config.json")
    args = ap.parse_args()

    if args.judge:
        return convert_judge(args)

    from sam_audio_tpu.checkpoint import (
        _load_torch_state_dict,
        convert_sam_audio_state_dict,
        convert_t5_state_dict,
        save_params,
    )
    from sam_audio_tpu.config import SAMAudioConfig

    snapshot = args.snapshot
    if not os.path.isdir(snapshot):
        from huggingface_hub import snapshot_download

        snapshot = snapshot_download(repo_id=snapshot)

    with open(os.path.join(snapshot, "config.json")) as fin:
        cfg_dict = json.load(fin)
    cfg = SAMAudioConfig.from_dict(cfg_dict)

    print("loading torch checkpoint...")
    sd = _load_torch_state_dict(os.path.join(snapshot, "checkpoint.pt"))
    print(f"  {len(sd)} tensors")
    params = convert_sam_audio_state_dict(sd, cfg, strict=not args.no_strict)

    if args.t5:
        print("converting provided T5 state_dict...")
        params["text_encoder"] = convert_t5_state_dict(
            _load_torch_state_dict(args.t5), cfg.text_encoder
        )
    else:
        try:
            from transformers import T5EncoderModel

            print(f"converting cached {cfg.text_encoder.name}...")
            m = T5EncoderModel.from_pretrained(cfg.text_encoder.name,
                                               local_files_only=True)
            params["text_encoder"] = convert_t5_state_dict(
                {k: v.detach().numpy() for k, v in m.state_dict().items()},
                cfg.text_encoder,
            )
        except Exception as e:
            print(f"  WARNING: no T5 weights available ({e}); the text tower "
                  "must be converted separately before real use.")

    os.makedirs(args.out, exist_ok=True)
    shutil.copy(os.path.join(snapshot, "config.json"),
                os.path.join(args.out, "config.json"))
    save_params(os.path.join(args.out, "params.npz"), params)
    print(f"wrote {args.out}/params.npz")

    if args.verify:
        import numpy as np

        from sam_audio_tpu import SAMAudio, SAMAudioProcessor

        model = SAMAudio.from_pretrained(args.out)
        proc = SAMAudioProcessor.from_pretrained(args.out)
        batch = proc(descriptions=["a test sound"],
                     audios=[np.zeros((1, model.hop_length * 8), np.float32)])
        res = model.separate(batch)
        assert np.isfinite(res.target[0]).all()
        print("verify: separate() produced finite output", res.target[0].shape)


def convert_tower(kind: str, argv):
    """One-command tower conversion (VERDICT r2 task 5): published torch
    artifact -> the exact layout the framework consumes."""
    ap = argparse.ArgumentParser(prog=f"convert_checkpoint.py {kind}")
    ap.add_argument("--torch", required=True, help="torch checkpoint path")
    ap.add_argument("--out", required=True,
                    help=".npz path (clap/imagebind/pe-clip) or output dir "
                         "(aesthetics/span-predictor)")
    ap.add_argument("--verify", action="store_true",
                    help="run a forward pass on the converted params "
                         "(the unconverted-key check always runs)")
    args = ap.parse_args(argv)

    import numpy as np

    from sam_audio_tpu.checkpoint import (
        _load_torch_state_dict,
        save_params,
    )

    if kind == "clap":
        from sam_audio_tpu.models.clap import ClapModel

        model = ClapModel.from_torch_checkpoint(args.torch)  # fails loudly
        save_params(args.out, model.params)
        print(f"wrote {args.out} (set ClapRankerConfig.checkpoint to it)")
        if args.verify:
            import jax.numpy as jnp

            emb = model.get_audio_embedding(
                jnp.zeros((1, model.cfg.n_samples)))
            assert np.isfinite(np.asarray(emb)).all()
            print("verify: audio embedding finite", emb.shape)

    elif kind == "imagebind":
        from sam_audio_tpu.models.imagebind import ImageBindHugeModel

        model = ImageBindHugeModel.from_torch_checkpoint(args.torch)
        save_params(args.out, model.params)
        print(f"wrote {args.out} (set ImageBindRankerConfig.checkpoint to it)")
        if args.verify:
            emb = model.embed_audio([np.zeros(32000, np.float32)], 16000)
            assert np.isfinite(np.asarray(emb)).all()
            print("verify: audio embedding finite", np.asarray(emb).shape)

    elif kind == "pe-clip":
        from sam_audio_tpu.config import PerceptionEncoderConfig
        from sam_audio_tpu.models.pe_clip import convert_pe_clip_state_dict

        cfg = PerceptionEncoderConfig()
        sd = _load_torch_state_dict(args.torch)
        params, unconverted = convert_pe_clip_state_dict(sd, cfg)
        if unconverted:
            raise SystemExit(f"unconverted PE-Core keys: {unconverted[:20]}")
        save_params(args.out, params)
        print(f"wrote {args.out} (attach PerceptionEncoder(cfg, "
              "load_params(...)) as model.vision_encoder)")
        if args.verify:
            import jax.numpy as jnp

            from sam_audio_tpu.models.pe_clip import encode_images

            x = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))
            out = encode_images(params, x, cfg)
            assert np.isfinite(np.asarray(out)).all()
            print("verify: image embedding finite", out.shape)

    elif kind == "aesthetics":
        import dataclasses

        from sam_audio_tpu.models.aesthetics import AudioboxAesthetics

        model = AudioboxAesthetics.from_torch_checkpoint(args.torch)
        os.makedirs(args.out, exist_ok=True)
        save_params(os.path.join(args.out, "params.npz"), model.params)
        cfg_dict = dataclasses.asdict(model.cfg)
        with open(os.path.join(args.out, "config.json"), "w") as fout:
            json.dump(cfg_dict, fout, indent=2)
        print(f"wrote {args.out}/params.npz + config.json")
        if args.verify:
            scores = model([np.zeros(16000, np.float32)], 16000)
            assert all(np.isfinite(v) for v in scores[0].values())
            print("verify: aesthetics scores finite", scores[0])

    elif kind == "span-predictor":
        import dataclasses

        from sam_audio_tpu.models.span_predictor import (
            PEAudioFrameConfig,
            PEAudioFrameModel,
            convert_peaudioframe_state_dict,
        )

        cfg = PEAudioFrameConfig()
        sd = _load_torch_state_dict(args.torch)
        params, arch, unconverted = convert_peaudioframe_state_dict(sd, cfg)
        if unconverted:
            raise SystemExit(
                f"unconverted PEAudioFrame keys: {unconverted[:20]}")
        cfg = dataclasses.replace(
            cfg, **{k: v for k, v in arch.items()
                    if k in {f.name for f in dataclasses.fields(cfg)}})
        os.makedirs(args.out, exist_ok=True)
        save_params(os.path.join(args.out, "params.npz"), params)
        with open(os.path.join(args.out, "config.json"), "w") as fout:
            json.dump(dataclasses.asdict(cfg), fout, indent=2)
        print(f"wrote {args.out}/params.npz + config.json (place under "
              "<snapshot>/span_predictor/ for load_sam_audio to attach)")
        if args.verify:
            import jax.numpy as jnp

            from sam_audio_tpu.models.span_predictor import (
                peaudioframe_forward,
            )

            logits = peaudioframe_forward(
                params, cfg, jnp.zeros((1, 8, cfg.audio_dim)),
                jnp.ones((1, 8), bool), jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), bool),
            )
            assert np.isfinite(np.asarray(logits)).all()
            print("verify: frame logits finite", logits.shape)
            del PEAudioFrameModel


def convert_judge(args):
    from sam_audio_tpu.checkpoint import (
        _load_torch_state_dict,
        convert_judge_state_dict,
        save_params,
    )
    from sam_audio_tpu.config import SAMAudioJudgeConfig

    snapshot = args.snapshot
    if not os.path.isdir(snapshot):
        from huggingface_hub import snapshot_download

        snapshot = snapshot_download(repo_id=snapshot, revision="sam_audio")

    with open(os.path.join(snapshot, "config.json")) as fin:
        cfg_dict = json.load(fin)
    cfg = SAMAudioJudgeConfig.from_dict(cfg_dict)

    print("loading judge torch checkpoint...")
    sd = _load_torch_state_dict(os.path.join(snapshot, "checkpoint.pt"))
    print(f"  {len(sd)} tensors")
    params, unconverted, archs = convert_judge_state_dict(sd, cfg,
                                                          return_arch=True)
    if unconverted:
        print(f"  WARNING: {len(unconverted)} unconverted keys:")
        for k in unconverted[:20]:
            print(f"    {k}")
        raise SystemExit(1)
    for tower, arch in archs.items():
        print(f"  {tower}: sniffed arch {arch}")
        cfg_dict.setdefault(tower, {}).update(arch)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as fout:
        json.dump(cfg_dict, fout, indent=2)
    save_params(os.path.join(args.out, "params.npz"), params)
    print(f"wrote {args.out}/params.npz")

    if args.verify:
        import jax
        import numpy as np

        from sam_audio_tpu.models.judge import SAMAudioJudgeModel

        model = SAMAudioJudgeModel.from_pretrained(args.out)
        b, tw = 1, model.cfg.audio_codec.hop_length * 8
        out = model(
            input_ids=np.zeros((b, 4), np.int32),
            input_values=np.zeros((b, 1, tw), np.float32),
            separated_values=np.zeros((b, 1, tw), np.float32),
        )
        assert np.isfinite(np.asarray(out.overall)).all()
        print("verify: judge forward produced finite scores", out.overall)
        del jax


if __name__ == "__main__":
    main()
