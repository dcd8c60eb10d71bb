#!/usr/bin/env python
"""Convert a reference sam-audio snapshot (config.json + checkpoint.pt) into
this framework's params.npz, including the separately-hosted T5 text tower.

  python scripts/convert_checkpoint.py --snapshot <dir-or-hf-repo> \
      --out <dir> [--t5 <t5 state_dict .pt>] [--verify]

The output dir gets config.json + params.npz and loads with
`SAMAudio.from_pretrained(<dir>)`.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True,
                    help="local snapshot dir or HF repo id")
    ap.add_argument("--out", required=True)
    ap.add_argument("--t5", default=None,
                    help="optional T5 encoder state_dict (.pt); otherwise "
                         "tries the locally-cached HF model")
    ap.add_argument("--verify", action="store_true",
                    help="run a jitted forward pass after conversion")
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
    params = convert_sam_audio_state_dict(sd, cfg)

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
