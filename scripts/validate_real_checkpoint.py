"""Waveform-parity validator for a staged sam-audio checkpoint snapshot.

The reference's core promise is `from_pretrained("facebook/sam-audio-*")`
-> real weights -> real audio (reference sam_audio/model/base.py:56-61).
This environment has no egress, so real weights cannot be fetched — this
script makes the validation TURNKEY the moment a snapshot directory
(config.json + checkpoint.pt) is staged:

    python scripts/validate_real_checkpoint.py --snapshot <dir> [--tol 1e-3]

It executes the ACTUAL reference source from /root/reference (via
tests/reference_loader.py) with the snapshot's weights on the torch side,
loads the same snapshot through our `load_sam_audio` converter on the JAX
side, and gates parity at every stage of the pipeline:

  A. velocity field  — reference SAMAudio.forward (model.py:130-180) vs
     ours, identical synthetic conditioning features;
  B. 32-NFE ODE      — reference fixed-grid midpoint solve
     (model.py:274-291) vs our lax.scan integrator, shared noise;
  C. codec encode    — torch DAC-VAE (tests/torch_dacvae_oracle.py, the
     dacvae-layout oracle; the pip package is not importable here) vs our
     JAX codec, on a seeded waveform;
  D. codec decode    — same pair on seeded latents -> WAVEFORM max-abs
     diff, the BASELINE.md <=1e-3 north-star gate;
  E. full separate() — the reference's COMPLETE pipeline (model.py:249-338,
     with the real codec.py + text_encoder.py re-executed; shared local T5
     + shared energy ranker, k=2 candidates, anchors) vs our
     SAMAudio.separate(), decoded-waveform max-abs diff.

Exit code 0 iff every gate passes. The machinery itself is validated
hermetically in tests/test_validate_real_checkpoint.py against a
reference-shaped random checkpoint (exact published key set).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, _REPO)


def _filter_cfg(cfg_cls, cfg: dict) -> dict:
    """Keep only kwargs the reference config accepts (plain __init__ class,
    reference config.py:204-217; dataclass fallback for robustness)."""
    import inspect

    if dataclasses.is_dataclass(cfg_cls):
        names = {f.name for f in dataclasses.fields(cfg_cls)}
    else:
        names = set(inspect.signature(cfg_cls.__init__).parameters) - {"self"}
    return {k: v for k, v in cfg.items() if k in names}


def main(snapshot: str, tol: float = 1e-3, seed: int = 0,
         t_frames: int = 12, text_len: int = 5) -> int:
    import torch

    import jax
    import jax.numpy as jnp

    from reference_loader import load_reference, ref_module
    from torch_dacvae_oracle import DACVAEOracle

    from sam_audio_tpu.checkpoint import load_sam_audio
    from sam_audio_tpu.models import dacvae as our_dac
    from sam_audio_tpu.models.sam_audio import forward as our_forward
    from sam_audio_tpu.ops import ode as ODE

    cfg = json.loads(
        open(os.path.join(snapshot, "config.json")).read())

    # ---- torch side: the REAL reference source with the snapshot weights
    mmod = load_reference()
    cfgmod = ref_module("config")
    ref_kwargs = _filter_cfg(cfgmod.SAMAudioConfig, cfg)
    # sub-config dicts go through their own reference ctors — filter any
    # extra fields (e.g. our JAX-side T5 architecture pins) the same way
    for sub, sub_cls in (("audio_codec", cfgmod.DACVAEConfig),
                         ("text_encoder", cfgmod.T5EncoderConfig),
                         ("vision_encoder", cfgmod.PerceptionEncoderConfig),
                         ("transformer", cfgmod.TransformerConfig)):
        if isinstance(ref_kwargs.get(sub), dict):
            ref_kwargs[sub] = _filter_cfg(sub_cls, ref_kwargs[sub])
    ref_cfg = cfgmod.SAMAudioConfig(**ref_kwargs)
    # real snapshots set span_predictor="pe-a-frame-large" (config.py:216);
    # the perception_models package is stubbed here and none of the parity
    # gates exercise span prediction — disable the tower on the torch side
    ref_cfg.span_predictor = None
    ref_model = mmod.SAMAudio(ref_cfg).eval()

    sd = torch.load(os.path.join(snapshot, "checkpoint.pt"),
                    map_location="cpu", weights_only=False)
    codec_sd = {k[len("audio_codec."):]: v for k, v in sd.items()
                if k.startswith("audio_codec.")}
    module_sd = {k: v for k, v in sd.items()
                 if not k.startswith("audio_codec.")}
    # the reference's own strict loader applies its published skip policy
    # (model.py:346-359) and raises on any real mismatch — codec keys go to
    # the oracle below because reference_loader stubs the dacvae tower
    try:
        ref_model.load_state_dict(module_sd, strict=True)
    except RuntimeError as e:
        print(f"KEY MISMATCH vs reference module tree: {e}")
        return 2
    print(f"reference module: {len(module_sd)} tensors loaded "
          f"(reference skip policy applied)")

    ck = cfg["audio_codec"]
    oracle = DACVAEOracle(ck["encoder_dim"], ck["encoder_rates"],
                          ck["latent_dim"], ck["decoder_dim"],
                          ck["decoder_rates"], ck["codebook_dim"]).eval()
    o_missing, o_unexpected = oracle.load_state_dict(codec_sd, strict=False)
    if o_missing or o_unexpected:
        print(f"CODEC KEY MISMATCH: missing={list(o_missing)[:8]} "
              f"unexpected={list(o_unexpected)[:8]}")
        return 2
    print(f"codec oracle: {len(codec_sd)} tensors loaded")

    # ---- JAX side: the production loader on the same snapshot
    model = load_sam_audio(snapshot, allow_random_towers=True)
    our_cfg = model.cfg
    params = model.params

    rng = np.random.RandomState(seed)
    b, t, l = 1, t_frames, text_len
    dim2c = 2 * ck["codebook_dim"]
    tdim = cfg["text_encoder"]["dim"]
    vdim = cfg["vision_encoder"]["dim"]
    n_anchor_slots = 4
    pad = np.ones((b, t), bool)
    inputs = dict(
        noisy_audio=rng.randn(b, t, dim2c).astype(np.float32),
        audio_features=rng.randn(b, t, dim2c).astype(np.float32),
        text_features=rng.randn(b, l, tdim).astype(np.float32),
        time=rng.rand(b).astype(np.float32),
        masked_video_features=rng.randn(b, vdim, t).astype(np.float32),
        text_mask=np.ones((b, l), bool),
        anchor_ids=np.pad(np.array([[0, 1, 2]], np.int64),
                          ((0, 0), (0, n_anchor_slots - 3)),
                          constant_values=3),
        anchor_alignment=rng.randint(0, 3, size=(b, t)).astype(np.int64),
        audio_pad_mask=pad,
    )
    results = {}

    # -- Gate A: velocity field --------------------------------------------
    with torch.no_grad():
        ref_v = ref_model.forward(
            **{k: torch.from_numpy(v) for k, v in inputs.items()}
        ).numpy()
    our_v = np.asarray(our_forward(
        params, our_cfg, **{k: jnp.asarray(v) for k, v in inputs.items()},
        compute_dtype=jnp.float32,
    ))
    results["A_velocity_field"] = float(np.abs(our_v - ref_v).max())

    # -- Gate B: full 32-NFE ODE -------------------------------------------
    noise = rng.randn(b, t, dim2c).astype(np.float32)
    cond = {k: v for k, v in inputs.items()
            if k not in ("noisy_audio", "time")}
    tcond = {k: torch.from_numpy(v) for k, v in cond.items()}
    odeint_ref = sys.modules["torchdiffeq"].odeint

    def ref_vf(tt, y):
        return ref_model.forward(noisy_audio=y, time=tt.expand(y.size(0)),
                                 **tcond)

    with torch.no_grad():
        states = odeint_ref(ref_vf, torch.from_numpy(noise),
                            torch.tensor([0.0, 1.0]), method="midpoint",
                            options={"step_size": 2 / 32})
        ref_lat = states[-1].numpy()

    jcond = {k: jnp.asarray(v) for k, v in cond.items()}

    def our_vf(tt, y):
        return our_forward(params, our_cfg, noisy_audio=y,
                           time=jnp.broadcast_to(tt, (y.shape[0],)), **jcond,
                           compute_dtype=jnp.float32)

    our_lat = np.asarray(ODE.odeint(our_vf, jnp.asarray(noise),
                                    method="midpoint", step_size=2 / 32))
    results["B_ode_32nfe"] = float(np.abs(our_lat - ref_lat).max())

    # -- Gate C: codec encode (both sides (B, codebook_dim, T)) -------------
    # raw in_proj mean latents on both sides — the reference source never
    # applies the config's mean/std fields (codec.py:65-70), and neither
    # does our dacvae.encode
    hop = int(np.prod(ck["encoder_rates"]))
    wav = (0.1 * rng.randn(b, 1, hop * 16)).astype(np.float32)
    with torch.no_grad():
        ref_enc = oracle.encode(torch.from_numpy(wav)).numpy()
    our_enc = np.asarray(our_dac.encode(
        params["audio_codec"], jnp.asarray(wav), our_cfg.audio_codec,
        compute_dtype=jnp.float32))
    results["C_codec_encode"] = float(np.abs(our_enc - ref_enc).max())

    # -- Gate D: codec decode -> waveform (the <=1e-3 north star) -----------
    lat = rng.randn(b, ck["codebook_dim"], 16).astype(np.float32)
    with torch.no_grad():
        ref_wav = oracle.decode(torch.from_numpy(lat)).numpy()
    our_wav = np.asarray(our_dac.decode(
        params["audio_codec"], jnp.asarray(lat), our_cfg.audio_codec,
        compute_dtype=jnp.float32))
    results["D_codec_decode_waveform"] = float(
        np.abs(our_wav.reshape(-1) - ref_wav.reshape(-1)).max())

    # -- Gate E: FULL separate() orchestration ------------------------------
    # The reference's complete pipeline end to end (processor batching,
    # candidate expansion, zeros-video align, 32-NFE ODE, decode reshape,
    # unbatch, ranker argmax selection; model.py:249-338) with the REAL
    # codec.py + text_encoder.py re-executed (tests/reference_e2e.py).
    # The text tower is a SHARED locally-built T5 of the configured
    # architecture and candidates score with a shared energy ranker — this
    # gates the pipeline's structure and weights parity; real-T5 and real
    # scorer-tower parities have their own tests/gates.
    from reference_e2e import (
        NpEnergyRanker,
        TinyTokenizer,
        TorchEnergyRanker,
        hf_t5_from_our_cfg,
        reference_e2e,
    )
    from sam_audio_tpu.checkpoint import convert_t5_state_dict

    t5 = hf_t5_from_our_cfg(our_cfg.text_encoder)
    tok = TinyTokenizer(vocab_size=our_cfg.text_encoder.vocab_size)
    with reference_e2e(t5_model=t5, tokenizer=tok) as mmod2:
        ref2 = mmod2.SAMAudio(ref_cfg).eval()
        # the reference's own loader (model.py:346-359) applies the published
        # skip policy (text_encoder/ranker/span towers load from HF) and
        # raises on any real mismatch; the real codec accepts its keys here
        try:
            ref2.load_state_dict(sd, strict=True)
        except RuntimeError as e:
            print(f"GATE E KEY MISMATCH: {e}")
            return 2
        ref2.text_ranker = TorchEnergyRanker()
        ref2.visual_ranker = None

        import copy

        ours2 = copy.copy(model)
        ours2.params = dict(model.params)
        ours2.params["text_encoder"] = convert_t5_state_dict(
            {k: v.detach().numpy() for k, v in t5.state_dict().items()},
            our_cfg.text_encoder,
        )
        ours2._tokenizer = tok
        ours2.text_ranker = NpEnergyRanker()
        ours2.visual_ranker = None

        from reference_loader import load_reference_processor

        pmod = load_reference_processor()
        from sam_audio_tpu.processor import SAMAudioProcessor

        hopl = our_cfg.audio_codec.hop_length
        sr = our_cfg.audio_codec.sample_rate
        rproc = pmod.SAMAudioProcessor(audio_hop_length=hopl,
                                       audio_sampling_rate=sr)
        oproc = SAMAudioProcessor(audio_hop_length=hopl,
                                  audio_sampling_rate=sr)
        wav_np = (0.1 * rng.randn(1, hopl * 16)).astype(np.float32)
        descs = ["a test tone"]
        anch = [[("+", 0.0, 4.0 * hopl / sr)]]
        rbatch = rproc(descriptions=descs,
                       audios=[torch.from_numpy(wav_np)], anchors=anch)
        obatch = oproc(descriptions=descs, audios=[wav_np], anchors=anch)

        kC = 2
        e_noise = rng.randn(kC, 16, 2 * ck["codebook_dim"]).astype(np.float32)
        with torch.no_grad():
            rres = ref2.separate(rbatch, noise=torch.from_numpy(e_noise),
                                 reranking_candidates=kC)
        ores = ours2.separate(obatch, noise=jnp.asarray(e_noise),
                              reranking_candidates=kC)
        errs = []
        for i in range(len(rres.target)):
            errs.append(np.abs(rres.target[i].numpy().reshape(-1)
                               - np.asarray(ores.target[i]).reshape(-1)).max())
            errs.append(np.abs(rres.residual[i].numpy().reshape(-1)
                               - np.asarray(ores.residual[i]).reshape(-1)).max())
        results["E_full_separate_waveform"] = float(max(errs))

    ok = True
    print(f"\n== parity report (tol {tol:g}) ==")
    for name, err in results.items():
        # ODE error compounds over 32 NFE; gate E adds the decoder on top
        gate_tol = tol * (2 if name.startswith("B_") else
                          3 if name.startswith("E_") else 1)
        status = "PASS" if err <= gate_tol else "FAIL"
        ok &= err <= gate_tol
        print(f"  {name:28s} max|diff| = {err:.3e}  {status}")
    print("VALIDATION " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshot", required=True,
                    help="dir with config.json + checkpoint.pt")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    raise SystemExit(main(args.snapshot, args.tol, args.seed))
