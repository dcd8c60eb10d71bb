"""Audiobox-aesthetics-style predictor: 4 quality axes from a waveform.

The reference's Aesthetic eval metric wraps the external
`audiobox_aesthetics.infer.AesPredictor` producing CE / CU / PC / PQ scores
(reference: eval/metrics/aes.py:6-49). This is a TPU-native stand-in with the
same interface: mel frontend -> transformer encoder -> masked mean -> 4-way
head, with per-axis output normalization params (loadable from a converted
checkpoint via checkpoint.load_params).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import PEAVTransformerConfig
from sam_audio_tpu.models.peav import peav_apply, peav_init
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops.mel import mel_spectrogram

AXES = ("CE", "CU", "PC", "PQ")


@dataclass(frozen=True)
class AestheticsConfig:
    sample_rate: int = 16_000
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 64
    hidden: int = 256
    layers: int = 4
    heads: int = 4
    max_seconds: float = 10.0


def aesthetics_init(key, cfg: AestheticsConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    tf = PEAVTransformerConfig(hidden_size=cfg.hidden, num_layers=cfg.layers,
                               num_heads=cfg.heads)
    return {
        "mel_proj": N.linear_init(ks[0], cfg.n_mels, cfg.hidden, dtype=dtype),
        "transformer": peav_init(ks[1], tf, dtype),
        "head": N.linear_init(ks[2], cfg.hidden, 4, dtype=dtype),
        "mean": jnp.full((4,), 5.0, dtype),  # axes live on a ~1-10 scale
        "std": jnp.ones((4,), dtype),
    }


def aesthetics_forward(params, cfg: AestheticsConfig, wav: jnp.ndarray,
                       compute_dtype=None) -> jnp.ndarray:
    """wav: (B, T) at cfg.sample_rate -> (B, 4) scores."""
    mel = mel_spectrogram(wav, sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
                          hop_length=cfg.hop_length, n_mels=cfg.n_mels)
    mel = jnp.log(jnp.maximum(mel, 1e-10))
    h = N.linear(params["mel_proj"], mel, compute_dtype)
    tf = PEAVTransformerConfig(hidden_size=cfg.hidden, num_layers=cfg.layers,
                               num_heads=cfg.heads)
    out = peav_apply(params["transformer"], h, tf, compute_dtype=compute_dtype)
    scores = N.linear(params["head"], out.pooler_output, compute_dtype)
    return scores.astype(jnp.float32) * params["std"].astype(jnp.float32) + \
        params["mean"].astype(jnp.float32)


class AesPredictor:
    def __init__(self, cfg: AestheticsConfig, params):
        self.cfg = cfg
        self.params = params

    @classmethod
    def init_random(cls, key, cfg: AestheticsConfig = AestheticsConfig()):
        return cls(cfg, aesthetics_init(key, cfg))

    @classmethod
    def from_pretrained(cls, checkpoint_path: str,
                        cfg: AestheticsConfig = AestheticsConfig()):
        from sam_audio_tpu.checkpoint import load_params

        return cls(cfg, load_params(checkpoint_path))

    def __call__(self, wavs: Sequence[np.ndarray],
                 sample_rate: int) -> List[dict]:
        from sam_audio_tpu.ops.resample import resample_np

        max_t = int(self.cfg.max_seconds * self.cfg.sample_rate)
        rows = []
        for w in wavs:
            w = np.asarray(w, np.float32).reshape(-1)
            if sample_rate != self.cfg.sample_rate:
                w = resample_np(w, sample_rate, self.cfg.sample_rate)
            rows.append(w[:max_t])
        tmax = max(r.shape[-1] for r in rows)
        batch = np.zeros((len(rows), tmax), np.float32)
        for i, r in enumerate(rows):
            batch[i, : r.shape[-1]] = r
        scores = np.asarray(
            aesthetics_forward(self.params, self.cfg, jnp.asarray(batch))
        )
        return [dict(zip(AXES, row.tolist())) for row in scores]


# ---------------------------------------------------------------------------
# Faithful audiobox-aesthetics predictor: WavLM encoder + per-axis MLP heads
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AudioboxAestheticsConfig:
    sample_rate: int = 16_000
    chunk_seconds: float = 10.0
    wavlm: "WavLMConfig" = None  # defaults to WavLM-base geometry

    def __post_init__(self):
        if self.wavlm is None:
            from sam_audio_tpu.models.wavlm import WavLMConfig

            object.__setattr__(self, "wavlm", WavLMConfig())


class AudioboxAesthetics:
    """audiobox_aesthetics.infer.AesPredictor equivalent (reference:
    eval/metrics/aes.py:6-49): WavLM encoder -> masked mean over frames ->
    per-axis MLP head -> per-axis mean/std de-normalization. Inference
    pipeline: mono-mean, resample to 16 kHz, split into 10 s chunks, predict
    each, average weighted by chunk length.

    params: {"wavlm": <models.wavlm tree>,
             "heads": {axis: [linear, ...]}   # GELU between stacked linears
             "target_transform": {axis: {"mean": s, "std": s}}  (optional)}

    ASSUMPTION (unverifiable here, zero egress): the head activation (exact
    GELU between stacked linears) and the final-hidden masked-mean pooling
    match the published audiobox-aesthetics predictor; the converter-side
    parity test round-trips a self-constructed checkpoint, so a divergence in
    either choice on the real checkpoint would score silently wrong. Missing
    extra params (e.g. layer-sum weights) WOULD fail loudly via the
    unconverted-key check. Cross-check against audiobox_aesthetics source
    when package access is available.
    """

    def __init__(self, cfg: AudioboxAestheticsConfig, params):
        self.cfg = cfg
        self.params = params
        import jax as _jax

        self._forward = _jax.jit(self._scores)

    @classmethod
    def init_random(cls, key, cfg: AudioboxAestheticsConfig = None):
        from sam_audio_tpu.models.wavlm import wavlm_init

        cfg = cfg or AudioboxAestheticsConfig()
        ks = jax.random.split(key, 1 + len(AXES))
        h = cfg.wavlm.hidden_size
        heads = {
            ax: [N.linear_init(k2, h, h, dtype=jnp.float32),
                 N.linear_init(jax.random.fold_in(k2, 1), h, 1,
                               dtype=jnp.float32)]
            for ax, k2 in zip(AXES, ks[1:])
        }
        return cls(cfg, {"wavlm": wavlm_init(ks[0], cfg.wavlm),
                         "heads": heads})

    @classmethod
    def from_torch_checkpoint(cls, path: str,
                              cfg: AudioboxAestheticsConfig = None):
        cfg = cfg or AudioboxAestheticsConfig()
        params, unconverted, cfg = convert_aes_checkpoint(path, cfg)
        if unconverted:
            raise ValueError(
                f"unconverted audiobox-aesthetics keys: {unconverted[:20]}"
                f" (+{max(0, len(unconverted) - 20)} more)")
        return cls(cfg, params)

    def _scores(self, wav, pad_mask):
        from sam_audio_tpu.models.wavlm import wavlm_encode

        h = wavlm_encode(self.params["wavlm"], self.cfg.wavlm, wav,
                         pad_mask=pad_mask, compute_dtype=jnp.float32)
        # masked mean over frames (frame validity from the sample mask)
        lens = jnp.sum(pad_mask.astype(jnp.int32), axis=-1)
        for k, s in zip(self.cfg.wavlm.conv_kernel, self.cfg.wavlm.conv_stride):
            lens = (lens - k) // s + 1
        idx = jnp.arange(h.shape[1])
        fmask = (idx[None, :] < lens[:, None]).astype(h.dtype)[:, :, None]
        pooled = jnp.sum(h * fmask, axis=1) / jnp.maximum(
            jnp.sum(fmask, axis=1), 1.0)
        out = {}
        for ax in AXES:
            y = pooled
            layers = self.params["heads"][ax]
            for i, lin in enumerate(layers):
                y = N.linear(lin, y)
                if i < len(layers) - 1:
                    y = jax.nn.gelu(y, approximate=False)
            out[ax] = y[:, 0]
        return out

    def __call__(self, wavs: Sequence[np.ndarray],
                 sample_rate: int) -> List[dict]:
        from sam_audio_tpu.ops.resample import resample_np

        sr = self.cfg.sample_rate
        chunk = int(self.cfg.chunk_seconds * sr)
        chunks, weights, owners = [], [], []
        for i, w in enumerate(wavs):
            w = np.asarray(w, np.float32)
            if w.ndim > 1:
                w = w.mean(axis=0)
            if sample_rate != sr:
                w = resample_np(w, sample_rate, sr)
            for s in range(0, max(len(w), 1), chunk):
                seg = w[s: s + chunk]
                if seg.shape[-1] == 0:
                    seg = np.zeros((1,), np.float32)
                chunks.append(seg)
                weights.append(seg.shape[-1])
                owners.append(i)
        tmax = max(c.shape[-1] for c in chunks)
        batch = np.zeros((len(chunks), tmax), np.float32)
        mask = np.zeros((len(chunks), tmax), bool)
        for j, c in enumerate(chunks):
            batch[j, : c.shape[-1]] = c
            mask[j, : c.shape[-1]] = True
        scores = self._forward(jnp.asarray(batch), jnp.asarray(mask))
        scores = {ax: np.asarray(v) for ax, v in scores.items()}

        tt = self.params.get("target_transform") or {}
        results = []
        w_arr = np.asarray(weights, np.float64)
        for i in range(len(wavs)):
            sel = [j for j, o in enumerate(owners) if o == i]
            row = {}
            for ax in AXES:
                vals = scores[ax][sel]
                v = float(np.average(vals, weights=w_arr[sel]))
                if ax in tt:
                    v = v * float(tt[ax]["std"]) + float(tt[ax]["mean"])
                row[ax] = v
            results.append(row)
        return results


def convert_aes_checkpoint(path: str, cfg: AudioboxAestheticsConfig):
    """Load an audiobox-aesthetics torch checkpoint and sniff its layout:
    a WavLM subtree (HF or fairseq/original naming) plus per-axis projection
    heads (keys carrying the axis token, e.g. `proj_CE.*` / `heads.CE.*`).
    target_transform mean/std are taken from the checkpoint dict when
    present. Returns (params, unconverted) — fail-loudly on unknown keys."""
    import re

    import torch

    from sam_audio_tpu.models.wavlm import (
        convert_wavlm_state_dict,
        fairseq_wavlm_to_hf_keys,
    )

    blob = torch.load(path, map_location="cpu", weights_only=False)
    tt = None
    sd = blob
    if isinstance(blob, dict) and not all(
            hasattr(v, "shape") for v in blob.values()):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in blob:
                sd = blob[key]
                break
        tt = blob.get("target_transform")
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
          np.asarray(v) for k, v in sd.items()}

    # strip a common wrapper prefix (e.g. "model." / "module.")
    marker = "feature_extractor.conv_layers"
    hit = next((k for k in sd if marker in k), None)
    if hit is None:
        raise ValueError("no WavLM feature extractor found in checkpoint")
    wrapper = hit.split(marker)[0]

    # partition: keys under the wavlm tower vs head keys
    axis_re = re.compile(r"(?:^|\.|_)(CE|CU|PC|PQ)(?:$|\.|_)", re.IGNORECASE)
    head_keys = {k: v for k, v in sd.items() if axis_re.search(k)}
    tower_keys = {k[len(wrapper):]: v for k, v in sd.items()
                  if k.startswith(wrapper) and k not in head_keys}

    renamed = fairseq_wavlm_to_hf_keys(tower_keys)
    # wavlm-large layout: LayerNorm on every extractor conv <=> pre-LN
    # (stable) encoder; adjust the config to match the checkpoint
    layer_mode = "feature_extractor.conv_layers.1.layer_norm.weight" in renamed
    if layer_mode != (cfg.wavlm.feat_extract_norm == "layer"):
        import dataclasses

        cfg = dataclasses.replace(cfg, wavlm=dataclasses.replace(
            cfg.wavlm,
            feat_extract_norm="layer" if layer_mode else "group",
            do_stable_layer_norm=layer_mode))
    wavlm_params, unconverted = convert_wavlm_state_dict(renamed, cfg.wavlm)
    # map renamed unconverted keys back to original spelling when possible
    if unconverted:
        back = {nk: ok for ok, nk in
                zip(tower_keys, fairseq_wavlm_to_hf_keys(
                    dict.fromkeys(tower_keys)))}
        unconverted = [wrapper + back.get(k, k) for k in unconverted]

    heads = {}

    def _natural(key: str):
        # numeric-aware sort: 'proj_CE.2.weight' before 'proj_CE.10.weight'
        # (lexicographic sort would misorder MLPs with >=10 submodules)
        return [int(s) if s.isdigit() else s for s in key.split(".")]

    for ax in AXES:
        ax_keys = sorted(
            (k for k in head_keys
             if axis_re.search(k) and axis_re.search(k).group(1).upper() == ax
             and k.endswith(".weight")),
            key=_natural)
        layers = []
        for wk in ax_keys:
            base = wk[: -len(".weight")]
            lin = {"weight": jnp.asarray(head_keys[wk])}
            bk = base + ".bias"
            if bk in head_keys:
                lin["bias"] = jnp.asarray(head_keys[bk])
            layers.append(lin)
        if layers:
            heads[ax] = layers
    if set(heads) != set(AXES):
        missing = sorted(set(AXES) - set(heads))
        raise ValueError(f"no projection head found for axes {missing}")
    unconverted += [k for k in head_keys
                    if not (k.endswith(".weight") or k.endswith(".bias"))]
    # keys outside both partitions (neither tower nor head) must fail loudly
    unconverted += [k for k in sd
                    if not k.startswith(wrapper) and k not in head_keys]

    params = {"wavlm": wavlm_params, "heads": heads}
    if isinstance(tt, dict):
        params["target_transform"] = {
            ax: {"mean": float(v["mean"]), "std": float(v["std"])}
            for ax, v in tt.items() if ax in AXES
        }
    return params, sorted(unconverted), cfg
