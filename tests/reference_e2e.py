"""Full-pipeline reference universe: the REAL codec.py and text_encoder.py.

`reference_loader.load_reference()` stubs the codec and text-encoder towers
(enough for velocity-field / ODE parity). This module goes further for FULL
`separate()` grounding: it re-executes the reference's actual
`model/codec.py` (with the `dacvae` pip package replaced by
tests/torch_dacvae_oracle.py, the dacvae-layout oracle — the package itself
is not importable here) and the actual `model/text_encoder.py` (with
`transformers.{T5EncoderModel,AutoTokenizer}.from_pretrained` replaced by
injected local factories — no egress), then re-executes `model/model.py`
against those, so `SAMAudio.separate()` runs the reference's complete
orchestration end to end: reference sam_audio/model/model.py:249-338,
codec.py:42-109, text_encoder.py:11-37.

sys.modules is restored on exit, so the standard stubbed universe the other
parity tests share is untouched.
"""

from __future__ import annotations

import sys
import types
from contextlib import contextmanager

from reference_loader import REF_MODEL_DIR, _exec_module, load_reference
from torch_dacvae_oracle import DACVAEOracle


def _dacvae_module() -> types.ModuleType:
    """A `dacvae` module whose DACVAE ctor matches the kwargs the reference
    codec.py:45-56 passes, backed by the torch oracle (same child-module
    naming — encoder/quantizer/decoder — that codec.py re-exposes)."""
    mod = types.ModuleType("dacvae")

    def DACVAE(encoder_dim, encoder_rates, latent_dim, decoder_dim,
               decoder_rates, codebook_dim, **_unused_vae_kwargs):
        return DACVAEOracle(encoder_dim, list(encoder_rates), latent_dim,
                            decoder_dim, list(decoder_rates), codebook_dim)

    mod.DACVAE = DACVAE
    return mod


def hf_t5_from_our_cfg(cfg, seed: int = 7):
    """A local (no egress) torch T5EncoderModel matching our T5EncoderConfig
    architecture — injected into BOTH sides so full-pipeline gates share the
    text tower (real-T5-weight parity is test_t5.py's job)."""
    import torch
    import transformers

    hf_cfg = transformers.T5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.dim, d_kv=cfg.head_dim,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    return transformers.T5EncoderModel(hf_cfg).eval()


class TinyTokenizer:
    """Deterministic byte tokenizer serving BOTH interfaces: the HF call the
    reference text_encoder.py:21-28 makes (return_tensors="pt" -> dict) and
    our model._tokenize contract ((ids, mask) numpy)."""

    def __init__(self, vocab_size: int = 128):
        self.vocab_size = vocab_size

    def _encode(self, texts, max_length):
        import numpy as np

        hi = self.vocab_size - 3
        seqs = [[2 + (b % hi) for b in t.encode()][: max_length - 1] + [1]
                for t in texts]
        longest = max(len(s) for s in seqs)
        ids = np.zeros((len(seqs), longest), np.int64)
        mask = np.zeros((len(seqs), longest), bool)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = True
        return ids, mask

    def __call__(self, texts, max_length=16, truncation=True,
                 padding="longest", return_tensors=None):
        import numpy as np
        import torch

        ids, mask = self._encode(list(texts), max_length or 16)
        if return_tensors == "pt":
            return {"input_ids": torch.from_numpy(ids),
                    "attention_mask": torch.from_numpy(mask.astype(np.int64))}
        return ids, mask


class TorchEnergyRanker:
    """Deterministic stand-in scorer, identical math on both sides — the
    selection ORDER semantics (argmax + per-item gather, reference
    model.py:318-330) are what full-pipeline gates test; the real tower
    parities live in their own tests."""

    def __call__(self, extracted_audio, input_audio=None, descriptions=None,
                 sample_rate=None, **kw):
        import torch

        return torch.stack([(x.float() ** 2).mean(-1)
                            for x in extracted_audio])


class NpEnergyRanker:
    def __call__(self, extracted_audio, **kw):
        import numpy as np

        return np.stack([np.mean(np.square(np.asarray(x, np.float64)), -1)
                         for x in extracted_audio])


@contextmanager
def reference_e2e(t5_model, tokenizer):
    """Yield a fresh `sam_audio.model.model` module whose SAMAudio uses the
    REAL reference codec.py and text_encoder.py. Construct reference models
    (and anything that triggers `from_pretrained`) INSIDE the context.

    t5_model: a torch T5EncoderModel equivalent returned verbatim by the
        patched `transformers.T5EncoderModel.from_pretrained`.
    tokenizer: returned verbatim by the patched
        `transformers.AutoTokenizer.from_pretrained`; must support the HF
        call signature text_encoder.py:21-28 uses (return_tensors="pt").
    """
    load_reference()
    import transformers

    names = ("dacvae", "sam_audio.model.codec",
             "sam_audio.model.text_encoder", "sam_audio.model.model")
    saved = {n: sys.modules.get(n) for n in names}
    saved_t5 = transformers.T5EncoderModel
    saved_tok = transformers.AutoTokenizer
    try:
        sys.modules["dacvae"] = _dacvae_module()
        _exec_module("sam_audio.model.codec", f"{REF_MODEL_DIR}/codec.py")
        transformers.T5EncoderModel = types.SimpleNamespace(
            from_pretrained=lambda name: t5_model)
        transformers.AutoTokenizer = types.SimpleNamespace(
            from_pretrained=lambda name: tokenizer)
        _exec_module("sam_audio.model.text_encoder",
                     f"{REF_MODEL_DIR}/text_encoder.py")
        yield _exec_module("sam_audio.model.model", f"{REF_MODEL_DIR}/model.py")
    finally:
        transformers.T5EncoderModel = saved_t5
        transformers.AutoTokenizer = saved_tok
        for n in names:
            if saved[n] is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = saved[n]
