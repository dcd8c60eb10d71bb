"""Load the ACTUAL reference model code (/root/reference/sam_audio) with
minimal stubs for its external dependencies, so parity tests are grounded in
the real source rather than hand-written oracles.

Real modules loaded: model/{config,rope,patcher,align,transformer,model}.py.
Stubbed (heavy externals the parity tests don't exercise): the `core`
perception-models package, `torchdiffeq` (replaced with a fixed-grid
midpoint/euler integrator matching model.py:22's usage), the `dacvae`-backed
codec, the T5 text encoder, the PE vision encoder, and the ranking package.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_MODEL_DIR = "/root/reference/sam_audio/model"


def _exec_module(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _fixed_grid_odeint(func, y0, t, method="midpoint", options=None):
    """torchdiffeq.odeint stand-in for the fixed-grid usage in reference
    model.py:285-290 (method='midpoint', options={'step_size': 2/32}).
    Returns states stacked at the requested time points [t0, t1]."""
    import torch

    h = float((options or {}).get("step_size", 1.0))
    t0, t1 = float(t[0]), float(t[-1])
    n = round((t1 - t0) / h)
    assert abs(n * h - (t1 - t0)) < 1e-9, (h, t0, t1)
    y = y0
    for i in range(n):
        ti = torch.tensor(t0 + i * h, device=y0.device)
        if method == "euler":
            y = y + h * func(ti, y)
        elif method == "midpoint":
            k1 = func(ti, y)
            y = y + h * func(ti + h / 2, y + (h / 2) * k1)
        else:
            raise NotImplementedError(method)
    return torch.stack([y0, y])


def load_reference():
    """Returns the reference `sam_audio.model.model` module (real code)."""
    if "sam_audio.model.model" in sys.modules:
        return sys.modules["sam_audio.model.model"]

    import torch

    # --- stub `core` (perception_models): only config + the two names
    # model.py imports at module level (never called when span_predictor=None).
    core = _stub("core")
    ave = _stub("core.audio_visual_encoder")
    ave_cfg = _stub("core.audio_visual_encoder.config")

    class _PEAVTransformerConfig:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class _Unavailable:
        @classmethod
        def from_config(cls, *a, **k):
            raise RuntimeError("perception_models stubbed out in tests")

    ave_cfg.TransformerConfig = _PEAVTransformerConfig
    ave.PEAudioFrame = _Unavailable
    ave.PEAudioFrameTransform = _Unavailable
    ave.config = ave_cfg
    core.audio_visual_encoder = ave

    # --- stub torchdiffeq with the exact fixed-grid semantics used
    tde = _stub("torchdiffeq")
    tde.odeint = _fixed_grid_odeint

    # --- the reference package skeleton
    pkg = _stub("sam_audio")
    pkg.__path__ = []
    model_pkg = _stub("sam_audio.model")
    model_pkg.__path__ = [REF_MODEL_DIR]
    pkg.model = model_pkg

    # --- stub the heavy towers (not exercised by velocity-field parity)
    codec_mod = _stub("sam_audio.model.codec")

    class _StubDACVAE(torch.nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.cfg = cfg
            self.hop_length = 1
            for r in cfg.encoder_rates:
                self.hop_length *= r

        @property
        def sample_rate(self):
            return self.cfg.sample_rate

        def feature_idx_to_wav_idx(self, idx):
            return idx * self.hop_length

        def forward(self, *a, **k):  # parity tests feed features directly
            raise RuntimeError("codec stubbed out in tests")

        decode = forward

    codec_mod.DACVAE = _StubDACVAE

    te_mod = _stub("sam_audio.model.text_encoder")

    class _StubT5(torch.nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.cfg = cfg

        def forward(self, *a, **k):
            raise RuntimeError("text encoder stubbed out in tests")

    te_mod.T5TextEncoder = _StubT5

    ve_mod = _stub("sam_audio.model.vision_encoder")

    class _StubPE(torch.nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.dim = cfg.dim

        def forward(self, *a, **k):
            raise RuntimeError("vision encoder stubbed out in tests")

    ve_mod.PerceptionEncoder = _StubPE

    proc_mod = _stub("sam_audio.processor")
    proc_mod.Batch = object

    ranking_mod = _stub("sam_audio.ranking")
    ranking_mod.create_ranker = lambda cfg: None

    # --- load the REAL reference modules (dependency order)
    _exec_module("sam_audio.model.base", f"{REF_MODEL_DIR}/base.py")
    _exec_module("sam_audio.model.config", f"{REF_MODEL_DIR}/config.py")
    _exec_module("sam_audio.model.rope", f"{REF_MODEL_DIR}/rope.py")
    _exec_module("sam_audio.model.patcher", f"{REF_MODEL_DIR}/patcher.py")
    _exec_module("sam_audio.model.align", f"{REF_MODEL_DIR}/align.py")
    _exec_module("sam_audio.model.transformer", f"{REF_MODEL_DIR}/transformer.py")
    return _exec_module("sam_audio.model.model", f"{REF_MODEL_DIR}/model.py")


def ref_module(name: str):
    """Get a loaded reference submodule, e.g. ref_module('transformer')."""
    load_reference()
    return sys.modules[f"sam_audio.model.{name}"]


def load_reference_processor():
    """Load the REAL reference processor.py (stubbing torchaudio/torchcodec,
    which the tensor-input paths never touch). Returns the module."""
    cached = sys.modules.get("sam_audio.processor")
    if cached is not None and hasattr(cached, "SAMAudioProcessor"):
        return cached  # real module already executed (load_reference()
        # pre-installs a thin stub under the same name — don't return that)

    load_reference()  # sam_audio package skeleton + real config module

    if "torchaudio" not in sys.modules:
        ta = _stub("torchaudio")

        def _unavailable(*a, **k):
            raise RuntimeError("torchaudio stubbed out in tests")

        ta.load = _unavailable
        ta.functional = types.SimpleNamespace(resample=_unavailable)

    if "torchcodec" not in sys.modules:
        tc = _stub("torchcodec")
        dec = _stub("torchcodec.decoders")

        class _UnavailableDecoder:
            def __init__(self, *a, **k):
                raise RuntimeError("torchcodec stubbed out in tests")

        dec.AudioDecoder = _UnavailableDecoder
        dec.VideoDecoder = _UnavailableDecoder
        tc.decoders = dec

    return _exec_module("sam_audio.processor",
                        "/root/reference/sam_audio/processor.py")
