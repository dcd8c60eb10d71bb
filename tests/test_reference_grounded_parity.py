"""Golden parity grounded in the ACTUAL reference source.

Unlike the torch_*_oracle tests (hand-written reimplementations that validate
the converters' key mapping), these tests import the real code from
/root/reference/sam_audio/model via tests/reference_loader.py, so a shared
misreading of the reference cannot pass silently. Covered: RoPE, Patcher,
AlignModalities, full DiT forward (reference transformer.py:473-524), the
velocity field SAMAudio.forward (model.py:130-180), and the complete
32-NFE midpoint ODE solve (model.py:274-291).
"""

import numpy as np
import torch

import jax.numpy as jnp

from reference_loader import load_reference, ref_module

from sam_audio_tpu import checkpoint as ckpt
from sam_audio_tpu.config import SAMAudioConfig, TransformerConfig
from sam_audio_tpu.models.dit import dit_apply, patcher_apply
from sam_audio_tpu.models.sam_audio import forward as our_forward
from sam_audio_tpu.ops import nn as N
from sam_audio_tpu.ops import ode as ODE
from sam_audio_tpu.ops import rope as R

TKW = dict(dim=32, n_heads=4, n_layers=3, dropout=0.0, context_dim=32,
           max_positions=64, frequency_embedding_dim=8, out_channels=6)


def _np(t):
    return t.detach().numpy()


def test_rope_parity_vs_reference():
    rmod = ref_module("rope")
    head_dim, seqlen, theta = 8, 20, 20000.0
    emb = rmod.RotaryEmbedding(theta=theta, head_dim=head_dim, max_seqlen=seqlen)
    emb.reset_parameters()
    torch.manual_seed(0)
    x = torch.randn(2, seqlen, 4, head_dim)
    with torch.no_grad():
        ref = _np(emb(x))
    cos, sin = R.precompute_rope(head_dim, seqlen, theta)
    ours = np.asarray(R.apply_rope(jnp.asarray(_np(x)), cos, sin))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_patcher_parity_vs_reference():
    pmod = ref_module("patcher")
    torch.manual_seed(1)
    for cin, cout in [(16, 16), (16, 24)]:
        patcher = pmod.Patcher(cin, cout, patch_size=1).eval()
        sd = {f"p.{k}": _np(v) for k, v in patcher.state_dict().items()}
        params = ckpt._patcher(sd, "p")
        x = torch.randn(2, cin, 13)  # odd length exercises asymmetric pads
        with torch.no_grad():
            ref = _np(patcher(x))
        ours = np.asarray(patcher_apply(params, jnp.asarray(_np(x))))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_align_modalities_parity_vs_reference():
    amod = ref_module("align")
    torch.manual_seed(2)
    align = amod.AlignModalities(12, 32).eval()
    with torch.no_grad():
        align.gate.fill_(0.37)  # zero-init gate would hide conv/norm errors
    sd = {f"align_masked_video.{k}": _np(v) for k, v in align.state_dict().items()}
    params = {
        "conv": {
            "weight": jnp.asarray(sd["align_masked_video.conv.weight"][..., 0]),
            "bias": jnp.asarray(sd["align_masked_video.conv.bias"]),
        },
        "layer_norm": {
            "weight": jnp.asarray(sd["align_masked_video.layer_norm.weight"]),
            "bias": jnp.asarray(sd["align_masked_video.layer_norm.bias"]),
        },
        "gate": jnp.asarray(sd["align_masked_video.gate"]),
    }
    anchor = torch.randn(2, 9, 32)
    tgt = torch.randn(2, 12, 9)
    with torch.no_grad():
        ref = _np(align(anchor, tgt))
    ours = np.asarray(
        N.align_modalities(params, jnp.asarray(_np(anchor)), jnp.asarray(_np(tgt)))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # tgt=None passthrough (reference align.py:39-40)
    ours_none = np.asarray(N.align_modalities(params, jnp.asarray(_np(anchor)), None))
    np.testing.assert_allclose(ours_none, _np(anchor), rtol=0, atol=0)


def test_dit_forward_parity_vs_reference():
    tmod = ref_module("transformer")
    cfgmod = ref_module("config")
    torch.manual_seed(3)
    ref_dit = tmod.DiT(cfgmod.TransformerConfig(**TKW)).eval()
    our_cfg = TransformerConfig(**TKW, in_channels=None)
    sd = {f"transformer.{k}": _np(v) for k, v in ref_dit.state_dict().items()}
    params = ckpt.convert_dit(sd, our_cfg, prefix="transformer")

    rng = np.random.RandomState(3)
    b, t, l = 2, 12, 5
    x = rng.randn(b, t, TKW["dim"]).astype(np.float32)
    time = rng.rand(b).astype(np.float32)
    memory = rng.randn(b, l, TKW["context_dim"]).astype(np.float32)
    pad = np.ones((b, t), bool)
    pad[1, 9:] = False
    mem_mask = np.ones((b, l), bool)
    mem_mask[0, 3:] = False

    with torch.no_grad():
        ref = _np(ref_dit(
            torch.from_numpy(x), torch.from_numpy(time),
            padding_mask=torch.from_numpy(pad),
            memory=torch.from_numpy(memory),
            memory_padding_mask=torch.from_numpy(mem_mask),
        ))
    ours = np.asarray(dit_apply(
        params, jnp.asarray(x), jnp.asarray(time), cfg=our_cfg,
        padding_mask=jnp.asarray(pad), memory=jnp.asarray(memory),
        memory_padding_mask=jnp.asarray(mem_mask),
    ))
    np.testing.assert_allclose(ours[pad], ref[pad], rtol=1e-4, atol=1e-4)


def _tiny_models():
    """Build the reference SAMAudio (stub towers) and our converted params."""
    mmod = load_reference()
    cfgmod = ref_module("config")
    common = dict(
        in_channels=18,  # 3 * (2 * codebook_dim) with codebook_dim=3
        audio_codec={"codebook_dim": 3, "encoder_dim": 4, "decoder_dim": 8,
                     "encoder_rates": [2, 2], "decoder_rates": [2, 2],
                     "latent_dim": 8},
        text_encoder={"dim": 16},
        vision_encoder={"dim": 12},
        transformer=dict(TKW),
        num_anchors=3,
        anchor_embedding_dim=8,
        span_predictor=None,
    )
    torch.manual_seed(4)
    ref_model = mmod.SAMAudio(cfgmod.SAMAudioConfig(**common)).eval()
    with torch.no_grad():  # zero-init gates would hide conversion errors
        ref_model.align_masked_video.gate.fill_(0.31)
        ref_model.embed_anchors.gate.fill_(-0.45)
    our_cfg = SAMAudioConfig.from_dict({**common, "compute_dtype": "float32"})
    sd = {k: _np(v) for k, v in ref_model.state_dict().items()}
    params = ckpt.convert_conditioning(sd, our_cfg)
    return ref_model, our_cfg, params


def _tiny_inputs(b=2, t=12, l=5):
    rng = np.random.RandomState(7)
    pad = np.ones((b, t), bool)
    pad[1, 9:] = False
    mem_mask = np.ones((b, l), bool)
    mem_mask[0, 3:] = False
    anchor_ids = np.array([[0, 1, 2, 3], [0, 1, 3, 3]], np.int64)
    anchor_alignment = rng.randint(0, 4, size=(b, t)).astype(np.int64)
    return dict(
        noisy_audio=rng.randn(b, t, 6).astype(np.float32),
        audio_features=rng.randn(b, t, 6).astype(np.float32),
        text_features=rng.randn(b, l, 16).astype(np.float32),
        time=rng.rand(b).astype(np.float32),
        masked_video_features=rng.randn(b, 12, t).astype(np.float32),
        text_mask=mem_mask,
        anchor_ids=anchor_ids,
        anchor_alignment=anchor_alignment,
        audio_pad_mask=pad,
    )


def test_velocity_field_parity_vs_reference():
    ref_model, our_cfg, params = _tiny_models()
    inp = _tiny_inputs()
    with torch.no_grad():
        ref = _np(ref_model.forward(
            **{k: torch.from_numpy(v) for k, v in inp.items()}
        ))
    ours = np.asarray(our_forward(
        params, our_cfg, **{k: jnp.asarray(v) for k, v in inp.items()},
        compute_dtype=jnp.float32,
    ))
    pad = inp["audio_pad_mask"]
    np.testing.assert_allclose(ours[pad], ref[pad], rtol=1e-4, atol=1e-4)


def test_full_ode_parity_vs_reference():
    """32-NFE midpoint solve of the reference velocity field vs our lax.scan
    integrator over our velocity field, from identical noise
    (reference model.py:274-291 semantics)."""
    import sys

    ref_model, our_cfg, params = _tiny_models()
    inp = _tiny_inputs()
    rng = np.random.RandomState(11)
    noise = rng.randn(2, 12, 6).astype(np.float32)
    cond = {k: v for k, v in inp.items() if k not in ("noisy_audio", "time")}

    tcond = {k: torch.from_numpy(v) for k, v in cond.items()}
    odeint_ref = sys.modules["torchdiffeq"].odeint

    def ref_vf(t, y):
        return ref_model.forward(
            noisy_audio=y, time=t.expand(y.size(0)), **tcond
        )

    with torch.no_grad():
        states = odeint_ref(ref_vf, torch.from_numpy(noise),
                            torch.tensor([0.0, 1.0]),
                            method="midpoint", options={"step_size": 2 / 32})
        ref = _np(states[-1])

    jcond = {k: jnp.asarray(v) for k, v in cond.items()}

    def our_vf(t, y):
        return our_forward(
            params, our_cfg, noisy_audio=y,
            time=jnp.broadcast_to(t, (y.shape[0],)), **jcond,
            compute_dtype=jnp.float32,
        )

    ours = np.asarray(ODE.odeint(our_vf, jnp.asarray(noise),
                                 method="midpoint", step_size=2 / 32))
    pad = inp["audio_pad_mask"]
    np.testing.assert_allclose(ours[pad], ref[pad], rtol=5e-4, atol=5e-4)
