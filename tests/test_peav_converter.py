"""PE-AV tower converter: layout sniffing + forward parity.

The perception-models `Transformer` inside the judge (reference
judge.py:46-47) ships its weights in checkpoint.pt; convert_peav_tower must
map whatever block naming style the checkpoint uses onto our canonical PE-AV
pytree with zero unconverted keys, and peav_apply must reproduce the torch
forward for the sniffed architecture. Each family below builds a
key-faithful state_dict plus an independent torch-functional forward.
"""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sam_audio_tpu.checkpoint import convert_judge_state_dict, convert_peav_tower
from sam_audio_tpu.config import PEAVTransformerConfig
from sam_audio_tpu.models.peav import peav_apply

H, NH, NL, MLP, B, T = 32, 4, 2, 56, 2, 10
EPS = 1e-5


def _r(rng, *shape):
    return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.25)


def _make_layers(rng, swiglu=False, bias=True, ln_bias=True, ls=False,
                 qk_norm=False):
    layers = []
    for _ in range(NL):
        lay = {
            "wq": _r(rng, H, H), "wk": _r(rng, H, H), "wv": _r(rng, H, H),
            "wo": _r(rng, H, H),
            "ln1w": 1 + 0.1 * _r(rng, H), "ln2w": 1 + 0.1 * _r(rng, H),
        }
        if bias:
            for n in ("bq", "bk", "bv", "bo"):
                lay[n] = _r(rng, H)
        if ln_bias:
            lay["ln1b"] = 0.1 * _r(rng, H)
            lay["ln2b"] = 0.1 * _r(rng, H)
        if swiglu:
            lay["w1"] = _r(rng, MLP, H)
            lay["w2"] = _r(rng, H, MLP)
            lay["w3"] = _r(rng, MLP, H)
        else:
            lay["fc1w"] = _r(rng, MLP, H)
            lay["fc2w"] = _r(rng, H, MLP)
            if bias:
                lay["fc1b"] = _r(rng, MLP)
                lay["fc2b"] = _r(rng, H)
        if ls:
            lay["ls1"] = 0.9 + 0.1 * _r(rng, H)
            lay["ls2"] = 0.9 + 0.1 * _r(rng, H)
        if qk_norm:
            lay["qnw"] = 1 + 0.1 * _r(rng, H // NH)
            lay["knw"] = 1 + 0.1 * _r(rng, H // NH)
        layers.append(lay)
    return layers


def _norm(w, b, y, rms):
    if rms:
        return y * torch.rsqrt((y * y).mean(-1, keepdim=True) + EPS) * w
    return F.layer_norm(y, (y.shape[-1],), w, b, EPS)


def _acts(name):
    return {
        "gelu": lambda x: F.gelu(x),
        "gelu_tanh": lambda x: F.gelu(x, approximate="tanh"),
        "quick_gelu": lambda x: x * torch.sigmoid(1.702 * x),
    }[name]


def torch_tower(layers, x, mask, prenorm=True, act="gelu_tanh", rms=False,
                pos=None, ln_pre=None, final=None):
    """Independent torch-functional forward over the role arrays."""
    if pos is not None:
        x = x + pos[: x.shape[1]][None]
    if ln_pre is not None:
        x = _norm(ln_pre[0], ln_pre[1], x, rms)
    attn_mask = mask[:, None, None, :] if mask is not None else None
    f = _acts(act) if act != "swiglu" else None
    for lay in layers:
        def attn(y, lay=lay):
            q = F.linear(y, lay["wq"], lay.get("bq"))
            k = F.linear(y, lay["wk"], lay.get("bk"))
            v = F.linear(y, lay["wv"], lay.get("bv"))
            q = q.view(B, T, NH, -1).transpose(1, 2)
            k = k.view(B, T, NH, -1).transpose(1, 2)
            v = v.view(B, T, NH, -1).transpose(1, 2)
            if "qnw" in lay:
                q = q * torch.rsqrt((q * q).mean(-1, keepdim=True) + EPS) * lay["qnw"]
                k = k * torch.rsqrt((k * k).mean(-1, keepdim=True) + EPS) * lay["knw"]
            o = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask)
            o = o.transpose(1, 2).reshape(B, T, H)
            return F.linear(o, lay["wo"], lay.get("bo"))

        def mlp(y, lay=lay):
            if "w1" in lay:
                return F.linear(
                    F.silu(F.linear(y, lay["w1"])) * F.linear(y, lay["w3"]),
                    lay["w2"],
                )
            return F.linear(f(F.linear(y, lay["fc1w"], lay.get("fc1b"))),
                            lay["fc2w"], lay.get("fc2b"))

        if prenorm:
            a = attn(_norm(lay["ln1w"], lay.get("ln1b"), x, rms))
            x = x + (a * lay["ls1"] if "ls1" in lay else a)
            m = mlp(_norm(lay["ln2w"], lay.get("ln2b"), x, rms))
            x = x + (m * lay["ls2"] if "ls2" in lay else m)
        else:
            x = _norm(lay["ln1w"], lay.get("ln1b"), x + attn(x), rms)
            x = _norm(lay["ln2w"], lay.get("ln2b"), x + mlp(x), rms)
    if final is not None:
        x = _norm(final[0], final[1], x, rms)
    return x


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, T, H).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 7:] = False
    return x, mask


def _check_family(sd, layers, cfg_kwargs, fwd_kwargs, extra=()):
    """Convert sd, assert zero unconverted + sniffed arch, compare forwards."""
    cfg = PEAVTransformerConfig(hidden_size=H, num_layers=NL, num_heads=NH,
                                layer_norm_eps=EPS, **cfg_kwargs)
    params, arch, unconverted = convert_peav_tower(sd, "tower.", cfg)
    assert unconverted == [], unconverted
    cfg = dataclasses.replace(cfg, **arch)
    x, mask = _inputs()
    with torch.no_grad():
        ref = torch_tower(layers, torch.from_numpy(x),
                          torch.from_numpy(mask), **fwd_kwargs).numpy()
    out = peav_apply(params, jnp.asarray(x), cfg,
                     padding_mask=jnp.asarray(mask))
    ours = np.asarray(out.last_hidden_state)
    np.testing.assert_allclose(ours[mask], ref[mask], rtol=2e-4, atol=2e-4)
    return params, arch, out


def test_fairseq_style_tower():
    rng = np.random.RandomState(1)
    layers = _make_layers(rng)
    final = (1 + 0.1 * _r(rng, H), 0.1 * _r(rng, H))
    sd = {}
    for i, lay in enumerate(layers):
        L = f"tower.layers.{i}"
        for role, name in (("wq", "self_attn.q_proj"), ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"), ("wo", "self_attn.out_proj")):
            sd[f"{L}.{name}.weight"] = lay[role].numpy()
            sd[f"{L}.{name}.bias"] = lay["b" + role[1]].numpy()
        sd[f"{L}.self_attn_layer_norm.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.self_attn_layer_norm.bias"] = lay["ln1b"].numpy()
        sd[f"{L}.final_layer_norm.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.final_layer_norm.bias"] = lay["ln2b"].numpy()
        sd[f"{L}.fc1.weight"] = lay["fc1w"].numpy()
        sd[f"{L}.fc1.bias"] = lay["fc1b"].numpy()
        sd[f"{L}.fc2.weight"] = lay["fc2w"].numpy()
        sd[f"{L}.fc2.bias"] = lay["fc2b"].numpy()
    sd["tower.final_layer_norm.weight"] = final[0].numpy()
    sd["tower.final_layer_norm.bias"] = final[1].numpy()
    _check_family(sd, layers, {"pos": "none"},
                  dict(prenorm=True, final=final))


def test_timm_style_tower_fused_qkv_learned_pos_layerscale():
    rng = np.random.RandomState(2)
    layers = _make_layers(rng, ls=True)
    pos = 0.02 * _r(rng, T, H)
    final = (1 + 0.1 * _r(rng, H), 0.1 * _r(rng, H))
    sd = {"tower.pos_embed": pos.numpy(),
          "tower.norm.weight": final[0].numpy(),
          "tower.norm.bias": final[1].numpy()}
    for i, lay in enumerate(layers):
        L = f"tower.blocks.{i}"
        sd[f"{L}.attn.qkv.weight"] = torch.cat(
            [lay["wq"], lay["wk"], lay["wv"]]).numpy()
        sd[f"{L}.attn.qkv.bias"] = torch.cat(
            [lay["bq"], lay["bk"], lay["bv"]]).numpy()
        sd[f"{L}.attn.proj.weight"] = lay["wo"].numpy()
        sd[f"{L}.attn.proj.bias"] = lay["bo"].numpy()
        sd[f"{L}.norm1.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.norm1.bias"] = lay["ln1b"].numpy()
        sd[f"{L}.norm2.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.norm2.bias"] = lay["ln2b"].numpy()
        sd[f"{L}.mlp.fc1.weight"] = lay["fc1w"].numpy()
        sd[f"{L}.mlp.fc1.bias"] = lay["fc1b"].numpy()
        sd[f"{L}.mlp.fc2.weight"] = lay["fc2w"].numpy()
        sd[f"{L}.mlp.fc2.bias"] = lay["fc2b"].numpy()
        sd[f"{L}.ls1.gamma"] = lay["ls1"].numpy()
        sd[f"{L}.ls2.gamma"] = lay["ls2"].numpy()
    params, arch, _ = _check_family(sd, layers, {},
                                    dict(prenorm=True, pos=pos, final=final))
    assert arch["pos"] == "learned"


def test_clip_style_tower_in_proj_quick_gelu():
    rng = np.random.RandomState(3)
    layers = _make_layers(rng)
    pos = 0.02 * _r(rng, T, H)
    pre = (1 + 0.1 * _r(rng, H), 0.1 * _r(rng, H))
    final = (1 + 0.1 * _r(rng, H), 0.1 * _r(rng, H))
    sd = {"tower.positional_embedding": pos.numpy(),
          "tower.ln_pre.weight": pre[0].numpy(),
          "tower.ln_pre.bias": pre[1].numpy(),
          "tower.ln_post.weight": final[0].numpy(),
          "tower.ln_post.bias": final[1].numpy()}
    for i, lay in enumerate(layers):
        L = f"tower.resblocks.{i}"
        sd[f"{L}.attn.in_proj_weight"] = torch.cat(
            [lay["wq"], lay["wk"], lay["wv"]]).numpy()
        sd[f"{L}.attn.in_proj_bias"] = torch.cat(
            [lay["bq"], lay["bk"], lay["bv"]]).numpy()
        sd[f"{L}.attn.out_proj.weight"] = lay["wo"].numpy()
        sd[f"{L}.attn.out_proj.bias"] = lay["bo"].numpy()
        sd[f"{L}.ln_1.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.ln_1.bias"] = lay["ln1b"].numpy()
        sd[f"{L}.ln_2.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.ln_2.bias"] = lay["ln2b"].numpy()
        sd[f"{L}.mlp.c_fc.weight"] = lay["fc1w"].numpy()
        sd[f"{L}.mlp.c_fc.bias"] = lay["fc1b"].numpy()
        sd[f"{L}.mlp.c_proj.weight"] = lay["fc2w"].numpy()
        sd[f"{L}.mlp.c_proj.bias"] = lay["fc2b"].numpy()
    _check_family(sd, layers, {"act": "quick_gelu"},
                  dict(prenorm=True, act="quick_gelu", pos=pos, ln_pre=pre,
                       final=final))


def test_llama_style_tower_swiglu_rmsnorm():
    rng = np.random.RandomState(4)
    layers = _make_layers(rng, swiglu=True, bias=False, ln_bias=False,
                          qk_norm=True)
    final_w = 1 + 0.1 * _r(rng, H)
    sd = {"tower.norm.weight": final_w.numpy()}
    for i, lay in enumerate(layers):
        L = f"tower.layers.{i}"
        for role, name in (("wq", "attention.wq"), ("wk", "attention.wk"),
                           ("wv", "attention.wv"), ("wo", "attention.wo")):
            sd[f"{L}.{name}.weight"] = lay[role].numpy()
        sd[f"{L}.attention.q_norm.weight"] = lay["qnw"].numpy()
        sd[f"{L}.attention.k_norm.weight"] = lay["knw"].numpy()
        sd[f"{L}.attention_norm.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.ffn_norm.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.feed_forward.w1.weight"] = lay["w1"].numpy()
        sd[f"{L}.feed_forward.w2.weight"] = lay["w2"].numpy()
        sd[f"{L}.feed_forward.w3.weight"] = lay["w3"].numpy()
    cfg_kwargs = {"pos": "none", "norm": "rmsnorm"}
    params, arch, _ = _check_family(
        sd, layers, cfg_kwargs,
        dict(prenorm=True, act="swiglu", rms=True, final=(final_w, None)))
    assert arch["act"] == "swiglu"


def test_bert_style_post_ln_tower():
    rng = np.random.RandomState(5)
    layers = _make_layers(rng)
    sd = {}
    for i, lay in enumerate(layers):
        L = f"tower.encoder.layer.{i}"
        for role, name in (("wq", "attention.self.query"),
                           ("wk", "attention.self.key"),
                           ("wv", "attention.self.value"),
                           ("wo", "attention.output.dense")):
            sd[f"{L}.{name}.weight"] = lay[role].numpy()
            sd[f"{L}.{name}.bias"] = lay["b" + role[1]].numpy()
        sd[f"{L}.attention.output.LayerNorm.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.attention.output.LayerNorm.bias"] = lay["ln1b"].numpy()
        sd[f"{L}.output.LayerNorm.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.output.LayerNorm.bias"] = lay["ln2b"].numpy()
        sd[f"{L}.intermediate.dense.weight"] = lay["fc1w"].numpy()
        sd[f"{L}.intermediate.dense.bias"] = lay["fc1b"].numpy()
        sd[f"{L}.output.dense.weight"] = lay["fc2w"].numpy()
        sd[f"{L}.output.dense.bias"] = lay["fc2b"].numpy()
    params, arch, _ = _check_family(sd, layers, {"pos": "none"},
                                    dict(prenorm=False))
    assert arch["prenorm"] is False


def _fairseq_tower_sd(prefix, rng, h, n_layers, mlp):
    """Reference-key-layout PE-AV tower (fairseq/HF naming), random weights."""
    sd = {}
    for i in range(n_layers):
        L = f"{prefix}layers.{i}"
        for name in ("self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj", "self_attn.out_proj"):
            sd[f"{L}.{name}.weight"] = (rng.randn(h, h) * 0.2).astype(np.float32)
            sd[f"{L}.{name}.bias"] = (rng.randn(h) * 0.05).astype(np.float32)
        for name in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{L}.{name}.weight"] = np.ones(h, np.float32)
            sd[f"{L}.{name}.bias"] = np.zeros(h, np.float32)
        sd[f"{L}.fc1.weight"] = (rng.randn(mlp, h) * 0.2).astype(np.float32)
        sd[f"{L}.fc1.bias"] = np.zeros(mlp, np.float32)
        sd[f"{L}.fc2.weight"] = (rng.randn(h, mlp) * 0.2).astype(np.float32)
        sd[f"{L}.fc2.bias"] = np.zeros(h, np.float32)
    sd[f"{prefix}final_layer_norm.weight"] = np.ones(h, np.float32)
    sd[f"{prefix}final_layer_norm.bias"] = np.zeros(h, np.float32)
    return sd


def test_judge_state_dict_full_conversion_and_forward():
    """A complete reference-shaped judge state_dict (codec encoder + ModernBERT
    + both PE-AV towers + fusion heads, reference judge.py:39-72) must convert
    with unconverted == [] and execute judge_forward finitely."""
    import transformers
    from torch_dacvae_oracle import DACVAEOracle

    from sam_audio_tpu.config import (
        DACVAEConfig,
        ModernBertTextConfig,
        SAMAudioJudgeConfig,
    )
    from sam_audio_tpu.models.judge import judge_forward

    cfg = SAMAudioJudgeConfig(
        audio_codec=DACVAEConfig(
            encoder_dim=4, encoder_rates=(2, 4), latent_dim=16, decoder_dim=16,
            decoder_rates=(4, 2), codebook_dim=4, sample_rate=8000,
        ),
        transformer=PEAVTransformerConfig(hidden_size=16, num_layers=2,
                                          num_heads=2, pos="none"),
        finetune_transformer=PEAVTransformerConfig(hidden_size=12, num_layers=1,
                                                   num_heads=2, pos="none"),
        text_model=ModernBertTextConfig(
            vocab_size=300, hidden_size=16, num_hidden_layers=3,
            num_attention_heads=2, intermediate_size=24,
            global_attn_every_n_layers=3, local_attention=8,
        ),
        nth_text_layer=2,
        bottleneck_dim=8,
        compute_dtype="float32",
    )

    torch.manual_seed(7)
    codec = DACVAEOracle(4, [2, 4], 16, 16, [4, 2], 4).eval()
    bert = transformers.ModernBertModel(transformers.ModernBertConfig(
        vocab_size=300, hidden_size=16, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=24,
        global_attn_every_n_layers=3, local_attention=8,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, cls_token_id=3,
        sep_token_id=4,
    )).eval()

    rng = np.random.RandomState(8)
    sd = {}
    sd.update({f"audio_codec.{k}": v.detach().numpy()
               for k, v in codec.state_dict().items()
               if not (k.startswith("decoder") or "out_proj" in k)})
    sd.update({f"text_model.{k}": v.detach().numpy()
               for k, v in bert.state_dict().items()})
    sd.update(_fairseq_tower_sd("transformer.", rng, 16, 2, 32))
    sd.update(_fairseq_tower_sd("finetune_transformer.", rng, 12, 1, 24))

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = (rng.randn(dout, din) * 0.2).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = np.zeros(dout, np.float32)

    lin("data_proj", 4, 16)
    lin("cat_audio_proj", 32, 8)
    lin("text_proj1", 16, 16, bias=False)
    lin("text_proj2", 16, 8)
    sd["layer_norm.weight"] = np.ones(8, np.float32)
    sd["layer_norm.bias"] = np.zeros(8, np.float32)
    lin("proj_audio_and_text", 16, 8)
    lin("finetune_data_proj", 8, 12)
    lin("head", 12, 4, bias=False)
    sd["mean"] = np.arange(4, dtype=np.float32)
    sd["std"] = np.full(4, 2.0, np.float32)

    params, unconverted, archs = convert_judge_state_dict(sd, cfg,
                                                          return_arch=True)
    assert unconverted == [], unconverted
    cfg = dataclasses.replace(
        cfg,
        transformer=dataclasses.replace(cfg.transformer, **archs["transformer"]),
        finetune_transformer=dataclasses.replace(
            cfg.finetune_transformer, **archs["finetune_transformer"]
        ),
    )

    b, tw, l = 2, 64, 6
    irng = np.random.RandomState(9)
    out = judge_forward(
        params, cfg,
        input_ids=jnp.asarray(irng.randint(3, 300, (b, l)).astype(np.int32)),
        input_values=jnp.asarray(irng.randn(b, 1, tw).astype(np.float32)),
        separated_values=jnp.asarray(irng.randn(b, 1, tw).astype(np.float32)),
        padding_mask=jnp.ones((b, tw), bool),
    )
    for field in (out.overall, out.recall, out.precision, out.faithfulness):
        assert field.shape == (b, 1)
        assert np.isfinite(np.asarray(field)).all()


def test_masked_mean_pooling():
    rng = np.random.RandomState(6)
    layers = _make_layers(rng)
    sd = {}
    for i, lay in enumerate(layers):
        L = f"tower.layers.{i}"
        for role, name in (("wq", "self_attn.q_proj"), ("wk", "self_attn.k_proj"),
                           ("wv", "self_attn.v_proj"), ("wo", "self_attn.out_proj")):
            sd[f"{L}.{name}.weight"] = lay[role].numpy()
            sd[f"{L}.{name}.bias"] = lay["b" + role[1]].numpy()
        sd[f"{L}.self_attn_layer_norm.weight"] = lay["ln1w"].numpy()
        sd[f"{L}.self_attn_layer_norm.bias"] = lay["ln1b"].numpy()
        sd[f"{L}.final_layer_norm.weight"] = lay["ln2w"].numpy()
        sd[f"{L}.final_layer_norm.bias"] = lay["ln2b"].numpy()
        sd[f"{L}.fc1.weight"] = lay["fc1w"].numpy()
        sd[f"{L}.fc1.bias"] = lay["fc1b"].numpy()
        sd[f"{L}.fc2.weight"] = lay["fc2w"].numpy()
        sd[f"{L}.fc2.bias"] = lay["fc2b"].numpy()
    _, _, out = _check_family(sd, layers, {"pos": "none"}, dict(prenorm=True))
    x, mask = _inputs()
    lh = np.asarray(out.last_hidden_state)
    expect = (lh * mask[:, :, None]).sum(1) / mask.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out.pooler_output), expect,
                               rtol=1e-5, atol=1e-5)


def test_rotary_buffers_flip_pos_to_rope():
    """A llama/rope-style tower's inv_freq buffers must set arch pos='rope'
    (with theta recovered) instead of being silently swallowed — the executor
    then actually rotates q/k (finding: rope towers ran position-less)."""
    import dataclasses

    from sam_audio_tpu.checkpoint import convert_peav_tower
    from sam_audio_tpu.config import PEAVTransformerConfig
    from sam_audio_tpu.models.peav import peav_apply

    rng = np.random.RandomState(6)
    h, nh, n_layers = 16, 2, 2
    hd = h // nh
    theta = 50_000.0
    inv_freq = theta ** (-np.arange(0, hd, 2, dtype=np.float64) / hd)
    sd = {}
    for i in range(n_layers):
        L = f"tower.layers.{i}"
        for name in ("attention.wq", "attention.wk", "attention.wv",
                     "attention.wo"):
            sd[f"{L}.{name}.weight"] = (rng.randn(h, h) * 0.2).astype(
                np.float32)
        sd[f"{L}.attention.rotary_emb.inv_freq"] = inv_freq.astype(np.float32)
        sd[f"{L}.attention_norm.weight"] = np.ones(h, np.float32)
        sd[f"{L}.ffn_norm.weight"] = np.ones(h, np.float32)
        sd[f"{L}.feed_forward.w1.weight"] = (rng.randn(24, h) * 0.2).astype(
            np.float32)
        sd[f"{L}.feed_forward.w2.weight"] = (rng.randn(h, 24) * 0.2).astype(
            np.float32)
        sd[f"{L}.feed_forward.w3.weight"] = (rng.randn(24, h) * 0.2).astype(
            np.float32)
    cfg = PEAVTransformerConfig(hidden_size=h, num_layers=n_layers,
                                num_heads=nh, norm="rmsnorm", pos="none")
    params, arch, unconverted = convert_peav_tower(sd, "tower.", cfg)
    assert unconverted == [], unconverted
    assert arch["pos"] == "rope"
    np.testing.assert_allclose(arch["rope_theta"], theta, rtol=1e-3)

    cfg = dataclasses.replace(cfg, **arch)
    x = jnp.asarray(rng.randn(1, 6, h).astype(np.float32))
    out_rope = np.asarray(peav_apply(params, x, cfg).last_hidden_state)
    out_none = np.asarray(peav_apply(
        params, x, dataclasses.replace(cfg, pos="none")).last_hidden_state)
    assert np.isfinite(out_rope).all()
    # rope must actually change multi-position outputs...
    assert np.abs(out_rope - out_none).max() > 1e-4
    # ...but a single-token sequence sees only the identity rotation
    x1 = x[:, :1]
    r1 = np.asarray(peav_apply(params, x1, cfg).last_hidden_state)
    n1 = np.asarray(peav_apply(
        params, x1, dataclasses.replace(cfg, pos="none")).last_hidden_state)
    np.testing.assert_allclose(r1, n1, atol=2e-5)
