"""Checkpoint ingestion: reference torch `checkpoint.pt` -> JAX param pytrees.

The reference distributes checkpoints as HF snapshots of `config.json` +
`checkpoint.pt` (a plain torch state_dict, loaded weights_only=True;
reference: sam_audio/model/base.py:47-61). This module:

  * `convert_sam_audio_state_dict` — key-maps a reference state_dict into our
    param pytree, folding weight-norm (weight_g/weight_v) into plain conv
    weights and permuting attention projections from the reference's strided
    head split to our contiguous split (see models/dit.attention_apply note).
  * `convert_t5_state_dict` — maps an HF T5 encoder state_dict (the text tower
    is fetched from its own repo, reference model.py:346-359).
  * `save_params` / `load_params` — flat .npz serialization of pytrees (plus
    orbax for sharded checkpoints via parallel/mesh.py).
  * `load_sam_audio` — end-to-end from_pretrained.

Missing-tower policy matches the reference (model.py:346-359): text encoder,
rankers, and span predictor are not expected in `checkpoint.pt`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sam_audio_tpu.config import SAMAudioConfig, T5EncoderConfig
from sam_audio_tpu.ops.conv import fold_weight_norm

# Towers intentionally absent from checkpoint.pt (reference model.py:352-355).
SKIP_REGEX = re.compile(r"(^text_encoder|^visual_ranker|^text_ranker|^span_predictor)")


def _stack_layer_trees(layers):
    """Stack N per-layer param dicts leaf-wise onto a leading layer axis —
    the storage layout the lax.scan layer loops consume."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


# ---------------------------------------------------------------------------
# Flat (npz) pytree serialization
# ---------------------------------------------------------------------------


def flatten_pytree(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_pytree(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def listify(node):
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [node[str(i)] for i in range(len(keys))]
            return node
        return node

    return listify(root)


def save_params(path: str, params):
    np.savez(path, **flatten_pytree(params))


def load_params(path: str):
    with np.load(path) as data:
        return unflatten_pytree({k: data[k] for k in data.files})


def save_params_orbax(path: str, params):
    """Sharded/async checkpointing via orbax (multi-host safe)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_params_orbax(path: str, template=None):
    """template: optional pytree of jax.ShapeDtypeStruct/arrays with target
    shardings; None restores with saved metadata."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))


# ---------------------------------------------------------------------------
# Conversion helpers
# ---------------------------------------------------------------------------


def _get(sd: Dict[str, np.ndarray], key: str) -> np.ndarray:
    """Fetch a (possibly weight-normed) weight: `key`.weight or the folded
    `key`.weight_g/weight_v pair."""
    if f"{key}.weight" in sd:
        return np.asarray(sd[f"{key}.weight"])
    if f"{key}.weight_v" in sd:
        return np.asarray(
            fold_weight_norm(
                jnp.asarray(sd[f"{key}.weight_g"]),
                jnp.asarray(sd[f"{key}.weight_v"]),
            )
        )
    # torch >= 2.1 parametrized weight norm
    if f"{key}.parametrizations.weight.original0" in sd:
        return np.asarray(
            fold_weight_norm(
                jnp.asarray(sd[f"{key}.parametrizations.weight.original0"]),
                jnp.asarray(sd[f"{key}.parametrizations.weight.original1"]),
            )
        )
    raise KeyError(key)


def _linear(sd, key, bias=True):
    p = {"weight": jnp.asarray(_get(sd, key))}
    if bias and f"{key}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{key}.bias"])
    return p


def _conv(sd, key):
    return _linear(sd, key, bias=True)


def _norm(sd, key, bias=False):
    p = {"weight": jnp.asarray(sd[f"{key}.weight"])}
    if bias and f"{key}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{key}.bias"])
    return p


def _snake(sd, key):
    return {"alpha": jnp.asarray(sd[f"{key}.alpha"])}


def permute_attention_heads(weight: np.ndarray, n_heads: int) -> np.ndarray:
    """Reference splits heads stridedly (reshape(B,T,C//H,H), transformer.py:121-126):
    torch out-channel j*H+h == our channel h*D+j. Permute projection rows."""
    out_dim, in_dim = weight.shape
    d = out_dim // n_heads
    return (
        weight.reshape(d, n_heads, in_dim).transpose(1, 0, 2).reshape(out_dim, in_dim)
    )


def deinterleave_qk_heads(x: np.ndarray, n_heads: int) -> np.ndarray:
    """Permute per-head channels so interleaved rotary pairs (2i, 2i+1) land
    on split halves (i, i+D/2) — the layout `ops.rope.apply_rope_half`
    expects. Applied identically to q and k (projection rows, biases, and
    qk-norm weights), so attention scores are exactly unchanged while the
    hot path avoids stride-2 lane relayouts. x: (H*D, ...) or (H*D,)."""
    from sam_audio_tpu.ops.rope import rope_deinterleave_perm

    out_dim = x.shape[0]
    d = out_dim // n_heads
    perm = rope_deinterleave_perm(d)
    xh = x.reshape(n_heads, d, *x.shape[1:])
    return xh[:, perm].reshape(x.shape)


def _attention(sd, prefix, n_heads, qk_norm=True, rope_deinterleave=False):
    p = {}
    for name in ("wq", "wk", "wv"):
        w = permute_attention_heads(np.asarray(_get(sd, f"{prefix}.{name}")),
                                    n_heads)
        if rope_deinterleave and name in ("wq", "wk"):
            w = deinterleave_qk_heads(w, n_heads)
        p[name] = {"weight": jnp.asarray(w)}
        if f"{prefix}.{name}.bias" in sd:
            b = np.asarray(sd[f"{prefix}.{name}.bias"])
            d = b.shape[0] // n_heads
            b = b.reshape(d, n_heads).T.reshape(-1)
            if rope_deinterleave and name in ("wq", "wk"):
                b = deinterleave_qk_heads(b, n_heads)
            p[name]["bias"] = jnp.asarray(b)
    p["wo"] = _linear(sd, f"{prefix}.wo")
    if qk_norm and f"{prefix}.q_norm.weight" in sd:
        p["q_norm"] = _norm(sd, f"{prefix}.q_norm")
        p["k_norm"] = _norm(sd, f"{prefix}.k_norm")
        if rope_deinterleave:
            # qk-norm weights are per head-dim channel: permute to match
            for nm in ("q_norm", "k_norm"):
                w = np.asarray(p[nm]["weight"])
                d = w.shape[0]
                from sam_audio_tpu.ops.rope import rope_deinterleave_perm

                p[nm]["weight"] = jnp.asarray(w[rope_deinterleave_perm(d)])
    return p


def _projection(sd, prefix):
    p = {"w1": _linear(sd, f"{prefix}.w1"), "w2": _linear(sd, f"{prefix}.w2")}
    if f"{prefix}.w3.weight" in sd:
        p["w3"] = _linear(sd, f"{prefix}.w3")
    return p


def _conv_block(sd, prefix):
    return {
        "groupnorm": _norm(sd, f"{prefix}.groupnorm", bias=True),
        "project": _conv(sd, f"{prefix}.project"),
    }


def _patcher(sd, prefix):
    p = {
        "block1": _conv_block(sd, f"{prefix}.block.block1"),
        "block2": _conv_block(sd, f"{prefix}.block.block2"),
    }
    if f"{prefix}.block.to_out.weight" in sd:
        p["to_out"] = _conv(sd, f"{prefix}.block.to_out")
    return p


# ---------------------------------------------------------------------------
# DiT conversion
# ---------------------------------------------------------------------------


def convert_dit(sd: Dict[str, np.ndarray], cfg, prefix="transformer"):
    """cfg: TransformerConfig."""
    layers = []
    for i in range(cfg.n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append(
            {
                # self-attention carries RoPE: deinterleave q/k for the
                # split-half rotary hot path (exactness-preserving)
                "attention": _attention(sd, f"{lp}.attention", cfg.n_heads,
                                        cfg.qk_norm, rope_deinterleave=True),
                "cross_attention": _attention(sd, f"{lp}.cross_attention",
                                              cfg.n_heads, cfg.qk_norm),
                "feed_forward": _projection(sd, f"{lp}.feed_forward"),
                "attention_norm": _norm(sd, f"{lp}.attention_norm"),
                "ffn_norm": _norm(sd, f"{lp}.ffn_norm"),
                "scale_shift_table": jnp.asarray(sd[f"{lp}.scale_shift_table"]),
            }
        )
    p = {
        "layers": _stack_layer_trees(layers),
        "norm": _norm(sd, f"{prefix}.norm"),
        "output": _linear(sd, f"{prefix}.output"),
        "x_embedder": _patcher(sd, f"{prefix}.x_embedder"),
        "y_embedder": {"projection": _projection(sd, f"{prefix}.y_embedder.projection")},
        "t_embedder": {"projection": _projection(sd, f"{prefix}.t_embedder.projection")},
        "t_block": _linear(sd, f"{prefix}.t_block"),
        "final_layer_scale_shift_table": jnp.asarray(
            sd[f"{prefix}.final_layer_scale_shift_table"]
        ),
    }
    if f"{prefix}.y_embedder.norm.weight" in sd:
        p["y_embedder"]["norm"] = _norm(sd, f"{prefix}.y_embedder.norm")
    if f"{prefix}.data_proj.weight" in sd:
        p["data_proj"] = _linear(sd, f"{prefix}.data_proj")
    return p


# ---------------------------------------------------------------------------
# DAC-VAE conversion (Descript-DAC Sequential key layout)
# ---------------------------------------------------------------------------


def _residual_unit(sd, prefix):
    return {
        "snake1": _snake(sd, f"{prefix}.block.0"),
        "conv1": _conv(sd, f"{prefix}.block.1"),
        "snake2": _snake(sd, f"{prefix}.block.2"),
        "conv2": _conv(sd, f"{prefix}.block.3"),
    }


def _seq_prefix(sd: Dict[str, np.ndarray], base: str) -> str:
    """The Descript-DAC Sequential attribute is `block` for the encoder and
    `model` for the decoder; tolerate either spelling in forks."""
    for name in ("block", "model"):
        probe = f"{base}.{name}.0."
        if any(k.startswith(probe) for k in sd):
            return f"{base}.{name}"
    raise KeyError(f"No Sequential container found under {base}.(block|model)")


def _proj_conv(sd, key):
    """VAE in/out projection: Conv1d k=1 (3-D weight) or Linear (2-D); both
    normalize to our (out, in, 1) conv layout."""
    p = _linear(sd, key, bias=True)
    w = np.asarray(p["weight"])
    if w.ndim == 2:
        p["weight"] = jnp.asarray(w[..., None])
    return p


def convert_dacvae(sd: Dict[str, np.ndarray], cfg, prefix="audio_codec",
                   with_decoder=True):
    """cfg: DACVAEConfig. Encoder: <seq>.0 conv_in, <seq>.1..n EncoderBlocks,
    <seq>.n+1 Snake, <seq>.n+2 conv_out; decoder mirrors."""
    n_enc = len(cfg.encoder_rates)
    eb = _seq_prefix(sd, f"{prefix}.encoder")
    enc = {"conv_in": _conv(sd, f"{eb}.0"), "blocks": []}
    for i in range(n_enc):
        bp = f"{eb}.{1 + i}.block"
        enc["blocks"].append(
            {
                "res": [_residual_unit(sd, f"{bp}.{j}") for j in range(3)],
                "snake": _snake(sd, f"{bp}.3"),
                "conv": _conv(sd, f"{bp}.4"),
            }
        )
    enc["snake_out"] = _snake(sd, f"{eb}.{n_enc + 1}")
    enc["conv_out"] = _conv(sd, f"{eb}.{n_enc + 2}")

    p = {"encoder": enc, "in_proj": _proj_conv(sd, f"{prefix}.quantizer.in_proj")}

    if with_decoder:
        n_dec = len(cfg.decoder_rates)
        db = _seq_prefix(sd, f"{prefix}.decoder")
        dec = {"conv_in": _conv(sd, f"{db}.0"), "blocks": []}
        for i in range(n_dec):
            bp = f"{db}.{1 + i}.block"
            dec["blocks"].append(
                {
                    "snake": _snake(sd, f"{bp}.0"),
                    "conv_t": _conv(sd, f"{bp}.1"),
                    "res": [_residual_unit(sd, f"{bp}.{2 + j}") for j in range(3)],
                }
            )
        dec["snake_out"] = _snake(sd, f"{db}.{n_dec + 1}")
        dec["conv_out"] = _conv(sd, f"{db}.{n_dec + 2}")
        p["out_proj"] = _proj_conv(sd, f"{prefix}.quantizer.out_proj")
        p["decoder"] = dec
    return p


# ---------------------------------------------------------------------------
# Full model conversion
# ---------------------------------------------------------------------------


def convert_conditioning(sd: Dict[str, np.ndarray], cfg: SAMAudioConfig):
    """Convert everything in the SAMAudio state_dict except the codec: the DiT
    and the conditioning heads (reference model.py:84-93)."""
    params = {
        "transformer": convert_dit(sd, cfg.transformer, "transformer"),
        "proj": _linear(sd, "proj"),
        "align_masked_video": {
            # reference align.py:17-19 uses Conv1d k=1 == Linear; squeeze kernel.
            "conv": {
                "weight": jnp.asarray(np.asarray(_get(sd, "align_masked_video.conv"))[..., 0]),
                "bias": jnp.asarray(sd["align_masked_video.conv.bias"]),
            },
            "layer_norm": _norm(sd, "align_masked_video.layer_norm", bias=True),
            "gate": jnp.asarray(sd["align_masked_video.gate"]),
        },
        "embed_anchors": {
            "embed": {"weight": jnp.asarray(sd["embed_anchors.embed.weight"])},
            "gate": jnp.asarray(sd["embed_anchors.gate"]),
            "proj": _linear(sd, "embed_anchors.proj"),
        },
        "memory_proj": _linear(sd, "memory_proj"),
    }
    return params


class _TrackedStateDict(dict):
    """Dict wrapper recording which keys the converters consume, so the
    full-model conversion can verify COVERAGE: a renamed or extra module in
    checkpoint.pt must fail loudly, not be silently dropped (the tower
    converters already do this via explicit unconverted-key checks)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.accessed: set = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.accessed.add(k)
        return super().get(k, default)


def convert_sam_audio_state_dict(sd: Dict[str, np.ndarray],
                                 cfg: SAMAudioConfig, strict: bool = True):
    """checkpoint.pt state_dict -> params pytree. With `strict` (default),
    raises if any key is neither consumed by the converters nor matched by
    SKIP_REGEX (towers that load from their own repos, reference
    model.py:352-355) — silent key drops would produce a wrong model."""
    tracked = _TrackedStateDict(sd)
    params = {
        "audio_codec": convert_dacvae(tracked, cfg.audio_codec, "audio_codec")
    }
    params.update(convert_conditioning(tracked, cfg))
    if strict:
        unused = sorted(k for k in sd
                        if k not in tracked.accessed and not SKIP_REGEX.match(k))
        if unused:
            raise ValueError(
                f"convert_sam_audio_state_dict: {len(unused)} checkpoint "
                f"key(s) were not consumed by the converter and do not match "
                f"the tower skip policy — a renamed/extra module would be "
                f"silently dropped. First offenders: {unused[:20]}. Fix the "
                f"layout mapping or pass strict=False to ignore.")
    return params


def convert_t5_state_dict(sd: Dict[str, np.ndarray], cfg: T5EncoderConfig):
    """HF T5EncoderModel state_dict -> our t5 params (HF splits heads
    contiguously; no permutation needed)."""
    blocks = []
    for i in range(cfg.num_layers):
        bp = f"encoder.block.{i}"
        blocks.append(
            {
                "attn": {
                    "q": _linear(sd, f"{bp}.layer.0.SelfAttention.q", bias=False),
                    "k": _linear(sd, f"{bp}.layer.0.SelfAttention.k", bias=False),
                    "v": _linear(sd, f"{bp}.layer.0.SelfAttention.v", bias=False),
                    "o": _linear(sd, f"{bp}.layer.0.SelfAttention.o", bias=False),
                    "layer_norm": _norm(sd, f"{bp}.layer.0.layer_norm"),
                },
                "ff": {
                    "wi": _linear(sd, f"{bp}.layer.1.DenseReluDense.wi", bias=False),
                    "wo": _linear(sd, f"{bp}.layer.1.DenseReluDense.wo", bias=False),
                    "layer_norm": _norm(sd, f"{bp}.layer.1.layer_norm"),
                },
            }
        )

    emb_key = "shared.weight" if "shared.weight" in sd else "encoder.embed_tokens.weight"
    return {
        "token_embedding": {"weight": jnp.asarray(sd[emb_key])},
        "relative_attention_bias": {
            "weight": jnp.asarray(
                sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
            )
        },
        "blocks": _stack_layer_trees(blocks),
        "final_layer_norm": _norm(sd, "encoder.final_layer_norm"),
    }



def split_fused_qkv(weight, bias=None):
    """Split a torch fused qkv projection ((3*dim, dim) weight, optional
    (3*dim,) bias — nn.MultiheadAttention in_proj / timm qkv) into
    {"wq","wk","wv"} linear param dicts."""
    w = np.asarray(weight)
    wq, wk, wv = np.split(w, 3, axis=0)
    out = {"wq": {"weight": jnp.asarray(wq)},
           "wk": {"weight": jnp.asarray(wk)},
           "wv": {"weight": jnp.asarray(wv)}}
    if bias is not None:
        bq, bk, bv = np.split(np.asarray(bias), 3, axis=0)
        out["wq"]["bias"] = jnp.asarray(bq)
        out["wk"]["bias"] = jnp.asarray(bk)
        out["wv"]["bias"] = jnp.asarray(bv)
    return out


# ---------------------------------------------------------------------------
# PE-AV tower conversion (layout-sniffing)
# ---------------------------------------------------------------------------

_PEAV_LAYER_RE = re.compile(
    r"^((?:encoder\.)?(?:transformer\.)?(?:layers|layer|blocks|resblocks|h))\.(\d+)\."
)

# (q, k, v, out) projection name templates relative to a layer root.
_PEAV_ATTN_SCHEMES = [
    ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj", "self_attn.out_proj"),
    ("attn.q_proj", "attn.k_proj", "attn.v_proj", "attn.out_proj"),
    ("attention.q_proj", "attention.k_proj", "attention.v_proj", "attention.out_proj"),
    ("attention.wq", "attention.wk", "attention.wv", "attention.wo"),
    ("attn.wq", "attn.wk", "attn.wv", "attn.wo"),
    ("attention.self.query", "attention.self.key", "attention.self.value",
     "attention.output.dense"),
]
# fused qkv variants: (qkv, out)
_PEAV_FUSED_SCHEMES = [
    ("attn.qkv", "attn.proj"),
    ("attn.Wqkv", "attn.Wo"),
    ("self_attn.qkv_proj", "self_attn.out_proj"),
]
# (ln1, ln2, prenorm)
_PEAV_NORM_SCHEMES = [
    ("ln_1", "ln_2", True),
    ("norm1", "norm2", True),
    ("norm_1", "norm_2", True),  # imagebind BlockWithMasking
    ("layer_norm1", "layer_norm2", True),
    ("self_attn_layer_norm", "final_layer_norm", True),
    ("attention_norm", "ffn_norm", True),
    ("input_layernorm", "post_attention_layernorm", True),
    ("attention.output.LayerNorm", "output.LayerNorm", False),
]
# MLP: 2-tuple = fc1/fc2 (+act from cfg), 3-tuple = swiglu gate/down/up
_PEAV_MLP_SCHEMES = [
    ("mlp.fc1", "mlp.fc2"),
    ("fc1", "fc2"),
    ("mlp.c_fc", "mlp.c_proj"),
    ("mlp.lin1", "mlp.lin2"),
    ("intermediate.dense", "output.dense"),
    ("feed_forward.w1", "feed_forward.w2", "feed_forward.w3"),
    ("mlp.w1", "mlp.w2", "mlp.w3"),
    ("mlp.gate_proj", "mlp.down_proj", "mlp.up_proj"),
    ("feed_forward.gate_proj", "feed_forward.down_proj", "feed_forward.up_proj"),
]
_PEAV_POS_KEYS = ["pos_embed", "positional_embedding", "pos_emb",
                  "embed_positions.weight", "pos_embedding"]
_PEAV_PRE_NORM_KEYS = ["ln_pre", "layernorm_embedding", "norm_pre", "emb_ln"]
_PEAV_FINAL_NORM_KEYS = ["final_layer_norm", "final_norm", "norm", "ln_post",
                         "ln_final", "layer_norm", "encoder.final_layer_norm",
                         "encoder.norm", "encoder.layer_norm"]
# recomputed buffers: consume silently, never report as unconverted
_PEAV_IGNORE_RE = re.compile(
    r"(position_ids|attn\.bias|attn\.masked_bias|num_batches_tracked)$"
)
# rotary buffers: recomputed too, but their presence flips the tower's
# positional mode to "rope" (see convert_peav_tower)
_PEAV_ROTARY_RE = re.compile(r"(rotary.*\.inv_freq|\binv_freq|freqs_cis)$")


def convert_peav_tower(sd: Dict[str, np.ndarray], prefix: str, cfg,
                       arch_overrides: Optional[Dict[str, str]] = None):
    """Map a perception-models PE-AV `Transformer` state_dict (reference
    judge.py:46-47) onto our canonical PE-AV pytree, sniffing the block naming
    style (fairseq/HF q_proj, timm fused qkv, CLIP resblocks/in_proj,
    llama wq/swiglu, BERT post-LN) from the keys.

    Returns (params, arch, unconverted): `arch` holds the sniffed switches for
    PEAVTransformerConfig {prenorm, act, pos}; `unconverted` lists keys under
    `prefix` that did not map (empty == fully weight-compatible).

    KNOWN AMBIGUITY: a bias-free nn.LayerNorm and an RMSNorm carry identical
    state-dict keys (weight only), so the norm sniff defaults such blocks to
    rmsnorm — if the source used LayerNorm(bias=False) (some newer timm /
    perception variants), pass `arch_overrides={"norm": "layernorm"}` (the
    SAM_AUDIO_PEAV_ARCH env var takes `key=value,key=value` for the CLI
    path) and validate against a reference activation.
    """
    sub = {k[len(prefix):]: np.asarray(v) for k, v in sd.items()
           if k.startswith(prefix)}
    consumed = set()

    def have(k):
        return k in sub

    def take(k):
        consumed.add(k)
        return jnp.asarray(sub[k])

    def take_linear(base):
        p = {"weight": take(f"{base}.weight")}
        if have(f"{base}.bias"):
            p["bias"] = take(f"{base}.bias")
        return p

    def take_norm(base):
        p = {"weight": take(f"{base}.weight")}
        if have(f"{base}.bias"):
            p["bias"] = take(f"{base}.bias")
        return p

    container, n_layers = None, 0
    for k in sub:
        m = _PEAV_LAYER_RE.match(k)
        if m:
            container = m.group(1)
            n_layers = max(n_layers, int(m.group(2)) + 1)
    if container is None:
        raise ValueError(f"no transformer layer keys under {prefix!r}")

    arch = {"prenorm": True, "act": getattr(cfg, "act", "gelu_tanh"),
            "pos": getattr(cfg, "pos", "sinusoidal")}
    layers = []
    for i in range(n_layers):
        L = f"{container}.{i}"
        lp = {}

        attn = None
        for qn, kn, vn, on in _PEAV_ATTN_SCHEMES:
            if have(f"{L}.{qn}.weight"):
                attn = {"wq": take_linear(f"{L}.{qn}"),
                        "wk": take_linear(f"{L}.{kn}"),
                        "wv": take_linear(f"{L}.{vn}"),
                        "wo": take_linear(f"{L}.{on}")}
                break
        if attn is None:
            for qkvn, on in _PEAV_FUSED_SCHEMES:
                if have(f"{L}.{qkvn}.weight"):
                    attn = split_fused_qkv(
                        take(f"{L}.{qkvn}.weight"),
                        take(f"{L}.{qkvn}.bias")
                        if have(f"{L}.{qkvn}.bias") else None)
                    attn["wo"] = take_linear(f"{L}.{on}")
                    break
        if attn is None and have(f"{L}.attn.in_proj_weight"):
            # torch nn.MultiheadAttention (CLIP style)
            attn = split_fused_qkv(
                take(f"{L}.attn.in_proj_weight"),
                take(f"{L}.attn.in_proj_bias")
                if have(f"{L}.attn.in_proj_bias") else None)
            attn["wo"] = take_linear(f"{L}.attn.out_proj")
        if attn is None:
            raise ValueError(f"unrecognized attention layout in {prefix}{L}")
        for norm_name, slot in (("q_norm", "q_norm"), ("k_norm", "k_norm"),
                                ("q_ln", "q_norm"), ("k_ln", "k_norm")):
            for root in ("attn", "self_attn", "attention"):
                if have(f"{L}.{root}.{norm_name}.weight"):
                    attn[slot] = take_norm(f"{L}.{root}.{norm_name}")
        lp["attn"] = attn

        norms = None
        for n1, n2, prenorm in _PEAV_NORM_SCHEMES:
            if have(f"{L}.{n1}.weight"):
                norms = (take_norm(f"{L}.{n1}"), take_norm(f"{L}.{n2}"))
                arch["prenorm"] = prenorm
                break
        if norms is None:
            raise ValueError(f"unrecognized layer norms in {prefix}{L}")
        lp["ln1"], lp["ln2"] = norms
        # affine bias present => LayerNorm; bare scale => RMSNorm. NOTE:
        # LayerNorm(bias=False) is key-indistinguishable from RMSNorm and
        # lands on rmsnorm here — overridable via arch_overrides /
        # SAM_AUDIO_PEAV_ARCH (see docstring).
        arch["norm"] = "layernorm" if "bias" in norms[0] else "rmsnorm"

        mlp = None
        for scheme in _PEAV_MLP_SCHEMES:
            if have(f"{L}.{scheme[0]}.weight"):
                if len(scheme) == 2:
                    mlp = {"fc1": take_linear(f"{L}.{scheme[0]}"),
                           "fc2": take_linear(f"{L}.{scheme[1]}")}
                else:
                    mlp = {"w1": take_linear(f"{L}.{scheme[0]}"),
                           "w2": take_linear(f"{L}.{scheme[1]}"),
                           "w3": take_linear(f"{L}.{scheme[2]}")}
                    arch["act"] = "swiglu"
                break
        if mlp is None:
            raise ValueError(f"unrecognized MLP layout in {prefix}{L}")
        lp["mlp"] = mlp

        for ls_name, slot in (("ls1.gamma", "ls1"), ("ls2.gamma", "ls2"),
                              ("gamma_1", "ls1"), ("gamma_2", "ls2"),
                              ("layer_scale_gamma1", "ls1"),
                              ("layer_scale_gamma2", "ls2")):
            if have(f"{L}.{ls_name}"):
                lp[slot] = take(f"{L}.{ls_name}").reshape(-1)
        # torch MultiheadAttention add_bias_kv: learned kv-token appended
        # after projection (imagebind audio trunk)
        for bkv in ("bias_k", "bias_v"):
            for root in ("attn", "self_attn"):
                if have(f"{L}.{root}.{bkv}"):
                    lp["attn"][bkv] = take(f"{L}.{root}.{bkv}").reshape(-1)
        layers.append(lp)

    params = {"layers": _stack_layer_trees(layers)}
    for key in _PEAV_POS_KEYS:
        if have(key):  # raw nn.Parameter table
            params["pos_embed"] = take(key)
            arch["pos"] = "learned"
            break
        if have(f"{key}.weight"):  # nn.Embedding table
            params["pos_embed"] = take(f"{key}.weight")
            arch["pos"] = "learned"
            break
    for key in _PEAV_PRE_NORM_KEYS:
        if have(f"{key}.weight"):
            params["ln_pre"] = take_norm(key)
            break
    for key in _PEAV_FINAL_NORM_KEYS:
        if have(f"{key}.weight"):
            params["final_norm"] = take_norm(key)
            break

    # rotary buffers imply a RoPE tower: set the executor's pos mode and
    # derive theta from inv_freq (inv_freq[i] = theta^(-2i/d)) so the
    # position encoding actually executes rather than being silently dropped
    rope_keys = [k for k in sub if k not in consumed
                 and _PEAV_ROTARY_RE.search(k)]
    if rope_keys and arch["pos"] != "learned":
        arch["pos"] = "rope"
        inv_key = next((k for k in rope_keys if k.endswith("inv_freq")), None)
        if inv_key is not None:
            inv = np.asarray(sub[inv_key]).reshape(-1)
            if inv.size >= 2 and 0.0 < float(inv[1]) < 1.0:
                d = 2 * inv.size
                arch["rope_theta"] = float(inv[1] ** (-d / 2.0))
    for k in rope_keys:
        consumed.add(k)

    for k in list(sub):
        if k not in consumed and _PEAV_IGNORE_RE.search(k):
            consumed.add(k)
    unconverted = sorted(prefix + k for k in sub if k not in consumed)
    # explicit overrides win over sniffing (bias-free LayerNorm vs RMSNorm is
    # key-indistinguishable — see the docstring); env var covers CLI paths
    env = os.environ.get("SAM_AUDIO_PEAV_ARCH", "")
    if env:
        for kv in env.split(","):
            k, _, v = kv.partition("=")
            if k.strip():
                arch[k.strip()] = v.strip()
    if arch_overrides:
        arch.update(arch_overrides)
    return params, arch, unconverted


def convert_judge_state_dict(sd: Dict[str, np.ndarray], cfg,
                             return_arch: bool = False):
    """Reference SAMAudioJudgeModel state_dict -> our judge params
    (cfg: SAMAudioJudgeConfig; reference judge.py:39-72).

    Converts the codec encoder, ModernBERT text tower, both PE-AV transformer
    towers (layout-sniffed via convert_peav_tower), and all fusion
    projections. Returns (params, unconverted); with return_arch=True also
    returns {tower: arch} so the caller can set the PEAVTransformerConfig
    switches (prenorm/act/pos) to match the checkpoint.
    """
    from sam_audio_tpu.models.modernbert import convert_modernbert_state_dict

    tower, tower_arch, tower_left = convert_peav_tower(sd, "transformer.",
                                                       cfg.transformer)
    ft, ft_arch, ft_left = convert_peav_tower(sd, "finetune_transformer.",
                                              cfg.finetune_transformer)
    params = {
        "transformer": tower,
        "finetune_transformer": ft,
        "audio_codec": convert_dacvae(sd, cfg.audio_codec, "audio_codec",
                                      with_decoder=False),
        "data_proj": _linear(sd, "data_proj"),
        "text_model": convert_modernbert_state_dict(sd, cfg.text_model,
                                                    prefix="text_model."),
        "cat_audio_proj": _linear(sd, "cat_audio_proj"),
        "text_proj1": _linear(sd, "text_proj1", bias=False),
        "text_proj2": _linear(sd, "text_proj2"),
        "layer_norm": _norm(sd, "layer_norm", bias=True),
        "proj_audio_and_text": _linear(sd, "proj_audio_and_text"),
        "finetune_data_proj": _linear(sd, "finetune_data_proj"),
        "head": _linear(sd, "head", bias=False),
        "mean": jnp.asarray(sd["mean"]),
        "std": jnp.asarray(sd["std"]),
    }
    unconverted = sorted(tower_left + ft_left)
    if return_arch:
        return params, unconverted, {"transformer": tower_arch,
                                     "finetune_transformer": ft_arch}
    return params, unconverted


# ---------------------------------------------------------------------------
# End-to-end loading
# ---------------------------------------------------------------------------


def _load_torch_state_dict(path: str, key: Optional[str] = None
                           ) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint as numpy. `key` unwraps containers like
    laion_clap's {'state_dict': ...} (reference ranking/clap.py:20-22)."""
    import torch

    sd = torch.load(path, weights_only=True, map_location="cpu")
    if key is not None and key in sd:
        sd = sd[key]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_sam_audio(model_id_or_path: str, t5_path: Optional[str] = None,
                   revision: Optional[str] = None,
                   allow_random_towers: bool = False,
                   **config_overrides):
    """Load from a local snapshot dir (config.json + checkpoint.pt or
    params.npz) or an HF repo id. Returns a models.sam_audio.SAMAudio.

    `revision` pins the HF snapshot revision, mirroring the reference's
    `BaseModel._from_pretrained(revision=...)` (sam_audio/model/base.py:27-45;
    e.g. the judge lives at revision "sam_audio"). `allow_random_towers=True`
    (tests only) lets missing sub-towers (T5, ranker weights) fall back to
    random init instead of raising."""
    from sam_audio_tpu.models.sam_audio import SAMAudio, sam_audio_init
    from sam_audio_tpu.ranking import create_ranker
    import jax

    if os.path.isdir(model_id_or_path):
        snapshot = model_id_or_path
    else:
        from huggingface_hub import snapshot_download

        from sam_audio_tpu.text_tokenizer import hub_reachable

        # serve straight from the local HF cache when the hub is unreachable
        # (air-gapped TPU hosts) instead of paying the download retry backoff
        snapshot = snapshot_download(repo_id=model_id_or_path,
                                     revision=revision,
                                     local_files_only=not hub_reachable())

    with open(os.path.join(snapshot, "config.json")) as fin:
        cfg_dict = json.load(fin)
    cfg_dict.update(config_overrides)
    cfg = SAMAudioConfig.from_dict(cfg_dict)

    npz = os.path.join(snapshot, "params.npz")
    pt = os.path.join(snapshot, "checkpoint.pt")
    if os.path.exists(npz):
        params = load_params(npz)
    elif os.path.exists(pt):
        sd = _load_torch_state_dict(pt)
        params = convert_sam_audio_state_dict(sd, cfg)
    else:
        raise FileNotFoundError(f"No params.npz or checkpoint.pt in {snapshot}")

    # Text tower ships separately (reference model.py:346-359). Convert it if
    # available locally, else random-init (tests).
    if t5_path is not None:
        t5sd = _load_torch_state_dict(t5_path)
        params["text_encoder"] = convert_t5_state_dict(t5sd, cfg.text_encoder)
    elif "text_encoder" not in params:
        try:
            from transformers import T5EncoderModel

            try:  # local/cached first: no network-retry stalls when air-gapped
                m = T5EncoderModel.from_pretrained(
                    cfg.text_encoder.name, local_files_only=True
                )
            except Exception:
                from sam_audio_tpu.text_tokenizer import hub_reachable

                if not hub_reachable():  # fail over in ~2 s, not ~40 s/file
                    raise
                m = T5EncoderModel.from_pretrained(cfg.text_encoder.name)
            t5sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
            params["text_encoder"] = convert_t5_state_dict(t5sd, cfg.text_encoder)
        except Exception:
            if not allow_random_towers:
                raise FileNotFoundError(
                    f"T5 text tower '{cfg.text_encoder.name}' is not available "
                    "locally and no t5_path= was given. Stage the HF weights "
                    "(or convert with scripts/convert_checkpoint.py t5) — the "
                    "reference always loads the real T5 "
                    "(sam_audio/model/text_encoder.py:14). Pass "
                    "allow_random_towers=True only for tests."
                )
            params["text_encoder"] = sam_audio_init(
                jax.random.PRNGKey(0), cfg
            )["text_encoder"]

    # Span predictor: a checkpoint placed in the snapshot under
    # span_predictor/ (params.npz + config.json) attaches automatically.
    # Two arches dispatch on config.json's "arch" tag: the TPU-native
    # predictor trained here (train/span.py writes "sam_audio_tpu_span"),
    # or — untagged — a converted PEAudioFrame checkpoint (the weight-
    # faithful executor for the reference's "pe-a-frame-large",
    # reference model.py:96-102). Otherwise separate(predict_spans=True)
    # requires attaching one explicitly.
    span_predictor = None
    sp_dir = os.path.join(snapshot, "span_predictor")
    if cfg.span_predictor is not None and os.path.exists(
        os.path.join(sp_dir, "params.npz")
    ):
        import dataclasses

        sp_cfg_path = os.path.join(sp_dir, "config.json")
        raw = {}
        if os.path.exists(sp_cfg_path):
            with open(sp_cfg_path) as fin:
                raw = json.load(fin)
        sp_params = load_params(os.path.join(sp_dir, "params.npz"))
        if raw.get("arch") == "sam_audio_tpu_span":
            from sam_audio_tpu.models.span_predictor import (
                SpanPredictor,
                SpanPredictorConfig,
            )

            known = {f.name for f in dataclasses.fields(SpanPredictorConfig)}
            span_predictor = SpanPredictor(
                SpanPredictorConfig(
                    **{k: v for k, v in raw.items() if k in known}),
                sp_params,
            )
        else:
            from sam_audio_tpu.models.span_predictor import (
                PEAudioFrameConfig,
                PEAudioFrameModel,
            )

            known = {f.name for f in dataclasses.fields(PEAudioFrameConfig)}
            span_predictor = PEAudioFrameModel(
                PEAudioFrameConfig(
                    **{k: v for k, v in raw.items() if k in known}),
                sp_params,
            )

    model = SAMAudio(
        cfg, params,
        visual_ranker=create_ranker(cfg.visual_ranker,
                                    allow_random=allow_random_towers),
        text_ranker=create_ranker(cfg.text_ranker,
                                  allow_random=allow_random_towers),
        span_predictor=span_predictor,
        allow_random_towers=allow_random_towers,
    )
    if not allow_random_towers:
        # Resolve the text tokenizer NOW so a missing tokenizer fails at
        # load time with staging instructions, not mid-separate() — real
        # weights must never silently condition on byte-fallback token ids
        # (reference sam_audio/model/text_encoder.py:14-15 always loads the
        # real HF tokenizer).
        model.tokenizer
    return model
