"""Key-faithful torch oracle of imagebind_huge's audio/vision branches
(facebookresearch/ImageBind state_dict naming: modality_preprocessors.X
.rgbt_stem/cls_token/pos_embedding_helper, modality_trunks.X.blocks.{i}
.attn (torch MultiheadAttention incl. add_bias_kv)/norm_1/norm_2/mlp
/layer_scale_gamma*, modality_heads.X.{0,2})."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class IBMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class IBBlock(nn.Module):
    def __init__(self, dim, heads, bias_kv=False, ls_init=None):
        super().__init__()
        self.attn = nn.MultiheadAttention(dim, heads, add_bias_kv=bias_kv,
                                          batch_first=True)
        self.norm_1 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = IBMlp(dim, 4 * dim)
        self.norm_2 = nn.LayerNorm(dim, eps=1e-6)
        if ls_init is not None:
            self.layer_scale_gamma1 = nn.Parameter(
                torch.ones(1, 1, dim) * ls_init
            )
            self.layer_scale_gamma2 = nn.Parameter(
                torch.ones(1, 1, dim) * ls_init
            )

    def forward(self, x):
        a = self.attn(self.norm_1(x), self.norm_1(x), self.norm_1(x),
                      need_weights=False)[0]
        if hasattr(self, "layer_scale_gamma1"):
            a = a * self.layer_scale_gamma1
        x = x + a
        m = self.mlp(self.norm_2(x))
        if hasattr(self, "layer_scale_gamma2"):
            m = m * self.layer_scale_gamma2
        return x + m


class IBTrunk(nn.Module):
    def __init__(self, dim, layers, heads, bias_kv=False, ls_init=None,
                 pre_ln=False):
        super().__init__()
        self.pre_transformer_layer = nn.Sequential(
            nn.LayerNorm(dim, eps=1e-6) if pre_ln else nn.Identity()
        )
        self.blocks = nn.ModuleList([
            IBBlock(dim, heads, bias_kv, ls_init) for _ in range(layers)
        ])

    def forward(self, x):
        x = self.pre_transformer_layer(x)
        for blk in self.blocks:
            x = blk(x)
        return x


class IBStem(nn.Module):
    """PatchEmbedGeneric: proj Sequential (+ optional norm_layer)."""

    def __init__(self, conv, conv_index=0, norm_dim=None):
        super().__init__()
        mods = [nn.Identity()] * conv_index + [conv]
        self.proj = nn.Sequential(*mods)
        if norm_dim is not None:
            self.norm_layer = nn.LayerNorm(norm_dim)

    def forward(self, x):
        x = self.proj(x)
        x = x.flatten(2).transpose(1, 2)
        if hasattr(self, "norm_layer"):
            x = self.norm_layer(x)
        return x


class IBPreprocessor(nn.Module):
    def __init__(self, stem, dim, n_tokens):
        super().__init__()
        self.rgbt_stem = stem
        self.cls_token = nn.Parameter(0.02 * torch.randn(1, 1, dim))
        self.pos_embedding_helper = nn.Module()
        self.pos_embedding_helper.pos_embed = nn.Parameter(
            0.02 * torch.randn(1, n_tokens + 1, dim)
        )

    def forward(self, x):
        tokens = self.rgbt_stem(x)
        b = tokens.shape[0]
        x = torch.cat([self.cls_token.expand(b, -1, -1), tokens], dim=1)
        return x + self.pos_embedding_helper.pos_embed


class IBBranch(nn.Module):
    """One modality branch: preprocessor -> trunk -> head -> normalize."""

    def __init__(self, pre, trunk, dim, embed_dim):
        super().__init__()
        self.pre = pre
        self.trunk = trunk
        self.head = nn.Sequential(
            nn.LayerNorm(dim, eps=1e-6), nn.Identity(),
            nn.Linear(dim, embed_dim, bias=False),
        )

    def forward(self, x):
        # per-clip embedding WITHOUT normalization: imagebind normalizes
        # after the clip-mean reduction
        x = self.trunk(self.pre(x))
        x = self.head[0](x)[:, 0]
        return self.head[2](x)


def tiny_imagebind(seed=0):
    """Tiny two-branch model with the exact imagebind key layout."""
    torch.manual_seed(seed)
    audio_conv = nn.Conv2d(1, 32, kernel_size=16, stride=10, bias=False)
    audio_pre = IBPreprocessor(
        IBStem(audio_conv, conv_index=0, norm_dim=32), 32, n_tokens=4 * 5
    )
    audio = IBBranch(audio_pre,
                     IBTrunk(32, 2, 4, bias_kv=True, ls_init=1e-1), 32, 16)
    vision_conv = nn.Conv3d(3, 32, kernel_size=(2, 14, 14),
                            stride=(2, 14, 14), bias=False)
    vision_pre = IBPreprocessor(IBStem(vision_conv, conv_index=1), 32,
                                n_tokens=2 * 2)
    vision = IBBranch(vision_pre, IBTrunk(32, 2, 4, pre_ln=True), 32, 16)

    model = nn.Module()
    model.modality_preprocessors = nn.ModuleDict(
        {"audio": audio.pre, "vision": vision.pre}
    )
    model.modality_trunks = nn.ModuleDict(
        {"audio": audio.trunk, "vision": vision.trunk}
    )
    model.modality_heads = nn.ModuleDict(
        {"audio": audio.head, "vision": vision.head}
    )
    post = nn.Module()
    post.register_buffer("log_logit_scale", torch.tensor(3.0))
    model.modality_postprocessors = nn.ModuleDict(
        {"audio": nn.Sequential(nn.Identity(), post),
         "vision": nn.Sequential(nn.Identity())}
    )
    return model, audio, vision
