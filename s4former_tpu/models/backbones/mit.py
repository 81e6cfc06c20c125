"""MixVisionTransformer (SegFormer MiT) backbone, flax/NHWC.

Rebuild of the reference MiT (reference: mmseg/models/backbones/mit.py):
4 stages of [overlapping patch embed -> N x (EfficientMHA + MixFFN) -> LN],
efficient attention reduces K/V spatially by ``sr_ratio`` (conv k=s=sr +
LN). PASA wiring follows the reference's intent (mit.py:460-491): the
additive mask is built from per-patch (un)confidence — the adaptive
variant INVERTS it (``1 - unconf``, mit.py:468-471) — and is applied only
in blocks whose ``sr_ratio == 1`` (mit.py:294-300; K/V-reduced blocks skip
it). Divergence, documented: the reference builds the mask at one fixed
grid which shape-mismatches most stages; we pool the confidence to each
applicable stage's own token grid so the bias is well-defined everywhere.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.ops.attention import dot_product_attention
from s4former_tpu.registry import BACKBONES

Array = jax.Array


class EfficientAttention(nn.Module):
    """(mit.py:60-200): MHA with optional K/V spatial reduction."""
    embed_dims: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int],
                 attn_bias: Optional[Array] = None) -> Array:
        b, l, c = x.shape
        h = self.num_heads
        q = nn.Dense(c, use_bias=self.qkv_bias, name='q',
                     dtype=self.dtype)(x)
        kv_in = x
        if self.sr_ratio > 1:
            sr = self.sr_ratio
            xs = x.reshape(b, hw[0], hw[1], c)
            xs = nn.Conv(c, (sr, sr), strides=(sr, sr), padding='VALID',
                         name='sr', dtype=self.dtype)(xs)
            kv_in = xs.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-6, name='sr_norm',
                                 dtype=jnp.float32)(kv_in)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, name='kv',
                      dtype=self.dtype)(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        lk = k.shape[1]
        qh = q.reshape(b, l, h, c // h)
        kh = k.reshape(b, lk, h, c // h)
        vh = v.reshape(b, lk, h, c // h)
        bias = None
        if attn_bias is not None and self.sr_ratio == 1:
            bias = attn_bias  # [B, 1, L, L]
        out, _ = dot_product_attention(qh, kh, vh, bias)
        out = out.reshape(b, l, c)
        return nn.Dense(c, name='proj', dtype=self.dtype)(out)


class MixFFN(nn.Module):
    """(mit.py:24-58): fc1 -> depthwise 3x3 conv -> GELU -> fc2."""
    embed_dims: int
    feedforward_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int]) -> Array:
        b, l, c = x.shape
        y = nn.Dense(self.feedforward_channels, name='fc1',
                     dtype=self.dtype)(x)
        y = y.reshape(b, hw[0], hw[1], self.feedforward_channels)
        y = nn.Conv(self.feedforward_channels, (3, 3), padding=1,
                    feature_group_count=self.feedforward_channels,
                    name='dwconv', dtype=self.dtype)(y)
        y = y.reshape(b, l, self.feedforward_channels)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.embed_dims, name='fc2', dtype=self.dtype)(y)


class MiTBlock(nn.Module):
    embed_dims: int
    num_heads: int
    mlp_ratio: int
    sr_ratio: int
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int],
                 attn_bias: Optional[Array] = None,
                 deterministic: bool = True) -> Array:
        def droppath(y):
            if self.drop_path_rate > 0 and not deterministic:
                keep = 1.0 - self.drop_path_rate
                rng = self.make_rng('dropout')
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
                return jnp.where(mask, y / keep, 0.0)
            return y

        y = nn.LayerNorm(epsilon=1e-6, name='norm1', dtype=jnp.float32)(x)
        y = EfficientAttention(self.embed_dims, self.num_heads,
                               self.sr_ratio, self.qkv_bias,
                               dtype=self.dtype, name='attn')(
                                   y, hw, attn_bias)
        x = x + droppath(y)
        z = nn.LayerNorm(epsilon=1e-6, name='norm2', dtype=jnp.float32)(x)
        z = MixFFN(self.embed_dims, self.mlp_ratio * self.embed_dims,
                   dtype=self.dtype, name='ffn')(z, hw)
        return x + droppath(z)


class OverlapPatchEmbed(nn.Module):
    embed_dims: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        pad = self.kernel // 2
        x = nn.Conv(self.embed_dims, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    name='proj', dtype=self.dtype)(x)
        b, hh, ww, c = x.shape
        tokens = x.reshape(b, hh * ww, c)
        tokens = nn.LayerNorm(epsilon=1e-6, name='norm',
                              dtype=jnp.float32)(tokens)
        return tokens, (hh, ww)


@BACKBONES.register_module()
class MixVisionTransformer(nn.Module):
    """4-stage MiT; returns NHWC feature maps at out_indices."""
    in_channels: int = 3
    embed_dims: int = 64
    num_stages: int = 4
    num_layers: Sequence[int] = (3, 4, 6, 3)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    mlp_ratio: int = 4
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # PASA flags (reference passes them per-forward from the segmentor,
    # mit.py:460; here they are module config, propagated from the
    # segmentor cfg by build_segmentor)
    attn_mask_weight: float = 1.0
    adaptive_attn_mask: bool = False
    # parity/no-op config keys
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    with_cp: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False,
                 attn_bias: Optional[Array] = None,
                 pos_mode: str = 'default',
                 use_fdrop: bool = False,
                 return_attn: bool = False):
        """``attn_bias`` here is the RAW PASA per-pixel UNCONFIDENCE map
        [B, H, W] in [0, 1] at input resolution (NOT the ViT token-bias):
        each sr_ratio==1 stage pools it to its own token grid and builds
        its bias via ``semi.pasa.mit_stage_bias`` (scaling by
        ``attn_mask_weight`` and the reference's inverted adaptive
        variant, mit.py:464-475). Stages with sr_ratio > 1 skip the bias —
        documented divergence: the reference passes one full-resolution
        [B, L, L] mask to every stage, whose shape can only match the
        sr==1 stage (mit.py:477-483).
        """
        del pos_mode  # MiT has no positional embedding (conv pos enc)
        dims = [self.embed_dims * m for m in (1, 2, 5, 8)][:self.num_stages]
        total_blocks = sum(self.num_layers)
        dpr = [self.drop_path_rate * i / max(total_blocks - 1, 1)
               for i in range(total_blocks)]
        outs = []
        cur = 0
        for s in range(self.num_stages):
            tokens, hw = OverlapPatchEmbed(
                dims[s], self.patch_sizes[s], self.strides[s],
                dtype=self.dtype, name=f'patch_embed_{s}')(x)
            bias = None
            if attn_bias is not None and self.sr_ratios[s] == 1:
                from s4former_tpu.semi.pasa import mit_stage_bias
                b = attn_bias.shape[0]
                ph = attn_bias.shape[1] // hw[0]
                pw = attn_bias.shape[2] // hw[1]
                vec = jnp.mean(
                    attn_bias.reshape(b, hw[0], ph, hw[1], pw),
                    axis=(2, 4)).reshape(b, hw[0] * hw[1])
                bias = mit_stage_bias(vec, self.attn_mask_weight,
                                      self.adaptive_attn_mask)
            for blk in range(self.num_layers[s]):
                tokens = MiTBlock(
                    dims[s], self.num_heads[s], self.mlp_ratio,
                    self.sr_ratios[s], self.qkv_bias,
                    drop_path_rate=dpr[cur + blk], dtype=self.dtype,
                    name=f'stage_{s}_block_{blk}')(
                        tokens, hw, bias, deterministic=not train)
            tokens = nn.LayerNorm(epsilon=1e-6, name=f'norm_{s}',
                                  dtype=jnp.float32)(tokens)
            x = tokens.reshape(tokens.shape[0], hw[0], hw[1], dims[s])
            cur += self.num_layers[s]
            if s in self.out_indices:
                out = x
                if use_fdrop:
                    rng = self.make_rng('fdrop')
                    keep = jax.random.bernoulli(
                        rng, 0.5, (x.shape[0], 1, 1, x.shape[-1]))
                    out = jnp.where(keep, out * 2.0, 0.0)
                outs.append(out)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)
