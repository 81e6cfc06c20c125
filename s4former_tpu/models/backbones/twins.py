"""Twins backbones: PCPVT and SVT.

Rebuild of (reference: mmseg/models/backbones/twins.py:588 LoC):
- PCPVT: pyramid ViT with PVT-style spatial-reduction attention (GSA) and
  conditional position encoding (PEG = stride-1 depthwise conv after the
  first block of every stage, no learned pos embed).
- SVT: alternates locally-grouped self-attention (LSA, windowed) with GSA.

NHWC/flax; attention through jnp einsums (these backbones run at pyramid
resolutions where L is small; the Pallas flash kernel targets the ViT
1025-token stack).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.registry import BACKBONES

Array = jax.Array


class _MLP(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(nn.Dense(self.hidden, name='fc1')(x),
                    approximate=False)
        return nn.Dense(self.out, name='fc2')(x)


class GSA(nn.Module):
    """Global sub-sampled attention (= PVT SRA): keys/values from an
    sr_ratio-strided projection of the map (twins.py GlobalSubsampledAttention)."""
    dim: int
    num_heads: int
    sr_ratio: int = 1

    @nn.compact
    def __call__(self, x: Array, hw) -> Array:
        b, l, c = x.shape
        h, w = hw
        hd = self.num_heads
        d = c // hd
        q = nn.Dense(c, name='q')(x).reshape(b, l, hd, d)
        if self.sr_ratio > 1:
            y = x.reshape(b, h, w, c)
            y = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                        strides=(self.sr_ratio, self.sr_ratio),
                        name='sr')(y)
            y = nn.LayerNorm(name='sr_norm')(
                y.reshape(b, -1, c))
        else:
            y = x
        kv = nn.Dense(2 * c, name='kv')(y)
        k, v = jnp.split(kv, 2, axis=-1)
        lk = k.shape[1]
        k = k.reshape(b, lk, hd, d)
        v = v.reshape(b, lk, hd, d)
        attn = jax.nn.softmax(
            jnp.einsum('bqhd,bkhd->bhqk', q, k) / jnp.sqrt(float(d)), -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v).reshape(b, l, c)
        return nn.Dense(c, name='proj')(out)


class LSA(nn.Module):
    """Locally-grouped self-attention: full attention inside ws x ws
    windows (twins.py LocallyGroupedSelfAttention)."""
    dim: int
    num_heads: int
    window_size: int = 7

    @nn.compact
    def __call__(self, x: Array, hw) -> Array:
        b, l, c = x.shape
        h, w = hw
        ws = self.window_size
        hd, d = self.num_heads, c // self.num_heads
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        y = x.reshape(b, h, w, c)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hh, ww = h + pad_h, w + pad_w
        gh, gw = hh // ws, ww // ws
        y = y.reshape(b, gh, ws, gw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b * gh * gw, ws * ws, c)
        qkv = nn.Dense(3 * c, name='qkv')(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        n = y.shape[0]
        q = q.reshape(n, ws * ws, hd, d)
        k = k.reshape(n, ws * ws, hd, d)
        v = v.reshape(n, ws * ws, hd, d)
        logits = jnp.einsum('bqhd,bkhd->bhqk', q, k) / jnp.sqrt(float(d))
        if pad_h or pad_w:
            # reference LSA (twins.py:195-240): -1000 on valid<->pad pairs
            # in border windows (pad<->pad pairs attend freely); static
            # from (h, w, ws), so it constant-folds
            pm = jnp.zeros((hh, ww), jnp.float32)
            pm = pm.at[h:, :].set(1.0)
            pm = pm.at[:, w:].set(1.0)
            pm = pm.reshape(gh, ws, gw, ws).transpose(0, 2, 1, 3)
            pm = pm.reshape(gh * gw, ws * ws)
            am = pm[:, :, None] - pm[:, None, :]
            am = jnp.where(am != 0, -1000.0, 0.0)
            logits = logits + jnp.tile(am, (b, 1, 1))[:, None]
        attn = jax.nn.softmax(logits, -1)
        out = jnp.einsum('bhqk,bkhd->bqhd', attn, v).reshape(n, ws * ws, c)
        out = nn.Dense(c, name='proj')(out)
        out = out.reshape(b, gh, gw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hh, ww, c)[:, :h, :w]
        return out.reshape(b, l, c)


class TwinsBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    sr_ratio: int = 1
    window_size: int = 0     # >0 -> LSA block (SVT), else GSA

    @nn.compact
    def __call__(self, x, hw):
        y = nn.LayerNorm(name='norm1')(x)
        if self.window_size > 0:
            y = LSA(self.dim, self.num_heads, self.window_size,
                    name='attn')(y, hw)
        else:
            y = GSA(self.dim, self.num_heads, self.sr_ratio,
                    name='attn')(y, hw)
        x = x + y
        z = nn.LayerNorm(name='norm2')(x)
        z = _MLP(self.dim * self.mlp_ratio, self.dim, name='mlp')(z)
        return x + z


@BACKBONES.register_module()
class PCPVT(nn.Module):
    """Twins-PCPVT (twins.py): 4 stages [patch embed -> blocks with PEG
    after block 0]. Outputs NHWC maps per stage."""
    in_channels: int = 3
    embed_dims: Sequence[int] = (64, 128, 320, 512)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (4, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    windows: Sequence[int] = (0, 0, 0, 0)   # SVT overrides (LSA windows)
    norm_after_stage: bool = True
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        b = x.shape[0]
        outs = []
        for s in range(len(self.depths)):
            p = self.patch_sizes[s]
            c = self.embed_dims[s]
            x = nn.Conv(c, (p, p), strides=(p, p), name=f'patch_embed_{s}')(x)
            h, w = x.shape[1:3]
            t = nn.LayerNorm(name=f'embed_norm_{s}')(x.reshape(b, h * w, c))
            for j in range(self.depths[s]):
                ws = self.windows[s] if j % 2 == 0 else 0  # SVT alternates
                t = TwinsBlock(c, self.num_heads[s], self.mlp_ratios[s],
                               self.sr_ratios[s], ws,
                               name=f'stage{s}_block{j}')(t, (h, w))
                if j == 0:
                    # PEG: stride-1 depthwise 3x3 conv + residual
                    m = t.reshape(b, h, w, c)
                    peg = nn.Conv(c, (3, 3), padding=1,
                                  feature_group_count=c,
                                  name=f'peg_{s}')(m)
                    t = (m + peg).reshape(b, h * w, c)
            if self.norm_after_stage:
                t = nn.LayerNorm(name=f'out_norm_{s}')(t)
            x = t.reshape(b, h, w, c)
            if s in self.out_indices:
                outs.append(x)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)


@BACKBONES.register_module()
class SVT(PCPVT):
    """Twins-SVT (twins.py): PCPVT with alternating LSA/GSA blocks."""
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    depths: Sequence[int] = (2, 2, 10, 4)
    windows: Sequence[int] = (7, 7, 7, 7)
