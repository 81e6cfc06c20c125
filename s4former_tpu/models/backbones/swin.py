"""Swin Transformer backbone (flax/NHWC).

Rebuild of the reference Swin (reference: mmseg/models/backbones/swin.py:
763 LoC — upstream zoo member; its forward accepts-and-ignores the semi
kwargs, swin.py:742-744). Windowed W-MSA/SW-MSA with relative position
bias, patch merging between stages. Window partition/shift are pure
reshapes + jnp.roll — static shapes, XLA-friendly.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.registry import BACKBONES

Array = jax.Array


def window_partition(x: Array, ws: int) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows: Array, ws: int, h: int, w: int) -> Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int):
    coords = jnp.stack(jnp.meshgrid(jnp.arange(ws), jnp.arange(ws),
                                    indexing='ij'))  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0) + jnp.asarray([ws - 1, ws - 1])
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]  # [N, N]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        bw, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bw, n, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(bw, n, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(bw, n, h, d).transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(d)
        rpb_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h))
        idx = _relative_position_index(self.window_size)
        rpb = rpb_table[idx.reshape(-1)].reshape(n, n, h)
        attn = attn + rpb.transpose(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, h, n, n) + \
                mask[None, :, None, :, :]
            attn = attn.reshape(bw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, name='proj')(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0  # stochastic depth (ref swin.py DropPath)

    def _drop_path(self, y: Array, deterministic: bool) -> Array:
        if self.drop_path_rate <= 0 or deterministic:
            return y
        keep = 1.0 - self.drop_path_rate
        rng = self.make_rng('dropout')
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1))
        return jnp.where(mask, y / keep, 0.0)

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int],
                 deterministic: bool = True) -> Array:
        h, w = hw
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        b, l, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, name='norm1', dtype=jnp.float32)(x)
        y = y.reshape(b, h, w, c)
        # pad to window multiples
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        attn_mask = None
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            img_mask = jnp.zeros((1, hp, wp, 1))
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for wss in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img_mask = img_mask.at[:, hs, wss, :].set(cnt)
                    cnt += 1
            mw = window_partition(img_mask, ws)[..., 0]  # [nw, N]
            attn_mask = jnp.where(
                mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        windows = window_partition(y, ws)
        windows = WindowAttention(c, self.num_heads, ws, name='attn')(
            windows, attn_mask)
        y = window_reverse(windows, ws, hp, wp)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :h, :w].reshape(b, l, c)
        x = x + self._drop_path(y, deterministic)
        z = nn.LayerNorm(epsilon=1e-5, name='norm2', dtype=jnp.float32)(x)
        z = nn.Dense(self.mlp_ratio * c, name='fc1')(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, name='fc2')(z)
        return x + self._drop_path(z, deterministic)


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    pretrain_img_size: int = 224
    in_channels: int = 3
    embed_dims: int = 96
    patch_size: int = 4
    window_size: int = 7
    mlp_ratio: int = 4
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    # parity/no-op keys
    strides: Optional[Sequence[int]] = None
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    patch_norm: bool = True
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    with_cp: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False,
                 attn_bias=None, pos_mode: str = 'default',
                 use_fdrop: bool = False, return_attn: bool = False):
        # semi kwargs accepted and ignored (reference swin.py:742-744)
        p = self.patch_size
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    padding='VALID', name='patch_embed')(x)
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        if self.patch_norm:
            tokens = nn.LayerNorm(epsilon=1e-5, name='patch_norm',
                                  dtype=jnp.float32)(tokens)
        outs = []
        dim = self.embed_dims
        hw = (h, w)
        # stochastic depth: linearly increasing per-block rate over the
        # whole stack (reference swin.py dpr = linspace(0, drop_path_rate))
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]
        cur = 0
        for s, depth in enumerate(self.depths):
            for blk in range(depth):
                tokens = SwinBlock(
                    dim, self.num_heads[s], self.window_size,
                    shift=0 if blk % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path_rate=dpr[cur + blk],
                    name=f'stage_{s}_block_{blk}')(
                        tokens, hw, deterministic=not train)
            cur += depth
            if s in self.out_indices:
                normed = nn.LayerNorm(epsilon=1e-5, name=f'out_norm_{s}',
                                      dtype=jnp.float32)(tokens)
                outs.append(normed.reshape(b, hw[0], hw[1], dim))
            if s < len(self.depths) - 1:
                # patch merging: 2x2 concat + linear to 2*dim
                hh, ww = hw
                t = tokens.reshape(b, hh // 2, 2, ww // 2, 2, dim)
                t = t.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, (hh // 2) * (ww // 2), 4 * dim)
                t = nn.LayerNorm(epsilon=1e-5, name=f'merge_norm_{s}',
                                 dtype=jnp.float32)(t)
                tokens = nn.Dense(2 * dim, use_bias=False,
                                  name=f'merge_{s}')(t)
                dim *= 2
                hw = (hh // 2, ww // 2)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)
