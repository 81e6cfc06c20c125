"""BEiT and MAE backbones (flax/NHWC).

Rebuilds of the reference zoo members (reference:
mmseg/models/backbones/beit.py:559, mae.py:261 — upstream, unused by the
S4Former configs): ViT variants with
- BEiT: per-layer relative position bias (shared window table), layer-scale
  (gamma_1/gamma_2), q/v-only bias, no absolute pos-embed;
- MAE: BEiT block structure with absolute pos-embed and final norm.
Both accept-and-ignore the semi kwargs like every backbone here.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.registry import BACKBONES

Array = jax.Array


def _beit_rel_pos_index(ws: Tuple[int, int]):
    h, w = ws
    coords = jnp.stack(jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                    indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + jnp.asarray([h - 1, w - 1])
    idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
    n = h * w
    num_rel = (2 * h - 1) * (2 * w - 1)
    # +3 special entries: cls-to-token, token-to-cls, cls-to-cls
    full = jnp.zeros((n + 1, n + 1), jnp.int32)
    full = full.at[1:, 1:].set(idx)
    full = full.at[0, 1:].set(num_rel)
    full = full.at[1:, 0].set(num_rel + 1)
    full = full.at[0, 0].set(num_rel + 2)
    return full, num_rel + 3


class BEiTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    mlp_ratio: int = 4
    init_values: float = 0.1
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, l, c = x.shape
        h = self.num_heads
        d = c // h
        y = nn.LayerNorm(epsilon=self.norm_eps, name='norm1',
                         dtype=jnp.float32)(x)
        # q/v bias only (beit convention)
        qkv_w = nn.Dense(3 * c, use_bias=False, name='qkv')(y)
        q_bias = self.param('q_bias', nn.initializers.zeros, (c,))
        v_bias = self.param('v_bias', nn.initializers.zeros, (c,))
        q, k, v = jnp.split(qkv_w, 3, axis=-1)
        q = (q + q_bias).reshape(b, l, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, l, h, d).transpose(0, 2, 1, 3)
        v = (v + v_bias).reshape(b, l, h, d).transpose(0, 2, 1, 3)
        attn = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(d)
        idx, table_size = _beit_rel_pos_index(self.window_size)
        table = self.param('relative_position_bias_table',
                           nn.initializers.zeros, (table_size, h))
        rpb = table[idx.reshape(-1)].reshape(l, l, h).transpose(2, 0, 1)
        attn = attn + rpb[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, l, c)
        out = nn.Dense(c, name='proj')(out)
        gamma1 = self.param('gamma_1',
                            nn.initializers.constant(self.init_values), (c,))
        x = x + gamma1 * out
        z = nn.LayerNorm(epsilon=self.norm_eps, name='norm2',
                         dtype=jnp.float32)(x)
        z = nn.Dense(self.mlp_ratio * c, name='fc1')(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, name='fc2')(z)
        gamma2 = self.param('gamma_2',
                            nn.initializers.constant(self.init_values), (c,))
        return x + gamma2 * z


@BACKBONES.register_module()
class BEiT(nn.Module):
    img_size: Tuple[int, int] = (640, 640)
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (3, 5, 7, 11)
    init_values: float = 0.1
    use_abs_pos_emb: bool = False
    final_norm: bool = False
    # parity/no-op keys
    qv_bias: bool = True
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        p = self.patch_size
        b, ih, iw, _ = x.shape
        hw = (ih // p, iw // p)
        tokens = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                         padding='VALID', name='patch_embed')(x)
        tokens = tokens.reshape(b, hw[0] * hw[1], self.embed_dims)
        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, self.embed_dims))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dims)), tokens], 1)
        if self.use_abs_pos_emb:
            pos = self.param('pos_embed',
                             nn.initializers.truncated_normal(0.02),
                             (1, hw[0] * hw[1] + 1, self.embed_dims))
            tokens = tokens + pos
        outs = []
        for i in range(self.num_layers):
            tokens = BEiTBlock(self.embed_dims, self.num_heads, hw,
                               self.mlp_ratio, self.init_values,
                               name=f'layers_{i}')(
                                   tokens, deterministic=not train)
            if i == self.num_layers - 1 and self.final_norm:
                tokens = nn.LayerNorm(epsilon=1e-6, name='ln_final',
                                      dtype=jnp.float32)(tokens)
            if i in self.out_indices:
                out = tokens[:, 1:].reshape(b, hw[0], hw[1],
                                            self.embed_dims)
                outs.append(out)
        if return_attn:
            return tuple(outs), ([], hw)
        return tuple(outs)


@BACKBONES.register_module()
class MAE(BEiT):
    """MAE-pretrained ViT (mae.py): BEiT blocks + absolute pos embed."""

    def __init__(self, **kwargs):
        kwargs.setdefault('use_abs_pos_emb', True)
        kwargs.setdefault('init_values', 1.0)
        kwargs.setdefault('final_norm', True)
        super().__init__(**kwargs)
