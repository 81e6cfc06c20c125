"""DeiT/ViT backbone, TPU-native (flax.linen, NHWC, bf16-friendly).

Re-implements the reference ``VisionTransformer``
(reference: mmseg/models/backbones/vit.py:187-569) with these deliberate
differences:

- Layout is NHWC; tokens are [B, L, C]. Attention runs through
  ``s4former_tpu.ops.attention`` (fused Pallas flash kernel on TPU; XLA
  einsum otherwise), instead of torch ``nn.MultiheadAttention``.
- The PASA additive attention bias is an explicit ``attn_bias`` argument
  broadcastable to [B, H, L+1, L+1] built by ``s4former_tpu.semi.pasa``
  (the reference builds it inline from per-patch unconfidence,
  vit.py:519-541). Keeping the backbone generic makes every PASA ablation a
  pure-function change.
- Attention-probability capture (the reference's hidden patched-mmcv
  ``.self_attn`` dependency, vit.py:550) is an explicit ``return_attn`` flag
  that switches to the XLA path.
- Positional-embedding ablations (``no_pos_embed`` / ``avg_pos_embed`` /
  ``duplicate_pos_embed``, vit.py:488-513) are a ``pos_mode`` argument.
- fdrop (``nn.Dropout2d(0.5)`` on output maps, vit.py:563-564) becomes a
  channelwise dropout driven by an explicit PRNG key.

Everything is traceable under jit with static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.ops.attention import multi_head_attention
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import BACKBONES

Array = jax.Array


class MultiheadSelfAttention(nn.Module):
    """Pre-proj fused qkv self-attention (torch MHA weight layout compatible)."""
    embed_dims: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop_rate: float = 0.0
    proj_drop_rate: float = 0.0
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Optional[Array] = None,
                 deterministic: bool = True,
                 return_attn: bool = False) -> Tuple[Array, Optional[Array]]:
        b, l, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, name='qkv',
                       dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, h, d)
        k = k.reshape(b, l, h, d)
        v = v.reshape(b, l, h, d)
        out, probs = multi_head_attention(
            q, k, v, bias=attn_bias, return_probs=return_attn,
            use_flash=self.use_flash)
        if self.attn_drop_rate > 0 and not deterministic and probs is not None:
            # attention dropout is only exercised on the XLA/debug path; the
            # S4Former configs run attn_drop_rate=0 (configs/setr/*:drop_rate)
            probs = nn.Dropout(self.attn_drop_rate)(
                probs, deterministic=deterministic)
        out = out.reshape(b, l, c)
        out = nn.Dense(c, name='proj', dtype=self.dtype)(out)
        if self.proj_drop_rate > 0:
            out = nn.Dropout(self.proj_drop_rate)(
                out, deterministic=deterministic)
        return out, probs


class FFN(nn.Module):
    """Two-layer MLP with GELU (reference: mmcv FFN, vit.py:113-127)."""
    embed_dims: int
    feedforward_channels: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.Dense(self.feedforward_channels, name='fc1', dtype=self.dtype)(x)
        y = nn.gelu(y, approximate=False)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, name='fc2', dtype=self.dtype)(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate)(y, deterministic=deterministic)
        return y


class TransformerEncoderLayer(nn.Module):
    """Pre-LN block: x += MHA(LN(x), bias); x += FFN(LN(x))."""
    embed_dims: int
    num_heads: int
    feedforward_channels: int
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    use_flash: bool = True
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, attn_bias: Optional[Array] = None,
                 deterministic: bool = True,
                 return_attn: bool = False) -> Tuple[Array, Optional[Array]]:
        # LN statistics are computed in f32 by flax internally; output in
        # the compute dtype keeps the token stream bf16-resident
        y = nn.LayerNorm(epsilon=self.norm_eps, name='ln1',
                         dtype=self.dtype)(x)
        y, probs = MultiheadSelfAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, attn_drop_rate=self.attn_drop_rate,
            proj_drop_rate=self.drop_rate, use_flash=self.use_flash,
            dtype=self.dtype, name='attn')(
                y, attn_bias, deterministic, return_attn)
        if self.drop_path_rate > 0 and not deterministic:
            keep = 1.0 - self.drop_path_rate
            rng = self.make_rng('dropout')
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
            y = jnp.where(mask, y / keep, 0.0)
        x = x + y
        z = nn.LayerNorm(epsilon=self.norm_eps, name='ln2',
                         dtype=self.dtype)(x)
        z = FFN(embed_dims=self.embed_dims,
                feedforward_channels=self.feedforward_channels,
                drop_rate=self.drop_rate, dtype=self.dtype, name='ffn')(
                    z, deterministic)
        if self.drop_path_rate > 0 and not deterministic:
            keep = 1.0 - self.drop_path_rate
            rng = self.make_rng('dropout')
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1))
            z = jnp.where(mask, z / keep, 0.0)
        return x + z, probs


class _LayerScanBody(nn.Module):
    """Scan body: one encoder layer; carry = tokens, per-step output =
    tokens (so ``ys[i]`` is layer i's output for out_indices taps)."""
    embed_dims: int
    num_heads: int
    feedforward_channels: int
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    qkv_bias: bool = True
    use_flash: bool = True
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry: Array, attn_bias: Optional[Array]):
        out, _ = TransformerEncoderLayer(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            qkv_bias=self.qkv_bias,
            use_flash=self.use_flash,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            name='block')(carry, attn_bias, self.deterministic, False)
        return out, out


def _resize_pos_embed(pos_embed: Array, hw: Tuple[int, int],
                      with_cls_token: bool) -> Array:
    """Runtime bilinear pos-embed resize (reference vit.py:416-477)."""
    l = pos_embed.shape[1] - (1 if with_cls_token else 0)
    src = int(round(float(l) ** 0.5))
    if (src, src) == hw:
        return pos_embed
    grid = pos_embed[:, 1:] if with_cls_token else pos_embed
    c = grid.shape[-1]
    grid = grid.reshape(1, src, src, c)
    grid = resize_bilinear(grid, hw, align_corners=False)
    grid = grid.reshape(1, hw[0] * hw[1], c)
    if with_cls_token:
        return jnp.concatenate([pos_embed[:, :1], grid], axis=1)
    return grid


def _pos_embed_ablation(pos_embed: Array, mode: str,
                        with_cls_token: bool) -> Array:
    """Pos-embed ablations (reference vit.py:488-513). ``mode`` in
    {'default','none','avg','duplicate'}."""
    if mode == 'default':
        return pos_embed
    if mode == 'none':
        return jnp.zeros_like(pos_embed)
    grid = pos_embed[:, 1:] if with_cls_token else pos_embed
    l, c = grid.shape[1], grid.shape[2]
    s = int(round(float(l) ** 0.5))
    g = grid.reshape(1, s, s, c)
    factor = 4
    if mode == 'avg':
        # avg-pool 4x4 then nearest-up 4x (vit.py:494-500)
        pooled = jnp.mean(
            g.reshape(1, s // factor, factor, s // factor, factor, c),
            axis=(2, 4))
        up = jnp.repeat(jnp.repeat(pooled, factor, axis=1), factor, axis=2)
    elif mode == 'duplicate':
        corner = g[:, :s // factor, :s // factor, :]
        up = jnp.tile(corner, (1, factor, factor, 1))
    else:
        raise ValueError(f'unknown pos_mode {mode}')
    up = up.reshape(1, l, c)
    if with_cls_token:
        return jnp.concatenate([pos_embed[:, :1], up], axis=1)
    return up


@BACKBONES.register_module()
class VisionTransformer(nn.Module):
    """DeiT-style ViT backbone for SETR/S4Former.

    Returns a tuple of NHWC feature maps at ``out_indices`` plus (optionally)
    per-layer attention maps.
    """
    img_size: Tuple[int, int] = (512, 512)
    patch_size: int = 16
    in_channels: int = 3
    embed_dims: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    out_indices: Sequence[int] = (4, 7, 9, 11)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    with_cls_token: bool = True
    output_cls_token: bool = False
    final_norm: bool = False
    norm_eps: float = 1e-6
    # measured on v5e at L=1025/d=64: the tuned Pallas kernel (256-row q
    # blocks, single full-K block, no online-softmax loop) runs fwd+bwd
    # 1.8x faster than XLA attention (4.54 vs 8.35 ms at B=8).
    use_flash: bool = True
    remat_layers: bool = True
    # lax.scan unroll factor for the layer stack: params stay STACKED
    # (checkpoint layout unchanged) but XLA sees `scan_unroll` copies of
    # the block body per loop iteration — straight-line code lets it
    # overlap the per-layer weight dynamic-slices with compute and fuse
    # across block boundaries (the round-4 profile put the scan whiles at
    # 133 ms/step with dense matmuls at 35% of GEMM rate). Full unroll =
    # num_layers; costs compile time.
    scan_unroll: int = 1
    # 'full' = recompute everything in bwd (min memory); 'dots' = save
    # matmul outputs, recompute elementwise only (faster bwd, more HBM).
    # measured r2 (deferred-classifier heads): dots 23.1 vs full 22.6
    # img/s/chip at 4+4/chip with HBM headroom — dots is the default
    remat_policy: str = 'dots'
    dtype: jnp.dtype = jnp.float32  # compute dtype for matmuls
    # accepted-and-ignored config keys for parity with reference configs
    interpolate_mode: str = 'bilinear'
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self,
                 x: Array,
                 *,
                 train: bool = False,
                 attn_bias: Optional[Array] = None,
                 pos_mode: str = 'default',
                 use_fdrop: bool = False,
                 return_attn: bool = False):
        """``x``: [B, H, W, 3] float. ``attn_bias``: broadcastable to
        [B, heads, L+1, L+1] additive logit bias (PASA), or None."""
        b, ih, iw, _ = x.shape
        p = self.patch_size
        # AdaptivePadding 'corner': zero-pad bottom/right so the stride-p
        # patch conv fully covers non-divisible inputs (reference
        # mmseg/models/utils/embed.py:12-81, wired at vit.py:303). Shapes
        # are static per trace, so this is jit-free-of-dynamism; 512-crop
        # training hits the no-op branch. Exact-shape eval depends on it:
        # the reference's keep-ratio val shapes are rarely 16-divisible.
        ph, pw = -(-ih // p) * p, -(-iw // p) * p
        if (ph, pw) != (ih, iw):
            x = jnp.pad(x, ((0, 0), (0, ph - ih), (0, pw - iw), (0, 0)))
        hw = (ph // p, pw // p)
        num_patches = hw[0] * hw[1]

        # patch embedding: conv p x p stride p (reference vit.py:297-306)
        tokens = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                         padding='VALID', name='patch_embed',
                         dtype=self.dtype)(x)
        tokens = tokens.reshape(b, num_patches, self.embed_dims)

        if self.with_cls_token or self.output_cls_token:
            cls_token = self.param(
                'cls_token', nn.initializers.zeros, (1, 1, self.embed_dims))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls_token.astype(tokens.dtype),
                                  (b, 1, self.embed_dims)), tokens], axis=1)

        n_pos = num_patches + (1 if self.with_cls_token else 0)
        grid_side = self.img_size[0] // p if isinstance(self.img_size, tuple) \
            else self.img_size // p
        init_pos_len = grid_side * (self.img_size[1] // p
                                    if isinstance(self.img_size, tuple)
                                    else grid_side) + \
            (1 if self.with_cls_token else 0)
        pos_embed = self.param(
            'pos_embed',
            nn.initializers.truncated_normal(stddev=0.02),
            (1, init_pos_len, self.embed_dims))
        pos = _pos_embed_ablation(pos_embed, pos_mode, self.with_cls_token)
        if n_pos != pos.shape[1]:
            pos = _resize_pos_embed(pos, hw, self.with_cls_token)
        tokens = tokens + pos.astype(tokens.dtype)
        if self.drop_rate > 0:
            tokens = nn.Dropout(self.drop_rate)(
                tokens, deterministic=not train)

        if not self.with_cls_token:
            tokens = tokens[:, 1:] if tokens.shape[1] != num_patches else tokens

        deterministic = not train

        # ---- transformer stack as ONE lax.scan over stacked layer params.
        # TPU-native: the 12 identical blocks trace/compile once instead of
        # 12x (the unrolled reference shape would multiply both tracing and
        # XLA compile time; on TPU the executable is the same loop).
        body_cls = _LayerScanBody
        if self.remat_layers:
            # rematerialize each block in backward: HBM stores only the
            # per-layer activations (jax.checkpoint; SURVEY.md hard-parts:
            # three student forwards per step at bs8/replica)
            policy = None
            if self.remat_policy == 'dots':
                policy = jax.checkpoint_policies.checkpoint_dots
            body_cls = nn.remat(_LayerScanBody, prevent_cse=False,
                                static_argnums=(), policy=policy)
        scan_cls = nn.scan(
            body_cls,
            variable_axes={'params': 0},
            split_rngs={'params': True, 'dropout': True},
            in_axes=nn.broadcast,
            length=self.num_layers,
            unroll=max(1, min(self.scan_unroll, self.num_layers)),
            out_axes=0)
        tokens_final, states = scan_cls(
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            feedforward_channels=self.mlp_ratio * self.embed_dims,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            qkv_bias=self.qkv_bias,
            use_flash=self.use_flash,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
            deterministic=deterministic,
            name='layers')(tokens, attn_bias)
        del tokens_final
        # states[i] == output of layer i, shape [num_layers, B, T, C]

        outs = []
        attns = []
        for i in self.out_indices:
            layer_out = states[i]
            if i == self.num_layers - 1 and self.final_norm:
                layer_out = nn.LayerNorm(epsilon=self.norm_eps,
                                         name='ln_final',
                                         dtype=self.dtype)(layer_out)
            feat_tokens = layer_out[:, 1:] if self.with_cls_token \
                else layer_out
            out = feat_tokens.reshape(b, hw[0], hw[1], self.embed_dims)
            if use_fdrop:
                # channelwise Dropout2d(0.5) (reference vit.py:563-564)
                rng = self.make_rng('fdrop')
                keep = jax.random.bernoulli(
                    rng, 0.5, (b, 1, 1, self.embed_dims))
                out = jnp.where(keep, out * 2.0, 0.0)
            if self.output_cls_token:
                outs.append([out, layer_out[:, 0]])
            else:
                outs.append(out)
            if return_attn:
                attns.append(self._attn_probs_for_layer(i, states, tokens,
                                                        attn_bias))
        if return_attn:
            return tuple(outs), (attns, hw)
        return tuple(outs)

    def _attn_probs_for_layer(self, i: int, states: Array,
                              tokens0: Array,
                              attn_bias: Optional[Array]) -> Array:
        """Recompute layer i's attention probabilities from the stacked
        scan parameters (explicit debug path replacing the reference's
        patched-mmcv ``.self_attn`` capture, vit.py:546-569)."""
        p = self.variables['params']['layers']['block']
        x_in = tokens0 if i == 0 else states[i - 1]
        g = p['ln1']['scale'][i].astype(jnp.float32)
        bta = p['ln1']['bias'][i].astype(jnp.float32)
        xf = x_in.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.norm_eps) * g + bta
        w = p['attn']['qkv']['kernel'][i]
        bqkv = p['attn']['qkv']['bias'][i] if 'bias' in p['attn']['qkv'] \
            else 0.0
        qkv = y.astype(w.dtype) @ w + bqkv
        q, k, _ = jnp.split(qkv, 3, axis=-1)
        bsz, l, c = q.shape
        h = self.num_heads
        d = c // h
        from s4former_tpu.ops.attention import dot_product_attention
        _, probs = dot_product_attention(
            q.reshape(bsz, l, h, d), k.reshape(bsz, l, h, d),
            jnp.zeros((bsz, l, h, d), q.dtype), bias=attn_bias,
            return_probs=True)
        return probs[:, :, 1:, 1:] if self.with_cls_token else probs
