"""Decode-head zoo: the reference's context-aggregation head family.

Rebuilds of (reference: mmseg/models/decode_heads/): aspp_head.py,
sep_aspp_head.py, sep_fcn_head.py, nl_head.py, gc_head.py, dnl_head.py,
ann_head.py, apc_head.py, dm_head.py, ema_head.py, enc_head.py,
isa_head.py, lraspp_head.py, psa_head.py, da_head.py — each re-designed
NHWC/flax with fixed shapes (attention maps as einsums, adaptive pools as
static reshape-means). Compact but real: every head computes its paper's
context mechanism, not a stub.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.decode_heads.base import (transform_inputs,
                                                   unshuffle_feature_map)
from s4former_tpu.models.decode_heads.misc_heads import ConvBNReLU
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import HEADS

Array = jax.Array

def _head_fields(cls):
    """Historical decorator, now a no-op: the shared config-parity fields
    (dropout_ratio, align_corners, loss_decode, norm_cfg, act_cfg,
    init_cfg, sampler, ignore_index) are declared on ``_HeadBase`` so flax
    turns them into real keyword constructor args on every subclass.
    (Adding annotations after class creation — the old approach — ran too
    late: flax's dataclass transform happens in ``__init_subclass__``, so
    reference configs passing ``loss_decode=...`` raised TypeError.)"""
    return cls


class _HeadBase(nn.Module):
    """Mixin: input select + PatchShuffle undo + classifier tail, plus
    the BaseDecodeHead config surface shared by every zoo head
    (reference decode_head.py:35-105 constructor kwargs)."""
    dropout_ratio: float = 0.1
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    def _pick(self, inputs, patchmix_perm, patchmix_n):
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners) \
            if isinstance(inputs, (list, tuple)) else inputs
        if patchmix_perm is not None and patchmix_n:
            x = unshuffle_feature_map(x, patchmix_perm, patchmix_n)
        return x

    def _cls(self, x, train, return_last_feat):
        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(x).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits


def _adaptive_pool(x: Array, s: int) -> Array:
    """Adaptive average pool NHWC -> [B, s, s, C], exact torch
    adaptive_avg_pool2d windows (start = floor(i*L/s), end =
    ceil((i+1)*L/s)); works for s > L too. Static shapes."""
    _, h, w, _ = x.shape

    def pool_axis(arr, axis_len, axis):
        segs = []
        for i in range(s):
            a = (i * axis_len) // s
            e = -(-((i + 1) * axis_len) // s)
            segs.append(jnp.mean(
                jax.lax.slice_in_dim(arr, a, e, axis=axis),
                axis=axis, keepdims=True))
        return jnp.concatenate(segs, axis=axis)

    return pool_axis(pool_axis(x, h, 1), w, 2)


class SepConvBNReLU(nn.Module):
    """DepthwiseSeparableConvModule (mmcv): depthwise 3x3 + BN (+ ReLU
    unless ``dw_act=False`` — callers passing the reference's
    ``dw_act_cfg=None``, e.g. sep_fcn_head.py) then pointwise 1x1 + BN +
    ReLU."""
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1
    dw_act: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c = x.shape[-1]
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        x = nn.Conv(c, (k, k), padding=pad, kernel_dilation=self.dilation,
                    feature_group_count=c, use_bias=False,
                    name='depthwise')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='dw_bn')(x)
        if self.dw_act:
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name='pointwise')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='pw_bn')(x)
        return nn.relu(x)


# ------------------------------------------------------------------- ASPP
@HEADS.register_module()
@_head_fields
class ASPPHead(_HeadBase):
    """(aspp_head.py): image pool + 1x1 + dilated 3x3 branches."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    dilations: Sequence[int] = (1, 12, 24, 36)
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    def aspp_forward(self, x, train):
        h, w = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        img_pool = ConvBNReLU(self.channels, 1, name='image_pool')(
            pooled, train)
        branches = [resize_bilinear(
            jnp.broadcast_to(img_pool, (x.shape[0], 1, 1, self.channels)),
            (h, w), self.align_corners)]
        for i, d in enumerate(self.dilations):
            k = 1 if d == 1 else 3
            branches.append(ConvBNReLU(self.channels, k, d,
                                       name=f'aspp_{i}')(x, train))
        return ConvBNReLU(self.channels, 3, name='bottleneck')(
            jnp.concatenate(branches, -1), train)

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        x = self.aspp_forward(x, train)
        return self._cls(x, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class DepthwiseSeparableASPPHead(_HeadBase):
    """(sep_aspp_head.py, DeepLabV3+): separable ASPP + low-level (c1)
    skip fusion."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    dilations: Sequence[int] = (1, 12, 24, 36)
    c1_in_channels: int = 256
    c1_channels: int = 48
    c1_index: int = 0
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        h, w = x.shape[1:3]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        img_pool = ConvBNReLU(self.channels, 1, name='image_pool')(
            pooled, train)
        branches = [resize_bilinear(
            jnp.broadcast_to(img_pool, (x.shape[0], 1, 1, self.channels)),
            (h, w), self.align_corners)]
        for i, d in enumerate(self.dilations):
            if d == 1:
                branches.append(ConvBNReLU(self.channels, 1,
                                           name=f'aspp_{i}')(x, train))
            else:
                branches.append(SepConvBNReLU(self.channels, 3, d,
                                              name=f'aspp_{i}')(x, train))
        y = ConvBNReLU(self.channels, 3, name='bottleneck')(
            jnp.concatenate(branches, -1), train)
        if isinstance(inputs, (list, tuple)) and self.c1_in_channels > 0:
            c1 = ConvBNReLU(self.c1_channels, 1, name='c1_bottleneck')(
                inputs[self.c1_index], train)
            y = resize_bilinear(y, c1.shape[1:3], self.align_corners)
            y = jnp.concatenate([y, c1], -1)
        y = SepConvBNReLU(self.channels, 3, name='sep_fuse_0')(y, train)
        y = SepConvBNReLU(self.channels, 3, name='sep_fuse_1')(y, train)
        return self._cls(y, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class DepthwiseSeparableFCNHead(_HeadBase):
    """(sep_fcn_head.py, Fast-SCNN): FCN with separable convs."""
    in_channels: int = 128
    channels: int = 128
    num_classes: int = 19
    num_convs: int = 2
    concat_input: bool = False
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        inp = x
        # ref sep_fcn_head.py passes dw_act_cfg=None: depthwise BN-only
        for i in range(self.num_convs):
            x = SepConvBNReLU(self.channels, 3, dw_act=False,
                              name=f'convs_{i}')(x, train)
        if self.concat_input:
            x = SepConvBNReLU(self.channels, 3, dw_act=False,
                              name='conv_cat')(
                jnp.concatenate([inp, x], -1), train)
        return self._cls(x, train, return_last_feat)


# ------------------------------------------------------- non-local family
class NonLocal2d(nn.Module):
    """mmcv NonLocal2d, embedded_gaussian (non_local.py): biased 1x1
    g/theta/phi projections (no norm), bias-free conv_out + BN (no act),
    pairwise scaled by 1/sqrt(inter) when ``use_scale``; y = x +
    conv_out(softmax(theta phi^T) g)."""
    reduction: int = 2
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        ci = max(c // self.reduction, 1)
        q = nn.Conv(ci, (1, 1), name='theta')(x).reshape(b, h * w, ci)
        k = nn.Conv(ci, (1, 1), name='phi')(x).reshape(b, h * w, ci)
        v = nn.Conv(ci, (1, 1), name='g')(x).reshape(b, h * w, ci)
        sim = jnp.einsum('bqc,bkc->bqk', q, k)
        if self.use_scale:
            sim = sim / jnp.sqrt(float(ci))
        attn = jax.nn.softmax(sim, axis=-1)
        y = jnp.einsum('bqk,bkc->bqc', attn, v).reshape(b, h, w, ci)
        y = nn.Conv(c, (1, 1), use_bias=False, name='conv_out')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn_out')(y)
        return x + y


class _FCNScaffold(_HeadBase):
    """FCNHead(num_convs=2) scaffolding shared by NL/GC/DNL heads:
    convs_0 -> block -> convs_1 (+ conv_cat on [input, out]) -> cls_seg
    (ref fcn_head.py via nl_head.py:41-49)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    concat_input: bool = True
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    def _block(self, y, train):
        raise NotImplementedError

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        y = ConvBNReLU(self.channels, 3, name='convs_0')(x, train)
        y = self._block(y, train)
        y = ConvBNReLU(self.channels, 3, name='convs_1')(y, train)
        if self.concat_input:
            y = ConvBNReLU(self.channels, 3, name='conv_cat')(
                jnp.concatenate([x, y], -1), train)
        return self._cls(y, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class NLHead(_FCNScaffold):
    """(nl_head.py:9-49): FCNHead(num_convs=2) with an mmcv NonLocal2d
    between the convs."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'

    def _block(self, y, train):
        return NonLocal2d(self.reduction, self.use_scale,
                          name='nl_block')(y, train)


@HEADS.register_module()
@_head_fields
class GCHead(_FCNScaffold):
    """(gc_head.py:9-47 + mmcv ContextBlock): attention-pooled global
    context, channel_add fusion through conv -> LN([planes,1,1]) ->
    ReLU -> conv."""
    ratio: float = 0.25
    pooling_type: str = 'att'
    fusion_types: Sequence[str] = ('channel_add',)

    def _block(self, y, train):
        b, h, w, c = y.shape
        if self.pooling_type == 'att':
            mask = nn.Conv(1, (1, 1), name='conv_mask')(y)
            mask = jax.nn.softmax(mask.reshape(b, h * w), axis=-1)
            context = jnp.einsum('bp,bpc->bc', mask,
                                 y.reshape(b, h * w, c))
        else:
            context = jnp.mean(y, axis=(1, 2))
        ci = max(int(c * self.ratio), 1)
        t = nn.Dense(ci, name='add_conv_0')(context)
        t = nn.LayerNorm(name='add_ln')(t)
        t = nn.Dense(c, name='add_conv_1')(nn.relu(t))
        return y + t[:, None, None, :]


@HEADS.register_module()
@_head_fields
class DNLHead(_FCNScaffold):
    """(dnl_head.py:10-120): disentangled non-local — mean-subtracted
    theta/phi, pairwise scaled by 1/sqrt(inter) AND 1/temperature, plus
    a softmax unary branch; out = x + conv_out(pairwise@g + unary@g)."""
    reduction: int = 2
    use_scale: bool = True
    mode: str = 'embedded_gaussian'
    temperature: float = 0.05

    def _block(self, x, train):
        b, h, w, c = x.shape
        ci = max(c // self.reduction, 1)
        q = nn.Conv(ci, (1, 1), name='theta')(x).reshape(b, h * w, ci)
        k = nn.Conv(ci, (1, 1), name='phi')(x).reshape(b, h * w, ci)
        v = nn.Conv(ci, (1, 1), name='g')(x).reshape(b, h * w, ci)
        q = q - jnp.mean(q, axis=1, keepdims=True)
        k = k - jnp.mean(k, axis=1, keepdims=True)
        sim = jnp.einsum('bqc,bkc->bqk', q, k)
        if self.use_scale:
            sim = sim / jnp.sqrt(float(ci))
        sim = sim / self.temperature
        pairwise = jax.nn.softmax(sim, -1)
        unary = jax.nn.softmax(
            nn.Conv(1, (1, 1), name='conv_mask')(x).reshape(b, 1, h * w),
            axis=-1)
        # (pairwise + broadcast unary) @ g == pairwise@g + unary@g
        y = jnp.einsum('bqk,bkc->bqc', pairwise + unary, v)
        y = y.reshape(b, h, w, ci)
        y = nn.Conv(c, (1, 1), use_bias=False, name='conv_out')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn_out')(y)
        return x + y


@HEADS.register_module()
@_head_fields
class ANNHead(_HeadBase):
    """(ref ann_head.py:16-256), exact structure: AFNB fuses the low
    level (keys/values PPM-sampled AFTER projection) into the high
    level with an act-free bottleneck, then dropout -> 3x3 bottleneck ->
    APNB (query/key projections SHARED) -> cls_seg. q/k are single
    bias-free ConvModules (BN+ReLU), value/out plain biased convs,
    matmul scaled by channels^-0.5."""
    in_channels: Sequence[int] = (1024, 2048)
    channels: int = 512
    num_classes: int = 21
    project_channels: int = 256
    query_scales: Sequence[int] = (1,)
    key_pool_scales: Sequence[int] = (1, 3, 6, 8)
    in_index: Sequence[int] = (-2, -1)
    input_transform: str = 'multiple_select'

    def _ppm_concat(self, x):
        b = x.shape[0]
        c = x.shape[-1]
        return jnp.concatenate(
            [_adaptive_pool(x, s).reshape(b, s * s, c)
             for s in self.key_pool_scales], axis=1)

    def _sab(self, query_feats, key_feats, out_c, name, train,
             share_key_query):
        ci = self.project_channels
        b, h, w, _ = query_feats.shape
        kproj = ConvBNReLU(ci, 1, name=f'{name}_key')
        qproj = kproj if share_key_query else             ConvBNReLU(ci, 1, name=f'{name}_query')
        q = qproj(query_feats, train).reshape(b, h * w, ci)
        k = self._ppm_concat(kproj(key_feats, train))
        v = self._ppm_concat(nn.Conv(out_c, (1, 1),
                                     name=f'{name}_value')(key_feats))
        attn = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', q, k) * float(ci) ** -0.5, -1)
        y = jnp.einsum('bqk,bkc->bqc', attn, v).reshape(b, h, w, out_c)
        return nn.Conv(out_c, (1, 1), name=f'{name}_out')(y)

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        feats = [inputs[i] for i in self.in_index] \
            if isinstance(inputs, (list, tuple)) else [inputs, inputs]
        low, high = feats[0], feats[-1]
        if patchmix_perm is not None and patchmix_n:
            high = unshuffle_feature_map(high, patchmix_perm, patchmix_n)
        high_c = high.shape[-1]
        # AFNB (ref :107-146): query=high, key/value=low; act-free
        # bottleneck on cat([context, high])
        ctx = sum(self._sab(high, low, high_c, f'fusion_{i}', train,
                            share_key_query=False)
                  for i in range(len(self.query_scales)))
        y = jnp.concatenate([ctx, high], -1)
        y = nn.Conv(high_c, (1, 1), use_bias=False,
                    name='fusion_bottleneck')(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='fusion_bottleneck_bn')(y)
        # ref ANNHead.forward applies the head dropout HERE (:247)
        if self.dropout_ratio > 0:
            y = nn.Dropout(self.dropout_ratio)(y, deterministic=not train)
        y = ConvBNReLU(self.channels, 3, name='bottleneck')(y, train)
        # APNB (ref :149-181): shared query/key projection
        ctx = sum(self._sab(y, y, self.channels, f'context_{i}', train,
                            share_key_query=True)
                  for i in range(len(self.query_scales)))
        y = ConvBNReLU(self.channels, 1, name='context_bottleneck')(
            jnp.concatenate([ctx, y], -1), train)
        feat = y
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(y).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits


# --------------------------------------------------- pooled-context family
@HEADS.register_module()
@_head_fields
class APCHead(_HeadBase):
    """(ref apc_head.py:11-160), exact ACM structure: pooled_redu_conv /
    input_redu_conv 1x1 ConvModules, GLA = biased 1x1 on
    x + broadcast(global_info(GAP(x))) with SIGMOID affinities,
    residual_conv + relu(z + x) + fusion_conv; head concatenates the RAW
    input with every ACM output into a 3x3 bottleneck."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    fusion: bool = True
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        raw = self._pick(inputs, patchmix_perm, patchmix_n)
        b = raw.shape[0]
        branches = [raw]
        for i, s in enumerate(self.pool_scales):
            pooled = _adaptive_pool(raw, s)
            pooled = ConvBNReLU(self.channels, 1,
                                name=f'acm_{i}_pooled_redu')(pooled, train)
            x = ConvBNReLU(self.channels, 1,
                           name=f'acm_{i}_input_redu')(raw, train)
            gi = ConvBNReLU(self.channels, 1, name=f'acm_{i}_global')(
                jnp.mean(x, axis=(1, 2), keepdims=True), train)
            aff = nn.Conv(s * s, (1, 1), name=f'acm_{i}_gla')(x + gi)
            aff = nn.sigmoid(aff)                         # [B,h,w,s*s]
            z = jnp.einsum('bhwk,bkc->bhwc', aff,
                           pooled.reshape(b, s * s, self.channels))
            # residual_conv is a full ConvModule (conv+BN+ReLU), then a
            # second ReLU on the sum (ref apc_head.py:100-103)
            z = ConvBNReLU(self.channels, 1,
                           name=f'acm_{i}_residual')(z, train)
            z = nn.relu(z + x)
            if self.fusion:
                z = ConvBNReLU(self.channels, 1,
                               name=f'acm_{i}_fusion')(z, train)
            branches.append(z)
        x = ConvBNReLU(self.channels, 3, name='bottleneck')(
            jnp.concatenate(branches, -1), train)
        return self._cls(x, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class DMHead(_HeadBase):
    """(ref dm_head.py:11-152), exact DCM structure: dynamic per-channel
    filters from filter_gen_conv(adaptive_pool(raw, fs)) applied as
    grouped CORRELATION with the reference's left-heavy padding on even
    filter sizes, BN + ReLU, fusion conv; head concatenates the RAW
    input with every DCM output into a 3x3 bottleneck."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    filter_sizes: Sequence[int] = (1, 3, 5, 7)
    fusion: bool = False
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        raw = self._pick(inputs, patchmix_perm, patchmix_n)
        b = raw.shape[0]
        branches = [raw]
        for i, fs in enumerate(self.filter_sizes):
            filt = nn.Conv(self.channels, (1, 1),
                           name=f'dcm_{i}_filter_gen')(
                               _adaptive_pool(raw, fs))  # [B,fs,fs,C]
            y = ConvBNReLU(self.channels, 1,
                           name=f'dcm_{i}_input_redu')(raw, train)
            pad = (fs - 1) // 2
            lo, hi = (pad, pad) if (fs - 1) % 2 == 0 else (pad + 1, pad)
            yp = jnp.pad(y, ((0, 0), (lo, hi), (lo, hi), (0, 0)))
            patches = jnp.stack([
                yp[:, a:a + y.shape[1], c0:c0 + y.shape[2]]
                for a in range(fs) for c0 in range(fs)], axis=-2)
            ctx = jnp.einsum('bhwkc,bkc->bhwc', patches,
                             filt.reshape(b, fs * fs, self.channels))
            ctx = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name=f'dcm_{i}_norm')(ctx)
            ctx = nn.relu(ctx)
            if self.fusion:
                ctx = ConvBNReLU(self.channels, 1,
                                 name=f'dcm_{i}_fusion')(ctx, train)
            branches.append(ctx)
        x = ConvBNReLU(self.channels, 3, name='bottleneck')(
            jnp.concatenate(branches, -1), train)
        return self._cls(x, train, return_last_feat)



@HEADS.register_module()
@_head_fields
class EMAHead(_HeadBase):
    """(ref ema_head.py:21-170), exact structure: ema_in_conv (3x3
    ConvModule) -> FROZEN biased 1x1 ema_mid_conv -> EM iterations whose
    attention AND bases are fully detached (the ref computes both under
    no_grad; gradients flow only through the identity) -> ReLU ->
    ema_out_conv (1x1 + BN, no act) -> relu(identity + recon) ->
    bottleneck -> optional conv_cat. ``bases`` is a moving-average
    BUFFER (batch_stats) updated with ``momentum`` during training,
    L2-normalized over channels."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    ema_channels: int = 256
    num_bases: int = 64
    num_stages: int = 3
    momentum: float = 0.1
    concat_input: bool = True
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        raw = self._pick(inputs, patchmix_perm, patchmix_n)
        x = ConvBNReLU(self.ema_channels, 3, name='ema_in')(raw, train)
        identity = x
        feats = nn.Conv(self.ema_channels, (1, 1), name='ema_mid')(x)
        # frozen like the reference (requires_grad=False on ema_mid_conv)
        feats = jax.lax.stop_gradient(feats)
        b, h, w, c = x.shape
        feats = feats.reshape(b, h * w, c)

        def init_bases(key):
            base = jax.random.normal(key, (1, self.num_bases, c)) *                 jnp.sqrt(2.0 / self.num_bases)
            return base / jnp.linalg.norm(base, axis=-1, keepdims=True)

        bases_var = self.variable('batch_stats', 'bases', init_bases,
                                  self.make_rng('params')
                                  if self.is_initializing() else None)
        mu = jnp.broadcast_to(bases_var.value, (b, self.num_bases, c))
        attn = None
        for _ in range(self.num_stages):
            attn = jax.nn.softmax(
                jnp.einsum('bpc,bkc->bpk', feats, mu), axis=-1)
            attn_normed = attn / (jnp.sum(attn, axis=1, keepdims=True)
                                  + 1e-12)
            mu = jnp.einsum('bpk,bpc->bkc', attn_normed, feats)
            mu = mu / (jnp.linalg.norm(mu, axis=-1, keepdims=True) + 1e-12)
        # the ref computes the whole EM loop under no_grad: recon is
        # fully detached — gradients reach the loss via identity only
        mu = jax.lax.stop_gradient(mu)
        attn = jax.lax.stop_gradient(attn)
        recon = jnp.einsum('bkc,bpk->bpc', mu, attn).reshape(b, h, w, c)
        if train and not self.is_initializing():
            new_bases = jnp.mean(mu, axis=0, keepdims=True)
            new_bases = new_bases / (jnp.linalg.norm(
                new_bases, axis=-1, keepdims=True) + 1e-12)
            bases_var.value = (1 - self.momentum) * bases_var.value +                 self.momentum * new_bases
        recon = nn.relu(recon)
        recon = nn.Conv(self.ema_channels, (1, 1), use_bias=False,
                        name='ema_out')(recon)
        recon = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name='ema_out_bn')(recon)
        y = nn.relu(identity + recon)
        y = ConvBNReLU(self.channels, 3, name='bottleneck')(y, train)
        if self.concat_input:
            y = ConvBNReLU(self.channels, 3, name='conv_cat')(
                jnp.concatenate([raw, y], -1), train)
        return self._cls(y, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class EncHead(_HeadBase):
    """(ref enc_head.py:13-190), exact EncModule: encoding_project 1x1
    ConvModule -> Encoding (ops/encoding, torch-parity) -> BN1d over the
    CODES axis -> ReLU -> mean over codes -> Linear+Sigmoid gamma;
    output = relu(x + x * gamma). Optional laterals + fusion; se-loss
    logits exposed via ``sow('intermediates', 'se_logits')``."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    channels: int = 512
    num_classes: int = 21
    num_codes: int = 32
    use_se_loss: bool = False
    add_lateral: bool = False
    loss_se_decode: Optional[dict] = None
    in_index: Sequence[int] = (0, 1, 2)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        from s4former_tpu.ops.encoding import Encoding
        feats = [inputs[i] for i in self.in_index] \
            if isinstance(inputs, (list, tuple)) else [inputs]
        x = ConvBNReLU(self.channels, 3, name='bottleneck')(
            feats[-1], train)
        if self.add_lateral and len(feats) > 1:
            laterals = [resize_bilinear(
                ConvBNReLU(self.channels, 1, name=f'lateral_{i}')(f, train),
                x.shape[1:3], self.align_corners)
                for i, f in enumerate(feats[:-1])]
            x = ConvBNReLU(self.channels, 3, name='fusion')(
                jnp.concatenate([x] + laterals, -1), train)
        proj = ConvBNReLU(self.channels, 1, name='encoding_project')(
            x, train)
        encoded = Encoding(num_codes=self.num_codes,
                           name='encoding')(proj)     # [B, K, C]
        # ref wraps Encoding in BN1d(num_codes) + ReLU, THEN means over
        # the code axis (enc_head.py:46-56)
        encoded = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, axis=1,
                               name='enc_bn')(encoded)
        enc_vec = jnp.mean(nn.relu(encoded), axis=1)  # [B, C]
        gamma = nn.sigmoid(nn.Dense(self.channels, name='fc')(enc_vec))
        y = nn.relu(x + x * gamma[:, None, None, :])
        if self.use_se_loss:
            self.sow('intermediates', 'se_logits',
                     nn.Dense(self.num_classes, name='se_layer')(enc_vec))
        return self._cls(y, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class ISAHead(_HeadBase):
    """(ref isa_head.py:16-246), exact structure: interlaced sparse
    self-attention — glb-major H/W block split, global attention over
    the (glb_h, glb_w) grid per local offset then local attention within
    each block; each SelfAttentionBlock has TWO ConvModule query/key
    projections, a plain biased value conv (value_out_norm=False,
    with_out=False) and a ConvModule output_project; out_conv on
    cat([attention, residual])."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    isa_channels: int = 256
    down_factor: Sequence[int] = (8, 8)
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    def _sab(self, x, train, name):
        b, h, w, c = x.shape
        ci = self.isa_channels
        q = ConvBNReLU(ci, 1, name=f'{name}_query_0')(x, train)
        q = ConvBNReLU(ci, 1, name=f'{name}_query_1')(q, train)
        k = ConvBNReLU(ci, 1, name=f'{name}_key_0')(x, train)
        k = ConvBNReLU(ci, 1, name=f'{name}_key_1')(k, train)
        v = nn.Conv(c, (1, 1), name=f'{name}_value')(x)
        q = q.reshape(b, h * w, ci)
        k = k.reshape(b, h * w, ci)
        v = v.reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum('bqc,bkc->bqk', q, k) * float(ci) ** -0.5, -1)
        ctx = jnp.einsum('bqk,bkc->bqc', attn, v).reshape(b, h, w, c)
        return ConvBNReLU(c, 1, name=f'{name}_output')(ctx, train)

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        x = ConvBNReLU(self.channels, 3, name='in_conv')(x, train)
        residual = x
        b, h, w, c = x.shape
        loc_h, loc_w = self.down_factor
        loc_h, loc_w = min(loc_h, h), min(loc_w, w)
        glb_h, glb_w = -(-h // loc_h), -(-w // loc_w)
        pad_h, pad_w = glb_h * loc_h - h, glb_w * loc_w - w
        y = jnp.pad(x, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                        (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        # glb-major split (ref :221 view(n, c, glb_h, loc_h, glb_w, loc_w))
        y = y.reshape(b, glb_h, loc_h, glb_w, loc_w, c)
        lng = y.transpose(0, 2, 4, 1, 3, 5).reshape(
            b * loc_h * loc_w, glb_h, glb_w, c)
        lng = self._sab(lng, train, 'global_relation')
        y = lng.reshape(b, loc_h, loc_w, glb_h, glb_w, c)
        sht = y.transpose(0, 3, 4, 1, 2, 5).reshape(
            b * glb_h * glb_w, loc_h, loc_w, c)
        sht = self._sab(sht, train, 'local_relation')
        y = sht.reshape(b, glb_h, glb_w, loc_h, loc_w, c)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, glb_h * loc_h, glb_w * loc_w, c)
        y = y[:, pad_h // 2:pad_h // 2 + h, pad_w // 2:pad_w // 2 + w]
        # ref :243 cat([attention, residual])
        x = ConvBNReLU(self.channels, 1, name='out_conv')(
            jnp.concatenate([y, residual], -1), train)
        return self._cls(x, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class LRASPPHead(_HeadBase):
    """(lraspp_head.py, MobileNetV3): light-weight R-ASPP — 1x1 conv gated
    by a pooled sigmoid branch, fused with a skip level."""
    in_channels: Sequence[int] = (16, 24, 960)
    channels: int = 128
    num_classes: int = 19
    branch_channels: Sequence[int] = (32, 64)
    in_index: Sequence[int] = (0, 1, 2)
    input_transform: str = 'multiple_select'

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        feats = [inputs[i] for i in self.in_index] \
            if isinstance(inputs, (list, tuple)) else [inputs]
        x = feats[-1]
        # ref lraspp_head.py:60-80: the gate is AvgPool2d(49, (16, 20))
        # -> bias-free 1x1 (NO norm) -> sigmoid, bilinear back to x.
        # The window clamps to the feature size for sub-49px inputs
        # (where the reference's pool simply errors).
        k = (min(49, x.shape[1]), min(49, x.shape[2]))
        gate = nn.avg_pool(x, k, strides=(16, 20))
        gate = nn.sigmoid(nn.Conv(self.channels, (1, 1), use_bias=False,
                                  name='image_pool_conv')(gate))
        gate = resize_bilinear(gate, x.shape[1:3], self.align_corners)
        y = ConvBNReLU(self.channels, 1, name='aspp_conv')(x, train) * gate
        y = nn.Conv(self.channels, (1, 1), name='conv_up_input')(y)
        for i in range(len(self.branch_channels) - 1, -1, -1):
            y = resize_bilinear(y, feats[i].shape[1:3], self.align_corners)
            skip = nn.Conv(self.branch_channels[i], (1, 1), use_bias=False,
                           name=f'convs_{i}')(feats[i])
            y = ConvBNReLU(self.channels, 1, name=f'conv_ups_{i}')(
                jnp.concatenate([y, skip], -1), train)
        return self._cls(y, train, return_last_feat)


def _psamask(a, mask_size, h, w, collect):
    """mmcv PSAMask as two factored one-hot contractions (MXU-friendly).

    ``a``: [B, h, w, mask_h*mask_w] relative attention predicted at each
    position. Returns [B, h*w (channel = absolute position), h*w
    (spatial)] matching mmcv's buffer layout: collect puts the PREDICTOR
    on the spatial axis (buffer[abs_source, target]); distribute puts it
    on the channel axis (buffer[predictor, abs_target])."""
    b = a.shape[0]
    mh, mw = mask_size
    hh, hw_ = (mh - 1) // 2, (mw - 1) // 2
    a5 = a.reshape(b, h, w, mh, mw)
    eh = (jnp.arange(h)[None, :] ==
          (jnp.arange(h)[:, None] +
           jnp.arange(mh)[:, None, None] - hh)).astype(a.dtype)  # [mh,s,t]
    ew = (jnp.arange(w)[None, :] ==
          (jnp.arange(w)[:, None] +
           jnp.arange(mw)[:, None, None] - hw_)).astype(a.dtype)
    # out[b, s, z, t, u] = a5[b, t, u, m, v] where s = t+m-hh, z = u+v-hw
    out = jnp.einsum('btumv,mst,vzu->bsztu', a5, eh, ew)
    if collect:
        return out.reshape(b, h * w, h * w)
    return out.reshape(b, h * w, h * w).transpose(0, 2, 1)


@HEADS.register_module()
@_head_fields
class PSAHead(_HeadBase):
    """(ref psa_head.py:17-198), exact structure: reduce 1x1 ConvModule,
    shrink-factor resize (align_corners flips to True on odd sizes),
    attention = ConvModule + bias-free conv to mask_h*mask_w, PSAMask
    (or compact transpose) + softmax over the CHANNEL position axis,
    x @ y / normalization_factor, bi-direction concat, the reference's
    quirky 1x1-conv-with-padding-1 ``proj``, resize back, bottleneck on
    cat([identity, out])."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    mask_size: Sequence[int] = (97, 97)
    psa_type: str = 'bi-direction'
    compact: bool = False
    shrink_factor: int = 2
    normalization_factor: float = 1.0
    psa_softmax: bool = True
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    def _branch(self, x, train, name, collect, compact_transpose):
        b, h, w, c = x.shape
        align = self.align_corners
        if self.shrink_factor != 1:
            if h % self.shrink_factor and w % self.shrink_factor:
                h = (h - 1) // self.shrink_factor + 1
                w = (w - 1) // self.shrink_factor + 1
                align = True
            else:
                h = h // self.shrink_factor
                w = w // self.shrink_factor
                align = False
            x = resize_bilinear(x, (h, w), align)
        y = ConvBNReLU(self.channels, 1, name=f'{name}_0')(x, train)
        mh, mw = self.mask_size
        y = nn.Conv(mh * mw, (1, 1), use_bias=False,
                    name=f'{name}_1')(y)
        if self.compact:
            # the ref transposes SINGLE-collect (:138-141) but
            # BI-distribute (:173-175) — an inconsistency kept as-is
            y = y.reshape(b, h * w, h * w)
            if compact_transpose:
                y = y.transpose(0, 2, 1)
        else:
            y = _psamask(y, self.mask_size, h, w, collect)
        if self.psa_softmax:
            y = jax.nn.softmax(y, axis=1)
        out = jnp.einsum('bpc,bpq->bqc', x.reshape(b, h * w, c), y) \
            * (1.0 / self.normalization_factor)
        return out.reshape(b, h, w, c), align

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        identity = self._pick(inputs, patchmix_perm, patchmix_n)
        if self.psa_type in ('collect', 'distribute'):
            x = ConvBNReLU(self.channels, 1, name='reduce')(identity,
                                                            train)
            out, align = self._branch(x, train, 'attention',
                                      self.psa_type == 'collect',
                                      self.psa_type == 'collect')
        else:
            x_col = ConvBNReLU(self.channels, 1, name='reduce')(identity,
                                                                train)
            x_dis = ConvBNReLU(self.channels, 1, name='reduce_p')(identity,
                                                                  train)
            col, align = self._branch(x_col, train, 'attention', True,
                                      False)
            dis, _ = self._branch(x_dis, train, 'attention_p', False,
                                  True)
            out = jnp.concatenate([col, dis], -1)
        # ref quirk: proj is a 1x1 ConvModule with padding=1 (output
        # grows by 2 per side; the resize below interpolates it away)
        out = jnp.pad(out, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = ConvBNReLU(identity.shape[-1], 1, name='proj')(out, train)
        out = resize_bilinear(out, identity.shape[1:3], align)
        y = ConvBNReLU(self.channels, 3, name='bottleneck')(
            jnp.concatenate([identity, out], -1), train)
        return self._cls(y, train, return_last_feat)


@HEADS.register_module()
@_head_fields
class DAHead(_HeadBase):
    """(da_head.py, DANet): position attention + channel attention, summed.
    The reference returns (pam_cam, pam, cam) logits; the primary pam_cam
    output is returned here (aux outputs via return_last_feat feat)."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    pam_channels: int = 64
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = self._pick(inputs, patchmix_perm, patchmix_n)
        # position attention module
        pam = ConvBNReLU(self.channels, 3, name='pam_in')(x, train)
        b, h, w, c = pam.shape
        q = nn.Conv(self.pam_channels, (1, 1), name='pam_q')(
            pam).reshape(b, h * w, -1)
        k = nn.Conv(self.pam_channels, (1, 1), name='pam_k')(
            pam).reshape(b, h * w, -1)
        v = nn.Conv(c, (1, 1), name='pam_v')(pam).reshape(b, h * w, c)
        attn = jax.nn.softmax(jnp.einsum('bqc,bkc->bqk', q, k), -1)
        gamma_p = self.param('pam_gamma', nn.initializers.zeros, ())
        pam = pam + gamma_p * jnp.einsum('bqk,bkc->bqc', attn,
                                         v).reshape(b, h, w, c)
        pam = ConvBNReLU(self.channels, 3, name='pam_out')(pam, train)
        # channel attention module
        cam = ConvBNReLU(self.channels, 3, name='cam_in')(x, train)
        f = cam.reshape(b, h * w, c)
        energy = jnp.einsum('bpc,bpd->bcd', f, f)
        energy = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn_c = jax.nn.softmax(energy, axis=-1)
        gamma_c = self.param('cam_gamma', nn.initializers.zeros, ())
        cam = cam + gamma_c * jnp.einsum(
            'bcd,bpd->bpc', attn_c, f).reshape(b, h, w, c)
        cam = ConvBNReLU(self.channels, 3, name='cam_out')(cam, train)
        # the reference also trains per-branch classifiers (pam_conv_seg /
        # cam_conv_seg, ref da_head.py:106-140); materialize them so the
        # param tree matches for ingestion — XLA removes the dead outputs
        # when only the primary pam_cam logits are consumed
        _ = nn.Conv(self.num_classes, (1, 1), name='pam_conv_seg')(pam)
        _ = nn.Conv(self.num_classes, (1, 1), name='cam_conv_seg')(cam)
        return self._cls(pam + cam, train, return_last_feat)
