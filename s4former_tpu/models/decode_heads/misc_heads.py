"""Additional decode heads: FCN, SETR-MLA, PSP, UPer (zoo breadth).

Rebuilds of the reference heads (reference:
mmseg/models/decode_heads/fcn_head.py, setr_mla_head.py, psp_head.py,
uper_head.py). All NHWC, PatchShuffle-aware where the reference is.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.decode_heads.base import (transform_inputs,
                                                   unshuffle_feature_map)
from s4former_tpu.ops.resize import adaptive_avg_pool, resize_bilinear
from s4former_tpu.registry import HEADS

Array = jax.Array


class ConvBNReLU(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        k = self.kernel_size
        pad = self.dilation * (k - 1) // 2
        x = nn.Conv(self.out_channels, (k, k), padding=pad,
                    kernel_dilation=self.dilation, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn', dtype=jnp.float32)(x)
        return nn.relu(x)


@HEADS.register_module()
class FCNHead(nn.Module):
    """(fcn_head.py): num_convs x ConvBNReLU (+concat input) + classifier."""
    in_channels: int = 768
    channels: int = 256
    num_classes: int = 21
    num_convs: int = 2
    kernel_size: int = 3
    concat_input: bool = True
    dilation: int = 1
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners) \
            if isinstance(inputs, (list, tuple)) else inputs
        if patchmix_perm is not None and patchmix_n:
            x = unshuffle_feature_map(x, patchmix_perm, patchmix_n)
        inp = x
        for i in range(self.num_convs):
            x = ConvBNReLU(self.channels, self.kernel_size, self.dilation,
                           name=f'convs_{i}')(x, train)
        if self.num_convs == 0:
            x = inp
        if self.concat_input and self.num_convs > 0:
            x = ConvBNReLU(self.channels, self.kernel_size,
                           name='conv_cat')(
                               jnp.concatenate([inp, x], -1), train)
        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(x).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits


@HEADS.register_module()
class SETRMLAHead(nn.Module):
    """(setr_mla_head.py): per-branch [1x1 conv + 4x up] then concat."""
    in_channels: Sequence[int] = (256, 256, 256, 256)
    channels: int = 512
    num_classes: int = 19
    mla_channels: int = 128
    up_scale: int = 4
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'
    dropout_ratio: float = 0.0
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        feats = [inputs[i] for i in self.in_index]
        outs = []
        for i, f in enumerate(feats):
            if patchmix_perm is not None and patchmix_n:
                f = unshuffle_feature_map(f, patchmix_perm, patchmix_n)
            y = ConvBNReLU(self.mla_channels, 3, name=f'up_conv_{i}_a')(
                f, train)
            y = ConvBNReLU(self.mla_channels, 3, name=f'up_conv_{i}_b')(
                y, train)
            y = resize_bilinear(
                y, (y.shape[1] * self.up_scale, y.shape[2] * self.up_scale),
                self.align_corners)
            outs.append(y)
        x = jnp.concatenate(outs, axis=-1)
        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(x).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits


@HEADS.register_module()
class PSPHead(nn.Module):
    """(psp_head.py): pyramid pooling module head."""
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 21
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        x = transform_inputs(inputs, self.in_index, self.input_transform,
                             self.align_corners) \
            if isinstance(inputs, (list, tuple)) else inputs
        if patchmix_perm is not None and patchmix_n:
            x = unshuffle_feature_map(x, patchmix_perm, patchmix_n)
        h, w = x.shape[1:3]
        branches = [x]
        for i, s in enumerate(self.pool_scales):
            # exact torch-AdaptiveAvgPool2d windows as constant matmuls
            # (the old s*floor(h/s) truncation dropped border rows
            # whenever h % s != 0 — e.g. every 16x16 1/32 map at scales
            # 3 and 6)
            pooled = adaptive_avg_pool(x, (s, s))
            y = ConvBNReLU(self.channels, 1, name=f'pool_conv_{i}')(
                pooled, train)
            branches.append(resize_bilinear(y, (h, w), self.align_corners))
        x = ConvBNReLU(self.channels, 3, name='bottleneck')(
            jnp.concatenate(branches, -1), train)
        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(x).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits


@HEADS.register_module()
class UPerHead(nn.Module):
    """(uper_head.py): PSP on the deepest level + FPN top-down fusion."""
    in_channels: Sequence[int] = (96, 192, 384, 768)
    channels: int = 512
    num_classes: int = 150
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'
    dropout_ratio: float = 0.1
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        feats = [inputs[i] for i in self.in_index]
        # PSP bottleneck on the deepest feature
        x = feats[-1]
        h, w = x.shape[1:3]
        branches = [x]
        for i, s in enumerate(self.pool_scales):
            # exact adaptive-pool windows (see PSPHead note; handles
            # h < s like torch — repeated rows)
            pooled = adaptive_avg_pool(x, (s, s))
            y = ConvBNReLU(self.channels, 1, name=f'psp_{i}')(pooled, train)
            branches.append(resize_bilinear(y, (h, w), self.align_corners))
        psp = ConvBNReLU(self.channels, 3, name='psp_bottleneck')(
            jnp.concatenate(branches, -1), train)
        # FPN top-down
        laterals = [ConvBNReLU(self.channels, 1, name=f'lateral_{i}')(
            f, train) for i, f in enumerate(feats[:-1])] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            up = resize_bilinear(laterals[i], laterals[i - 1].shape[1:3],
                                 self.align_corners)
            laterals[i - 1] = laterals[i - 1] + up
        outs = [ConvBNReLU(self.channels, 3, name=f'fpn_{i}')(
            laterals[i], train) for i in range(len(laterals) - 1)] + \
            [laterals[-1]]
        target_hw = outs[0].shape[1:3]
        outs = [o if o.shape[1:3] == target_hw else
                resize_bilinear(o, target_hw, self.align_corners)
                for o in outs]
        x = ConvBNReLU(self.channels, 3, name='fpn_bottleneck')(
            jnp.concatenate(outs, -1), train)
        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(x).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits


@HEADS.register_module()
class OCRHead(nn.Module):
    """(ocr_head.py): Object-Contextual Representations. A CASCADE head:
    takes backbone features PLUS the previous head's logits (appended as
    the last input by CascadeEncoderDecoder). Soft object regions from the
    prior logits gather per-class context vectors; pixels attend to them.
    """
    in_channels: int = 2048
    channels: int = 512
    num_classes: int = 19
    ocr_channels: int = 256
    scale: int = 1
    in_index: Union[int, Sequence[int]] = -1
    input_transform: Optional[str] = None
    dropout_ratio: float = 0.1
    align_corners: bool = False
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0, return_last_feat: bool = False):
        # last element = previous-stage logits (cascade contract)
        prev_logits = inputs[-1]
        feats = inputs[:-1]
        x = transform_inputs(list(feats), self.in_index,
                             self.input_transform, self.align_corners) \
            if isinstance(feats, (list, tuple)) else feats
        x = ConvBNReLU(self.channels, 3, name='bottleneck')(x, train)
        b, h, w, c = x.shape
        if prev_logits.shape[1:3] != (h, w):
            prev_logits = resize_bilinear(prev_logits, (h, w),
                                          self.align_corners)
        # SpatialGatherModule (ref ocr_head.py:13-37): soft object regions
        # = softmax over the SPATIAL dim of each class map, then a
        # probs @ pixels contraction -> per-class context [B, K, C]
        probs = jax.nn.softmax(
            self.scale * prev_logits.reshape(b, h * w, -1), axis=1)
        pixels = x.reshape(b, h * w, c)
        context = jnp.einsum('bpk,bpc->bkc', probs, pixels)
        # ObjectAttentionBlock (ref ocr_head.py:40-82 on
        # utils/self_attention_block.py): 2-conv query/key projections,
        # 1-conv value/out projections — every projection a 1x1
        # ConvModule (conv-no-bias + BN + ReLU); context vectors are a
        # [B, K, 1, C] "image" so BN statistics pool over (B, K) exactly
        # like BatchNorm2d on the reference's [B, C, K, 1] layout
        ctx_img = context[:, :, None, :]
        q = x
        for i in range(2):
            q = ConvBNReLU(self.ocr_channels, 1,
                           name=f'ocb_query_{i}')(q, train)
        k = ctx_img
        for i in range(2):
            k = ConvBNReLU(self.ocr_channels, 1,
                           name=f'ocb_key_{i}')(k, train)
        v = ConvBNReLU(self.ocr_channels, 1, name='ocb_value')(
            ctx_img, train)
        sim = jnp.einsum('bhwc,bkc->bhwk', q, k[:, :, 0, :]) \
            * float(self.ocr_channels) ** -0.5
        attn = jax.nn.softmax(sim, axis=-1)
        ocr = jnp.einsum('bhwk,bkc->bhwc', attn, v[:, :, 0, :])
        ocr = ConvBNReLU(self.channels, 1, name='ocb_out')(ocr, train)
        # ref ObjectAttentionBlock.bottleneck: cat([context, query]) —
        # context FIRST
        y = ConvBNReLU(self.channels, 1, name='ocb_bottleneck')(
            jnp.concatenate([ocr, x], axis=-1), train)
        feat = y
        if self.dropout_ratio > 0:
            y = nn.Dropout(self.dropout_ratio)(y, deterministic=not train)
        logits = nn.Conv(self.num_classes, (1, 1),
                         name='conv_seg')(y).astype(jnp.float32)
        return (logits, feat) if return_last_feat else logits
