"""ResNet / ResNetV1c backbones (flax/NHWC).

Rebuild of the reference ResNet (reference:
mmseg/models/backbones/resnet.py:725 LoC) — the reference extends its
forward to accept-and-ignore the semi kwargs so CNN students run under the
same segmentor (resnet.py:663-665); we do the same. Supports depths
18/34/50/101, dilated stages (output stride 8) as mmseg uses for
segmentation, and the V1c deep stem.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.registry import BACKBONES

Array = jax.Array

ARCH = {
    18: ('basic', (2, 2, 2, 2)),
    34: ('basic', (3, 4, 6, 3)),
    50: ('bottleneck', (3, 4, 6, 3)),
    101: ('bottleneck', (3, 4, 23, 3)),
    152: ('bottleneck', (3, 8, 36, 3)),
}


class ConvBN(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=False, relu=True):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    kernel_dilation=self.dilation, use_bias=False,
                    feature_group_count=self.groups,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn', dtype=jnp.float32)(x)
        return nn.relu(x) if relu else x


def _avg_pool_ceil(x: Array, s: int) -> Array:
    """torch AvgPool2d(kernel=s, stride=s, ceil_mode=True,
    count_include_pad=False) — the ResNetV1d avg_down pool
    (mmcv res_layer.py:49-54). Partial border windows average only the
    real pixels."""
    h, w = x.shape[1], x.shape[2]
    pad = ((0, 0), (0, (-h) % s), (0, (-w) % s), (0, 0))
    dims, strides = (1, s, s, 1), (1, s, s, 1)
    sums = jax.lax.reduce_window(x, jnp.zeros((), x.dtype), jax.lax.add,
                                 dims, strides, pad)
    cnt = jax.lax.reduce_window(jnp.ones((1, h, w, 1), x.dtype),
                                jnp.zeros((), x.dtype), jax.lax.add,
                                dims, strides, pad)
    return sums / cnt


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = ConvBN(self.planes, 3, self.stride, self.dilation,
                   name='conv1')(x, train)
        # conv2 dilation is ALWAYS 1 in the reference BasicBlock
        # (resnet.py:49: padding=1, no dilation arg) — only conv1 dilates
        y = ConvBN(self.planes, 3, 1, 1, name='conv2')(
            y, train, relu=False)
        if self.downsample:
            if self.avg_down and self.stride > 1:
                identity = _avg_pool_ceil(identity, self.stride)
            conv_stride = 1 if self.avg_down else self.stride
            identity = ConvBN(self.planes, 1, conv_stride,
                              name='downsample')(identity, train,
                                                 relu=False)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    avg_down: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = ConvBN(self.planes, 1, 1, name='conv1')(x, train)
        y = ConvBN(self.planes, 3, self.stride, self.dilation,
                   name='conv2')(y, train)
        y = ConvBN(self.planes * 4, 1, 1, name='conv3')(y, train,
                                                        relu=False)
        if self.downsample:
            if self.avg_down and self.stride > 1:
                identity = _avg_pool_ceil(identity, self.stride)
            conv_stride = 1 if self.avg_down else self.stride
            identity = ConvBN(self.planes * 4, 1, conv_stride,
                              name='downsample')(identity, train,
                                                 relu=False)
        return nn.relu(y + identity)


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    in_channels: int = 3
    stem_channels: int = 64
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    deep_stem: bool = False
    avg_down: bool = False
    contract_dilation: bool = False
    # parity/no-op keys
    norm_cfg: Optional[dict] = None
    norm_eval: bool = False
    style: str = 'pytorch'
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    frozen_stages: int = -1
    with_cp: bool = False
    # ICNet hook (ref icnet.py:152-159): bilinear-halve the FEATURES
    # after this stage index before running the remaining stages
    half_after_stage: Optional[int] = None
    align_corners: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False,
                 attn_bias=None, pos_mode: str = 'default',
                 use_fdrop: bool = False, return_attn: bool = False):
        # semi kwargs accepted and ignored (reference resnet.py:663-665)
        block_name, stage_blocks = ARCH[self.depth]
        block_cls = BasicBlock if block_name == 'basic' else Bottleneck
        if self.deep_stem:
            x = ConvBN(self.stem_channels // 2, 3, 2, name='stem1')(x, train)
            x = ConvBN(self.stem_channels // 2, 3, 1, name='stem2')(x, train)
            x = ConvBN(self.stem_channels, 3, 1, name='stem3')(x, train)
        else:
            x = ConvBN(self.stem_channels, 7, 2, name='stem')(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_channels
        for i in range(self.num_stages):
            stride = self.strides[i]
            dilation = self.dilations[i]
            expansion = 1 if block_name == 'basic' else 4
            for j in range(stage_blocks[i]):
                d = dilation
                if j == 0 and dilation > 1 and self.contract_dilation:
                    d = dilation // 2
                # reference ResLayer adds the 1x1 downsample only when the
                # residual shape changes (res_layer.py:55-66) — ResNet-18's
                # layer1 has NONE (stride 1, 64 -> 64)
                need_down = j == 0 and (
                    stride != 1 or x.shape[-1] != planes * expansion)
                x = block_cls(planes, stride if j == 0 else 1, d,
                              downsample=need_down,
                              avg_down=self.avg_down,
                              name=f'layer{i + 1}_{j}')(x, train)
            planes *= 2
            if i in self.out_indices:
                if use_fdrop:
                    rng = self.make_rng('fdrop')
                    keep = jax.random.bernoulli(
                        rng, 0.5, (x.shape[0], 1, 1, x.shape[-1]))
                    x_out = jnp.where(keep, x * 2.0, 0.0)
                else:
                    x_out = x
                outs.append(x_out)
            if i == self.half_after_stage:
                # the out_indices tap above sees the PRE-resize features
                # (ref icnet.py:149-159: layer2 -> conv_sub2 tap ->
                # resize 0.5 -> layer3). NOTE the ref also flips the stem
                # maxpool to ceil_mode=True; jax lacks ceil_mode — even
                # input sizes are identical (disclosed in PARITY.md)
                from s4former_tpu.ops.resize import resize_bilinear
                x = resize_bilinear(
                    x, (max(x.shape[1] // 2, 1), max(x.shape[2] // 2, 1)),
                    self.align_corners)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)


@BACKBONES.register_module()
class ResNetV1c(ResNet):
    """ResNet with deep stem (mmseg default for CNN segmentors)."""

    def __init__(self, **kwargs):
        kwargs['deep_stem'] = True
        super().__init__(**kwargs)


@BACKBONES.register_module()
class ResNetV1d(ResNet):
    """Deep stem + avg_down shortcuts (ref resnet.py:711-725: AvgPool
    before a stride-1 1x1 in every downsampling shortcut)."""

    def __init__(self, **kwargs):
        kwargs['deep_stem'] = True
        kwargs['avg_down'] = True
        super().__init__(**kwargs)
