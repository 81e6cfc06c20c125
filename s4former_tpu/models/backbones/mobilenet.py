"""MobileNetV2 / V3 backbones (flax/NHWC).

Rebuilds of the reference zoo members
(reference: mmseg/models/backbones/mobilenet_v2.py:197,
mobilenet_v3.py:267 — unused by the S4Former configs). Inverted residual
blocks with dilation support for segmentation output strides; V3 adds
squeeze-excite + hard-swish.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.registry import BACKBONES

Array = jax.Array


def hard_swish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class ConvBNAct(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: str = 'relu6'
    # mmcv Conv2dAdaptivePadding == TF-style 'SAME'
    same_pad: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        pad = 'SAME' if self.same_pad else \
            self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=pad,
                    feature_group_count=self.groups,
                    kernel_dilation=self.dilation, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name='bn', dtype=jnp.float32)(x)
        if self.act == 'relu6':
            return jnp.clip(x, 0.0, 6.0)
        if self.act == 'hswish':
            return hard_swish(x)
        if self.act == 'relu':
            return nn.relu(x)
        return x


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dilation: int = 1
    use_se: bool = False
    act: str = 'relu6'

    @nn.compact
    def __call__(self, x, train=False):
        c_in = x.shape[-1]
        hidden = c_in * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, 1, act=self.act, name='expand')(y, train)
        y = ConvBNAct(hidden, 3, self.stride, groups=hidden,
                      dilation=self.dilation, act=self.act,
                      name='dw')(y, train)
        if self.use_se:
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(max(hidden // 4, 8), (1, 1),
                                name='se_fc1')(s))
            s = jax.nn.sigmoid(nn.Conv(hidden, (1, 1), name='se_fc2')(s))
            y = y * s
        y = ConvBNAct(self.out_channels, 1, act='none', name='project')(
            y, train)
        if self.stride == 1 and c_in == self.out_channels:
            return x + y
        return y


# (expand_ratio, channels, num_blocks, stride) per stage — MobileNetV2
_V2_ARCH = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


@BACKBONES.register_module()
class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    strides: Sequence[int] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1)
    out_indices: Sequence[int] = (1, 2, 4, 6)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        def ch(c):
            return max(int(c * self.widen_factor), 8)

        x = ConvBNAct(ch(32), 3, 2, name='stem')(x, train)
        outs = []
        for i, (t, c, n, _) in enumerate(_V2_ARCH):
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(n):
                x = InvertedResidual(
                    ch(c), stride if j == 0 else 1, t, dilation,
                    name=f'layer{i}_{j}')(x, train)
            if i in self.out_indices:
                outs.append(x)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)


def _make_divisible(v, divisor=8):
    """mmcv make_divisible (se_layer.py SELayer hidden channels)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _hsigmoid(x):
    """mmcv HSigmoid(bias=3, divisor=6)."""
    return jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)


# [kernel, mid_channels, out_channels, with_se, act, stride] — exact
# reference tables (ref mobilenet_v3.py:44-71)
_V3_ARCH = {
    'small': [(3, 16, 16, True, 'relu', 2), (3, 72, 24, False, 'relu', 2),
              (3, 88, 24, False, 'relu', 1), (5, 96, 40, True, 'hswish', 2),
              (5, 240, 40, True, 'hswish', 1), (5, 240, 40, True, 'hswish', 1),
              (5, 120, 48, True, 'hswish', 1), (5, 144, 48, True, 'hswish', 1),
              (5, 288, 96, True, 'hswish', 2), (5, 576, 96, True, 'hswish', 1),
              (5, 576, 96, True, 'hswish', 1)],
    'large': [(3, 16, 16, False, 'relu', 1), (3, 64, 24, False, 'relu', 2),
              (3, 72, 24, False, 'relu', 1), (5, 72, 40, True, 'relu', 2),
              (5, 120, 40, True, 'relu', 1), (5, 120, 40, True, 'relu', 1),
              (3, 240, 80, False, 'hswish', 2),
              (3, 200, 80, False, 'hswish', 1),
              (3, 184, 80, False, 'hswish', 1),
              (3, 184, 80, False, 'hswish', 1),
              (3, 480, 112, True, 'hswish', 1),
              (3, 672, 112, True, 'hswish', 1),
              (5, 672, 160, True, 'hswish', 2),
              (5, 960, 160, True, 'hswish', 1),
              (5, 960, 160, True, 'hswish', 1)],
}


@BACKBONES.register_module()
class MobileNetV3(nn.Module):
    """Exact reference rebuild (ref mobilenet_v3.py:15-260 +
    utils/inverted_residual.py InvertedResidualV3 + utils/se_layer.py):

    - layer0 stem and every ORIGINALLY-stride-2 depthwise conv use
      Conv2dAdaptivePadding (TF 'SAME');
    - SE: biased 1x1 convs, hidden = make_divisible(mid//4, 8), ReLU +
      HSigmoid(bias 3, divisor 6);
    - segmentation dilation surgery (ref :209-241): the last two
      stride-2 dw convs become stride 1; layers from the first such
      index get dilation 2, from the second dilation 4. The residual
      shortcut keeps the PRE-surgery stride condition (the ref mutates
      conv.stride after with_res_shortcut was computed), so the
      surgically-stride-1 blocks still have NO shortcut."""
    arch: str = 'small'
    out_indices: Sequence[int] = (0, 1, 12)
    reduction_factor: int = 1
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        table = _V3_ARCH[self.arch]
        surge = (7, 13) if self.arch == 'large' else (4, 9)
        x = ConvBNAct(16, 3, 2, act='hswish', same_pad=True,
                      name='layer0')(x, train)
        outs = [x] if 0 in self.out_indices else []
        for i, (k, mid, c, se, act, stride) in enumerate(table):
            li = i + 1
            if (self.arch == 'large' and i >= 12) or \
                    (self.arch == 'small' and i >= 8):
                mid //= self.reduction_factor
                c //= self.reduction_factor
            dilation = 1
            if li >= surge[0]:
                dilation = 2 if li < surge[1] else 4
            eff_stride = 1 if li in surge else stride
            c_in = x.shape[-1]
            y = x
            if mid != c_in:
                y = ConvBNAct(mid, 1, act=act,
                              name=f'layer{li}_expand')(y, train)
            y = ConvBNAct(mid, k, eff_stride, groups=mid,
                          dilation=dilation, act=act,
                          same_pad=(stride == 2),
                          name=f'layer{li}_dw')(y, train)
            if se:
                hidden = _make_divisible(mid // 4, 8)
                s = jnp.mean(y, axis=(1, 2), keepdims=True)
                s = nn.relu(nn.Conv(hidden, (1, 1),
                                    name=f'layer{li}_se1')(s))
                s = _hsigmoid(nn.Conv(mid, (1, 1),
                                      name=f'layer{li}_se2')(s))
                y = y * s
            y = ConvBNAct(c, 1, act='none',
                          name=f'layer{li}_linear')(y, train)
            # ref computes the shortcut from the TABLE stride
            x = x + y if (stride == 1 and c_in == c) else y
            if li in self.out_indices:
                outs.append(x)
        last = len(table) + 1
        x = ConvBNAct(576 if self.arch == 'small' else 960, 1,
                      dilation=4, act='hswish',
                      name=f'layer{last}')(x, train)
        if last in self.out_indices:
            outs.append(x)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)
