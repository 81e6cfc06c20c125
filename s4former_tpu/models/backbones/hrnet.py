"""HRNet backbone (flax/NHWC).

Rebuild of the reference zoo member (reference:
mmseg/models/backbones/hrnet.py:642 — unused by S4Former configs).
Parallel multi-resolution branches with repeated cross-resolution fusion.
Compact implementation: standard HRNetV2 topology driven by an ``extra``
config dict like the reference.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import BACKBONES

Array = jax.Array

DEFAULT_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, num_blocks=(2,),
                num_channels=(32,)),
    stage2=dict(num_modules=1, num_branches=2, num_blocks=(2, 2),
                num_channels=(16, 32)),
    stage3=dict(num_modules=2, num_branches=3, num_blocks=(2, 2, 2),
                num_channels=(16, 32, 64)),
    stage4=dict(num_modules=2, num_branches=4, num_blocks=(2, 2, 2, 2),
                num_channels=(16, 32, 64, 128)),
)


class ConvBN(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(self.kernel - 1) // 2, use_bias=False,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name='bn', dtype=jnp.float32)(x)
        return nn.relu(x) if self.relu else x


class BasicBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        y = ConvBN(self.channels, 3, name='c1')(x, train)
        y = ConvBN(self.channels, 3, relu=False, name='c2')(y, train)
        if identity.shape[-1] != self.channels:
            identity = ConvBN(self.channels, 1, relu=False,
                              name='down')(x, train)
        return nn.relu(y + identity)


class FuseLayer(nn.Module):
    """Cross-resolution fusion: every branch receives every other branch,
    up/downsampled to its resolution, summed."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, xs, train=False):
        outs = []
        for i, ci in enumerate(self.channels):
            acc = None
            for j, xj in enumerate(xs):
                y = xj
                if j < i:   # downsample by repeated stride-2 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = ConvBN(ci if last else y.shape[-1], 3, 2,
                                   relu=not last,
                                   name=f'down_{i}_{j}_{s}')(y, train)
                elif j > i:  # 1x1 + bilinear upsample
                    y = ConvBN(ci, 1, relu=False,
                               name=f'up_{i}_{j}')(y, train)
                    y = resize_bilinear(y, xs[i].shape[1:3], False)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Optional[Dict[str, Any]] = None
    in_channels: int = 3
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        extra = {k: dict(v) for k, v in
                 (self.extra or DEFAULT_EXTRA).items()}
        # stem: two stride-2 convs -> 1/4 resolution
        x = ConvBN(64, 3, 2, name='stem1')(x, train)
        x = ConvBN(64, 3, 2, name='stem2')(x, train)
        s1 = extra['stage1']
        for b in range(s1['num_blocks'][0]):
            x = BasicBlock(s1['num_channels'][0], name=f's1_b{b}')(x, train)
        xs = [x]
        for stage_i in (2, 3, 4):
            cfg = extra[f'stage{stage_i}']
            chs = cfg['num_channels']
            # transition: adjust channels / create the new lower branch
            new_xs = []
            for i, c in enumerate(chs):
                if i < len(xs):
                    y = xs[i]
                    if y.shape[-1] != c:
                        y = ConvBN(c, 3, name=f't{stage_i}_{i}')(y, train)
                else:
                    y = ConvBN(c, 3, 2, name=f't{stage_i}_{i}')(
                        xs[-1], train)
                new_xs.append(y)
            xs = new_xs
            for m in range(cfg['num_modules']):
                for i, c in enumerate(chs):
                    for b in range(cfg['num_blocks'][i]):
                        xs[i] = BasicBlock(
                            c, name=f's{stage_i}_m{m}_br{i}_b{b}')(
                                xs[i], train)
                xs = FuseLayer(chs, name=f's{stage_i}_m{m}_fuse')(xs, train)
        if return_attn:
            return tuple(xs), ([], None)
        return tuple(xs)
