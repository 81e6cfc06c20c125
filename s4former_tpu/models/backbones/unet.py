"""UNet backbone (flax/NHWC).

Rebuild of the reference zoo member (reference:
mmseg/models/backbones/unet.py:438 — unused by S4Former configs). Classic
encoder-decoder with skip connections; returns the decoder feature pyramid
(deepest first is index 0 to match mmseg's out ordering: the reference
returns enc outputs + final dec levels; here we return each decoder level,
coarse to fine, plus the bottleneck).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import BACKBONES

Array = jax.Array


class DoubleConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=1,
                        use_bias=False, name=f'conv{i}')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f'bn{i}', dtype=jnp.float32)(x)
            x = nn.relu(x)
        return x


@BACKBONES.register_module()
class UNet(nn.Module):
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 5
    strides: Sequence[int] = (1, 1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True, True)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        # encoder
        skips = []
        ch = self.base_channels
        for s in range(self.num_stages):
            if s > 0 and self.downsamples[s - 1]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = DoubleConv(ch, name=f'enc_{s}')(x, train)
            skips.append(x)
            if s < self.num_stages - 1:
                ch *= 2
        # decoder
        outs = [skips[-1]]
        y = skips[-1]
        for s in range(self.num_stages - 2, -1, -1):
            ch //= 2
            y = resize_bilinear(y, skips[s].shape[1:3], False)
            y = jnp.concatenate([skips[s], y], axis=-1)
            y = DoubleConv(ch, name=f'dec_{s}')(y, train)
            outs.append(y)
        if return_attn:
            return tuple(outs), ([], None)
        return tuple(outs)
