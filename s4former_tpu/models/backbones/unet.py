"""UNet backbone (flax/NHWC) — exact reference topology.

Rebuild of the reference zoo member
(reference: mmseg/models/backbones/unet.py:16-438 +
models/utils/up_conv_block.py:9-103 — unused by S4Former's own configs):

- encoder stage i: optional MaxPool2d(2) (strides[i]==1 and
  downsamples[i-1]) then ``BasicConvBlock`` — num_convs 3x3 ConvModules
  where conv 0 carries the stride and dilation 1 and the REST carry the
  stage dilation (ref :66-77);
- decoder i: ``UpConvBlock`` — InterpConv upsample (bilinear x2
  align_corners=False followed by a 1x1 conv+BN+ReLU; ref :196-222) when
  the matching encoder stage downsampled, otherwise a plain 1x1
  ConvModule; concat [skip, upsampled] then a BasicConvBlock;
- forward returns [bottleneck, dec_{n-1}, ..., dec_1] — coarse to fine
  (ref :405-415).

Round-4 note: replaced the earlier compact (non-ingestable) rebuild so
mmseg UNet checkpoints load via ``convert_unet_backbone``; the flax
param tree changed accordingly.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import BACKBONES

Array = jax.Array


class ConvModule(nn.Module):
    """conv + BN + optional ReLU (mmcv ConvModule with BN: bias-free)."""
    out_channels: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train=False, relu=True):
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=self.padding, kernel_dilation=self.dilation,
                    use_bias=False, name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn', dtype=jnp.float32)(x)
        return nn.relu(x) if relu else x


class DeconvModule(nn.Module):
    """ConvTranspose(k, s=scale, p=(k-scale)/2, biased) + BN + ReLU
    (reference unet.py:90-147). torch equivalence: flax ConvTranspose
    padding lo=hi=k-1-p; checkpoint kernels arrive transposed+flipped
    (core/checkpoint.py deconv recipe)."""
    out_channels: int
    kernel: int = 4
    scale: int = 2

    @nn.compact
    def __call__(self, x, train=False):
        assert (self.kernel - self.scale) >= 0 and \
            (self.kernel - self.scale) % 2 == 0
        p = (self.kernel - self.scale) // 2
        lohi = self.kernel - 1 - p
        x = nn.ConvTranspose(self.out_channels,
                             (self.kernel, self.kernel),
                             strides=(self.scale, self.scale),
                             padding=((lohi, lohi), (lohi, lohi)),
                             use_bias=True, name='deconv')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn', dtype=jnp.float32)(x)
        return nn.relu(x)


class BasicConvBlock(nn.Module):
    """num_convs 3x3 convs; conv 0: stride + dilation 1; rest: dilation
    (reference unet.py:66-77)."""
    out_channels: int
    num_convs: int = 2
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        for c in range(self.num_convs):
            first = c == 0
            x = ConvModule(self.out_channels, 3,
                           self.stride if first else 1,
                           1 if first else self.dilation,
                           padding=1 if first else self.dilation,
                           name=f'conv{c}')(x, train)
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
    enc_dilations: Sequence[int] = (1, 1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1, 1)
    # upsample_cfg type: 'InterpConv' (default) or 'DeconvModule'
    # (ref unet.py:90-222); other keys accepted-and-ignored
    upsample_cfg: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    norm_eval: bool = False
    with_cp: bool = False
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        base = self.base_channels
        enc_outs = []
        for i in range(self.num_stages):
            if i > 0 and self.strides[i] == 1 and self.downsamples[i - 1]:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = BasicConvBlock(base * 2 ** i, self.enc_num_convs[i],
                               self.strides[i], self.enc_dilations[i],
                               name=f'enc_{i}')(x, train)
            enc_outs.append(x)
        dec_outs = [x]
        for i in range(self.num_stages - 1, 0, -1):
            skip = enc_outs[i - 1]
            upsample = self.strides[i] != 1 or self.downsamples[i - 1]
            up_cfg = self.upsample_cfg or {}
            if upsample and up_cfg.get('type') == 'DeconvModule':
                x = DeconvModule(base * 2 ** (i - 1),
                                 kernel=up_cfg.get('kernel_size', 4),
                                 scale=up_cfg.get('scale_factor', 2),
                                 name=f'dec_{i}_up')(x, train)
            else:
                if upsample:
                    # InterpConv, conv_first=False: bilinear x2 (AC=False)
                    # then 1x1 conv+BN+ReLU to the skip's channel count
                    x = resize_bilinear(x, skip.shape[1:3], False)
                x = ConvModule(base * 2 ** (i - 1), 1, padding=0,
                               name=f'dec_{i}_up')(x, train)
            x = jnp.concatenate([skip, x], axis=-1)
            x = BasicConvBlock(base * 2 ** (i - 1),
                               self.dec_num_convs[i - 1], 1,
                               self.dec_dilations[i - 1],
                               name=f'dec_{i}_conv')(x, train)
            dec_outs.append(x)
        if return_attn:
            return tuple(dec_outs), ([], None)
        return tuple(dec_outs)
