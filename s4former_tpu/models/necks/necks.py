"""Necks: MLA (SETR-MLA), MultiLevelNeck, Feature2Pyramid, FPN.

Rebuild of the reference neck zoo (reference: mmseg/models/necks/
mla_neck.py, multilevel_neck.py, featurepyramid.py, fpn.py; exports in
necks/__init__.py). SETR-PUP uses no neck; MLA is the SETR-MLA variant
(SURVEY.md §2.4). All NHWC.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.decode_heads.misc_heads import \
    ConvBNReLU as _ConvModule
from s4former_tpu.ops.resize import resize_bilinear, resize_nearest
from s4former_tpu.registry import NECKS

Array = jax.Array


class ConvReLU(nn.Module):
    out_channels: int
    kernel: int = 1
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    padding=pad, use_bias=not self.use_norm, name='conv')(x)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name='bn', dtype=jnp.float32)(x)
        return nn.relu(x)


@NECKS.register_module()
class MLANeck(nn.Module):
    """(mla_neck.py:8-117), exact structure: per-level token LayerNorm
    (the ViT final norms moved into the neck, eps 1e-6) -> 1x1
    channel_proj -> deepest-first cumulative aggregation -> 3x3
    feat_extract. channel_proj/feat_extract are ConvModules with
    norm_cfg=None/act_cfg=None, i.e. plain BIASED convs. NOTE the output
    tuple is deepest-first (mid_list order [m5, m4, m3, m2] — the
    reference's o2..o5 comment describes intent, not the code)."""
    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    out_channels: int = 256
    norm_layer: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        n = len(inputs)
        eps = (self.norm_layer or {}).get('eps', 1e-6)
        feats = []
        for i, x in enumerate(inputs):
            # flax LN over the channel axis == ref's nchw->nlc->LN->nchw
            x = nn.LayerNorm(epsilon=eps, name=f'norm_{i}')(x)
            feats.append(nn.Conv(self.out_channels, (1, 1),
                                 name=f'proj_{i}')(x))
        rev = feats[::-1]
        mids = [rev[0]]
        for f in rev[1:]:
            mids.append(mids[-1] + f)
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1,
                        name=f'feat_{k}')(m)
                for k, m in enumerate(mids)]
        return tuple(outs)


@NECKS.register_module()
class MultiLevelNeck(nn.Module):
    """(ref multilevel_neck.py:9-74), exact structure: biased no-norm
    1x1 laterals (one per in_channel, DUPLICATED across scales when a
    single input arrives), per-level bilinear rescale, biased 3x3
    convs."""
    in_channels: Sequence[int] = (768, 768, 768, 768)
    out_channels: int = 768
    scales: Sequence[float] = (0.5, 1, 2, 4)
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        feats = [nn.Conv(self.out_channels, (1, 1),
                         name=f'lateral_{i}')(x)
                 for i, x in enumerate(inputs)]
        if len(feats) == 1:
            feats = [feats[0] for _ in range(len(self.scales))]
        outs = []
        for i, y in enumerate(feats):
            s = self.scales[i]
            if s != 1:
                y = resize_bilinear(
                    y, (int(y.shape[1] * s), int(y.shape[2] * s)), False)
            y = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name=f'conv_{i}')(y)
            outs.append(y)
        return tuple(outs)


@NECKS.register_module()
class Feature2Pyramid(nn.Module):
    """(ref featurepyramid.py:8-75), exact structure: rescale-4 is
    deconv(2,2) + norm + GELU + deconv(2,2); rescale-2 a single
    deconv(2,2); 1 identity; 0.5/0.25 max pools. Deconv weights map from
    torch via transpose(2,3,0,1) + double spatial flip."""
    embed_dim: int = 768
    rescales: Sequence[float] = (4, 2, 1, 0.5)
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        def deconv2(x, name):
            return nn.ConvTranspose(self.embed_dim, (2, 2),
                                    strides=(2, 2), padding='VALID',
                                    name=name)(x)

        outs = []
        for i, x in enumerate(inputs):
            s = self.rescales[i]
            if s == 4:
                x = deconv2(x, 'up4_deconv1')
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name='up4_bn')(x)
                x = nn.gelu(x, approximate=False)
                x = deconv2(x, 'up4_deconv2')
            elif s == 2:
                x = deconv2(x, 'up2_deconv')
            elif s == 1:
                pass
            elif s == 0.5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            elif s == 0.25:
                x = nn.max_pool(x, (4, 4), strides=(4, 4))
            else:
                raise KeyError(f'invalid {s} for feature2pyramid')
            outs.append(x)
        return tuple(outs)


@NECKS.register_module()
class FPN(nn.Module):
    """(fpn.py): classic feature pyramid.

    Top-down upsampling defaults to NEAREST like the reference
    (fpn.py:81 ``upsample_cfg=dict(mode='nearest')``); laterals/fpn convs
    are ConvModules with norm_cfg=None, i.e. biased convs with no BN/act
    — matching state_dict keys ``lateral_convs.{i}.conv`` /
    ``fpn_convs.{i}.conv``."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 4
    upsample_mode: str = 'nearest'

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        laterals = [nn.Conv(self.out_channels, (1, 1),
                            name=f'lateral_{i}')(x)
                    for i, x in enumerate(inputs)]
        for i in range(len(laterals) - 1, 0, -1):
            hw = laterals[i - 1].shape[1:3]
            if self.upsample_mode == 'nearest':
                up = resize_nearest(laterals[i], hw)
            else:
                up = resize_bilinear(laterals[i], hw, False)
            laterals[i - 1] = laterals[i - 1] + up
        outs = [nn.Conv(self.out_channels, (3, 3), padding=1,
                        name=f'fpn_{i}')(laterals[i])
                for i in range(len(laterals))]
        return tuple(outs[:self.num_outs])


class CascadeFeatureFusion(nn.Module):
    """(ref ic_neck.py:9-72): upsample the low branch, DILATED 3x3
    ConvModule on it, 1x1 ConvModule on the high branch, relu(sum);
    returns (fused, low_projection) — the low projections are ICNet's
    cascade-label-guidance aux taps."""
    out_channels: int
    align_corners: bool = False

    @nn.compact
    def __call__(self, x_low, x_high, train=False):
        x_low = resize_bilinear(x_low, x_high.shape[1:3],
                                self.align_corners)
        x_low = _ConvModule(self.out_channels, 3, 2,
                            name='conv_low')(x_low, train)
        x_high = _ConvModule(self.out_channels, 1, 1,
                             name='conv_high')(x_high, train)
        return nn.relu(x_low + x_high), x_low


@NECKS.register_module()
class ICNeck(nn.Module):
    """(ref ic_neck.py:75-150), exact structure: cff_24 fuses sub4 into
    sub2, cff_12 fuses that into sub1; output order (x_24, x_12,
    x_cff_12) — the first two are the CFF LOW projections (aux taps),
    the last is the fused map the decode head consumes (in_index=2)."""
    in_channels: Sequence[int] = (64, 256, 256)
    out_channels: int = 128
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        x_sub1, x_sub2, x_sub4 = inputs
        x_cff_24, x_24 = CascadeFeatureFusion(
            self.out_channels, self.align_corners, name='cff_24')(
                x_sub4, x_sub2, train)
        x_cff_12, x_12 = CascadeFeatureFusion(
            self.out_channels, self.align_corners, name='cff_12')(
                x_cff_24, x_sub1, train)
        return (x_24, x_12, x_cff_12)


@NECKS.register_module()
class JPU(nn.Module):
    """(ref jpu.py:10-123), exact structure: per-level 3x3 ConvModules,
    bilinear upsample to the shallowest, concat; per-dilation
    DW-separable modules (depthwise BN no-act, pointwise BN+ReLU) whose
    OUTPUTS concatenate; returns inputs[:-1] + [concat]."""
    in_channels: Sequence[int] = (512, 1024, 2048)
    mid_channels: int = 512
    dilations: Sequence[int] = (1, 2, 4, 8)
    align_corners: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, inputs, *, train: bool = False):
        from s4former_tpu.models.decode_heads.zoo_heads import SepConvBNReLU
        feats = [_ConvModule(self.mid_channels, 3,
                             name=f'conv_{i}')(x, train)
                 for i, x in enumerate(inputs)]
        target_hw = feats[0].shape[1:3]
        feats = [f if f.shape[1:3] == target_hw else
                 resize_bilinear(f, target_hw, self.align_corners)
                 for f in feats]
        x = jnp.concatenate(feats, axis=-1)
        outs = [SepConvBNReLU(self.mid_channels, 3, d, dw_act=False,
                              name=f'dilation_{i}')(x, train)
                for i, d in enumerate(self.dilations)]
        fused = jnp.concatenate(outs, axis=-1)
        return tuple(list(inputs[:-1]) + [fused])
