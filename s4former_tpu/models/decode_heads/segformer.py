"""SegFormer decode head (flax/NHWC).

Rebuild of ``SegformerHead`` (reference:
mmseg/models/decode_heads/segformer_head.py): per-scale linear projection
-> bilinear resize to the finest grid -> concat -> 1x1 fuse conv+BN+ReLU ->
classifier. PatchShuffle-aware (reference :102,165): each selected feature
map is un-shuffled on ITS own grid before projection, using the same
super-patch permutation (super-patch = patchmix_n * 16 input pixels; the
per-scale token count per super-patch is derived from the stride).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.decode_heads.base import unshuffle_feature_map
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import HEADS

Array = jax.Array


@HEADS.register_module()
class SegformerHead(nn.Module):
    in_channels: Sequence[int] = (64, 128, 320, 512)
    channels: int = 256
    num_classes: int = 19
    in_index: Sequence[int] = (0, 1, 2, 3)
    input_transform: str = 'multiple_select'
    dropout_ratio: float = 0.1
    align_corners: bool = False
    interpolate_mode: str = 'bilinear'
    dtype: jnp.dtype = jnp.float32
    # parity config keys
    loss_decode: Optional[dict] = None
    norm_cfg: Optional[dict] = None
    init_cfg: Optional[Union[dict, list]] = None
    sampler: Optional[dict] = None
    ignore_index: int = 255
    # input patch budget: super-patch pixels = patchmix_n * vit_patch
    vit_patch: int = 16

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 patchmix_perm: Optional[Array] = None,
                 patchmix_n: int = 0,
                 return_last_feat: bool = False):
        feats = [inputs[i] for i in self.in_index]
        target_hw = feats[0].shape[1:3]
        # total input pixels = finest grid * its stride; infer strides from
        # relative grid sizes
        outs = []
        for i, f in enumerate(feats):
            if patchmix_perm is not None and patchmix_n:
                # tokens per super-patch side at this scale
                img_h = None
                # super-patch pixels / stride = super tokens; stride =
                # input_h / grid_h. Using finest grid as anchor:
                # stride_i = stride_0 * (grid_0 / grid_i); we only need the
                # per-scale n = (patchmix_n * vit_patch) / stride_i, and
                # stride_0 = 4 for MiT. Derive from grid ratios instead of
                # hardcoding: n_i = grid_i / num_super, where num_super =
                # input_super_grid shared across scales.
                g = f.shape[1]
                # number of super-patches per side is fixed by perm length
                num_super = int(round(float(patchmix_perm.shape[-1]) ** 0.5))
                n_i = g // num_super
                if n_i >= 1 and g % num_super == 0:
                    f = unshuffle_feature_map(f, patchmix_perm, n_i)
            # per-level ConvModule: 1x1 conv (no bias) + BN + ReLU
            # (reference segformer_head.py:120-129 with norm_cfg SyncBN)
            y = nn.Dense(self.channels, use_bias=False,
                         name=f'convs_{i}', dtype=self.dtype)(f)
            # BN statistics in f32 regardless of compute dtype: the
            # reference's SyncBN accumulates moments in f32, and bf16
            # moments over a [B,H,W,256] map lose mantissa (ADVICE r3).
            # The stats are tiny next to the conv compute; output returns
            # to the module compute dtype.
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'convs_{i}_bn',
                             dtype=jnp.float32)(y)
            y = nn.relu(y).astype(self.dtype)
            if y.shape[1:3] != target_hw:
                y = resize_bilinear(y, target_hw, self.align_corners)
            outs.append(y)
        # concat in in_index order (reference torch.cat(outs, dim=1))
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.channels, (1, 1), use_bias=False,
                    name='fusion_conv', dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='fusion_bn',
                         dtype=jnp.float32)(x)
        x = nn.relu(x).astype(self.dtype)
        feat = x
        if self.dropout_ratio > 0:
            x = nn.Dropout(self.dropout_ratio)(x, deterministic=not train)
        # classifier stays in the model compute dtype; consumers (CE,
        # softmax pseudo-labels, NCR, inference) upcast to f32 inside
        # their own fused chains, so the loss-time resize to label size
        # moves bf16 bytes instead of f32 (f32 models are unchanged)
        logits = nn.Conv(self.num_classes, (1, 1), name='conv_seg',
                         dtype=self.dtype)(x)
        if return_last_feat:
            return logits, feat
        return logits
