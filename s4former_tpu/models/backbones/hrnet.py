"""HRNet backbone (flax/NHWC) — exact reference topology.

Rebuild of the reference zoo member (reference:
mmseg/models/backbones/hrnet.py:218-642 — unused by S4Former's own
configs, used by the `_base_` model zoo e.g. ocrnet_hr18). Structure
matches the reference module-for-module so mmseg HRNet checkpoints
ingest directly (core/checkpoint.convert_hrnet_backbone):

- stem: two 3x3 s2 conv+BN+ReLU (ref :376-395, keys conv1/bn1/conv2/bn2);
- layer1: a ResNet stage (Bottleneck for the shipped configs) built by
  ``_make_layer`` with conditional downsample (ref :481-527);
- per-stage transitions (ref :434-479): channel-fix 3x3 conv+BN+ReLU on
  existing branches only when channels differ; NEW branches come from
  the LAST previous branch through chained 3x3 s2 conv+BN+ReLU;
- HRModule (ref :14-214): per-branch ResNet blocks, then full cross-
  resolution fusion — j>i: 1x1 conv+BN then bilinear align_corners=False
  upsample to branch i's size; j<i: (i-j) chained 3x3 s2 convs keeping
  source channels (with ReLU) except the last (target channels, no
  ReLU); y starts at branch i's own tensor and the SUM is ReLU'd.

Round-4 note: this replaced the earlier compact (non-ingestable)
rebuild; the flax param tree changed accordingly.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.models.backbones.resnet import (BasicBlock, Bottleneck,
                                                  ConvBN)
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import BACKBONES

Array = jax.Array

_BLOCKS = {'BASIC': (BasicBlock, 1), 'BOTTLENECK': (Bottleneck, 4)}

# upstream hrnet_w18 recipe (reference configs/_base_/models/*hr18*)
DEFAULT_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, block='BOTTLENECK',
                num_blocks=(4,), num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, block='BASIC',
                num_blocks=(4, 4), num_channels=(18, 36)),
    stage3=dict(num_modules=4, num_branches=3, block='BASIC',
                num_blocks=(4, 4, 4), num_channels=(18, 36, 72)),
    stage4=dict(num_modules=3, num_branches=4, block='BASIC',
                num_blocks=(4, 4, 4, 4), num_channels=(18, 36, 72, 144)),
)


@BACKBONES.register_module()
class HRNet(nn.Module):
    extra: Optional[Dict[str, Any]] = None
    in_channels: int = 3
    multiscale_output: bool = True
    # accepted-and-ignored parity knobs (zero-init BN / freezing are
    # init/finetune-time concerns handled by ingestion + optimizer)
    norm_cfg: Optional[dict] = None
    conv_cfg: Optional[dict] = None
    norm_eval: bool = False
    frozen_stages: int = -1
    zero_init_residual: bool = False
    with_cp: bool = False
    init_cfg: Optional[dict] = None
    pretrained: Optional[str] = None

    def _branch(self, cfg, b: int, x, train, prefix: str):
        """One HRModule branch == a ResNet layer (ref :68-114)."""
        block, exp = _BLOCKS[cfg.get('block', 'BASIC')]
        planes = cfg['num_channels'][b]
        for k in range(cfg['num_blocks'][b]):
            down = k == 0 and x.shape[-1] != planes * exp
            x = block(planes, 1, 1, downsample=down,
                      name=f'{prefix}_b{k}')(x, train)
        return x

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False, attn_bias=None,
                 pos_mode: str = 'default', use_fdrop: bool = False,
                 return_attn: bool = False):
        extra = {k: dict(v) for k, v in
                 (self.extra or DEFAULT_EXTRA).items()}

        # stem (ref :376-395): conv1/bn1 + conv2/bn2, both 3x3 stride 2
        x = ConvBN(64, 3, 2, name='conv1')(x, train)
        x = ConvBN(64, 3, 2, name='conv2')(x, train)

        # layer1 (ref :407-409): _make_layer(stage1.block, 64, C1, n1)
        s1 = extra['stage1']
        block, exp = _BLOCKS[s1.get('block', 'BOTTLENECK')]
        planes = s1['num_channels'][0]
        for k in range(s1['num_blocks'][0]):
            down = k == 0 and x.shape[-1] != planes * exp
            x = block(planes, 1, 1, downsample=down,
                      name=f'layer1_{k}')(x, train)

        xs = [x]
        for stage_i in (2, 3, 4):
            cfg = extra[f'stage{stage_i}']
            _, exp = _BLOCKS[cfg.get('block', 'BASIC')]
            out_ch = [c * exp for c in cfg['num_channels']]
            t = stage_i - 1
            # transition (ref :434-479, forward :607-629): existing
            # branches keep their tensor unless channels change; new
            # branches chain stride-2 convs FROM THE LAST branch
            new_xs = []
            for i, c in enumerate(out_ch):
                if i < len(xs):
                    y = xs[i]
                    if y.shape[-1] != c:
                        y = ConvBN(c, 3, 1, name=f'transition{t}_{i}')(
                            y, train)
                else:
                    y = xs[-1]
                    for j in range(i + 1 - len(xs)):
                        oc = c if j == i - len(xs) else y.shape[-1]
                        y = ConvBN(oc, 3, 2,
                                   name=f'transition{t}_{i}_{j}')(y, train)
                new_xs.append(y)
            xs = new_xs
            # num_modules x HRModule (ref :529-568)
            last_stage = stage_i == 4 and not self.multiscale_output
            for m in range(cfg['num_modules']):
                pre = f'stage{stage_i}_m{m}'
                xs = [self._branch(cfg, b, xb, train, f'{pre}_br{b}')
                      for b, xb in enumerate(xs)]
                n_out = 1 if (last_stage and
                              m == cfg['num_modules'] - 1) else len(xs)
                if len(xs) == 1:
                    continue
                fused = []
                for i in range(n_out):
                    acc = xs[i]
                    for j in range(len(xs)):
                        if j == i:
                            continue
                        if j > i:
                            y = ConvBN(out_ch[i], 1, 1,
                                       name=f'{pre}_fuse_{i}_{j}')(
                                           xs[j], train, relu=False)
                            y = resize_bilinear(y, xs[i].shape[1:3], False)
                        else:
                            y = xs[j]
                            for k in range(i - j):
                                last = k == i - j - 1
                                y = ConvBN(
                                    out_ch[i] if last else y.shape[-1],
                                    3, 2, name=f'{pre}_fuse_{i}_{j}_{k}')(
                                        y, train, relu=not last)
                        acc = acc + y
                    fused.append(nn.relu(acc))
                xs = fused
        if return_attn:
            return tuple(xs), ([], None)
        return tuple(xs)
