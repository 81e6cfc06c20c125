"""MobileNetV2 checkpoint-ingestion parity vs a torch oracle.

The oracle mirrors the reference semantics
(mmseg/models/backbones/mobilenet_v2.py:108-180 + mmcv InvertedResidual):
stem ConvModule (3x3 s2 + BN + ReLU6), 7 stages of InvertedResidual
([expand 1x1, dw 3x3, project 1x1] with ReLU6 on expand/dw, linear
project, residual iff stride 1 and in==out; layer1 has expand_ratio 1 so
its Sequential is [dw, project]), per-stage stride/dilation taken from
the segmentation output-stride recipes. State_dict keys follow mmseg's
``conv1.{conv,bn}`` / ``layer{s}.{j}.conv.{k}.{conv,bn}`` layout that
``convert_mobilenet_v2_backbone`` ingests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables

ARCH = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4),
        (6, 96, 3), (6, 160, 3), (6, 320, 1)]


def _convbn(cin, cout, k=1, stride=1, dilation=1, groups=1):
    return torch.nn.ModuleDict({
        'conv': torch.nn.Conv2d(cin, cout, k, stride,
                                padding=dilation * (k - 1) // 2,
                                dilation=dilation, groups=groups,
                                bias=False),
        'bn': torch.nn.BatchNorm2d(cout)})


def _apply(m, x, act=True):
    x = m['bn'](m['conv'](x))
    return torch.nn.functional.relu6(x) if act else x


class TorchMobileNetV2(torch.nn.Module):
    def __init__(self, strides, dilations):
        super().__init__()
        self.conv1 = _convbn(3, 32, 3, 2)
        self.stages = torch.nn.ModuleList()
        cin = 32
        for i, (t, c, n) in enumerate(ARCH):
            blocks = torch.nn.ModuleList()
            for j in range(n):
                s = strides[i] if j == 0 else 1
                hidden = cin * t
                mods = torch.nn.ModuleList()
                if t != 1:
                    mods.append(_convbn(cin, hidden))
                mods.append(_convbn(hidden, hidden, 3, s,
                                    dilations[i], groups=hidden))
                mods.append(_convbn(hidden, c))
                blocks.append(mods)
                cin = c
            self.stages.append(blocks)

    def forward(self, x, out_indices):
        x = _apply(self.conv1, x)
        outs = []
        for i, blocks in enumerate(self.stages):
            for mods in blocks:
                y = x
                for k, m in enumerate(mods):
                    y = _apply(m, y, act=(k != len(mods) - 1))
                x = x + y if (y.shape == x.shape) else y
            if i in out_indices:
                outs.append(x)
        return outs

    def state_dict_mmseg(self):
        sd = {}

        def put(m, prefix):
            sd[prefix + '.conv.weight'] = m['conv'].weight
            sd[prefix + '.bn.weight'] = m['bn'].weight
            sd[prefix + '.bn.bias'] = m['bn'].bias
            sd[prefix + '.bn.running_mean'] = m['bn'].running_mean
            sd[prefix + '.bn.running_var'] = m['bn'].running_var

        put(self.conv1, 'conv1')
        for i, blocks in enumerate(self.stages):
            for j, mods in enumerate(blocks):
                for k, m in enumerate(mods):
                    put(m, f'layer{i + 1}.{j}.conv.{k}')
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize('strides,dilations', [
    ((1, 2, 2, 2, 1, 2, 1), (1, 1, 1, 1, 1, 1, 1)),   # classification os32
    ((1, 2, 2, 1, 1, 1, 1), (1, 1, 1, 2, 2, 4, 4)),   # deeplab os8 recipe
])
def test_mobilenet_v2_ingestion_parity(strides, dilations):
    torch.manual_seed(0)
    oracle = TorchMobileNetV2(strides, dilations).eval()
    # randomize BN stats so ingestion of running stats is actually tested
    for m in oracle.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='MobileNetV2', strides=strides,
                      dilations=dilations, out_indices=(1, 2, 4, 6)),
        decode_head=dict(type='FCNHead', in_channels=320, channels=8,
                         num_classes=5, in_index=3, num_convs=1))
    model = build_segmentor(cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 64, 64, 3))
    converted = convert_mmseg_checkpoint(
        {'backbone.' + k: v for k, v in oracle.state_dict_mmseg().items()})
    variables = merge_pretrained(variables, converted)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2),
                     out_indices=(1, 2, 4, 6))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == len(ref)
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f'out {s}')
