"""STDC checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
stdc.py:14-422): STDCModule cat AND add fusion (stride-2 depthwise
downsample between layers.0 and layers.1, AvgPool / depthwise+1x1
skips), STDCNet arch tables, STDCContextPathNet (ARMs, nearest
upsampling, STDC's two-conv bias-free FFM attention, reference output
order [detail, arm0@1/16, arm1@1/8, feat_fuse]).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_stdc_context_path,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES
from tests.test_core.test_bisenetv1_parity import TorchARM
from tests.test_core.test_head_ingestion_parity import TorchConvModule

CH = (4, 8, 16, 32, 64)
OUTC = 8
FFM_OUT = 16


class TorchDWConvBN(torch.nn.Module):
    """Depthwise ConvModule with BN, no act."""

    def __init__(self, cin, cout, k, stride, groups):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=(k - 1) // 2, groups=groups,
                                    bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        return self.bn(self.conv(x))

    def dump(self, sd, key):
        sd[key + '.conv.weight'] = self.conv.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{key}.bn.{a}'] = getattr(self.bn, a)


class TorchSTDCModule(torch.nn.Module):
    def __init__(self, cin, cout, stride, fusion, num_convs=4):
        super().__init__()
        self.stride, self.fusion = stride, fusion
        self.conv0 = TorchConvModule(cin, cout // 2, 1)
        self.down = TorchDWConvBN(cout // 2, cout // 2, 3, 2,
                                  cout // 2) if stride == 2 else None
        if fusion == 'add' and stride == 2:
            self.skip0 = TorchDWConvBN(cin, cin, 3, 2, cin)
            self.skip1 = TorchDWConvBN(cin, cout, 1, 1, 1)
        self.layers = torch.nn.ModuleList()
        for i in range(1, num_convs):
            last = i == num_convs - 1
            oc = cout // (2 ** i if last else 2 ** (i + 1))
            ic = cout // 2 ** i
            self.layers.append(TorchConvModule(ic, oc, 3))

    def forward(self, x):
        x0 = self.conv0(x)
        d = self.down(x0) if self.down is not None else x0
        y = d
        rest = []
        for m in self.layers:
            y = m(y)
            rest.append(y)
        if self.fusion == 'cat':
            first = F.avg_pool2d(x0, 3, stride=2, padding=1) \
                if self.stride == 2 else x0
            return torch.cat([first] + rest, 1)
        skip = self.skip1(self.skip0(x)) if self.stride == 2 else x
        return torch.cat([d] + rest, 1) + skip

    def dump(self, sd, pre):
        if self.fusion == 'add' and self.stride == 2:
            self.conv0.dump(sd, pre + 'layers.0.0')
            self.down.dump(sd, pre + 'layers.0.1')
            self.skip0.dump(sd, pre + 'skip.0')
            self.skip1.dump(sd, pre + 'skip.1')
        else:
            self.conv0.dump(sd, pre + 'layers.0')
            if self.down is not None:
                self.down.dump(sd, pre + 'downsample')
        for i, m in enumerate(self.layers, start=1):
            m.dump(sd, pre + f'layers.{i}')


class TorchSTDCNet(torch.nn.Module):
    ARCH = {'STDCNet1': ((2, 1), (2, 1), (2, 1))}

    def __init__(self, fusion='cat', with_final=True):
        super().__init__()
        torch.manual_seed(41)
        self.s0 = TorchConvModule(3, CH[0], 3)
        self.s0.conv.stride = (2, 2)
        self.s1 = TorchConvModule(CH[0], CH[1], 3)
        self.s1.conv.stride = (2, 2)
        self.stages = torch.nn.ModuleList()
        for i, strides in enumerate(self.ARCH['STDCNet1']):
            mods = []
            cin = CH[i + 1]
            for st in strides:
                mods.append(TorchSTDCModule(cin, CH[i + 2], st, fusion))
                cin = CH[i + 2]
            self.stages.append(torch.nn.ModuleList(mods))
        self.final = TorchConvModule(CH[-1], max(1024, CH[-1]), 1) \
            if with_final else None

    def forward(self, x):
        x = self.s1(self.s0(x))
        outs = []
        for stage in self.stages:
            for m in stage:
                x = m(x)
            outs.append(x)
        if self.final is not None:
            outs[-1] = self.final(outs[-1])
        return outs

    def dump(self, sd, pre):
        self.s0.dump(sd, pre + 'stages.0')
        self.s1.dump(sd, pre + 'stages.1')
        for i, stage in enumerate(self.stages):
            for j, m in enumerate(stage):
                m.dump(sd, pre + f'stages.{i + 2}.{j}.')
        if self.final is not None:
            self.final.dump(sd, pre + 'final_conv')


@pytest.mark.parametrize('fusion', ['cat', 'add'])
def test_stdc_context_path_ingestion_parity(fusion):
    torch.manual_seed(42)
    inner = TorchSTDCNet(fusion)
    last = max(1024, CH[-1])
    arms = torch.nn.ModuleList([TorchARM(last, OUTC),
                                TorchARM(CH[-2], OUTC)])
    convs = torch.nn.ModuleList([TorchConvModule(OUTC, OUTC, 3)
                                 for _ in range(2)])
    conv_avg = TorchConvModule(last, OUTC, 1)
    ffm_conv0 = TorchConvModule(CH[2] + OUTC, FFM_OUT, 1)
    att0 = torch.nn.Conv2d(FFM_OUT, FFM_OUT // 4, 1, bias=False)
    att1 = torch.nn.Conv2d(FFM_OUT // 4, FFM_OUT, 1, bias=False)

    sd = {}
    inner.dump(sd, 'backbone.')
    arms[0].dump(sd, 'arms.0.')
    arms[1].dump(sd, 'arms.1.')
    convs[0].dump(sd, 'convs.0')
    convs[1].dump(sd, 'convs.1')
    conv_avg.dump(sd, 'conv_avg')
    ffm_conv0.dump(sd, 'ffm.conv0')
    sd['ffm.attention.1.conv.weight'] = att0.weight
    sd['ffm.attention.2.conv.weight'] = att1.weight

    for m in (inner, *arms, *convs, conv_avg, ffm_conv0, att0, att1):
        m.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(img).permute(0, 3, 1, 2)
        outs = inner(x)
        avg = conv_avg(F.adaptive_avg_pool2d(outs[-1], 1))
        feature_up = F.interpolate(avg, size=outs[-1].shape[2:],
                                   mode='nearest')
        arms_out = []
        for i in range(2):
            x_arm = arms[i](outs[len(outs) - 1 - i]) + feature_up
            feature_up = F.interpolate(
                x_arm, size=outs[len(outs) - 2 - i].shape[2:],
                mode='nearest')
            feature_up = convs[i](feature_up)
            arms_out.append(feature_up)
        fuse = ffm_conv0(torch.cat([outs[0], arms_out[1]], 1))
        g = torch.sigmoid(att1(F.relu(att0(
            F.adaptive_avg_pool2d(fuse, 1)))))
        feat_fuse = fuse * g + fuse
        refs = [outs[0], arms_out[0], arms_out[1], feat_fuse]

    bb = BACKBONES.build(dict(
        type='STDCContextPathNet',
        backbone_cfg=dict(type='STDCNet', stdc_type='STDCNet1',
                          channels=CH, bottleneck_type=fusion,
                          with_final_conv=True),
        last_in_channels=(last, CH[-2]), out_channels=OUTC,
        ffm_cfg=dict(in_channels=CH[2] + OUTC, out_channels=FFM_OUT,
                     scale_factor=4)))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_stdc_context_path(
        {k: v.detach().numpy() for k, v in sd.items()})
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = bb.apply(variables, jnp.asarray(img))
    assert len(got) == 4
    for i, (g_, r) in enumerate(zip(got, refs)):
        np.testing.assert_allclose(
            np.asarray(g_), r.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4, err_msg=f'out {i}')
