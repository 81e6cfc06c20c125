"""BiSeNetV2 checkpoint-ingestion parity vs a torch oracle.

The oracle is a literal port of the reference backbone (reference:
mmseg/models/backbones/bisenetv2.py:12-621): DetailBranch (2/3/3
ConvModules), StemBlock, GELayer (stride-1: grouped expansion dwconv;
stride-2: extra depthwise + DW-separable shortcut, BN-only convs where
the reference passes act_cfg=None), CEBlock (GAP->BN->ConvModule,
residual), BGALayer (DW-separable projections whose pointwise conv is
BIASED with no norm, sigmoid gates, bilinear resizes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_bisenetv2_backbone,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES

DETAIL = (8, 8, 16)
SEM = (4, 8, 16, 16)
BGA = 16
EXP = 6


class CM(torch.nn.Module):
    """ConvModule: conv(no bias) + BN (+ ReLU unless act=False)."""

    def __init__(self, cin, cout, k, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=(k - 1) // 2, groups=groups,
                                    bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        self.act = act
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.5)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.bn.weight.normal_(1, 0.2)
            self.bn.bias.normal_(0, 0.2)

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x

    def dump(self, sd, key):
        sd[key + '.conv.weight'] = self.conv.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{key}.bn.{a}'] = getattr(self.bn, a)


class TorchGE(torch.nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        mid = cin * EXP
        self.stride = stride
        self.conv1 = CM(cin, cin, 3)
        if stride == 1:
            self.dw = torch.nn.ModuleList([CM(cin, mid, 3, 1, groups=cin)])
            self.short = None
        else:
            self.dw = torch.nn.ModuleList([
                CM(cin, mid, 3, 2, groups=cin, act=False),
                CM(mid, mid, 3, 1, groups=mid)])
            self.short = torch.nn.ModuleList([
                CM(cin, cin, 3, 2, groups=cin, act=False),
                CM(cin, cout, 1, act=False)])
        self.conv2 = CM(mid, cout, 1, act=False)

    def forward(self, x):
        idn = x
        y = self.conv1(x)
        for m in self.dw:
            y = m(y)
        y = self.conv2(y)
        if self.short is not None:
            s = idn
            for m in self.short:
                s = m(s)
            return F.relu(y + s)
        return F.relu(y + idn)

    def dump(self, sd, pre):
        self.conv1.dump(sd, pre + 'conv1')
        for j, m in enumerate(self.dw):
            m.dump(sd, pre + f'dwconv.{j}')
        self.conv2.dump(sd, pre + 'conv2.0')
        if self.short is not None:
            self.short[0].dump(sd, pre + 'shortcut.0.depthwise_conv')
            self.short[1].dump(sd, pre + 'shortcut.0.pointwise_conv')


class TorchBiSeNetV2(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(21)
        # detail branch
        stages = []
        cin = 3
        for i, c in enumerate(DETAIL):
            convs = [CM(cin, c, 3, 2)] + \
                [CM(c, c, 3, 1) for _ in range(1 if i == 0 else 2)]
            stages.append(torch.nn.ModuleList(convs))
            cin = c
        self.detail = torch.nn.ModuleList(stages)
        # stem
        self.stem_first = CM(3, SEM[0], 3, 2)
        self.stem_c0 = CM(SEM[0], SEM[0] // 2, 1)
        self.stem_c1 = CM(SEM[0] // 2, SEM[0], 3, 2)
        self.stem_fuse = CM(SEM[0] * 2, SEM[0], 3)
        # GE stages
        self.stages = torch.nn.ModuleList()
        cin = SEM[0]
        for i, c in enumerate(SEM[1:]):
            n = 4 if i == len(SEM) - 2 else 2
            mods = [TorchGE(cin, c, 2)] + \
                [TorchGE(c, c, 1) for _ in range(n - 1)]
            self.stages.append(torch.nn.ModuleList(mods))
            cin = c
        # CE block
        self.ce_bn = torch.nn.BatchNorm2d(SEM[-1])
        with torch.no_grad():
            self.ce_bn.running_mean.normal_(0, 0.1)
            self.ce_bn.running_var.uniform_(0.5, 2.0)
        self.ce_gap = CM(SEM[-1], SEM[-1], 1)
        self.ce_last = CM(SEM[-1], SEM[-1], 3)
        # BGA
        self.b_d_dw = CM(BGA, BGA, 3, groups=BGA, act=False)
        self.b_d_pw = torch.nn.Conv2d(BGA, BGA, 1)  # biased, no norm
        self.b_d_down = CM(BGA, BGA, 3, 2, act=False)
        self.b_s_conv = CM(BGA, BGA, 3, act=False)
        self.b_s_dw = CM(BGA, BGA, 3, groups=BGA, act=False)
        self.b_s_pw = torch.nn.Conv2d(BGA, BGA, 1)
        self.b_conv = CM(BGA, BGA, 3)

    def forward(self, x):
        d = x
        for stage in self.detail:
            for m in stage:
                d = m(d)
        s = self.stem_first(x)
        left = self.stem_c1(self.stem_c0(s))
        right = F.max_pool2d(s, 3, stride=2, padding=1)
        s = self.stem_fuse(torch.cat([left, right], 1))
        outs = [s]
        for stage in self.stages:
            for m in stage:
                s = m(s)
            outs.append(s)
        gap = F.adaptive_avg_pool2d(s, 1)
        gap = self.ce_gap(self.ce_bn(gap))
        s = self.ce_last(s + gap)
        # BGA
        dd = self.b_d_pw(self.b_d_dw(d))
        da = F.avg_pool2d(self.b_d_down(d), 3, stride=2, padding=1,
                          count_include_pad=True)
        sb = F.interpolate(self.b_s_conv(s), size=dd.shape[2:],
                           mode='bilinear', align_corners=False)
        sd_ = self.b_s_pw(self.b_s_dw(s))
        fuse1 = dd * torch.sigmoid(sb)
        fuse2 = F.interpolate(da * torch.sigmoid(sd_),
                              size=fuse1.shape[2:], mode='bilinear',
                              align_corners=False)
        head = self.b_conv(fuse1 + fuse2)
        return [head] + outs

    def state_dict_mmseg(self):
        sd = {}
        for i, stage in enumerate(self.detail):
            for j, m in enumerate(stage):
                m.dump(sd, f'detail.detail_branch.{i}.{j}')
        self.stem_first.dump(sd, 'semantic.stage1.conv_first')
        self.stem_c0.dump(sd, 'semantic.stage1.convs.0')
        self.stem_c1.dump(sd, 'semantic.stage1.convs.1')
        self.stem_fuse.dump(sd, 'semantic.stage1.fuse_last')
        for i, stage in enumerate(self.stages):
            for j, m in enumerate(stage):
                m.dump(sd, f'semantic.stage{i + 2}.{j}.')
        ce = f'semantic.stage{len(SEM)}_CEBlock'
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{ce}.gap.1.{a}'] = getattr(self.ce_bn, a)
        self.ce_gap.dump(sd, ce + '.conv_gap')
        self.ce_last.dump(sd, ce + '.conv_last')
        self.b_d_dw.dump(sd, 'bga.detail_dwconv.0.depthwise_conv')
        sd['bga.detail_dwconv.0.pointwise_conv.conv.weight'] = \
            self.b_d_pw.weight
        sd['bga.detail_dwconv.0.pointwise_conv.conv.bias'] = \
            self.b_d_pw.bias
        self.b_d_down.dump(sd, 'bga.detail_down.0')
        self.b_s_conv.dump(sd, 'bga.semantic_conv.0')
        self.b_s_dw.dump(sd, 'bga.semantic_dwconv.0.depthwise_conv')
        sd['bga.semantic_dwconv.0.pointwise_conv.conv.weight'] = \
            self.b_s_pw.weight
        sd['bga.semantic_dwconv.0.pointwise_conv.conv.bias'] = \
            self.b_s_pw.bias
        self.b_conv.dump(sd, 'bga.conv')
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_bisenetv2_ingestion_parity():
    oracle = TorchBiSeNetV2().eval()
    bb = BACKBONES.build(dict(
        type='BiSeNetV2', detail_channels=DETAIL, semantic_channels=SEM,
        semantic_expansion_ratio=EXP, bga_channels=BGA,
        out_indices=(0, 1, 2, 3, 4)))
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_bisenetv2_backbone(oracle.state_dict_mmseg())
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    with torch.no_grad():
        refs = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    outs = bb.apply(variables, jnp.asarray(img))
    assert len(outs) == 5
    for i, (g, r) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4, err_msg=f'out {i}')
