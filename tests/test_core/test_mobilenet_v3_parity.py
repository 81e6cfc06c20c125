"""MobileNetV3 checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
mobilenet_v3.py:15-260 + utils/inverted_residual.py InvertedResidualV3 +
utils/se_layer.py): TF-'SAME' adaptive padding on the stem and the
originally-stride-2 depthwise convs, make_divisible SE hidden channels
with HSigmoid(bias 3, divisor 6), the post-hoc segmentation dilation
surgery (incl. the pre-surgery residual-shortcut quirk).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mobilenet_v3_backbone,
                                          merge_pretrained)
from s4former_tpu.models.backbones.mobilenet import (_V3_ARCH,
                                                     _make_divisible)
from s4former_tpu.registry import BACKBONES


def _adaptive_conv(x, w, b, stride, dilation, groups):
    """mmcv Conv2dAdaptivePadding (TF SAME)."""
    ih, iw = x.shape[2:]
    kh, kw = w.shape[2:]
    oh = -(-ih // stride)
    ow = -(-iw // stride)
    ph = max((oh - 1) * stride + (kh - 1) * dilation + 1 - ih, 0)
    pw = max((ow - 1) * stride + (kw - 1) * dilation + 1 - iw, 0)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return F.conv2d(x, w, b, stride=stride, dilation=dilation,
                    groups=groups)


class CM(torch.nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, groups=1,
                 act='hswish', adaptive=False):
        super().__init__()
        pad = 0 if adaptive else dilation * (k - 1) // 2
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=pad, dilation=dilation,
                                    groups=groups, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        self.act, self.adaptive = act, adaptive
        self.stride, self.dilation, self.groups = stride, dilation, groups
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        if self.adaptive:
            y = _adaptive_conv(x, self.conv.weight, None, self.stride,
                               self.dilation, self.groups)
        else:
            y = self.conv(x)
        y = self.bn(y)
        if self.act == 'hswish':
            return y * F.relu6(y + 3) / 6
        if self.act == 'relu':
            return F.relu(y)
        return y

    def dump(self, sd, key):
        sd[key + '.conv.weight'] = self.conv.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{key}.bn.{a}'] = getattr(self.bn, a)


class TorchIRV3(torch.nn.Module):
    def __init__(self, cin, mid, cout, k, stride, eff_stride, dilation,
                 se, act):
        super().__init__()
        self.expand = CM(cin, mid, 1, act=act) if mid != cin else None
        self.dw = CM(mid, mid, k, eff_stride, dilation, mid, act,
                     adaptive=(stride == 2))
        if se:
            hidden = _make_divisible(mid // 4, 8)
            self.se1 = torch.nn.Conv2d(mid, hidden, 1)
            self.se2 = torch.nn.Conv2d(hidden, mid, 1)
        else:
            self.se1 = None
        self.linear = CM(mid, cout, 1, act='none')
        # ref quirk: shortcut uses the PRE-surgery stride
        self.res = stride == 1 and cin == cout

    def forward(self, x):
        y = self.expand(x) if self.expand is not None else x
        y = self.dw(y)
        if self.se1 is not None:
            s = F.adaptive_avg_pool2d(y, 1)
            s = F.relu(self.se1(s))
            s = torch.clamp((self.se2(s) + 3) / 6, 0, 1)
            y = y * s
        y = self.linear(y)
        return x + y if self.res else y

    def dump(self, sd, li):
        if self.expand is not None:
            self.expand.dump(sd, f'{li}.expand_conv')
        self.dw.dump(sd, f'{li}.depthwise_conv')
        if self.se1 is not None:
            for n, m in ((1, self.se1), (2, self.se2)):
                sd[f'{li}.se.conv{n}.conv.weight'] = m.weight
                sd[f'{li}.se.conv{n}.conv.bias'] = m.bias
        self.linear.dump(sd, f'{li}.linear_conv')


@pytest.mark.slow
@pytest.mark.parametrize('arch', ['small', 'large'])
def test_mobilenet_v3_ingestion_parity(arch):
    torch.manual_seed(91)
    table = _V3_ARCH[arch]
    surge = (7, 13) if arch == 'large' else (4, 9)
    stem = CM(3, 16, 3, 2, act='hswish', adaptive=True)
    blocks = []
    cin = 16
    for i, (k, mid, c, se, act, stride) in enumerate(table):
        li = i + 1
        dilation = 1
        if li >= surge[0]:
            dilation = 2 if li < surge[1] else 4
        eff = 1 if li in surge else stride
        blocks.append(TorchIRV3(cin, mid, c, k, stride, eff, dilation,
                                se, act))
        cin = c
    blocks = torch.nn.ModuleList(blocks)
    final = CM(cin, 576 if arch == 'small' else 960, 1, act='hswish')

    sd = {}
    stem.dump(sd, 'layer0')
    for i, m in enumerate(blocks):
        m.dump(sd, f'layer{i + 1}')
    final.dump(sd, f'layer{len(table) + 1}')

    for m in (stem, *blocks, final):
        m.eval()
    out_indices = (0, 1, len(table) + 1)
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        y = torch.from_numpy(img).permute(0, 3, 1, 2)
        y = stem(y)
        refs = [y]
        for i, m in enumerate(blocks):
            y = m(y)
            if i + 1 in out_indices:
                refs.append(y)
        refs.append(final(y))

    bb = BACKBONES.build(dict(type='MobileNetV3', arch=arch,
                              out_indices=out_indices))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_mobilenet_v3_backbone(
        {k: v.detach().numpy() for k, v in sd.items()})
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = bb.apply(variables, jnp.asarray(img))
    assert len(got) == len(refs)
    for i, (g_, r) in enumerate(zip(got, refs)):
        np.testing.assert_allclose(
            np.asarray(g_), r.permute(0, 2, 3, 1).numpy(),
            rtol=4e-4, atol=4e-4, err_msg=f'out {i}')
