"""CGNet checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
cgnet.py:14-363): PReLU everywhere (per-channel), avg-pool input
injections, BN+PReLU after each stage concat, CG blocks whose 1x1
bottleneck exists ONLY on the downsampling block, Linear-SE global
context, stage concat orders [x, down1, inp_4x] and [down2, x].
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_cgnet_backbone,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES

NUM_CH = (8, 16, 32)
BLOCKS = (2, 3)
DIL = (2, 4)
RED = (4, 8)


class CM(torch.nn.Module):
    """ConvModule with BN + per-channel PReLU."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=(k - 1) // 2, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        self.activate = torch.nn.PReLU(cout)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.5)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.activate.weight.normal_(0.25, 0.1)

    def forward(self, x):
        return self.activate(self.bn(self.conv(x)))

    def dump(self, sd, key):
        sd[key + '.conv.weight'] = self.conv.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{key}.bn.{a}'] = getattr(self.bn, a)
        sd[key + '.activate.weight'] = self.activate.weight


class TorchCGBlock(torch.nn.Module):
    def __init__(self, cin, cout, dilation, reduction, down):
        super().__init__()
        self.down = down
        ch = cout if down else cout // 2
        self.conv1x1 = CM(cin, ch, 3 if down else 1, 2 if down else 1)
        self.f_loc = torch.nn.Conv2d(ch, ch, 3, padding=1, groups=ch,
                                     bias=False)
        self.f_sur = torch.nn.Conv2d(ch, ch, 3, padding=dilation,
                                     dilation=dilation, groups=ch,
                                     bias=False)
        self.bn = torch.nn.BatchNorm2d(2 * ch)
        self.activate = torch.nn.PReLU(2 * ch)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.activate.weight.normal_(0.25, 0.1)
        if down:
            self.bottleneck = torch.nn.Conv2d(2 * ch, cout, 1, bias=False)
        self.fc1 = torch.nn.Linear(cout, cout // reduction)
        self.fc2 = torch.nn.Linear(cout // reduction, cout)

    def forward(self, x):
        y = self.conv1x1(x)
        joi = torch.cat([self.f_loc(y), self.f_sur(y)], 1)
        joi = self.activate(self.bn(joi))
        if self.down:
            joi = self.bottleneck(joi)
        b, c = joi.shape[:2]
        g = F.adaptive_avg_pool2d(joi, 1).view(b, c)
        g = torch.sigmoid(self.fc2(F.relu(self.fc1(g))))
        joi = joi * g.view(b, c, 1, 1)
        return joi if self.down else joi + x

    def dump(self, sd, pre):
        self.conv1x1.dump(sd, pre + 'conv1x1')
        sd[pre + 'f_loc.weight'] = self.f_loc.weight
        sd[pre + 'f_sur.weight'] = self.f_sur.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}bn.{a}'] = getattr(self.bn, a)
        sd[pre + 'activate.weight'] = self.activate.weight
        if self.down:
            sd[pre + 'bottleneck.weight'] = self.bottleneck.weight
        sd[pre + 'f_glo.fc.0.weight'] = self.fc1.weight
        sd[pre + 'f_glo.fc.0.bias'] = self.fc1.bias
        sd[pre + 'f_glo.fc.2.weight'] = self.fc2.weight
        sd[pre + 'f_glo.fc.2.bias'] = self.fc2.bias


class TorchNormPReLU(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn = torch.nn.BatchNorm2d(c)
        self.act = torch.nn.PReLU(c)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.act.weight.normal_(0.25, 0.1)

    def forward(self, x):
        return self.act(self.bn(x))

    def dump(self, sd, key):
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{key}.0.{a}'] = getattr(self.bn, a)
        sd[key + '.1.weight'] = self.act.weight


@pytest.mark.slow
def test_cgnet_ingestion_parity():
    torch.manual_seed(71)
    stem = torch.nn.ModuleList([CM(3, NUM_CH[0], 3, 2),
                                CM(NUM_CH[0], NUM_CH[0], 3),
                                CM(NUM_CH[0], NUM_CH[0], 3)])
    np0 = TorchNormPReLU(NUM_CH[0] + 3)
    lvl1 = torch.nn.ModuleList(
        [TorchCGBlock(NUM_CH[0] + 3, NUM_CH[1], DIL[0], RED[0], True)] +
        [TorchCGBlock(NUM_CH[1], NUM_CH[1], DIL[0], RED[0], False)
         for _ in range(BLOCKS[0] - 1)])
    np1 = TorchNormPReLU(2 * NUM_CH[1] + 3)
    lvl2 = torch.nn.ModuleList(
        [TorchCGBlock(2 * NUM_CH[1] + 3, NUM_CH[2], DIL[1], RED[1],
                      True)] +
        [TorchCGBlock(NUM_CH[2], NUM_CH[2], DIL[1], RED[1], False)
         for _ in range(BLOCKS[1] - 1)])
    np2 = TorchNormPReLU(2 * NUM_CH[2])

    sd = {}
    for i, m in enumerate(stem):
        m.dump(sd, f'stem.{i}')
    np0.dump(sd, 'norm_prelu_0')
    np1.dump(sd, 'norm_prelu_1')
    np2.dump(sd, 'norm_prelu_2')
    for j, m in enumerate(lvl1):
        m.dump(sd, f'level1.{j}.')
    for j, m in enumerate(lvl2):
        m.dump(sd, f'level2.{j}.')

    for m in (*stem, np0, np1, np2, *lvl1, *lvl2):
        m.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(img).permute(0, 3, 1, 2)
        inp_2x = F.avg_pool2d(x, 3, stride=2, padding=1)
        inp_4x = F.avg_pool2d(inp_2x, 3, stride=2, padding=1)
        y = x
        for m in stem:
            y = m(y)
        y = np0(torch.cat([y, inp_2x], 1))
        refs = [y]
        down1 = None
        for i, m in enumerate(lvl1):
            y = m(y)
            if i == 0:
                down1 = y
        y = np1(torch.cat([y, down1, inp_4x], 1))
        refs.append(y)
        down2 = None
        for i, m in enumerate(lvl2):
            y = m(y)
            if i == 0:
                down2 = y
        y = np2(torch.cat([down2, y], 1))
        refs.append(y)

    bb = BACKBONES.build(dict(type='CGNet', num_channels=NUM_CH,
                              num_blocks=BLOCKS, dilations=DIL,
                              reductions=RED, out_indices=(0, 1, 2)))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_cgnet_backbone(
        {k: v.detach().numpy() for k, v in sd.items()})
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = bb.apply(variables, jnp.asarray(img))
    assert len(got) == 3
    for i, (g_, r) in enumerate(zip(got, refs)):
        np.testing.assert_allclose(
            np.asarray(g_), r.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4, err_msg=f'out {i}')
