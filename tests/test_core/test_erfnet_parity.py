"""ERFNet checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
erfnet.py:11-331): DownsamplerBlock (biased conv ‖ maxpool, BN eps
1e-3), NonBottleneck1d (biased factorized convs, dilated second pair),
UpsamplerBlock ConvTranspose2d(3, s2, p1, op1) — also pinning the
torch->flax deconv weight mapping (transpose + double spatial flip,
padding ((1,2),(1,2)))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_erfnet_backbone,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES

DOWN = (4, 8, 16)
ENC_N = (2, 2)
DILS = (2, 4)
DEC_UP = (8, 4)
DEC_N = (1, 1)


class TorchDown(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout - cin, 3, stride=2,
                                    padding=1)
        self.bn = torch.nn.BatchNorm2d(cout, eps=1e-3)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        c = self.conv(x)
        pool = F.max_pool2d(x, 2, 2)
        if pool.shape[2:] != c.shape[2:]:
            pool = F.interpolate(pool, size=c.shape[2:], mode='bilinear',
                                 align_corners=False)
        return F.relu(self.bn(torch.cat([c, pool], 1)))

    def dump(self, sd, pre):
        sd[pre + 'conv.weight'] = self.conv.weight
        sd[pre + 'conv.bias'] = self.conv.bias
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}bn.{a}'] = getattr(self.bn, a)


class TorchNB1d(torch.nn.Module):
    def __init__(self, c, dilation=1):
        super().__init__()
        d = dilation
        self.c31a = torch.nn.Conv2d(c, c, (3, 1), padding=(1, 0))
        self.c13a = torch.nn.Conv2d(c, c, (1, 3), padding=(0, 1))
        self.bn1 = torch.nn.BatchNorm2d(c, eps=1e-3)
        self.c31b = torch.nn.Conv2d(c, c, (3, 1), padding=(d, 0),
                                    dilation=(d, 1))
        self.c13b = torch.nn.Conv2d(c, c, (1, 3), padding=(0, d),
                                    dilation=(1, d))
        self.bn2 = torch.nn.BatchNorm2d(c, eps=1e-3)
        for bn in (self.bn1, self.bn2):
            with torch.no_grad():
                bn.running_mean.normal_(0, 0.3)
                bn.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        y = F.relu(self.c31a(x))
        y = F.relu(self.bn1(self.c13a(y)))
        y = F.relu(self.c31b(y))
        y = self.bn2(self.c13b(y))
        return F.relu(y + x)

    def dump(self, sd, pre):
        for idx, m in ((0, self.c31a), (2, self.c13a), (5, self.c31b),
                       (7, self.c13b)):
            sd[f'{pre}convs_layers.{idx}.weight'] = m.weight
            sd[f'{pre}convs_layers.{idx}.bias'] = m.bias
        for idx, m in ((3, self.bn1), (8, self.bn2)):
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{pre}convs_layers.{idx}.{a}'] = getattr(m, a)


class TorchUp(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = torch.nn.ConvTranspose2d(cin, cout, 3, stride=2,
                                             padding=1, output_padding=1)
        self.bn = torch.nn.BatchNorm2d(cout, eps=1e-3)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.3)
            self.bn.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))

    def dump(self, sd, pre):
        sd[pre + 'conv.weight'] = self.conv.weight
        sd[pre + 'conv.bias'] = self.conv.bias
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}bn.{a}'] = getattr(self.bn, a)


@pytest.mark.slow
def test_erfnet_ingestion_parity():
    torch.manual_seed(81)
    encoder = [TorchDown(3, DOWN[0]), TorchDown(DOWN[0], DOWN[1])]
    for _ in range(ENC_N[0]):
        encoder.append(TorchNB1d(DOWN[1]))
    encoder.append(TorchDown(DOWN[1], DOWN[2]))
    for _ in range(ENC_N[1] // len(DILS)):
        for d in DILS:
            encoder.append(TorchNB1d(DOWN[2], d))
    decoder = []
    cin = DOWN[2]
    for s in range(2):
        decoder.append(TorchUp(cin, DEC_UP[s]))
        for _ in range(DEC_N[s]):
            decoder.append(TorchNB1d(DEC_UP[s]))
        cin = DEC_UP[s]
    encoder = torch.nn.ModuleList(encoder)
    decoder = torch.nn.ModuleList(decoder)

    sd = {}
    for i, m in enumerate(encoder):
        m.dump(sd, f'encoder.{i}.')
    for i, m in enumerate(decoder):
        m.dump(sd, f'decoder.{i}.')

    for m in (*encoder, *decoder):
        m.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        y = torch.from_numpy(img).permute(0, 3, 1, 2)
        for m in encoder:
            y = m(y)
        for m in decoder:
            y = m(y)
        ref = y.permute(0, 2, 3, 1).numpy()

    bb = BACKBONES.build(dict(
        type='ERFNet', enc_downsample_channels=DOWN,
        enc_stage_non_bottlenecks=ENC_N,
        enc_non_bottleneck_dilations=DILS,
        enc_non_bottleneck_channels=(DOWN[1], DOWN[2]),
        dec_upsample_channels=DEC_UP, dec_stages_non_bottleneck=DEC_N,
        dec_non_bottleneck_channels=DEC_UP, dropout_ratio=0.0))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_erfnet_backbone(
        {k: v.detach().numpy() for k, v in sd.items()})
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = bb.apply(variables, jnp.asarray(img))
    assert len(got) == 1
    np.testing.assert_allclose(np.asarray(got[0]), ref,
                               rtol=3e-4, atol=3e-4)
