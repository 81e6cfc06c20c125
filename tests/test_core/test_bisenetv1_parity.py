"""BiSeNetV1 checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
bisenetv1.py:11-331): classic-stem ResNet-18 context backbone, spatial
path (7x7 s2 / 3x3 s2 / 3x3 s2 / 1x1), ARMs with bias-free gate convs,
NEAREST context upsampling, FFM whose attention is ONE bias-free 1x1
ConvModule (BN+ReLU) followed by sigmoid, out = fuse*atten + fuse.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_bisenetv1_backbone,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES
from tests.test_core.test_beit_resnet_parity import (TorchBasicBlock,
                                                     TorchConvBN)

SPATIAL = (8, 8, 8, 16)
CTX = (16, 32, 64)  # (out, x16, x32) for base-8 R18
BASE = 8
OUT = 32


class TorchR18Classic(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TorchConvBN(3, BASE, 7, 2)
        self.layers = torch.nn.ModuleList()
        cin, planes = BASE, BASE
        for s, (stride, blocks) in enumerate(
                zip((1, 2, 2, 2), (2, 2, 2, 2))):
            stage = torch.nn.ModuleList()
            for j in range(blocks):
                st = stride if j == 0 else 1
                down = j == 0 and (st != 1 or cin != planes)
                stage.append(TorchBasicBlock(cin, planes, st, 1, down))
                cin = planes
            self.layers.append(stage)
            planes *= 2

    def forward(self, x):
        x = self.conv1(x)
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for stage in self.layers:
            for blk in stage:
                x = blk(x)
            outs.append(x)
        return outs

    def dump(self, sd, pre):
        def put(mod, ck, bk):
            sd[ck + '.weight'] = mod.conv.weight
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{bk}.{a}'] = getattr(mod.bn, a)

        put(self.conv1, pre + 'conv1', pre + 'bn1')
        for s, stage in enumerate(self.layers, start=1):
            for j, blk in enumerate(stage):
                bp = f'{pre}layer{s}.{j}.'
                put(blk.c1, bp + 'conv1', bp + 'bn1')
                put(blk.c2, bp + 'conv2', bp + 'bn2')
                if blk.down is not None:
                    put(blk.down, bp + 'downsample.0', bp + 'downsample.1')


class TorchARM(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv_layer = TorchConvBN(cin, cout, 3)
        self.gate = torch.nn.Conv2d(cout, cout, 1, bias=False)
        self.gate_bn = torch.nn.BatchNorm2d(cout)
        with torch.no_grad():
            self.gate_bn.running_mean.normal_(0, 0.3)
            self.gate_bn.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        x = self.conv_layer(x)
        a = F.adaptive_avg_pool2d(x, 1)
        a = torch.sigmoid(self.gate_bn(self.gate(a)))
        return x * a

    def dump(self, sd, pre):
        sd[pre + 'conv_layer.conv.weight'] = self.conv_layer.conv.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}conv_layer.bn.{a}'] = getattr(self.conv_layer.bn, a)
        sd[pre + 'atten_conv_layer.1.conv.weight'] = self.gate.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{pre}atten_conv_layer.1.bn.{a}'] = getattr(self.gate_bn, a)


@pytest.mark.slow
def test_bisenetv1_ingestion_parity():
    torch.manual_seed(31)
    inner = TorchR18Classic()
    spatial = torch.nn.ModuleList([
        TorchConvBN(3, SPATIAL[0], 7, 2),
        TorchConvBN(SPATIAL[0], SPATIAL[1], 3, 2),
        TorchConvBN(SPATIAL[1], SPATIAL[2], 3, 2),
        TorchConvBN(SPATIAL[2], SPATIAL[3], 1, 1)])
    arm16 = TorchARM(CTX[1], CTX[0])
    arm32 = TorchARM(CTX[2], CTX[0])
    head32 = TorchConvBN(CTX[0], CTX[0], 3)
    head16 = TorchConvBN(CTX[0], CTX[0], 3)
    gap_conv = TorchConvBN(CTX[2], CTX[0], 1)
    ffm_conv = TorchConvBN(CTX[1], OUT, 1)
    ffm_atten = TorchConvBN(OUT, OUT, 1)

    sd = {}
    inner.dump(sd, 'context_path.backbone.')

    def put_cm(mod, key):
        sd[key + '.conv.weight'] = mod.conv.weight
        for a in ('weight', 'bias', 'running_mean', 'running_var'):
            sd[f'{key}.bn.{a}'] = getattr(mod.bn, a)

    for i, m in enumerate(spatial):
        put_cm(m, f'spatial_path.layer{i + 1}')
    arm16.dump(sd, 'context_path.arm16.')
    arm32.dump(sd, 'context_path.arm32.')
    put_cm(head32, 'context_path.conv_head32')
    put_cm(head16, 'context_path.conv_head16')
    put_cm(gap_conv, 'context_path.gap_conv.1')
    put_cm(ffm_conv, 'ffm.conv1')
    put_cm(ffm_atten, 'ffm.conv_atten.0')

    mods = [inner, *spatial, arm16, arm32, head32, head16, gap_conv,
            ffm_conv, ffm_atten]
    for m in mods:
        m.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(img).permute(0, 3, 1, 2)
        _, x8, x16, x32 = inner(x)
        gap = gap_conv(F.adaptive_avg_pool2d(x32, 1))
        a32 = arm32(x32) + gap
        a32 = head32(F.interpolate(a32, size=x16.shape[2:],
                                   mode='nearest'))
        a16 = arm16(x16) + a32
        a16 = head16(F.interpolate(a16, size=x8.shape[2:],
                                   mode='nearest'))
        s = x
        for m in spatial:
            s = m(s)
        fuse = ffm_conv(torch.cat([s, a16], 1))
        atten = torch.sigmoid(ffm_atten(F.adaptive_avg_pool2d(fuse, 1)))
        fused = fuse * atten + fuse
        refs = [fused, a16, a32]

    bb = BACKBONES.build(dict(
        type='BiSeNetV1', spatial_channels=SPATIAL, context_channels=CTX,
        out_channels=OUT, out_indices=(0, 1, 2),
        backbone_cfg=dict(type='ResNet', depth=18, stem_channels=BASE,
                          base_channels=BASE, out_indices=(1, 2, 3))))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_bisenetv1_backbone(
        {k: v.detach().numpy() for k, v in sd.items()})
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    outs = bb.apply(variables, jnp.asarray(img))
    assert len(outs) == 3
    for i, (g, r) in enumerate(zip(outs, refs)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4, err_msg=f'out {i}')
