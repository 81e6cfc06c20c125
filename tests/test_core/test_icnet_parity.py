"""ICNet checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
icnet.py:46-166): the 0.5x FEATURE resize happens between layer2 and
layer3 of the shared ResNet (the layer2 tap is pre-resize), PPM branches
conv to psp_out_channels each with the identity features concatenated
LAST, 3x3 psp bottleneck, per-branch 1x1 output convs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_icnet_backbone,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES
from tests.test_core.test_beit_resnet_parity import TorchResNetV1c
from tests.test_core.test_head_ingestion_parity import TorchConvModule

BASE = 8
PSP = 16
OUTC = (4, 8, 8)
SCALES = (1, 2, 3, 6)


@pytest.mark.slow
def test_icnet_ingestion_parity():
    torch.manual_seed(61)
    inner = TorchResNetV1c(50, base=BASE, strides=(1, 2, 2, 2),
                           dilations=(1, 1, 1, 1), contract=False)
    layer2_ch, layer4_ch = BASE * 2 * 4, BASE * 8 * 4
    psp_convs = torch.nn.ModuleList(TorchConvModule(layer4_ch, PSP, 1)
                                    for _ in SCALES)
    psp_bottleneck = TorchConvModule(layer4_ch + len(SCALES) * PSP, PSP, 3)
    sub1 = torch.nn.ModuleList([TorchConvModule(3, 4, 3),
                                TorchConvModule(4, 4, 3),
                                TorchConvModule(4, OUTC[0], 3)])
    for m in sub1:
        m.conv.stride = (2, 2)
    conv_sub2 = TorchConvModule(layer2_ch, OUTC[1], 1)
    conv_sub4 = TorchConvModule(PSP, OUTC[2], 1)

    sd = {}
    # TorchResNetV1c dumps WITH a 'backbone.' prefix already
    sd.update(inner.state_dict_mmseg())
    sd = {k: torch.from_numpy(v) for k, v in sd.items()}
    for i, m in enumerate(psp_convs):
        m.dump(sd, f'psp_modules.{i}.1')
    psp_bottleneck.dump(sd, 'psp_bottleneck')
    for i, m in enumerate(sub1):
        m.dump(sd, f'conv_sub1.{i}')
    conv_sub2.dump(sd, 'conv_sub2')
    conv_sub4.dump(sd, 'conv_sub4')

    for m in (inner, *psp_convs, psp_bottleneck, *sub1, conv_sub2,
              conv_sub4):
        m.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(img).permute(0, 3, 1, 2)
        s1 = x
        for m in sub1:
            s1 = m(s1)
        x2 = F.interpolate(x, scale_factor=0.5, mode='bilinear',
                           align_corners=False)
        y = x2
        for m in inner.stem:
            y = m(y)
        y = F.max_pool2d(y, 3, stride=2, padding=1)
        for blk in inner.layers[0]:
            y = blk(y)
        for blk in inner.layers[1]:
            y = blk(y)
        s2 = conv_sub2(y)
        y = F.interpolate(y, scale_factor=0.5, mode='bilinear',
                          align_corners=False)
        for blk in inner.layers[2]:
            y = blk(y)
        for blk in inner.layers[3]:
            y = blk(y)
        branches = []
        for sc, m in zip(SCALES, psp_convs):
            pb = m(F.adaptive_avg_pool2d(y, sc))
            branches.append(F.interpolate(pb, size=y.shape[2:],
                                          mode='bilinear',
                                          align_corners=False))
        branches.append(y)
        d = psp_bottleneck(torch.cat(branches, 1))
        s4 = conv_sub4(d)
        refs = [s1, s2, s4]

    bb = BACKBONES.build(dict(
        type='ICNet',
        backbone_cfg=dict(type='ResNetV1c', depth=50, stem_channels=BASE,
                          base_channels=BASE, strides=(1, 2, 2, 2),
                          dilations=(1, 1, 1, 1)),
        layer_channels=(layer2_ch, layer4_ch),
        light_branch_middle_channels=4, psp_out_channels=PSP,
        out_channels=OUTC, pool_scales=SCALES))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_icnet_backbone(
        {k: np.asarray(v.detach() if hasattr(v, 'detach') else v)
         for k, v in sd.items()})
    variables = merge_pretrained(variables,
                                 {'params': p, 'batch_stats': bs},
                                 strict=True)
    got = bb.apply(variables, jnp.asarray(img))
    assert len(got) == 3
    for i, (g_, r) in enumerate(zip(got, refs)):
        np.testing.assert_allclose(
            np.asarray(g_), r.permute(0, 2, 3, 1).numpy(),
            rtol=4e-4, atol=4e-4, err_msg=f'out {i}')
