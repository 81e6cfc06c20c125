"""Fast-SCNN checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
fast_scnn.py:13-270 + utils/inverted_residual.py:9-99): LTD whose
depthwise convs carry NO activation (dw_act_cfg=None), GFE inverted
residuals (ReLU act) + PPM (inter = block_channels[-1] // 4) + 3x3 out
conv, FFM with grouped dwconv (ReLU) and act-free 1x1 branches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_fastscnn_backbone,
                                          merge_pretrained)
from s4former_tpu.registry import BACKBONES
from tests.test_core.test_head_ingestion_parity import TorchConvModule
from tests.test_core.test_stdc_parity import TorchDWConvBN

DW = (4, 6)
GIN = 8
BLOCKS = (8, 12, 16)
GOUT = 16
FUSE = 16
SCALES = (1, 2, 3, 6)


class TorchIR(torch.nn.Module):
    def __init__(self, cin, cout, stride, expand=6):
        super().__init__()
        hid = cin * expand
        self.expand = TorchConvModule(cin, hid, 1)
        self.dw = TorchDWConvBN(hid, hid, 3, stride, hid)
        self.proj = TorchConvModule(hid, cout, 1)  # linear: bn(conv) only
        self.res = stride == 1 and cin == cout

    def forward(self, x):
        y = F.relu(self.dw(self.expand(x)))
        y = self.proj.bn(self.proj.conv(y))
        return x + y if self.res else y

    def dump(self, sd, pre):
        self.expand.dump(sd, pre + 'conv.0')
        self.dw.dump(sd, pre + 'conv.1')
        self.proj.dump(sd, pre + 'conv.2')


@pytest.mark.slow
def test_fastscnn_ingestion_parity():
    torch.manual_seed(51)
    lds0 = TorchConvModule(3, DW[0], 3)
    lds0.conv.stride = (2, 2)
    lds1_dw = TorchDWConvBN(DW[0], DW[0], 3, 2, DW[0])
    lds1_pw = TorchConvModule(DW[0], DW[1], 1)
    lds2_dw = TorchDWConvBN(DW[1], DW[1], 3, 2, DW[1])
    lds2_pw = TorchConvModule(DW[1], GIN, 1)
    gfe = torch.nn.ModuleList()
    cin = GIN
    for c, st in zip(BLOCKS, (2, 2, 1)):
        stage = torch.nn.ModuleList(
            [TorchIR(cin, c, st)] + [TorchIR(c, c, 1) for _ in range(2)])
        gfe.append(stage)
        cin = c
    ppm = torch.nn.ModuleList(TorchConvModule(BLOCKS[-1], BLOCKS[-1] // 4,
                                              1) for _ in SCALES)
    out_conv = TorchConvModule(BLOCKS[-1] * 2, GOUT, 3)
    ffm_dw = TorchDWConvBN(GOUT, FUSE, 3, 1, FUSE)
    ffm_low = TorchConvModule(FUSE, FUSE, 1)
    ffm_high = TorchConvModule(GIN, FUSE, 1)

    sd = {}
    lds0.dump(sd, 'learning_to_downsample.conv')
    lds1_dw.dump(sd, 'learning_to_downsample.dsconv1.depthwise_conv')
    lds1_pw.dump(sd, 'learning_to_downsample.dsconv1.pointwise_conv')
    lds2_dw.dump(sd, 'learning_to_downsample.dsconv2.depthwise_conv')
    lds2_pw.dump(sd, 'learning_to_downsample.dsconv2.pointwise_conv')
    for i, stage in enumerate(gfe):
        for j, m in enumerate(stage):
            m.dump(sd, f'global_feature_extractor.bottleneck{i + 1}.{j}.')
    for i, m in enumerate(ppm):
        m.dump(sd, f'global_feature_extractor.ppm.{i}.1')
    out_conv.dump(sd, 'global_feature_extractor.out')
    ffm_dw.dump(sd, 'feature_fusion.dwconv')
    ffm_low.dump(sd, 'feature_fusion.conv_lower_res')
    ffm_high.dump(sd, 'feature_fusion.conv_higher_res')

    mods = [lds0, lds1_dw, lds1_pw, lds2_dw, lds2_pw, gfe, ppm, out_conv,
            ffm_dw, ffm_low, ffm_high]
    for m in mods:
        m.eval()
    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(img).permute(0, 3, 1, 2)
        y = lds1_pw(lds1_dw(lds0(x)))
        higher = lds2_pw(lds2_dw(y))
        g = higher
        for stage in gfe:
            for m in stage:
                g = m(g)
        branches = [g]
        for sc, m in zip(SCALES, ppm):
            pb = m(F.adaptive_avg_pool2d(g, sc))
            branches.append(F.interpolate(pb, size=g.shape[2:],
                                          mode='bilinear',
                                          align_corners=False))
        lower = out_conv(torch.cat(branches, 1))
        up = F.interpolate(lower, size=higher.shape[2:], mode='bilinear',
                           align_corners=False)
        up = F.relu(ffm_dw(up))
        low_b = ffm_low.bn(ffm_low.conv(up))
        high_b = ffm_high.bn(ffm_high.conv(higher))
        fusion = F.relu(low_b + high_b)
        refs = [higher, lower, fusion]

    bb = BACKBONES.build(dict(
        type='FastSCNN', downsample_dw_channels=DW, global_in_channels=GIN,
        global_block_channels=BLOCKS, global_block_strides=(2, 2, 1),
        global_out_channels=GOUT, higher_in_channels=GIN,
        lower_in_channels=GOUT, fusion_out_channels=FUSE,
        out_indices=(0, 1, 2)))
    variables = bb.init(jax.random.PRNGKey(0), jnp.asarray(img))
    p, bs = convert_fastscnn_backbone(
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
