"""ResNeXt checkpoint-ingestion parity vs a torch oracle.

mmseg ResNeXt (reference: mmseg/models/backbones/resnext.py:9-90) keeps
ResNet's exact state_dict key layout — only the Bottleneck geometry
changes: width = floor(planes * base_width/64) * groups on conv1/conv2,
conv2 grouped. So ``convert_resnet_backbone`` ingests it unchanged; this
test pins that through a torch oracle with grouped convs, the dilated
os8 recipe, and contract_dilation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables


class TorchGroupConvBN(torch.nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, groups=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=dilation * (k - 1) // 2,
                                    dilation=dilation, groups=groups,
                                    bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        with torch.no_grad():
            self.bn.running_mean.normal_(0, 0.5)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.bn.weight.normal_(1, 0.2)
            self.bn.bias.normal_(0, 0.2)

    def forward(self, x, relu=True):
        x = self.bn(self.conv(x))
        return F.relu(x) if relu else x


class TorchGroupBottleneck(torch.nn.Module):
    def __init__(self, cin, planes, stride, dilation, down,
                 groups=32, base_width=4):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.c1 = TorchGroupConvBN(cin, width, 1)
        self.c2 = TorchGroupConvBN(width, width, 3, stride, dilation,
                                   groups)
        self.c3 = TorchGroupConvBN(width, planes * 4, 1)
        self.down = TorchGroupConvBN(cin, planes * 4, 1, stride) if down \
            else None

    def forward(self, x):
        idn = self.down(x, relu=False) if self.down else x
        y = self.c3(self.c2(self.c1(x)), relu=False)
        return F.relu(y + idn)


class TorchResNeXt50(torch.nn.Module):
    def __init__(self, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                 contract=True):
        super().__init__()
        torch.manual_seed(11)
        self.stem = TorchGroupConvBN(3, 64, 7, 2)
        self.layers = torch.nn.ModuleList()
        cin, planes = 64, 64
        for s, blocks in enumerate((3, 4, 6, 3)):
            stage = torch.nn.ModuleList()
            for j in range(blocks):
                d = dilations[s]
                if j == 0 and d > 1 and contract:
                    d //= 2
                stride = strides[s] if j == 0 else 1
                stage.append(TorchGroupBottleneck(
                    cin, planes, stride, d, down=(j == 0)))
                cin = planes * 4
            self.layers.append(stage)
            planes *= 2

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for stage in self.layers:
            for blk in stage:
                x = blk(x)
            outs.append(x)
        return outs

    def state_dict_mmseg(self):
        sd = {}

        def put(mod, conv_key, bn_key):
            sd[conv_key + '.weight'] = mod.conv.weight
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{bn_key}.{a}'] = getattr(mod.bn, a)

        put(self.stem, 'conv1', 'bn1')
        for s, stage in enumerate(self.layers, start=1):
            for j, blk in enumerate(stage):
                pre = f'layer{s}.{j}.'
                put(blk.c1, pre + 'conv1', pre + 'bn1')
                put(blk.c2, pre + 'conv2', pre + 'bn2')
                put(blk.c3, pre + 'conv3', pre + 'bn3')
                if blk.down is not None:
                    put(blk.down, pre + 'downsample.0', pre + 'downsample.1')
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_resnext50_ingestion_parity():
    oracle = TorchResNeXt50().eval()
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNeXt', depth=50, groups=32, base_width=4,
                      strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                      contract_dilation=True, out_indices=(0, 1, 2, 3)),
        decode_head=dict(type='FCNHead', in_channels=2048, channels=16,
                         num_classes=5, in_index=3, num_convs=1))
    model = build_segmentor(cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 64, 64, 3))
    converted = convert_mmseg_checkpoint(
        {'backbone.' + k: v for k, v in oracle.state_dict_mmseg().items()})
    variables = merge_pretrained(variables, converted, strict=True)

    rng = np.random.RandomState(0)
    img = rng.randn(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == 4
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=3e-4, atol=3e-4, err_msg=f'stage {s}')
