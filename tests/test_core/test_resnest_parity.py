"""ResNeSt checkpoint-ingestion parity vs a torch oracle.

Oracle is a literal port of the reference (mmseg/models/backbones/
resnest.py:16-268 + mmcv ResLayer avg_down + ResNetV1d deep stem):
SplitAttentionConv2d (grouped conv by groups*radix, RSoftmax), stride
moved to the post-attention 3x3 AvgPool (avg_down_stride), V1d
downsample = AvgPool(stride) + stride-1 1x1 conv + BN.
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

RADIX, REDUCTION = 2, 4


def _bn(c):
    m = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        m.running_mean.normal_(0, 0.5)
        m.running_var.uniform_(0.5, 2.0)
        m.weight.normal_(1, 0.2)
        m.bias.normal_(0, 0.2)
    return m


class TorchSplAt(torch.nn.Module):
    def __init__(self, cin, channels, stride, dilation, groups=1):
        super().__init__()
        inter = max(cin * RADIX // REDUCTION, 32)
        self.radix, self.groups, self.channels = RADIX, groups, channels
        self.conv = torch.nn.Conv2d(cin, channels * RADIX, 3,
                                    stride=stride, padding=dilation,
                                    dilation=dilation,
                                    groups=groups * RADIX, bias=False)
        self.bn0 = _bn(channels * RADIX)
        self.fc1 = torch.nn.Conv2d(channels, inter, 1, groups=groups)
        self.bn1 = _bn(inter)
        self.fc2 = torch.nn.Conv2d(inter, channels * RADIX, 1,
                                   groups=groups)

    def forward(self, x):
        x = F.relu(self.bn0(self.conv(x)))
        b = x.size(0)
        splits = x.view(b, self.radix, -1, *x.shape[2:])
        gap = splits.sum(dim=1)
        gap = F.adaptive_avg_pool2d(gap, 1)
        gap = F.relu(self.bn1(self.fc1(gap)))
        atten = self.fc2(gap)
        # RSoftmax
        a = atten.view(b, self.groups, self.radix, -1).transpose(1, 2)
        a = F.softmax(a, dim=1).reshape(b, -1).view(b, -1, 1, 1)
        attens = a.view(b, self.radix, -1, *a.shape[2:])
        return torch.sum(attens * splits, dim=1).contiguous()

    def dump(self, sd, pre):
        sd[pre + 'conv.weight'] = self.conv.weight
        for n, m in (('bn0', self.bn0), ('bn1', self.bn1)):
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{pre}{n}.{a}'] = getattr(m, a)
        for n, m in (('fc1', self.fc1), ('fc2', self.fc2)):
            sd[pre + n + '.weight'] = m.weight
            sd[pre + n + '.bias'] = m.bias


class TorchSplAtBottleneck(torch.nn.Module):
    def __init__(self, cin, planes, stride, dilation, down):
        super().__init__()
        width = planes  # groups == 1
        self.stride = stride
        self.avd = stride > 1  # avg_down_stride
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = _bn(width)
        self.conv2 = TorchSplAt(width, width,
                                1 if self.avd else stride, dilation)
        self.avd_layer = torch.nn.AvgPool2d(3, stride, padding=1) \
            if self.avd else None
        self.conv3 = torch.nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = _bn(planes * 4)
        if down:
            self.down_conv = torch.nn.Conv2d(cin, planes * 4, 1,
                                             bias=False)
            self.down_bn = _bn(planes * 4)
        else:
            self.down_conv = None

    def forward(self, x):
        idn = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.conv2(y)
        if self.avd_layer is not None:
            y = self.avd_layer(y)
        y = self.bn3(self.conv3(y))
        if self.down_conv is not None:
            if self.stride > 1:  # V1d avg_down
                idn = F.avg_pool2d(idn, self.stride, self.stride)
            idn = self.down_bn(self.down_conv(idn))
        return F.relu(y + idn)

    def dump(self, sd, pre):
        sd[pre + 'conv1.weight'] = self.conv1.weight
        sd[pre + 'conv3.weight'] = self.conv3.weight
        for n, m in (('bn1', self.bn1), ('bn3', self.bn3)):
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{pre}{n}.{a}'] = getattr(m, a)
        self.conv2.dump(sd, pre + 'conv2.')
        if self.down_conv is not None:
            sd[pre + 'downsample.1.weight'] = self.down_conv.weight
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{pre}downsample.2.{a}'] = getattr(self.down_bn, a)


class TorchResNeSt50(torch.nn.Module):
    def __init__(self, strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                 contract=True, stem=64):
        super().__init__()
        torch.manual_seed(12)
        self.stem = torch.nn.ModuleList([
            torch.nn.Conv2d(3, stem // 2, 3, 2, 1, bias=False),
            _bn(stem // 2),
            torch.nn.Conv2d(stem // 2, stem // 2, 3, 1, 1, bias=False),
            _bn(stem // 2),
            torch.nn.Conv2d(stem // 2, stem, 3, 1, 1, bias=False),
            _bn(stem)])
        self.layers = torch.nn.ModuleList()
        cin, planes = stem, 64
        for s, blocks in enumerate((3, 4, 6, 3)):
            stage = torch.nn.ModuleList()
            for j in range(blocks):
                d = dilations[s]
                if j == 0 and d > 1 and contract:
                    d //= 2
                stage.append(TorchSplAtBottleneck(
                    cin, planes, strides[s] if j == 0 else 1, d,
                    down=(j == 0)))
                cin = planes * 4
            self.layers.append(stage)
            planes *= 2

    def forward(self, x):
        for i in range(0, 6, 2):
            x = F.relu(self.stem[i + 1](self.stem[i](x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for stage in self.layers:
            for blk in stage:
                x = blk(x)
            outs.append(x)
        return outs

    def state_dict_mmseg(self):
        sd = {}
        for n, i in (('0', 0), ('3', 2), ('6', 4)):
            sd[f'stem.{n}.weight'] = self.stem[i].weight
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'stem.{int(n) + 1}.{a}'] = getattr(self.stem[i + 1], a)
        for s, stage in enumerate(self.layers, start=1):
            for j, blk in enumerate(stage):
                blk.dump(sd, f'layer{s}.{j}.')
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_resnest50_ingestion_parity():
    oracle = TorchResNeSt50().eval()
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNeSt', depth=50, radix=2,
                      reduction_factor=4, avg_down_stride=True,
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
