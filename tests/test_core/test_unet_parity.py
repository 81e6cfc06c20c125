"""UNet checkpoint-ingestion parity vs a torch oracle.

The oracle mirrors the reference semantics
(mmseg/models/backbones/unet.py:16-438 + utils/up_conv_block.py:9-103):
encoder stages of BasicConvBlock (conv 0 carries stride, dilation 1;
later convs carry the stage dilation) behind optional MaxPool2d (which
consumes a Sequential index in the state_dict), decoders of InterpConv
(bilinear x2 AC=False then 1x1 conv+BN+ReLU) + concat[skip, up] +
BasicConvBlock, returning [bottleneck, coarse..fine]. Emits the mmseg
``encoder.{i}.{k}.convs.{c}`` / ``decoder.{j}.upsample.interp_upsample``
key layout ingested by ``convert_unet_backbone``.
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
from tests.test_core.test_beit_resnet_parity import TorchConvBN


class TorchBasicConvBlock(torch.nn.Module):
    def __init__(self, cin, cout, num_convs, stride, dilation):
        super().__init__()
        self.convs = torch.nn.ModuleList([
            TorchConvBN(cin if c == 0 else cout, cout, 3,
                        stride if c == 0 else 1,
                        1 if c == 0 else dilation)
            for c in range(num_convs)])

    def forward(self, x):
        for m in self.convs:
            x = m(x)
        return x


class TorchUNet(torch.nn.Module):
    def __init__(self, base=8, num_stages=4,
                 strides=(1, 1, 1, 1), downsamples=(True, True, False),
                 enc_num_convs=(2, 2, 2, 2), dec_num_convs=(2, 2, 2),
                 enc_dilations=(1, 1, 1, 1), dec_dilations=(1, 2, 1),
                 deconv=False):
        super().__init__()
        self.deconv = deconv
        torch.manual_seed(3)
        self.num_stages = num_stages
        self.strides = strides
        self.downsamples = downsamples
        self.enc = torch.nn.ModuleList()
        self.dec_up = torch.nn.ModuleList()
        self.dec_conv = torch.nn.ModuleList()
        self.enc_pool = []
        cin = 3
        for i in range(num_stages):
            self.enc_pool.append(
                i > 0 and strides[i] == 1 and downsamples[i - 1])
            self.enc.append(TorchBasicConvBlock(
                cin, base * 2 ** i, enc_num_convs[i], strides[i],
                enc_dilations[i]))
            cin = base * 2 ** i
        self.dec_upsample = []
        for i in range(1, num_stages):
            self.dec_upsample.append(strides[i] != 1 or downsamples[i - 1])
            if deconv and self.dec_upsample[-1]:
                # DeconvModule (ref unet.py:90-147): biased ConvTranspose
                # k4/s2/p1 + BN + ReLU
                m = torch.nn.Module()
                m.deconv = torch.nn.ConvTranspose2d(
                    base * 2 ** i, base * 2 ** (i - 1), 4, 2, 1)
                m.bn = torch.nn.BatchNorm2d(base * 2 ** (i - 1))
                with torch.no_grad():
                    m.bn.running_mean.normal_(0, 0.5)
                    m.bn.running_var.uniform_(0.5, 2.0)
                    m.bn.weight.normal_(1, 0.2)
                    m.bn.bias.normal_(0, 0.2)
                self.dec_up.append(m)
            else:
                self.dec_up.append(TorchConvBN(
                    base * 2 ** i, base * 2 ** (i - 1), 1))
            self.dec_conv.append(TorchBasicConvBlock(
                base * 2 ** i, base * 2 ** (i - 1), dec_num_convs[i - 1],
                1, dec_dilations[i - 1]))

    def forward(self, x):
        enc_outs = []
        for i in range(self.num_stages):
            if self.enc_pool[i]:
                x = F.max_pool2d(x, 2)
            x = self.enc[i](x)
            enc_outs.append(x)
        dec_outs = [x]
        for i in range(self.num_stages - 1, 0, -1):
            skip = enc_outs[i - 1]
            up = self.dec_up[i - 1]
            if self.deconv and self.dec_upsample[i - 1]:
                x = F.relu(up.bn(up.deconv(x)))
            else:
                if self.dec_upsample[i - 1]:
                    x = F.interpolate(x, size=skip.shape[2:],
                                      mode='bilinear', align_corners=False)
                x = up(x)
            x = torch.cat([skip, x], dim=1)
            x = self.dec_conv[i - 1](x)
            dec_outs.append(x)
        return dec_outs

    def state_dict_mmseg(self):
        sd = {}

        def put(mod, prefix):
            sd[prefix + '.conv.weight'] = mod.conv.weight
            for a in ('weight', 'bias', 'running_mean', 'running_var'):
                sd[f'{prefix}.bn.{a}'] = getattr(mod.bn, a)

        for i, blk in enumerate(self.enc):
            k = 1 if self.enc_pool[i] else 0
            for c, m in enumerate(blk.convs):
                put(m, f'encoder.{i}.{k}.convs.{c}')
        for j in range(len(self.dec_up)):
            if self.deconv and self.dec_upsample[j]:
                m = self.dec_up[j]
                pre = f'decoder.{j}.upsample.deconv_upsamping'
                sd[pre + '.0.weight'] = m.deconv.weight
                sd[pre + '.0.bias'] = m.deconv.bias
                for a in ('weight', 'bias', 'running_mean', 'running_var'):
                    sd[f'{pre}.1.{a}'] = getattr(m.bn, a)
            elif self.dec_upsample[j]:
                put(self.dec_up[j],
                    f'decoder.{j}.upsample.interp_upsample.1')
            else:
                put(self.dec_up[j], f'decoder.{j}.upsample')
            for c, m in enumerate(self.dec_conv[j].convs):
                put(m, f'decoder.{j}.conv_block.convs.{c}')
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize('downsamples,strides', [
    ((True, True, True), (1, 1, 1, 1)),     # classic pooled UNet
    ((True, True, False), (1, 1, 1, 1)),    # no-downsample last stage ->
    # decoder.2 takes the plain-ConvModule (no interp_upsample) key path
])
def test_unet_ingestion_parity(downsamples, strides):
    oracle = TorchUNet(strides=strides, downsamples=downsamples).eval()
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='UNet', base_channels=8, num_stages=4,
                      strides=strides, downsamples=downsamples,
                      enc_num_convs=(2, 2, 2, 2), dec_num_convs=(2, 2, 2),
                      enc_dilations=(1, 1, 1, 1), dec_dilations=(1, 2, 1)),
        decode_head=dict(type='FCNHead', in_channels=8, channels=8,
                         num_classes=5, in_index=3, num_convs=1))
    model = build_segmentor(cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 32, 32, 3))
    converted = convert_mmseg_checkpoint(
        {'backbone.' + k: v for k, v in oracle.state_dict_mmseg().items()})
    variables = merge_pretrained(variables, converted, strict=True)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == len(ref)
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'level {s}')


def test_unet_deconv_decoder_ingestion_parity():
    """DeconvModule decoder variant (ref unet.py:90-147 +
    upsample_cfg=dict(type='DeconvModule')): biased ConvTranspose k4/s2/p1
    + BN + ReLU replaces the InterpConv upsample."""
    downsamples, strides = (True, True, True), (1, 1, 1, 1)
    oracle = TorchUNet(strides=strides, downsamples=downsamples,
                       deconv=True).eval()
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type='UNet', base_channels=8, num_stages=4,
                      strides=strides, downsamples=downsamples,
                      enc_num_convs=(2, 2, 2, 2), dec_num_convs=(2, 2, 2),
                      enc_dilations=(1, 1, 1, 1), dec_dilations=(1, 2, 1),
                      upsample_cfg=dict(type='DeconvModule')),
        decode_head=dict(type='FCNHead', in_channels=8, channels=8,
                         num_classes=5, in_index=3, num_convs=1))
    model = build_segmentor(cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 32, 32, 3))
    converted = convert_mmseg_checkpoint(
        {'backbone.' + k: v for k, v in oracle.state_dict_mmseg().items()})
    variables = merge_pretrained(variables, converted, strict=True)

    rng = np.random.RandomState(1)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f'level {s}')
