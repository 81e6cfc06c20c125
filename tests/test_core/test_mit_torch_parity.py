"""MiT (SegFormer) checkpoint-ingestion parity vs a torch reference.

Torch oracle mirrors the reference MixVisionTransformer
(mmseg/models/backbones/mit.py): per stage [overlap patch embed (conv k,
stride, pad k//2 + LN) -> N x (pre-LN EfficientMHA(+sr conv+LN when
sr_ratio>1) + MixFFN(fc1 1x1 -> dw3x3 -> GELU -> fc2 1x1)) -> stage LN],
emitting the mmseg state_dict layout (layers.{s}.{0,1,2}...,
attn.attn.in_proj_*). convert_mit_backbone must map those weights onto our
flax MixVisionTransformer so the forwards agree at f32 tolerance — this is
what lets the Cityscapes SegFormer semi configs start from pretrained
MiT-B4 weights (reference README.md:16-24).

Also covers the SegformerHead converter (segformer_head.py:120-135
ConvModule-per-level + fusion + conv_seg).
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

DIMS = (8, 16)          # embed_dims=8, stage multipliers (1, 2)
HEADS_ = (1, 2)
LAYERS_ = (2, 2)
SRS = (2, 1)
PATCHES = (7, 3)
STRIDES = (4, 2)
IMG = 32
NCLS = 5


class TorchMiTBlock(torch.nn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.attn = torch.nn.MultiheadAttention(dim, heads,
                                                batch_first=True)
        self.sr_ratio = sr
        if sr > 1:
            self.sr = torch.nn.Conv2d(dim, dim, sr, stride=sr)
            self.sr_norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
        hidden = dim * 4
        self.fc1 = torch.nn.Conv2d(dim, hidden, 1)
        self.dw = torch.nn.Conv2d(hidden, hidden, 3, padding=1,
                                  groups=hidden)
        self.fc2 = torch.nn.Conv2d(hidden, dim, 1)

    def forward(self, x, hw):
        b, l, c = x.shape
        y = self.norm1(x)
        kv = y
        if self.sr_ratio > 1:
            y2 = y.transpose(1, 2).reshape(b, c, *hw)
            y2 = self.sr(y2)
            kv = self.sr_norm(y2.flatten(2).transpose(1, 2))
        y, _ = self.attn(y, kv, kv, need_weights=False)
        x = x + y
        z = self.norm2(x)
        z = z.transpose(1, 2).reshape(b, c, *hw)
        z = self.fc2(F.gelu(self.dw(self.fc1(z))))
        return x + z.flatten(2).transpose(1, 2)


class TorchMiT(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.stages = torch.nn.ModuleList()
        cin = 3
        for s, dim in enumerate(DIMS):
            patch = torch.nn.Conv2d(cin, dim, PATCHES[s],
                                    stride=STRIDES[s],
                                    padding=PATCHES[s] // 2)
            pnorm = torch.nn.LayerNorm(dim, eps=1e-6)
            blocks = torch.nn.ModuleList(
                TorchMiTBlock(dim, HEADS_[s], SRS[s])
                for _ in range(LAYERS_[s]))
            snorm = torch.nn.LayerNorm(dim, eps=1e-6)
            self.stages.append(torch.nn.ModuleList(
                [patch, pnorm, blocks, snorm]))
            cin = dim

    def forward(self, x):
        outs = []
        for patch, pnorm, blocks, snorm in self.stages:
            x = patch(x)
            b, c, h, w = x.shape
            t = pnorm(x.flatten(2).transpose(1, 2))
            for blk in blocks:
                t = blk(t, (h, w))
            t = snorm(t)
            x = t.transpose(1, 2).reshape(b, c, h, w)
            outs.append(x)
        return outs

    def state_dict_mmseg(self):
        sd = {}
        for s, (patch, pnorm, blocks, snorm) in enumerate(self.stages):
            sd[f'backbone.layers.{s}.0.projection.weight'] = patch.weight
            sd[f'backbone.layers.{s}.0.projection.bias'] = patch.bias
            sd[f'backbone.layers.{s}.0.norm.weight'] = pnorm.weight
            sd[f'backbone.layers.{s}.0.norm.bias'] = pnorm.bias
            for i, blk in enumerate(blocks):
                p = f'backbone.layers.{s}.1.{i}.'
                sd[p + 'norm1.weight'] = blk.norm1.weight
                sd[p + 'norm1.bias'] = blk.norm1.bias
                sd[p + 'norm2.weight'] = blk.norm2.weight
                sd[p + 'norm2.bias'] = blk.norm2.bias
                sd[p + 'attn.attn.in_proj_weight'] = \
                    blk.attn.in_proj_weight
                sd[p + 'attn.attn.in_proj_bias'] = blk.attn.in_proj_bias
                sd[p + 'attn.attn.out_proj.weight'] = \
                    blk.attn.out_proj.weight
                sd[p + 'attn.attn.out_proj.bias'] = blk.attn.out_proj.bias
                if blk.sr_ratio > 1:
                    sd[p + 'attn.sr.weight'] = blk.sr.weight
                    sd[p + 'attn.sr.bias'] = blk.sr.bias
                    sd[p + 'attn.norm.weight'] = blk.sr_norm.weight
                    sd[p + 'attn.norm.bias'] = blk.sr_norm.bias
                sd[p + 'ffn.layers.0.weight'] = blk.fc1.weight
                sd[p + 'ffn.layers.0.bias'] = blk.fc1.bias
                sd[p + 'ffn.layers.1.weight'] = blk.dw.weight
                sd[p + 'ffn.layers.1.bias'] = blk.dw.bias
                sd[p + 'ffn.layers.4.weight'] = blk.fc2.weight
                sd[p + 'ffn.layers.4.bias'] = blk.fc2.bias
            sd[f'backbone.layers.{s}.2.weight'] = snorm.weight
            sd[f'backbone.layers.{s}.2.bias'] = snorm.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


class TorchSegformerHead(torch.nn.Module):
    """Reference SegformerHead (:120-135), eval-mode BN."""

    def __init__(self, in_channels, channels):
        super().__init__()
        torch.manual_seed(1)
        self.convs = torch.nn.ModuleList()
        self.bns = torch.nn.ModuleList()
        for c in in_channels:
            self.convs.append(torch.nn.Conv2d(c, channels, 1, bias=False))
            self.bns.append(torch.nn.BatchNorm2d(channels))
        self.fusion = torch.nn.Conv2d(channels * len(in_channels),
                                      channels, 1, bias=False)
        self.fusion_bn = torch.nn.BatchNorm2d(channels)
        self.conv_seg = torch.nn.Conv2d(channels, NCLS, 1)
        gen = torch.Generator().manual_seed(3)
        for bn in list(self.bns) + [self.fusion_bn]:
            bn.running_mean.copy_(
                torch.randn(bn.running_mean.shape, generator=gen) * 0.3)
            bn.running_var.copy_(
                torch.rand(bn.running_var.shape, generator=gen) + 0.5)

    def forward(self, feats):
        outs = []
        for f, conv, bn in zip(feats, self.convs, self.bns):
            y = F.relu(bn(conv(f)))
            y = F.interpolate(y, size=feats[0].shape[2:], mode='bilinear',
                              align_corners=False)
            outs.append(y)
        x = F.relu(self.fusion_bn(self.fusion(torch.cat(outs, dim=1))))
        return self.conv_seg(x)

    def state_dict_mmseg(self):
        sd = {}
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns)):
            sd[f'decode_head.convs.{i}.conv.weight'] = conv.weight
            sd[f'decode_head.convs.{i}.bn.weight'] = bn.weight
            sd[f'decode_head.convs.{i}.bn.bias'] = bn.bias
            sd[f'decode_head.convs.{i}.bn.running_mean'] = bn.running_mean
            sd[f'decode_head.convs.{i}.bn.running_var'] = bn.running_var
        sd['decode_head.fusion_conv.conv.weight'] = self.fusion.weight
        sd['decode_head.fusion_conv.bn.weight'] = self.fusion_bn.weight
        sd['decode_head.fusion_conv.bn.bias'] = self.fusion_bn.bias
        sd['decode_head.fusion_conv.bn.running_mean'] = \
            self.fusion_bn.running_mean
        sd['decode_head.fusion_conv.bn.running_var'] = \
            self.fusion_bn.running_var
        sd['decode_head.conv_seg.weight'] = self.conv_seg.weight
        sd['decode_head.conv_seg.bias'] = self.conv_seg.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


MODEL_CFG = dict(
    type='EncoderDecoder',
    backbone=dict(type='MixVisionTransformer', embed_dims=8, num_stages=2,
                  num_layers=LAYERS_, num_heads=HEADS_,
                  patch_sizes=PATCHES, strides=STRIDES, sr_ratios=SRS,
                  out_indices=(0, 1)),
    decode_head=dict(type='SegformerHead', in_channels=list(DIMS),
                     channels=12, num_classes=NCLS, in_index=[0, 1],
                     dropout_ratio=0.0, align_corners=False))


@pytest.fixture(scope='module')
def pair():
    tmit = TorchMiT().eval()
    thead = TorchSegformerHead(DIMS, 12).eval()
    sd = {}
    sd.update(tmit.state_dict_mmseg())
    sd.update(thead.state_dict_mmseg())
    model = build_segmentor(MODEL_CFG)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, IMG, IMG, 3))
    converted = convert_mmseg_checkpoint(sd)
    variables = merge_pretrained(variables, converted)
    return tmit, thead, model, variables


def _img(b=2, seed=5):
    rng = np.random.RandomState(seed)
    return rng.randn(b, IMG, IMG, 3).astype(np.float32)


def test_mit_backbone_ingestion_parity(pair):
    tmit, _, model, variables = pair
    img = _img()
    with torch.no_grad():
        ref = tmit(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4)


def test_segformer_full_forward_ingestion_parity(pair):
    tmit, thead, model, variables = pair
    img = _img()
    with torch.no_grad():
        feats = tmit(torch.from_numpy(img).permute(0, 3, 1, 2))
        ref = thead(feats)
        ref = F.interpolate(ref, size=(IMG, IMG), mode='bilinear',
                            align_corners=False)
    got = model.apply(variables, jnp.asarray(img), train=False)
    assert got.shape == (2, IMG, IMG, NCLS)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)
