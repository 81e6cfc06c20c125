"""Full-model numeric parity vs a torch reimplementation of the REFERENCE
forward (mmseg vit.py:187-569 + setr_up_head.py + encoder_decoder.py
encode_decode). This is the mIoU-parity evidence obtainable without the
dataset: random reference-layout weights -> our converter -> our flax
forward must match the torch forward to f32 tolerance, end to end.

Covers (VERDICT r1 next-step #4): a full ViT block stack (pre-LN MHA+FFN,
pos embed, cls token), the SETR-PUP head (LN on tokens, conv/BN-eval/ReLU,
F.interpolate bilinear align_corners=False, conv_seg), the vmapped aux-head
stack, and the encode_decode resize-to-input.
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

C, HEADS, LAYERS, GRID, P = 32, 4, 4, 4, 16
IMG = GRID * P  # 64
NCLS = 5


# --------------------------------------------------------------- torch ref
class TorchBlock(torch.nn.Module):
    """Reference TransformerEncoderLayer (mmseg vit.py:67-127): pre-LN,
    torch nn.MultiheadAttention, mmcv FFN (Linear-GELU-Linear)."""

    def __init__(self):
        super().__init__()
        self.ln1 = torch.nn.LayerNorm(C, eps=1e-6)
        self.attn = torch.nn.MultiheadAttention(C, HEADS, batch_first=True)
        self.ln2 = torch.nn.LayerNorm(C, eps=1e-6)
        self.fc1 = torch.nn.Linear(C, 4 * C)
        self.fc2 = torch.nn.Linear(4 * C, C)

    def forward(self, x, attn_mask=None):
        # attn_mask: additive float [B*H, T, T] (the reference's PASA bias
        # path, vit.py:113-127 -> nn.MultiheadAttention attn_mask)
        y = self.ln1(x)
        y, _ = self.attn(y, y, y, attn_mask=attn_mask, need_weights=False)
        x = x + y
        z = self.ln2(x)
        z = self.fc2(F.gelu(self.fc1(z)))
        return x + z


class TorchViT(torch.nn.Module):
    """Reference VisionTransformer forward (vit.py:479-569, PASA off)."""

    def __init__(self, out_indices):
        super().__init__()
        self.out_indices = out_indices
        self.patch = torch.nn.Conv2d(3, C, P, stride=P)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, C) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, GRID * GRID + 1, C) * 0.02)
        self.blocks = torch.nn.ModuleList(TorchBlock()
                                          for _ in range(LAYERS))

    def forward(self, x, attn_mask=None):
        # attn_mask [B*H, T, T] additive, applied at EVERY layer like the
        # reference (vit.py:543-545 passes the same mask into each block)
        b = x.shape[0]
        t = self.patch(x).flatten(2).transpose(1, 2)       # [B, HW, C]
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self.pos_embed
        outs = []
        for i, blk in enumerate(self.blocks):
            t = blk(t, attn_mask=attn_mask)
            if i in self.out_indices:
                f = t[:, 1:].transpose(1, 2).reshape(b, C, GRID, GRID)
                outs.append(f)
        return outs


class TorchSETRUP(torch.nn.Module):
    """Reference SETRUPHead (setr_up_head.py:52-113): LN on tokens, then
    num_convs x [3x3 conv(no bias) + BN + ReLU + 2x bilinear up], 1x1
    conv_seg."""

    def __init__(self, num_convs, up_scale, channels=16):
        super().__init__()
        self.norm = torch.nn.LayerNorm(C, eps=1e-6)
        self.up_scale = up_scale
        self.convs = torch.nn.ModuleList()
        self.bns = torch.nn.ModuleList()
        cin = C
        for _ in range(num_convs):
            self.convs.append(torch.nn.Conv2d(cin, channels, 3, padding=1,
                                              bias=False))
            self.bns.append(torch.nn.BatchNorm2d(channels))
            cin = channels
        self.conv_seg = torch.nn.Conv2d(channels, NCLS, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        t = x.flatten(2).transpose(1, 2)
        t = self.norm(t)
        x = t.transpose(1, 2).reshape(b, c, h, w)
        for conv, bn in zip(self.convs, self.bns):
            x = F.relu(bn(conv(x)))
            x = F.interpolate(x, scale_factor=self.up_scale,
                              mode='bilinear', align_corners=False)
        return self.conv_seg(x)


def _head_sd(prefix, head):
    sd = {f'{prefix}norm.weight': head.norm.weight,
          f'{prefix}norm.bias': head.norm.bias,
          f'{prefix}conv_seg.weight': head.conv_seg.weight,
          f'{prefix}conv_seg.bias': head.conv_seg.bias}
    for i, (conv, bn) in enumerate(zip(head.convs, head.bns)):
        sd[f'{prefix}up_convs.{i}.0.conv.weight'] = conv.weight
        sd[f'{prefix}up_convs.{i}.0.bn.weight'] = bn.weight
        sd[f'{prefix}up_convs.{i}.0.bn.bias'] = bn.bias
        sd[f'{prefix}up_convs.{i}.0.bn.running_mean'] = bn.running_mean
        sd[f'{prefix}up_convs.{i}.0.bn.running_var'] = bn.running_var
    return sd


def _vit_sd(vit):
    sd = {'backbone.cls_token': vit.cls_token,
          'backbone.pos_embed': vit.pos_embed,
          'backbone.patch_embed.projection.weight': vit.patch.weight,
          'backbone.patch_embed.projection.bias': vit.patch.bias}
    for i, blk in enumerate(vit.blocks):
        p = f'backbone.layers.{i}.'
        sd[p + 'ln1.weight'] = blk.ln1.weight
        sd[p + 'ln1.bias'] = blk.ln1.bias
        sd[p + 'ln2.weight'] = blk.ln2.weight
        sd[p + 'ln2.bias'] = blk.ln2.bias
        sd[p + 'attn.attn.in_proj_weight'] = blk.attn.in_proj_weight
        sd[p + 'attn.attn.in_proj_bias'] = blk.attn.in_proj_bias
        sd[p + 'attn.attn.out_proj.weight'] = blk.attn.out_proj.weight
        sd[p + 'attn.attn.out_proj.bias'] = blk.attn.out_proj.bias
        sd[p + 'ffn.layers.0.0.weight'] = blk.fc1.weight
        sd[p + 'ffn.layers.0.0.bias'] = blk.fc1.bias
        sd[p + 'ffn.layers.1.weight'] = blk.fc2.weight
        sd[p + 'ffn.layers.1.bias'] = blk.fc2.bias
    return sd


@pytest.fixture(scope='module')
def torch_model_and_sd():
    torch.manual_seed(0)
    vit = TorchViT(out_indices=(1, 3)).eval()
    head = TorchSETRUP(num_convs=2, up_scale=2).eval()
    aux = [TorchSETRUP(num_convs=1, up_scale=4).eval() for _ in range(2)]
    # randomize BN running stats so eval-mode BN is a real affine test
    gen = torch.Generator().manual_seed(7)
    for h in [head] + aux:
        for bn in h.bns:
            bn.running_mean.copy_(torch.randn(bn.running_mean.shape,
                                              generator=gen) * 0.3)
            bn.running_var.copy_(
                torch.rand(bn.running_var.shape, generator=gen) + 0.5)
    sd = {}
    sd.update(_vit_sd(vit))
    sd.update(_head_sd('decode_head.', head))
    for i, a in enumerate(aux):
        sd.update(_head_sd(f'auxiliary_head.{i}.', a))
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    return vit, head, aux, sd


@pytest.fixture(scope='module')
def jax_model(torch_model_and_sd):
    _, _, _, sd = torch_model_and_sd
    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(IMG, IMG),
                      patch_size=P, embed_dims=C, num_layers=LAYERS,
                      num_heads=HEADS, out_indices=(1, 3), use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=C, channels=16,
                         num_classes=NCLS, in_index=1, num_convs=2,
                         up_scale=2, align_corners=False),
        auxiliary_head=[
            dict(type='SETRUPHead', in_channels=C, channels=16,
                 num_classes=NCLS, in_index=0, num_convs=1, up_scale=4,
                 align_corners=False) for _ in range(2)]))
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, IMG, IMG, 3))
    converted = convert_mmseg_checkpoint(sd, num_layers=LAYERS,
                                         dst_grid=(GRID, GRID), num_aux=2)
    merged = merge_pretrained(variables, converted)
    return model, merged


def _img(b=2, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(b, IMG, IMG, 3).astype(np.float32)


def test_backbone_feature_parity(torch_model_and_sd, jax_model):
    vit = torch_model_and_sd[0]
    model, variables = jax_model
    img = _img()
    with torch.no_grad():
        ref = vit(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4)


def test_full_forward_logit_parity(torch_model_and_sd, jax_model):
    """The north-star check: whole flagship-shaped forward, logits within
    f32 tolerance of the reference pipeline."""
    vit, head, _, _ = torch_model_and_sd
    model, variables = jax_model
    img = _img()
    with torch.no_grad():
        feats = vit(torch.from_numpy(img).permute(0, 3, 1, 2))
        ref = head(feats[1])                      # in_index=1
        ref = F.interpolate(ref, size=(IMG, IMG), mode='bilinear',
                            align_corners=False)  # encode_decode resize
    got = model.apply(variables, jnp.asarray(img), train=False)
    assert got.shape == (2, IMG, IMG, NCLS)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)


def test_aux_head_stack_parity(torch_model_and_sd, jax_model):
    """The vmapped aux-head stack must reproduce each torch aux head."""
    vit, _, aux, _ = torch_model_and_sd
    model, variables = jax_model
    img = _img()
    with torch.no_grad():
        feats = vit(torch.from_numpy(img).permute(0, 3, 1, 2))
        refs = [a(feats[0]) for a in aux]         # in_index=0
    _, aux_logits = model.apply(
        variables, method='forward_train_heads_from_img',
        img=jnp.asarray(img), train=False)
    assert len(aux_logits) == 2
    for g, r in zip(aux_logits, refs):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4)
