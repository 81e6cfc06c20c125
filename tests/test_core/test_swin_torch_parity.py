"""Swin checkpoint-ingestion parity vs a torch reference (VERDICT r3 #7).

Torch oracle mirrors the reference SwinTransformer
(mmseg/models/backbones/swin.py:23-260 WindowMSA/ShiftWindowMSA with the
double_step_seq relative-position index, :380-475 block sequence, and the
``nn.Unfold``-based PatchMerging of mmseg/models/utils/embed.py:207-303
whose 4C axis is C-major), emitting the exact mmseg state_dict layout
(stages.{s}.blocks.{i}.attn.w_msa..., stages.{s}.downsample...,
norm{s}.*). ``convert_swin_backbone`` must map those weights onto our
flax SwinTransformer so the forwards agree at f32 tolerance — this is
what lets the ``upernet-swin`` config start from reference weights.

Geometry note: all grids here are LARGER than the window (16 and 8 vs
window 4), the regime every shipped 512x512 config runs in. At grid ==
window, mmseg still roll+masks while we (like timm) disable the shift —
a documented divergence outside the shipped geometries.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
import jax
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables

EMBED = 8
DEPTHS = (2, 2)
HEADS_ = (2, 4)
WIN = 4
PATCH = 4
IMG = 64
NCLS = 5


def _rel_position_index(ws):
    # mmseg WindowMSA.__init__ (swin.py:64-69): double_step_seq + flip(1)
    seq1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
    seq2 = torch.arange(0, ws)
    coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
    idx = coords + coords.T
    return idx.flip(1).contiguous()


class TorchWindowMSA(torch.nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.1)
        self.register_buffer('relative_position_index',
                             _rel_position_index(ws))
        self.qkv = torch.nn.Linear(dim, dim * 3, bias=True)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b, n, c = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(b, n, 3, h, c // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        rpb = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(n, n, -1)
        attn = attn + rpb.permute(2, 0, 1)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.view(-1, h, n, n)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TorchShiftWindowMSA(torch.nn.Module):
    """ShiftWindowMSA (swin.py:128-260) incl. the pad + cyclic shift +
    9-slice attention mask."""

    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.w_msa = TorchWindowMSA(dim, heads, ws)

    @staticmethod
    def _partition(x, ws):
        b, h, w, c = x.shape
        x = x.view(b, h // ws, ws, w // ws, ws, c)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)

    @staticmethod
    def _reverse(win, ws, h, w):
        b = win.shape[0] // ((h // ws) * (w // ws))
        x = win.view(b, h // ws, w // ws, ws, ws, -1)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)

    def forward(self, x, hw):
        b, l, c = x.shape
        h, w = hw
        x = x.view(b, h, w, c)
        pr = (self.ws - w % self.ws) % self.ws
        pb = (self.ws - h % self.ws) % self.ws
        x = F.pad(x, (0, 0, 0, pr, 0, pb))
        hp, wp = x.shape[1], x.shape[2]
        mask = None
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            img_mask = torch.zeros((1, hp, wp, 1))
            cnt = 0
            for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                       slice(-self.shift, None)):
                for wss in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[:, hs, wss, :] = cnt
                    cnt += 1
            mw = self._partition(img_mask, self.ws)[..., 0]
            mask = (mw[:, None, :] - mw[:, :, None])
            mask = mask.masked_fill(mask != 0, -100.0)
        win = self._partition(x, self.ws)
        win = self.w_msa(win, mask)
        x = self._reverse(win, self.ws, hp, wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        return x[:, :h, :w].reshape(b, h * w, c)


class TorchSwinBlock(torch.nn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = TorchShiftWindowMSA(dim, heads, ws, shift)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.fc1 = torch.nn.Linear(dim, 4 * dim)
        self.fc2 = torch.nn.Linear(4 * dim, dim)

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class TorchSwin(torch.nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(0)
        self.patch = torch.nn.Conv2d(3, EMBED, PATCH, stride=PATCH)
        self.patch_norm = torch.nn.LayerNorm(EMBED)
        self.stages = torch.nn.ModuleList()
        self.out_norms = torch.nn.ModuleList()
        dim = EMBED
        for s, depth in enumerate(DEPTHS):
            blocks = torch.nn.ModuleList(
                TorchSwinBlock(dim, HEADS_[s], WIN,
                               0 if i % 2 == 0 else WIN // 2)
                for i in range(depth))
            if s < len(DEPTHS) - 1:
                # PatchMerging: Unfold(2, stride 2) -> LN(4C) -> Linear
                merge_norm = torch.nn.LayerNorm(4 * dim)
                reduction = torch.nn.Linear(4 * dim, 2 * dim, bias=False)
            else:
                merge_norm = reduction = None
            self.stages.append(torch.nn.ModuleList(
                [blocks] + ([merge_norm, reduction] if reduction is not None
                            else [])))
            self.out_norms.append(torch.nn.LayerNorm(dim))
            if reduction is not None:
                dim *= 2

    def forward(self, x):
        x = self.patch(x)
        b, c, h, w = x.shape
        t = self.patch_norm(x.flatten(2).transpose(1, 2))
        outs = []
        hw = (h, w)
        for s, stage in enumerate(self.stages):
            blocks = stage[0]
            for blk in blocks:
                t = blk(t, hw)
            normed = self.out_norms[s](t)
            outs.append(normed.view(b, *hw, -1).permute(0, 3, 1, 2))
            if len(stage) > 1:
                merge_norm, reduction = stage[1], stage[2]
                hh, ww = hw
                cc = t.shape[-1]
                img = t.view(b, hh, ww, cc).permute(0, 3, 1, 2)
                # mmseg PatchMerging: nn.Unfold -> [B, 4C (C-major), L]
                u = F.unfold(img, kernel_size=2, stride=2)
                t = merge_norm(u.transpose(1, 2))
                t = reduction(t)
                hw = (hh // 2, ww // 2)
        return outs

    def state_dict_mmseg(self):
        sd = {
            'backbone.patch_embed.projection.weight': self.patch.weight,
            'backbone.patch_embed.projection.bias': self.patch.bias,
            'backbone.patch_embed.norm.weight': self.patch_norm.weight,
            'backbone.patch_embed.norm.bias': self.patch_norm.bias,
        }
        for s, stage in enumerate(self.stages):
            for i, blk in enumerate(stage[0]):
                pre = f'backbone.stages.{s}.blocks.{i}.'
                msa = blk.attn.w_msa
                sd[pre + 'norm1.weight'] = blk.norm1.weight
                sd[pre + 'norm1.bias'] = blk.norm1.bias
                sd[pre + 'attn.w_msa.relative_position_bias_table'] = \
                    msa.relative_position_bias_table
                sd[pre + 'attn.w_msa.relative_position_index'] = \
                    msa.relative_position_index
                sd[pre + 'attn.w_msa.qkv.weight'] = msa.qkv.weight
                sd[pre + 'attn.w_msa.qkv.bias'] = msa.qkv.bias
                sd[pre + 'attn.w_msa.proj.weight'] = msa.proj.weight
                sd[pre + 'attn.w_msa.proj.bias'] = msa.proj.bias
                sd[pre + 'norm2.weight'] = blk.norm2.weight
                sd[pre + 'norm2.bias'] = blk.norm2.bias
                sd[pre + 'ffn.layers.0.0.weight'] = blk.fc1.weight
                sd[pre + 'ffn.layers.0.0.bias'] = blk.fc1.bias
                sd[pre + 'ffn.layers.1.weight'] = blk.fc2.weight
                sd[pre + 'ffn.layers.1.bias'] = blk.fc2.bias
            if len(stage) > 1:
                sd[f'backbone.stages.{s}.downsample.norm.weight'] = \
                    stage[1].weight
                sd[f'backbone.stages.{s}.downsample.norm.bias'] = \
                    stage[1].bias
                sd[f'backbone.stages.{s}.downsample.reduction.weight'] = \
                    stage[2].weight
            sd[f'backbone.norm{s}.weight'] = self.out_norms[s].weight
            sd[f'backbone.norm{s}.bias'] = self.out_norms[s].bias
        return {k: v.detach().numpy() for k, v in sd.items()}


MODEL_CFG = dict(
    type='EncoderDecoder',
    backbone=dict(type='SwinTransformer', embed_dims=EMBED,
                  patch_size=PATCH, window_size=WIN, depths=DEPTHS,
                  num_heads=HEADS_, out_indices=(0, 1)),
    decode_head=dict(type='FCNHead', in_channels=EMBED * 2, channels=8,
                     num_classes=NCLS, in_index=1, num_convs=1))


@pytest.fixture(scope='module')
def pair():
    oracle = TorchSwin().eval()
    model = build_segmentor(MODEL_CFG)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, IMG, IMG, 3))
    converted = convert_mmseg_checkpoint(oracle.state_dict_mmseg())
    variables = merge_pretrained(variables, converted)
    return oracle, model, variables


def test_swin_backbone_ingestion_parity(pair):
    oracle, model, variables = pair
    rng = np.random.RandomState(5)
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == len(ref) == 2
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f'stage {s}')
