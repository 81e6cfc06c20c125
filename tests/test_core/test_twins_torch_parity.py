"""Twins (PCPVT/SVT) checkpoint-ingestion parity vs a torch reference.

Torch oracle mirrors mmseg/models/backbones/twins.py:
- GSA = EfficientMultiheadAttention: stacked in_proj [3C,C] with q|k|v
  rows, sr-strided conv + LN for keys/values (:21-76, GSAEncoderLayer
  :78-146 with identity=0.);
- LSA (:148-244): ws-window partition with the reference's border mask
  (valid<->pad pairs get -1000, pad<->pad attend freely) — grids here are
  chosen NOT divisible by the window so the mask path is live;
- CPE (:315-350): stride-1 depthwise 3x3 + residual after block 0;
- SVT (:512-588): LSA at even block indices;
- mmcv-FFN state keys (ffn.layers.0.0 / ffn.layers.1), norm_list.{s}.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

import s4former_tpu.models  # noqa: F401
from s4former_tpu.core.checkpoint import (convert_mmseg_checkpoint,
                                          merge_pretrained)
from s4former_tpu.models import build_segmentor, init_segmentor_variables

DIMS = (8, 16)
HEADS = (2, 4)
MLPR = (2, 2)
DEPTHS = (2, 2)
SRR = (2, 1)
PATCH = (4, 2)
WS = 4          # stage grids 6 and 3 -> both pad (mask path live)
IMG = 24
NCLS = 5


class TorchGSA(torch.nn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads, self.sr_ratio = heads, sr
        self.in_proj_weight = torch.nn.Parameter(
            torch.randn(3 * dim, dim) * 0.1)
        self.in_proj_bias = torch.nn.Parameter(torch.randn(3 * dim) * 0.1)
        self.out_proj = torch.nn.Linear(dim, dim)
        if sr > 1:
            self.sr = torch.nn.Conv2d(dim, dim, sr, stride=sr)
            self.norm = torch.nn.LayerNorm(dim)

    def forward(self, x, hw):
        b, n, c = x.shape
        h_, w_ = hw
        hd = self.heads
        d = c // hd
        w, bias = self.in_proj_weight, self.in_proj_bias
        q = F.linear(x, w[:c], bias[:c])
        y = x
        if self.sr_ratio > 1:
            img = x.transpose(1, 2).reshape(b, c, h_, w_)
            y = self.sr(img).flatten(2).transpose(1, 2)
            y = self.norm(y)
        k = F.linear(y, w[c:2 * c], bias[c:2 * c])
        v = F.linear(y, w[2 * c:], bias[2 * c:])
        q = q.reshape(b, n, hd, d).transpose(1, 2) * d ** -0.5
        k = k.reshape(b, -1, hd, d).transpose(1, 2)
        v = v.reshape(b, -1, hd, d).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.out_proj(out)


class TorchLSA(torch.nn.Module):
    """Literal port of LocallyGroupedSelfAttention.forward (:190-244)."""

    def __init__(self, dim, heads, ws):
        super().__init__()
        self.heads, self.ws = heads, ws
        self.qkv = torch.nn.Linear(dim, 3 * dim, bias=True)
        self.proj = torch.nn.Linear(dim, dim)

    def forward(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        ws = self.ws
        x = x.view(b, h, w, c)
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = x.shape[1:3]
        gh, gw = hp // ws, wp // ws
        mask = torch.zeros((1, hp, wp))
        mask[:, -pad_b:, :].fill_(1)
        mask[:, :, -pad_r:].fill_(1)
        x = x.reshape(b, gh, ws, gw, ws, c).transpose(2, 3)
        mask = mask.reshape(1, gh, ws, gw, ws).transpose(2, 3).reshape(
            1, gh * gw, ws * ws)
        am = mask.unsqueeze(2) - mask.unsqueeze(3)
        am = am.masked_fill(am != 0, -1000.0).masked_fill(am == 0, 0.0)
        hd, d = self.heads, c // self.heads
        qkv = self.qkv(x).reshape(b, gh * gw, ws * ws, 3, hd, d).permute(
            3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * d ** -0.5
        attn = attn + am.unsqueeze(2)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(2, 3).reshape(b, gh, gw, ws, ws, c)
        x = out.transpose(2, 3).reshape(b, gh * ws, gw * ws, c)
        if pad_r > 0 or pad_b > 0:
            x = x[:, :h, :w, :].contiguous()
        return self.proj(x.reshape(b, n, c))


class TorchTwinsBlock(torch.nn.Module):
    def __init__(self, dim, heads, mlp_ratio, sr, ws):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = TorchLSA(dim, heads, ws) if ws > 0 else \
            TorchGSA(dim, heads, sr)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.fc1 = torch.nn.Linear(dim, mlp_ratio * dim)
        self.fc2 = torch.nn.Linear(mlp_ratio * dim, dim)

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class TorchTwins(torch.nn.Module):
    def __init__(self, windows):
        super().__init__()
        torch.manual_seed(1)
        self.windows = windows
        self.patch_embeds = torch.nn.ModuleList()
        self.embed_norms = torch.nn.ModuleList()
        self.pegs = torch.nn.ModuleList()
        self.stages = torch.nn.ModuleList()
        self.out_norms = torch.nn.ModuleList()
        cin = 3
        for s in range(2):
            c = DIMS[s]
            self.patch_embeds.append(
                torch.nn.Conv2d(cin, c, PATCH[s], stride=PATCH[s]))
            self.embed_norms.append(torch.nn.LayerNorm(c))
            self.pegs.append(
                torch.nn.Conv2d(c, c, 3, padding=1, groups=c))
            self.stages.append(torch.nn.ModuleList(
                TorchTwinsBlock(c, HEADS[s], MLPR[s], SRR[s],
                                windows[s] if j % 2 == 0 else 0)
                for j in range(DEPTHS[s])))
            self.out_norms.append(torch.nn.LayerNorm(c))
            cin = c

    def forward(self, x):
        outs = []
        b = x.shape[0]
        for s, stage in enumerate(self.stages):
            x = self.patch_embeds[s](x)
            h, w = x.shape[2:]
            c = x.shape[1]
            t = self.embed_norms[s](x.flatten(2).transpose(1, 2))
            for j, blk in enumerate(stage):
                t = blk(t, (h, w))
                if j == 0:
                    img = t.transpose(1, 2).reshape(b, c, h, w)
                    t = (self.pegs[s](img) + img).flatten(2).transpose(1, 2)
            t = self.out_norms[s](t)
            x = t.transpose(1, 2).reshape(b, c, h, w)
            outs.append(x)
        return outs

    def state_dict_mmseg(self):
        sd = {}
        for s in range(2):
            sd[f'backbone.patch_embeds.{s}.projection.weight'] = \
                self.patch_embeds[s].weight
            sd[f'backbone.patch_embeds.{s}.projection.bias'] = \
                self.patch_embeds[s].bias
            sd[f'backbone.patch_embeds.{s}.norm.weight'] = \
                self.embed_norms[s].weight
            sd[f'backbone.patch_embeds.{s}.norm.bias'] = \
                self.embed_norms[s].bias
            sd[f'backbone.position_encodings.{s}.proj.weight'] = \
                self.pegs[s].weight
            sd[f'backbone.position_encodings.{s}.proj.bias'] = \
                self.pegs[s].bias
            for j, blk in enumerate(self.stages[s]):
                pre = f'backbone.layers.{s}.{j}.'
                sd[pre + 'norm1.weight'] = blk.norm1.weight
                sd[pre + 'norm1.bias'] = blk.norm1.bias
                sd[pre + 'norm2.weight'] = blk.norm2.weight
                sd[pre + 'norm2.bias'] = blk.norm2.bias
                a = blk.attn
                if isinstance(a, TorchLSA):
                    sd[pre + 'attn.qkv.weight'] = a.qkv.weight
                    sd[pre + 'attn.qkv.bias'] = a.qkv.bias
                    sd[pre + 'attn.proj.weight'] = a.proj.weight
                    sd[pre + 'attn.proj.bias'] = a.proj.bias
                else:
                    sd[pre + 'attn.attn.in_proj_weight'] = a.in_proj_weight
                    sd[pre + 'attn.attn.in_proj_bias'] = a.in_proj_bias
                    sd[pre + 'attn.attn.out_proj.weight'] = \
                        a.out_proj.weight
                    sd[pre + 'attn.attn.out_proj.bias'] = a.out_proj.bias
                    if a.sr_ratio > 1:
                        sd[pre + 'attn.sr.weight'] = a.sr.weight
                        sd[pre + 'attn.sr.bias'] = a.sr.bias
                        sd[pre + 'attn.norm.weight'] = a.norm.weight
                        sd[pre + 'attn.norm.bias'] = a.norm.bias
                sd[pre + 'ffn.layers.0.0.weight'] = blk.fc1.weight
                sd[pre + 'ffn.layers.0.0.bias'] = blk.fc1.bias
                sd[pre + 'ffn.layers.1.weight'] = blk.fc2.weight
                sd[pre + 'ffn.layers.1.bias'] = blk.fc2.bias
            sd[f'backbone.norm_list.{s}.weight'] = self.out_norms[s].weight
            sd[f'backbone.norm_list.{s}.bias'] = self.out_norms[s].bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def _run(model_type, windows):
    oracle = TorchTwins(windows).eval()
    cfg = dict(
        type='EncoderDecoder',
        backbone=dict(type=model_type, embed_dims=DIMS, num_heads=HEADS,
                      mlp_ratios=MLPR, depths=DEPTHS, sr_ratios=SRR,
                      patch_sizes=PATCH, out_indices=(0, 1),
                      windows=windows, norm_after_stage=True),
        decode_head=dict(type='FCNHead', in_channels=DIMS[1], channels=8,
                         num_classes=NCLS, in_index=1, num_convs=1))
    model = build_segmentor(cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, IMG, IMG, 3))
    converted = convert_mmseg_checkpoint(oracle.state_dict_mmseg())
    variables = merge_pretrained(variables, converted)
    rng = np.random.RandomState(7)
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f'stage {s}')


def test_pcpvt_ingestion_parity():
    _run('PCPVT', (0, 0))


def test_svt_ingestion_parity_with_border_mask():
    _run('SVT', (WS, WS))
