"""BEiT/MAE and ResNet checkpoint-ingestion parity vs torch references
(VERDICT r3 weak #6: the remaining no-ingestion backbones).

Torch oracles mirror the reference semantics:
- BEiT (mmseg/models/backbones/beit.py:32-231): q/v-only bias with a
  zero k bias concatenated at matmul time, shared relative-position bias
  table with +3 cls entries (index layout beit.py:84-115), layer-scale
  gamma_1/gamma_2, mmcv-FFN state_dict keys (ffn.layers.0.0 / layers.1).
- MAE (mmseg/models/backbones/mae.py:120-260): BEiT blocks with FULL qkv
  bias (bias=True), absolute pos_embed, final 'ln1' norm. The converter
  drops the k-bias third EXACTLY (softmax-invariant) — asserted here at
  f32 tolerance, which would fail if the dropped term mattered.
- ResNetV1c (mmseg/models/backbones/resnet.py:20-210 + utils/
  res_layer.py:55-95): deep stem, pytorch-style strides, conditional
  downsample (none in ResNet-18 layer1), BasicBlock conv2 dilation
  ALWAYS 1, contract_dilation halving the first dilated block.
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

# ---------------------------------------------------------------- BEiT
DIM = 16
HEADS = 2
LAYERS = 2
PATCH = 8
IMG = 32
GRID = IMG // PATCH
NCLS = 5


def _beit_rel_index(h, w):
    # beit.py:92-115
    coords = torch.stack(torch.meshgrid(
        [torch.arange(h), torch.arange(w)], indexing='ij')).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
    rel = rel.clone()
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    n = h * w
    num = (2 * h - 1) * (2 * w - 1) + 3
    idx = torch.zeros((n + 1, n + 1), dtype=torch.long)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num - 3
    idx[0:, 0] = num - 2
    idx[0, 0] = num - 1
    return idx, num


class TorchBEiTBlock(torch.nn.Module):
    def __init__(self, dim, heads, hw, full_bias):
        super().__init__()
        self.heads, self.full_bias = heads, full_bias
        self.ln1 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.ln2 = torch.nn.LayerNorm(dim, eps=1e-6)
        self.qkv = torch.nn.Linear(dim, 3 * dim, bias=full_bias)
        if not full_bias:
            self.q_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
            self.v_bias = torch.nn.Parameter(torch.randn(dim) * 0.1)
        idx, num = _beit_rel_index(*hw)
        self.register_buffer('rel_index', idx)
        self.rel_table = torch.nn.Parameter(torch.randn(num, heads) * 0.1)
        self.proj = torch.nn.Linear(dim, dim)
        self.gamma_1 = torch.nn.Parameter(torch.randn(dim) * 0.1 + 1)
        self.gamma_2 = torch.nn.Parameter(torch.randn(dim) * 0.1 + 1)
        self.fc1 = torch.nn.Linear(dim, 4 * dim)
        self.fc2 = torch.nn.Linear(4 * dim, dim)

    def attn(self, x):
        b, n, c = x.shape
        h = self.heads
        if self.full_bias:
            qkv = self.qkv(x)
        else:
            k_bias = torch.zeros_like(self.v_bias)
            bias = torch.cat((self.q_bias, k_bias, self.v_bias))
            qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(b, n, 3, h, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (c // h) ** -0.5
        attn = q @ k.transpose(-2, -1)
        rpb = self.rel_table[self.rel_index.view(-1)].view(n, n, -1)
        attn = attn + rpb.permute(2, 0, 1)[None]
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.ln1(x))
        return x + self.gamma_2 * (
            self.fc2(F.gelu(self.fc1(self.ln2(x)))))


class TorchBEiT(torch.nn.Module):
    def __init__(self, full_bias=False, abs_pos=False, final_norm=False):
        super().__init__()
        torch.manual_seed(0)
        self.abs_pos, self.final_norm = abs_pos, final_norm
        self.patch = torch.nn.Conv2d(3, DIM, PATCH, stride=PATCH)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, DIM) * 0.1)
        if abs_pos:
            self.pos_embed = torch.nn.Parameter(
                torch.randn(1, GRID * GRID + 1, DIM) * 0.1)
        self.layers = torch.nn.ModuleList(
            TorchBEiTBlock(DIM, HEADS, (GRID, GRID), full_bias)
            for _ in range(LAYERS))
        if final_norm:
            self.ln_f = torch.nn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):
        t = self.patch(x).flatten(2).transpose(1, 2)
        b = t.shape[0]
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], 1)
        if self.abs_pos:
            # mae.py forward: pos added to ALL tokens incl. cls
            t = t + self.pos_embed
        outs = []
        for i, blk in enumerate(self.layers):
            t = blk(t)
            if i == LAYERS - 1 and self.final_norm:
                t = self.ln_f(t)
            outs.append(t[:, 1:].reshape(b, GRID, GRID, DIM))
        return outs

    def state_dict_mmseg(self):
        sd = {
            'backbone.patch_embed.projection.weight': self.patch.weight,
            'backbone.patch_embed.projection.bias': self.patch.bias,
            'backbone.cls_token': self.cls_token,
        }
        if self.abs_pos:
            sd['backbone.pos_embed'] = self.pos_embed
        if self.final_norm:
            sd['backbone.ln1.weight'] = self.ln_f.weight
            sd['backbone.ln1.bias'] = self.ln_f.bias
        for i, blk in enumerate(self.layers):
            pre = f'backbone.layers.{i}.'
            sd[pre + 'ln1.weight'] = blk.ln1.weight
            sd[pre + 'ln1.bias'] = blk.ln1.bias
            sd[pre + 'ln2.weight'] = blk.ln2.weight
            sd[pre + 'ln2.bias'] = blk.ln2.bias
            sd[pre + 'attn.qkv.weight'] = blk.qkv.weight
            if blk.full_bias:
                sd[pre + 'attn.qkv.bias'] = blk.qkv.bias
            else:
                sd[pre + 'attn.q_bias'] = blk.q_bias
                sd[pre + 'attn.v_bias'] = blk.v_bias
            sd[pre + 'attn.relative_position_bias_table'] = blk.rel_table
            sd[pre + 'attn.relative_position_index'] = blk.rel_index
            sd[pre + 'attn.proj.weight'] = blk.proj.weight
            sd[pre + 'attn.proj.bias'] = blk.proj.bias
            sd[pre + 'gamma_1'] = blk.gamma_1
            sd[pre + 'gamma_2'] = blk.gamma_2
            sd[pre + 'ffn.layers.0.0.weight'] = blk.fc1.weight
            sd[pre + 'ffn.layers.0.0.bias'] = blk.fc1.bias
            sd[pre + 'ffn.layers.1.weight'] = blk.fc2.weight
            sd[pre + 'ffn.layers.1.bias'] = blk.fc2.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


def _ingest(model_cfg, oracle):
    model = build_segmentor(model_cfg)
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, IMG, IMG, 3))
    converted = convert_mmseg_checkpoint(oracle.state_dict_mmseg())
    return model, merge_pretrained(variables, converted)


def _head(in_ch, in_index=1):
    return dict(type='FCNHead', in_channels=in_ch, channels=8,
                num_classes=NCLS, in_index=in_index, num_convs=1)


def test_beit_ingestion_parity():
    oracle = TorchBEiT().eval()
    cfg = dict(type='EncoderDecoder',
               backbone=dict(type='BEiT', img_size=(IMG, IMG),
                             patch_size=PATCH, embed_dims=DIM,
                             num_layers=LAYERS, num_heads=HEADS,
                             out_indices=(0, 1)),
               decode_head=_head(DIM))
    model, variables = _ingest(cfg, oracle)
    rng = np.random.RandomState(3)
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f'layer out {i}')


def test_mae_ingestion_parity_k_bias_dropped_exactly():
    oracle = TorchBEiT(full_bias=True, abs_pos=True,
                       final_norm=True).eval()
    # make the k bias decidedly nonzero so an inexact drop would show
    with torch.no_grad():
        for blk in oracle.layers:
            blk.qkv.bias[DIM:2 * DIM] += 3.0
    cfg = dict(type='EncoderDecoder',
               backbone=dict(type='MAE', img_size=(IMG, IMG),
                             patch_size=PATCH, embed_dims=DIM,
                             num_layers=LAYERS, num_heads=HEADS,
                             out_indices=(0, 1)),
               decode_head=_head(DIM))
    model, variables = _ingest(cfg, oracle)
    rng = np.random.RandomState(4)
    img = rng.randn(2, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(np.asarray(g), r.numpy(),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f'layer out {i}')


# -------------------------------------------------------------- ResNet
class TorchConvBN(torch.nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=dilation * (k - 1) // 2,
                                    dilation=dilation, bias=False)
        self.bn = torch.nn.BatchNorm2d(cout)
        with torch.no_grad():   # non-trivial BN stats
            self.bn.running_mean.normal_(0, 0.5)
            self.bn.running_var.uniform_(0.5, 2.0)
            self.bn.weight.normal_(1, 0.2)
            self.bn.bias.normal_(0, 0.2)

    def forward(self, x, relu=True):
        x = self.bn(self.conv(x))
        return F.relu(x) if relu else x


class TorchBasicBlock(torch.nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride, dilation, down,
                 avg_down=False):
        super().__init__()
        # resnet.py:39-50: conv1 carries stride+dilation; conv2 is plain
        self.c1 = TorchConvBN(cin, planes, 3, stride, dilation)
        self.c2 = TorchConvBN(planes, planes, 3, 1, 1)
        # V1d avg_down shortcut (res_layer.py:47-64)
        self.pool = torch.nn.AvgPool2d(stride, stride, ceil_mode=True,
                                       count_include_pad=False) \
            if down and avg_down and stride > 1 else None
        self.down = TorchConvBN(cin, planes, 1,
                                1 if avg_down else stride) if down else None

    def forward(self, x):
        idn = x
        if self.down:
            idn = self.down(self.pool(x) if self.pool else x, relu=False)
        return F.relu(self.c2(self.c1(x), relu=False) + idn)


class TorchBottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride, dilation, down,
                 avg_down=False):
        super().__init__()
        # pytorch style: stride on conv2 (resnet.py:137-141)
        self.c1 = TorchConvBN(cin, planes, 1)
        self.c2 = TorchConvBN(planes, planes, 3, stride, dilation)
        self.c3 = TorchConvBN(planes, planes * 4, 1)
        self.pool = torch.nn.AvgPool2d(stride, stride, ceil_mode=True,
                                       count_include_pad=False) \
            if down and avg_down and stride > 1 else None
        self.down = TorchConvBN(cin, planes * 4, 1,
                                1 if avg_down else stride) if down \
            else None

    def forward(self, x):
        idn = x
        if self.down:
            idn = self.down(self.pool(x) if self.pool else x, relu=False)
        y = self.c3(self.c2(self.c1(x)), relu=False)
        return F.relu(y + idn)


ARCH_T = {18: (TorchBasicBlock, (2, 2, 2, 2)),
          50: (TorchBottleneck, (3, 4, 6, 3))}


class TorchResNetV1c(torch.nn.Module):
    def __init__(self, depth, base=8, strides=(1, 2, 1, 1),
                 dilations=(1, 1, 2, 4), contract=True, avg_down=False):
        super().__init__()
        self.avg_down = avg_down
        torch.manual_seed(depth)
        block, blocks_per = ARCH_T[depth]
        self.stem = torch.nn.ModuleList([
            TorchConvBN(3, base // 2, 3, 2),
            TorchConvBN(base // 2, base // 2, 3, 1),
            TorchConvBN(base // 2, base, 3, 1)])
        self.layers = torch.nn.ModuleList()
        cin, planes = base, base
        for s in range(4):
            stage = torch.nn.ModuleList()
            for j in range(blocks_per[s]):
                d = dilations[s]
                if j == 0 and d > 1 and contract:
                    d //= 2
                stride = strides[s] if j == 0 else 1
                down = j == 0 and (strides[s] != 1 or
                                   cin != planes * block.expansion)
                stage.append(block(cin, planes, stride, d, down,
                                   avg_down=avg_down))
                cin = planes * block.expansion
            self.layers.append(stage)
            planes *= 2
        self.depth = depth

    def forward(self, x):
        for s in self.stem:
            x = s(x)
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
            sd[bn_key + '.weight'] = mod.bn.weight
            sd[bn_key + '.bias'] = mod.bn.bias
            sd[bn_key + '.running_mean'] = mod.bn.running_mean
            sd[bn_key + '.running_var'] = mod.bn.running_var

        for n, m in enumerate(self.stem):
            put(m, f'backbone.stem.{n * 3}', f'backbone.stem.{n * 3 + 1}')
        for s, stage in enumerate(self.layers):
            for j, blk in enumerate(stage):
                pre = f'backbone.layer{s + 1}.{j}.'
                put(blk.c1, pre + 'conv1', pre + 'bn1')
                put(blk.c2, pre + 'conv2', pre + 'bn2')
                if hasattr(blk, 'c3'):
                    put(blk.c3, pre + 'conv3', pre + 'bn3')
                if blk.down is not None:
                    # V1d: downsample.0 is the AvgPool (no params)
                    off = 1 if self.avg_down else 0
                    put(blk.down, pre + f'downsample.{off}',
                        pre + f'downsample.{off + 1}')
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize('depth', [18, 50])
def test_resnet_v1c_ingestion_parity(depth):
    oracle = TorchResNetV1c(depth).eval()
    cfg = dict(type='EncoderDecoder',
               backbone=dict(type='ResNetV1c', depth=depth,
                             stem_channels=8, base_channels=8,
                             strides=(1, 2, 1, 1), dilations=(1, 1, 2, 4),
                             contract_dilation=True,
                             out_indices=(0, 1, 2, 3)),
               decode_head=_head(256 if depth == 50 else 64, in_index=3))
    model, variables = _ingest(cfg, oracle)
    rng = np.random.RandomState(depth)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == 4
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f'stage {s}')


def test_resnet_v1d_ingestion_parity():
    """ResNetV1d (ref resnet.py:711-725): deep stem + avg_down shortcuts.
    Input 66x66 makes layer2 pool a 17x17 map — the ceil_mode partial
    border window (count_include_pad=False) is live."""
    oracle = TorchResNetV1c(50, strides=(1, 2, 2, 2),
                            dilations=(1, 1, 1, 1), contract=False,
                            avg_down=True).eval()
    cfg = dict(type='EncoderDecoder',
               backbone=dict(type='ResNetV1d', depth=50,
                             stem_channels=8, base_channels=8,
                             strides=(1, 2, 2, 2), dilations=(1, 1, 1, 1),
                             out_indices=(0, 1, 2, 3)),
               decode_head=_head(256, in_index=3))
    model, variables = _ingest(cfg, oracle)
    rng = np.random.RandomState(7)
    img = rng.randn(2, 66, 66, 3).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert got[1].shape[1] == 9  # ceil(17/2) spatial
    for s, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f'stage {s}')
