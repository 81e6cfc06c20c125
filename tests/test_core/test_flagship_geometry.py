"""Flagship-geometry numeric checks (VERDICT r2 weak #2 / next #8).

The round-2 parity harness ran a 2-layer/8x8-grid model; layout- or
scale-dependent bugs (pos-embed grid, remat policy, accumulation order,
flash-vs-XLA drift at L=1025) sat outside it. These slow CPU tests run the
REAL flagship geometry: DeiT-Base 12 layers / 768 dims / 12 heads /
patch 16 on a 512x512 crop (L = 32*32 + 1 = 1025 tokens,
reference configs/setr/..._MT_w_ours.py:145-160), f32, vs an independent
torch mirror of the reference forward (vit.py:479-569).
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
from s4former_tpu.ops.attention import dot_product_attention
from s4former_tpu.ops.flash_attention import flash_attention

C, HEADS, LAYERS, P = 768, 12, 12, 16
IMG = 512
GRID = IMG // P  # 32 -> L = 1025


class _Block(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = torch.nn.LayerNorm(C, eps=1e-6)
        self.attn = torch.nn.MultiheadAttention(C, HEADS, batch_first=True)
        self.ln2 = torch.nn.LayerNorm(C, eps=1e-6)
        self.fc1 = torch.nn.Linear(C, 4 * C)
        self.fc2 = torch.nn.Linear(4 * C, C)

    def forward(self, x):
        y = self.ln1(x)
        y, _ = self.attn(y, y, y, need_weights=False)
        x = x + y
        z = self.ln2(x)
        return x + self.fc2(F.gelu(self.fc1(z)))


class _TorchDeiT(torch.nn.Module):
    def __init__(self, out_indices):
        super().__init__()
        self.out_indices = out_indices
        self.patch = torch.nn.Conv2d(3, C, P, stride=P)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, C) * 0.02)
        self.pos_embed = torch.nn.Parameter(
            torch.randn(1, GRID * GRID + 1, C) * 0.02)
        self.blocks = torch.nn.ModuleList(_Block() for _ in range(LAYERS))

    def forward(self, x):
        b = x.shape[0]
        t = self.patch(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self.pos_embed
        outs = []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if i in self.out_indices:
                outs.append(t[:, 1:].transpose(1, 2).reshape(
                    b, C, GRID, GRID))
        return outs

    def state_dict_mmseg(self):
        sd = {'backbone.cls_token': self.cls_token,
              'backbone.pos_embed': self.pos_embed,
              'backbone.patch_embed.projection.weight': self.patch.weight,
              'backbone.patch_embed.projection.bias': self.patch.bias}
        for i, blk in enumerate(self.blocks):
            pre = f'backbone.layers.{i}.'
            sd[pre + 'ln1.weight'] = blk.ln1.weight
            sd[pre + 'ln1.bias'] = blk.ln1.bias
            sd[pre + 'ln2.weight'] = blk.ln2.weight
            sd[pre + 'ln2.bias'] = blk.ln2.bias
            sd[pre + 'attn.attn.in_proj_weight'] = blk.attn.in_proj_weight
            sd[pre + 'attn.attn.in_proj_bias'] = blk.attn.in_proj_bias
            sd[pre + 'attn.attn.out_proj.weight'] = \
                blk.attn.out_proj.weight
            sd[pre + 'attn.attn.out_proj.bias'] = blk.attn.out_proj.bias
            sd[pre + 'ffn.layers.0.0.weight'] = blk.fc1.weight
            sd[pre + 'ffn.layers.0.0.bias'] = blk.fc1.bias
            sd[pre + 'ffn.layers.1.weight'] = blk.fc2.weight
            sd[pre + 'ffn.layers.1.bias'] = blk.fc2.bias
        return {k: v.detach().numpy() for k, v in sd.items()}


@pytest.mark.slow
def test_flagship_vit_feature_parity_at_L1025():
    """12-layer/768-dim/1025-token features within f32 tolerance of torch
    (flash off: the XLA path is what CPU eval and the dryrun compile)."""
    torch.manual_seed(0)
    out_indices = (4, 7, 9, 11)
    tvit = _TorchDeiT(out_indices).eval()
    sd = tvit.state_dict_mmseg()

    model = build_segmentor(dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(IMG, IMG),
                      patch_size=P, embed_dims=C, num_layers=LAYERS,
                      num_heads=HEADS, out_indices=out_indices,
                      use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=C, channels=16,
                         num_classes=5, in_index=3, num_convs=2,
                         up_scale=2, align_corners=False)))
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (1, IMG, IMG, 3))
    conv = convert_mmseg_checkpoint(sd, num_layers=LAYERS,
                                    dst_grid=(GRID, GRID))
    variables = merge_pretrained(variables, conv)

    rng = np.random.RandomState(7)
    img = rng.randn(1, IMG, IMG, 3).astype(np.float32)
    with torch.no_grad():
        want = tvit(torch.from_numpy(img).permute(0, 3, 1, 2))
    got = model.apply(variables, method='extract_feat',
                      img=jnp.asarray(img), train=False)
    assert len(got) == len(want) == 4
    for i, (g, r) in enumerate(zip(got, want)):
        r = r.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(g), r, rtol=1e-4, atol=1e-4,
                                   err_msg=f'out_index {i}')


@pytest.mark.slow
def test_flash_kernel_at_flagship_length():
    """The Pallas flash kernel (interpret mode on CPU — the same kernel
    code that compiles on TPU) vs XLA attention at the REAL geometry:
    L=1025 (odd, exercises key masking), H=12, D=64, with a PASA bias."""
    L = GRID * GRID + 1
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (1, L, HEADS, 64), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (1, L, HEADS, 64), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (1, L, HEADS, 64), jnp.float32) * 0.5
    bias = jax.random.normal(ks[3], (1, 1, L, L), jnp.float32) * 2.0
    ref, _ = dot_product_attention(q, k, v, bias)
    out = flash_attention(q, k, v, bias)
    # the kernel keeps the bias tile in bf16 (BENCH_NOTES round 2); that
    # quantization bounds the achievable match
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    ref2, _ = dot_product_attention(q, k, v, None)
    out2 = flash_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=2e-3, atol=2e-3)
