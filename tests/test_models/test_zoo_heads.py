"""Shape/finiteness tests for the context-head zoo (zoo_heads.py) —
the reference's test strategy for heads (SURVEY.md §4: shape assertions
on random tensors), one per registered head."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.registry import HEADS

B, H, W, C = 2, 16, 16, 32
NCLS = 5


def _feats(channels=C, n=3):
    ks = jax.random.split(jax.random.PRNGKey(0), n)
    shapes = [(B, H * 2, W * 2, channels // 2),
              (B, H, W, channels),
              (B, H, W, channels)][:n]
    return [jax.random.normal(k, s) for k, s in zip(ks, shapes)]


SINGLE_INPUT_HEADS = [
    ('ASPPHead', dict(dilations=(1, 2, 4))),
    ('DepthwiseSeparableFCNHead', dict(num_convs=1)),
    ('NLHead', {}),
    ('GCHead', {}),
    ('DNLHead', {}),
    ('APCHead', dict(pool_scales=(1, 2))),
    ('DMHead', dict(filter_sizes=(1, 3))),
    ('EMAHead', dict(ema_channels=16, num_bases=8, num_stages=2)),
    ('ISAHead', dict(isa_channels=16, down_factor=(4, 4))),
    ('PSAHead', {}),
    ('DAHead', dict(pam_channels=8)),
]


@pytest.mark.parametrize('name,extra', SINGLE_INPUT_HEADS,
                         ids=[n for n, _ in SINGLE_INPUT_HEADS])
def test_single_input_head_shapes(name, extra):
    head = HEADS.build(dict(type=name, in_channels=C, channels=16,
                            num_classes=NCLS, in_index=1, **extra))
    feats = _feats()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, H, W, NCLS)
    assert np.isfinite(np.asarray(out)).all()
    # train mode with batch_stats updates
    out2, upd = head.apply(v, feats, train=True, mutable=['batch_stats'],
                           rngs={'dropout': jax.random.PRNGKey(1)})
    assert out2.shape == (B, H, W, NCLS)


def test_sep_aspp_head_c1_fusion():
    head = HEADS.build(dict(
        type='DepthwiseSeparableASPPHead', in_channels=C, channels=16,
        num_classes=NCLS, in_index=1, dilations=(1, 2, 4),
        c1_in_channels=C // 2, c1_channels=8, c1_index=0))
    feats = _feats()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    # fused at the c1 (2x) resolution
    assert out.shape == (B, H * 2, W * 2, NCLS)


def test_ann_head_pyramid_kv():
    head = HEADS.build(dict(type='ANNHead', in_channels=(C, C), channels=16,
                            num_classes=NCLS, in_index=(1, 2),
                            key_pool_scales=(1, 2)))
    feats = _feats()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, H, W, NCLS)


def test_lraspp_head_multilevel():
    head = HEADS.build(dict(type='LRASPPHead',
                            in_channels=(C // 2, C), channels=16,
                            num_classes=NCLS, in_index=(0, 1),
                            branch_channels=(8,)))
    feats = _feats(n=2)
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, H * 2, W * 2, NCLS)


def test_enc_head_encoding():
    head = HEADS.build(dict(type='EncHead', in_channels=(C, C), channels=16,
                            num_classes=NCLS, in_index=(1, 2),
                            num_codes=4, add_lateral=True,
                            use_se_loss=True))
    feats = _feats()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out, inter = head.apply(v, feats, train=False,
                            mutable=['intermediates'])
    assert out.shape == (B, H, W, NCLS)
    se = inter['intermediates']['se_logits'][0]
    assert se.shape == (B, NCLS)


def test_encoding_matches_torch_reference():
    """ops.Encoding vs the reference torch implementation."""
    import torch
    from s4former_tpu.ops.encoding import Encoding

    class TorchEncoding(torch.nn.Module):
        def __init__(self, channels, num_codes, codewords, scale):
            super().__init__()
            self.codewords = torch.nn.Parameter(torch.from_numpy(codewords))
            self.scale = torch.nn.Parameter(torch.from_numpy(scale))

        def forward(self, x):
            b = x.size(0)
            x = x.view(b, x.size(1), -1).transpose(1, 2).contiguous()
            nk, c = self.codewords.shape
            ex = x.unsqueeze(2).expand(b, x.size(1), nk, c)
            cw = self.codewords.view(1, 1, nk, c)
            sl = self.scale.view(1, 1, nk) * (ex - cw).pow(2).sum(3)
            a = torch.softmax(sl, dim=2)
            enc = (a.unsqueeze(3) * (ex - cw)).sum(dim=1)
            return enc

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 8).astype(np.float32)
    mod = Encoding(num_codes=4)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = mod.apply(v, jnp.asarray(x))
    # params now hold the EFFECTIVE torch-layout values directly (the
    # old init-offset indirection broke checkpoint ingestion)
    cw = np.asarray(v['params']['codewords'])
    sc = np.asarray(v['params']['scale'])
    tref = TorchEncoding(8, 4, cw, sc)
    with torch.no_grad():
        ref = tref(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=1e-4, atol=1e-5)
