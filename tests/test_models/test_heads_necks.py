"""Decode-head and neck shape tests (mirrors reference
tests/test_models/test_heads/*)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.registry import HEADS, NECKS


def _feats(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return [jnp.asarray(rng.randn(*s), jnp.float32) for s in shapes]


def _run_head(cfg, feats, **kwargs):
    head = HEADS.build(cfg)
    variables = head.init({'params': jax.random.PRNGKey(0)}, feats,
                          train=False)
    return head.apply(variables, feats, train=False, **kwargs)


def test_setr_up_head():
    out = _run_head(dict(type='SETRUPHead', in_channels=32, channels=16,
                         num_classes=7, in_index=0, num_convs=2,
                         up_scale=2), _feats([(2, 4, 4, 32)]))
    assert out.shape == (2, 16, 16, 7)


def test_segformer_head():
    shapes = [(2, 16, 16, 8), (2, 8, 8, 16), (2, 4, 4, 40), (2, 2, 2, 64)]
    out = _run_head(dict(type='SegformerHead', in_channels=[8, 16, 40, 64],
                         channels=32, num_classes=19,
                         in_index=[0, 1, 2, 3]), _feats(shapes))
    assert out.shape == (2, 16, 16, 19)


def test_fcn_head():
    out = _run_head(dict(type='FCNHead', in_channels=32, channels=16,
                         num_classes=5, in_index=0, num_convs=2),
                    _feats([(2, 8, 8, 32)]))
    assert out.shape == (2, 8, 8, 5)


def test_psp_head():
    out = _run_head(dict(type='PSPHead', in_channels=32, channels=16,
                         num_classes=5, in_index=0,
                         pool_scales=(1, 2)), _feats([(2, 8, 8, 32)]))
    assert out.shape == (2, 8, 8, 5)


def test_uper_head():
    shapes = [(2, 16, 16, 8), (2, 8, 8, 16), (2, 4, 4, 32)]
    out = _run_head(dict(type='UPerHead', in_channels=[8, 16, 32],
                         channels=16, num_classes=5, in_index=[0, 1, 2],
                         pool_scales=(1, 2)), _feats(shapes))
    assert out.shape == (2, 16, 16, 5)


def test_setr_mla_head():
    shapes = [(2, 4, 4, 16)] * 4
    out = _run_head(dict(type='SETRMLAHead', in_channels=[16] * 4,
                         channels=32, mla_channels=8, num_classes=5,
                         up_scale=4, in_index=[0, 1, 2, 3]), _feats(shapes))
    assert out.shape == (2, 16, 16, 5)


def test_setr_up_head_unshuffles():
    """Head-level feature un-shuffle: identity perm == no perm."""
    feats = _feats([(2, 4, 4, 32)])
    head = HEADS.build(dict(type='SETRUPHead', in_channels=32, channels=16,
                            num_classes=7, in_index=0, num_convs=1,
                            up_scale=2))
    variables = head.init({'params': jax.random.PRNGKey(0)}, feats,
                          train=False)
    base = head.apply(variables, feats, train=False)
    identity = jnp.tile(jnp.arange(4), (2, 1))
    same = head.apply(variables, feats, train=False,
                      patchmix_perm=identity, patchmix_n=2)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('neck_cfg,shapes,expect_hw', [
    (dict(type='MLANeck', in_channels=[16] * 4, out_channels=8),
     [(2, 4, 4, 16)] * 4, (4, 4)),
    (dict(type='MultiLevelNeck', in_channels=[16] * 4, out_channels=8,
          scales=[0.5, 1, 2, 4]), [(2, 4, 4, 16)] * 4, (2, 2)),
    (dict(type='Feature2Pyramid', embed_dim=16, rescales=[4, 2, 1, 0.5]),
     [(2, 4, 4, 16)] * 4, (16, 16)),
    (dict(type='FPN', in_channels=[8, 16, 32, 64], out_channels=8),
     [(2, 16, 16, 8), (2, 8, 8, 16), (2, 4, 4, 32), (2, 2, 2, 64)],
     (16, 16)),
])
def test_necks(neck_cfg, shapes, expect_hw):
    neck = NECKS.build(neck_cfg)
    feats = _feats(shapes)
    variables = neck.init({'params': jax.random.PRNGKey(0)}, feats,
                          train=False)
    outs = neck.apply(variables, feats, train=False)
    assert len(outs) == len(shapes)
    assert outs[0].shape[1:3] == expect_hw


def test_icneck_and_jpu():
    ic = NECKS.build(dict(type='ICNeck', in_channels=[8, 16, 16],
                          out_channels=8))
    feats = _feats([(1, 16, 16, 8), (1, 8, 8, 16), (1, 4, 4, 16)])
    v = ic.init({'params': jax.random.PRNGKey(0)}, feats, train=False)
    outs = ic.apply(v, feats, train=False)
    # reference output order (ic_neck.py:150): (x_24, x_12, x_cff_12) —
    # x_24 at sub2 resolution, x_12/x_cff_12 at sub1 resolution
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 8)
    assert outs[1].shape == (1, 16, 16, 8)
    assert outs[2].shape == (1, 16, 16, 8)

    jpu = NECKS.build(dict(type='JPU', in_channels=[8, 16, 32],
                           mid_channels=8, dilations=(1, 2)))
    feats = _feats([(1, 8, 8, 8), (1, 4, 4, 16), (1, 2, 2, 32)])
    v = jpu.init({'params': jax.random.PRNGKey(0)}, feats, train=False)
    outs = jpu.apply(v, feats, train=False)
    assert len(outs) == 3 and outs[-1].shape == (1, 8, 8, 16)


def test_ocr_head_cascade():
    """OCRHead consumes [features..., prev_logits] (cascade contract)."""
    feats = _feats([(2, 8, 8, 32)])
    prev_logits = _feats([(2, 8, 8, 5)])[0]
    head = HEADS.build(dict(type='OCRHead', in_channels=32, channels=16,
                            ocr_channels=8, num_classes=5, in_index=0))
    inputs = feats + [prev_logits]
    v = head.init({'params': jax.random.PRNGKey(0)}, inputs, train=False)
    out = head.apply(v, inputs, train=False)
    assert out.shape == (2, 8, 8, 5)


def test_cascade_encoder_decoder_with_ocr():
    import s4former_tpu.models  # noqa
    from s4former_tpu.registry import SEGMENTORS
    model = SEGMENTORS.build(dict(
        type='CascadeEncoderDecoder',
        num_stages=2,
        backbone=dict(type='VisionTransformer', img_size=(64, 64),
                      patch_size=16, embed_dims=32, num_layers=2,
                      num_heads=4, out_indices=(1,), use_flash=False),
        decode_head=[
            dict(type='FCNHead', in_channels=32, channels=16,
                 num_classes=5, in_index=0, num_convs=1,
                 concat_input=False),
            dict(type='OCRHead', in_channels=32, channels=16,
                 ocr_channels=8, num_classes=5, in_index=0),
        ]))
    img = jnp.zeros((1, 64, 64, 3))
    v = model.init({'params': jax.random.PRNGKey(0)}, img, train=False)
    out = model.apply(v, img, train=False)
    assert out.shape == (1, 64, 64, 5)


def test_setr_up_deferred_classifier_commutes():
    """conv_seg (1x1) commutes exactly with the final bilinear upsample;
    the fast path (classify at low res, upsample num_classes channels)
    must match the reference ordering (kept under return_last_feat)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from s4former_tpu.models.decode_heads.setr_up import SETRUPHead
    head = SETRUPHead(in_channels=32, channels=16, num_classes=7,
                      num_convs=2, up_scale=2, kernel_size=3, in_index=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    v = head.init(jax.random.PRNGKey(0), x)
    fast = head.apply(v, x)
    slow, feat = head.apply(v, x, return_last_feat=True)  # original order
    assert fast.shape == slow.shape == (2, 32, 32, 7)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                               rtol=2e-5, atol=2e-5)
