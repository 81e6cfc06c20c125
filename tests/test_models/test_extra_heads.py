"""Shape/finiteness tests for the final head-roster entries
(extra_heads.py: FPN, CCNet, Segmenter, STDC) plus semantics checks for
criss-cross attention and the STDC boundary-target construction."""
import jax
import jax.numpy as jnp
import numpy as np

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models.decode_heads.extra_heads import (
    CrissCrossAttention, stdc_boundary_targets)
from s4former_tpu.registry import HEADS

B, H, W, C = 2, 16, 16, 32
NCLS = 5


def _pyramid():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    shapes = [(B, 32, 32, 16), (B, 16, 16, 32), (B, 8, 8, 32),
              (B, 4, 4, 64)]
    return [jax.random.normal(k, s) for k, s in zip(ks, shapes)]


def test_fpn_head():
    head = HEADS.build(dict(
        type='FPNHead', in_channels=(16, 32, 32, 64), channels=16,
        num_classes=NCLS, feature_strides=(4, 8, 16, 32),
        in_index=(0, 1, 2, 3)))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, 32, 32, NCLS)
    assert np.isfinite(np.asarray(out)).all()


def test_cc_head():
    head = HEADS.build(dict(type='CCHead', in_channels=C, channels=16,
                            num_classes=NCLS, in_index=1, recurrence=2))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out, _ = head.apply(v, feats, train=True, mutable=['batch_stats'],
                        rngs={'dropout': jax.random.PRNGKey(1)})
    assert out.shape == (B, 16, 16, NCLS)
    assert np.isfinite(np.asarray(out)).all()


def test_criss_cross_attention_identity_at_init_and_row_col_reach():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 7, 8))
    cca = CrissCrossAttention(8)
    v = cca.init(jax.random.PRNGKey(1), x)
    # gamma starts at 0 -> identity
    np.testing.assert_allclose(np.asarray(cca.apply(v, x)),
                               np.asarray(x), rtol=1e-6)
    # with gamma=1, output at (i,j) changes when we perturb the same
    # row/column but NOT when perturbing an unrelated pixel
    v1 = jax.tree_util.tree_map(lambda a: a, v)
    v1 = {'params': dict(v1['params'], gamma=jnp.ones(()))}
    base = np.asarray(cca.apply(v1, x))
    x_row = x.at[0, 2, 5].add(3.0)   # same row as (2, 3)
    x_far = x.at[0, 4, 5].add(3.0)   # different row AND column
    assert abs(np.asarray(cca.apply(v1, x_row))[0, 2, 3] -
               base[0, 2, 3]).max() > 1e-5
    np.testing.assert_allclose(
        np.asarray(cca.apply(v1, x_far))[0, 2, 3], base[0, 2, 3],
        rtol=1e-5, atol=1e-5)


def test_segmenter_mask_head():
    head = HEADS.build(dict(
        type='SegmenterMaskTransformerHead', in_channels=C,
        embed_dims=32, num_layers=2, num_heads=4, num_classes=NCLS,
        in_index=1))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, 16, 16, NCLS)
    assert out.dtype == jnp.float32
    out2 = head.apply(v, feats, train=True,
                      rngs={'dropout': jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out2)).all()


def test_stdc_head_and_boundary_targets():
    head = HEADS.build(dict(type='STDCHead', in_channels=C, channels=16,
                            num_classes=1, num_convs=1, in_index=1,
                            concat_input=False))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, 16, 16, 1)

    # boundary targets: a vertical class edge produces a 1-band at the
    # edge, zero far away, and values only in {0, 1}
    lab = np.zeros((1, 16, 16), np.int32)
    lab[:, :, 8:] = 3
    t = np.asarray(stdc_boundary_targets(jnp.asarray(lab)))
    assert t.shape == (1, 16, 16)
    assert set(np.unique(t)) <= {0.0, 1.0}
    assert t[0, 5, 7:9].max() == 1.0    # on the edge
    assert t[0, :, :4].max() == 0.0     # interior flat region
