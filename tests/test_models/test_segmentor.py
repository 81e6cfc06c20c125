"""Segmentor forward smoke tests on tiny shapes (CPU).

Mirrors the reference's strategy of building segmentors from configs and
running synthetic batches (tests/test_models/test_segmentors/utils.py:82-120)
— but against the real ViT/SETR components at toy size.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401  (registers components)
from s4former_tpu.models import build_segmentor
from s4former_tpu.models.init_utils import init_segmentor_variables

TINY_MODEL = dict(
    type='EncoderDecoder',
    backbone=dict(
        type='VisionTransformer',
        img_size=(64, 64), patch_size=16, embed_dims=32, num_layers=2,
        num_heads=4, out_indices=(0, 1), use_flash=False),
    decode_head=dict(
        type='SETRUPHead', in_channels=32, channels=16, num_classes=5,
        in_index=1, num_convs=2, up_scale=2, kernel_size=3,
        align_corners=False),
    auxiliary_head=[
        dict(type='SETRUPHead', in_channels=32, channels=16, num_classes=5,
             in_index=0, num_convs=1, up_scale=4, kernel_size=3),
    ],
)


@pytest.fixture(scope='module')
def model_and_vars():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    return model, variables


def test_encode_decode_shape(model_and_vars):
    model, variables = model_and_vars
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                      jnp.float32)
    logits = model.apply(variables, img, train=False)
    assert logits.shape == (2, 64, 64, 5)
    assert jnp.all(jnp.isfinite(logits))


def test_train_heads_and_batchstats(model_and_vars):
    model, variables = model_and_vars
    img = jnp.ones((2, 64, 64, 3), jnp.float32)
    (main, aux), updates = model.apply(
        variables, mutable=['batch_stats'],
        method='forward_train_heads_from_img', img=img, train=True)
    # head outputs stay at head resolution; the loss resizes to the label
    # (reference decode_head.py:318-355). 64/16 grid -> x2 x2 convs = 16.
    assert main.shape == (2, 16, 16, 5)
    assert len(aux) == 1 and aux[0].shape == (2, 16, 16, 5)
    assert 'batch_stats' in updates


def test_attn_bias_changes_output(model_and_vars):
    model, variables = model_and_vars
    img = jnp.asarray(np.random.RandomState(1).randn(1, 64, 64, 3),
                      jnp.float32)
    l = (64 // 16) ** 2 + 1

    def logits_with_bias(bias):
        feats = model.apply(variables, method='extract_feat', img=img,
                            attn_bias=bias)
        return model.apply(variables, method='decode_logits', feats=feats)

    base = logits_with_bias(None)
    # a constant bias per row is softmax-invariant -> identical output
    const = jnp.full((1, 1, l, l), 3.0)
    np.testing.assert_allclose(np.asarray(logits_with_bias(const)),
                               np.asarray(base), atol=2e-4)
    # a key-varying bias must change the output
    varying = jnp.zeros((1, 1, l, l)).at[:, :, :, 1:5].set(7.0)
    assert not np.allclose(np.asarray(logits_with_bias(varying)),
                           np.asarray(base), atol=1e-3)


def test_pos_embed_runtime_resize(model_and_vars):
    model, variables = model_and_vars
    img = jnp.ones((1, 96, 96, 3), jnp.float32)  # different grid than init
    logits = model.apply(variables, img, train=False)
    assert logits.shape == (1, 96, 96, 5)


def test_fused_aux_heads_match_unfused():
    """fuse_aux_heads=True (vmapped stack) must equal 4 separate heads
    given identical parameters."""
    import numpy as np
    from s4former_tpu.models import build_segmentor, init_segmentor_variables

    aux = [dict(type='SETRUPHead', in_channels=32, channels=16,
                num_classes=5, in_index=i, num_convs=1, up_scale=4,
                kernel_size=3) for i in range(2)]
    base = dict(
        type='EncoderDecoder',
        backbone=dict(type='VisionTransformer', img_size=(64, 64),
                      patch_size=16, embed_dims=32, num_layers=2,
                      num_heads=4, out_indices=(0, 1), use_flash=False),
        decode_head=dict(type='SETRUPHead', in_channels=32, channels=16,
                         num_classes=5, in_index=1, num_convs=1,
                         up_scale=4),
        auxiliary_head=aux)
    fused = build_segmentor(base)
    unfused = build_segmentor({**base, 'fuse_aux_heads': False})
    img = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                      jnp.float32)
    vf = init_segmentor_variables(fused, jax.random.PRNGKey(0),
                                  (2, 64, 64, 3))
    vu = init_segmentor_variables(unfused, jax.random.PRNGKey(0),
                                  (2, 64, 64, 3))
    # copy fused (stacked) params into the unfused per-head slots
    stacked = vf['params']['aux_heads']['head']
    vu_p = jax.tree_util.tree_map(lambda x: x, vu['params'])
    for i in range(2):
        vu_p[f'aux_heads_{i}'] = jax.tree_util.tree_map(
            lambda x, _i=i: x[_i], stacked)
    for k in ('backbone_m', 'decode_head_m'):
        vu_p[k] = vf['params'][k]
    vu = {'params': vu_p, 'batch_stats': vu['batch_stats']}
    vu['batch_stats'] = {
        'decode_head_m': vf['batch_stats']['decode_head_m'],
        'aux_heads_0': jax.tree_util.tree_map(
            lambda x: x[0], vf['batch_stats']['aux_heads']['head']),
        'aux_heads_1': jax.tree_util.tree_map(
            lambda x: x[1], vf['batch_stats']['aux_heads']['head']),
    }
    (m1, a1) = fused.apply(vf, method='forward_train_heads_from_img',
                           img=img, train=False)
    (m2, a2) = unfused.apply(vu, method='forward_train_heads_from_img',
                             img=img, train=False)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5,
                               atol=1e-5)
    for x, y in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)
