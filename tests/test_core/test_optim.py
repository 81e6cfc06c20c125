"""Optimizer/schedule parity tests.

poly LR pins the mmcv 1.x PolyLrUpdaterHook formula; layer decay pins the
reference LearningRateDecayOptimizerConstructor ratios
(layer_decay_optimizer_constructor.py:103-189, get_layer_id_for_vit:79)
mapped onto the stacked-scan param layout.
"""
import jax
import jax.numpy as jnp
import numpy as np

from s4former_tpu.core.optim import (build_layer_decay_trees, poly_lr,
                                     sgd_init, sgd_update)


def test_poly_lr_mmcv_formula():
    base, mn, power, mx = 1e-3, 1e-4, 0.9, 100
    for it in (0, 25, 50, 99, 100, 200):
        got = float(poly_lr(jnp.asarray(it), base, mx, power, mn))
        prog = min(it / mx, 1.0)
        want = (base - mn) * (1 - prog) ** power + mn
        np.testing.assert_allclose(got, want, rtol=1e-6)
    # at iter 0 the LR is base (f32); at the end exactly min_lr
    np.testing.assert_allclose(
        float(poly_lr(jnp.asarray(0), base, mx, power, mn)), base,
        rtol=1e-6)
    np.testing.assert_allclose(
        float(poly_lr(jnp.asarray(mx), base, mx, power, mn)), mn)


def _fake_params(num_layers=4, c=8):
    return {
        'backbone_m': {
            'cls_token': jnp.zeros((1, 1, c)),
            'pos_embed': jnp.zeros((1, 5, c)),
            'patch_embed': {'kernel': jnp.zeros((2, 2, 3, c)),
                            'bias': jnp.zeros((c,))},
            'layers': {'block': {
                'attn': {'qkv': {'kernel': jnp.zeros((num_layers, c, 3 * c)),
                                 'bias': jnp.zeros((num_layers, 3 * c))}},
                'ln1': {'scale': jnp.ones((num_layers, c)),
                        'bias': jnp.zeros((num_layers, c))},
            }},
        },
        'decode_head_m': {'conv_seg': {'kernel': jnp.zeros((1, 1, c, 5)),
                                       'bias': jnp.zeros((5,))}},
    }


def test_layer_decay_ratios_match_reference():
    """Reference formula: layer_id(embeddings)=0, layer_id(block i)=i+1,
    layer_id(else)=num_layers+1; scale = dr**(num_layers+2-layer_id-1)."""
    nl, dr = 4, 0.9
    params = _fake_params(nl)
    lr, wd = build_layer_decay_trees(params, nl, dr)
    # embeddings: dr**(nl+1)
    np.testing.assert_allclose(lr['backbone_m']['cls_token'],
                               dr ** (nl + 1))
    np.testing.assert_allclose(
        lr['backbone_m']['patch_embed']['kernel'], dr ** (nl + 1))
    # stacked blocks: per-layer vector dr**(nl - i), broadcastable shape
    blk = lr['backbone_m']['layers']['block']['attn']['qkv']['kernel']
    assert blk.shape == (nl, 1, 1)
    np.testing.assert_allclose(
        np.asarray(blk).ravel(), [dr ** (nl - i) for i in range(nl)],
        rtol=1e-6)
    # consecutive layers differ by exactly dr
    r = np.asarray(blk).ravel()
    np.testing.assert_allclose(r[1:] / r[:-1], 1 / dr, rtol=1e-6)
    # head: scale 1
    assert lr['decode_head_m']['conv_seg']['kernel'] == 1.0

    # weight-decay groups: biases/LN scales/pos_embed/cls_token -> 0
    assert wd['backbone_m']['layers']['block']['ln1']['scale'] == 0.0
    assert wd['backbone_m']['layers']['block']['attn']['qkv']['bias'] == 0.0
    assert wd['backbone_m']['pos_embed'] == 0.0
    assert wd['backbone_m']['layers']['block']['attn']['qkv']['kernel'] == 1.0
    assert wd['decode_head_m']['conv_seg']['kernel'] == 1.0


def test_sgd_update_with_vector_mults():
    nl = 4
    params = _fake_params(nl)
    params = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), params)
    lr_mults, wd_mults = build_layer_decay_trees(params, nl, 0.5)
    new_params, _ = sgd_update(params, grads, sgd_init(params),
                               jnp.asarray(0.1), lr_mults, momentum=0.0,
                               weight_decay=0.01, wd_mults=wd_mults)
    qkv = np.asarray(
        new_params['backbone_m']['layers']['block']['attn']['qkv']['kernel'])
    # delta per layer = lr * dr**(nl-i) * (g + wd*p)
    deltas = 1.0 - qkv[:, 0, 0]
    np.testing.assert_allclose(
        deltas, [0.1 * 0.5 ** (nl - i) * 1.01 for i in range(nl)],
        rtol=1e-5)
    # no_decay leaf: no wd term
    ln = np.asarray(
        new_params['backbone_m']['layers']['block']['ln1']['scale'])
    np.testing.assert_allclose(
        1.0 - ln[:, 0], [0.1 * 0.5 ** (nl - i) for i in range(nl)],
        rtol=1e-5)
