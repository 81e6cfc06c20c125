"""MiT (SegFormer) family through the FULL semi train step — the second
model family's PASA path (reference mit.py:460-491: raw unconfidence map,
per-stage pooling, inverted adaptive variant) was only reachable through
the config CLI before; these tests pin the loader->step contract for it.
"""
import jax
import jax.numpy as jnp
import numpy as np

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.pasa import mit_stage_bias
from s4former_tpu.semi.train_step import (create_train_state,
                                          make_semi_train_step)

MIT_MODEL = dict(
    type='EncoderDecoder',
    backbone=dict(
        type='MixVisionTransformer', embed_dims=8, num_stages=4,
        num_layers=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
        patch_sizes=[7, 3, 3, 3], sr_ratios=[8, 4, 2, 1],
        out_indices=(0, 1, 2, 3), mlp_ratio=2),
    decode_head=dict(
        type='SegformerHead', in_channels=[8, 16, 40, 64],
        in_index=[0, 1, 2, 3], channels=16, num_classes=5),
    # PASA flags on the segmentor cfg, reference layout; build_segmentor
    # must propagate them into the MiT backbone cfg
    attn_mask_seperate_head=True, attn_mask_weight=5,
    adaptive_attn_mask=True,
)


def test_mit_stage_bias_semantics():
    unconf = jnp.asarray([[0.9, 0.1, 0.8, 0.2]])
    plain = mit_stage_bias(unconf, 5.0, adaptive=False)
    assert plain.shape == (1, 1, 4, 4)
    # every query row equals the scaled key-unconfidence vector
    np.testing.assert_allclose(np.asarray(plain[0, 0, 2]),
                               [4.5, 0.5, 4.0, 1.0])
    adapt = np.asarray(mit_stage_bias(unconf, 5.0, adaptive=True)[0, 0])
    # keys inverted to confidence
    np.testing.assert_allclose(adapt[3], 5 * (1 - np.asarray(
        [0.9, 0.1, 0.8, 0.2])), rtol=1e-6)
    # k = 0.5*(l-1) = 1 most-confident slice position (index 0 of the
    # slice == unconf[1]=0.1) zeroes ROW 0 (reference's off-by-one quirk)
    assert np.all(adapt[0] == 0.0)
    assert np.any(adapt[1] != 0.0)


def _batch(b=2, hw=64):
    r = np.random.RandomState(0)
    return {
        'sup_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
        'sup_gt': jnp.asarray(r.randint(0, 5, (b, hw, hw)), jnp.int32),
        'unsup_teacher_img': jnp.asarray(r.randn(b, hw, hw, 3),
                                         jnp.float32),
        'unsup_student_img': jnp.asarray(r.randn(b, hw, hw, 3),
                                         jnp.float32),
    }


def test_mit_full_semi_step():
    model = build_segmentor(MIT_MODEL)
    # flags propagated into the backbone module cfg
    assert model.backbone['attn_mask_weight'] == 5
    assert model.backbone['adaptive_attn_mask'] is True
    variables = init_segmentor_variables(model, jax.random.PRNGKey(0),
                                         (1, 64, 64, 3))
    cfg = SemiConfig(
        ema=True, ema_momentum=0.99, unsup_weight=1.0,
        unsup_confidence=0.25, attn_mask_seperate_head=True,
        attn_mask_weight=5.0, adaptive_attn_mask=True,
        use_PatchShuffle_w_Cutmix=True, PatchMix_N=2,
        negative_class_ranking=True,
        negative_class_ranking_mode='unsup_only')
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    state = create_train_state(variables, ema=True)
    state, logs = step(state, _batch(), jax.random.PRNGKey(0))
    for k in ('loss', 'decode.loss_ce', 'unsup.loss_seg_unsup',
              'unsup.loss_seg_unsup_attn_mask', 'unsup.loss_ncr_unsup',
              'mask_ratio'):
        assert k in logs, k
        assert np.isfinite(float(logs[k])), k
    # 0.25 confidence threshold at random init (5 classes -> max_prob
    # >= 0.2 by construction) leaves some confident pixels, so the PASA
    # pass actually trains
    assert float(logs['mask_ratio']) > 0.0
    state2, logs2 = step(state, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(logs2['loss']))
