"""End-to-end semi-supervised train-step tests on a tiny model (CPU).

The reference has ZERO dedicated tests for the semi machinery (SURVEY.md §4);
these are the tests it never had: the full S4Former step (EMA + pseudo-labels
+ PASA + CutMix/PatchShuffle + NCR) runs jitted, losses are finite, EMA moves
toward the student, and the step is deterministic given the PRNG key.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.train_step import (TrainState, create_train_state,
                                          make_semi_train_step)

TINY_MODEL = dict(
    type='EncoderDecoder',
    backbone=dict(
        type='VisionTransformer',
        img_size=(64, 64), patch_size=16, embed_dims=32, num_layers=2,
        num_heads=4, out_indices=(0, 1), use_flash=False),
    decode_head=dict(
        type='SETRUPHead', in_channels=32, channels=16, num_classes=5,
        in_index=1, num_convs=2, up_scale=2, kernel_size=3,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
    auxiliary_head=[
        dict(type='SETRUPHead', in_channels=32, channels=16, num_classes=5,
             in_index=0, num_convs=1, up_scale=4, kernel_size=3,
             loss_decode=dict(type='CrossEntropyLoss', loss_weight=0.4)),
    ],
)

S4_CFG = SemiConfig(
    ema=True, ema_momentum=0.99, unsup_weight=1.0, unsup_confidence=0.95,
    attn_mask_seperate_head=True, attn_mask_weight=5.0,
    adaptive_attn_mask=True, use_PatchShuffle_w_Cutmix=True, PatchMix_N=2,
    negative_class_ranking=True, negative_class_ranking_mode='unsup_only')


def _batch(rng=0, b=2, hw=64):
    r = np.random.RandomState(rng)
    return {
        'sup_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
        'sup_gt': jnp.asarray(r.randint(0, 5, (b, hw, hw)), jnp.int32),
        'unsup_teacher_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
        'unsup_student_img': jnp.asarray(r.randn(b, hw, hw, 3), jnp.float32),
    }


@pytest.fixture(scope='module')
def setup():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    step = make_semi_train_step(model, S4_CFG, num_classes=5,
                                base_lr=0.01, max_iters=100)
    return model, jax.jit(step), state


def test_full_s4former_step(setup):
    _, step, state = setup
    new_state, logs = step(state, _batch(), jax.random.PRNGKey(1))
    for key in ('decode.loss_ce', 'aux_0.loss_ce',
                'unsup.loss_seg_unsup', 'unsup.loss_seg_unsup_attn_mask',
                'unsup.loss_ncr_unsup', 'mask_ratio', 'loss', 'lr'):
        assert key in logs, key
        assert np.isfinite(float(logs[key])), key
    assert int(new_state.step) == 1
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_ema_moves_toward_student(setup):
    _, step, state = setup
    s = state
    for i in range(3):
        s, _ = step(s, _batch(i), jax.random.PRNGKey(i))
    # teacher must differ from initial and lag the student
    d_teacher = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.ema_params, s.ema_params)
    assert max(jax.tree_util.tree_leaves(d_teacher)) > 0
    d_lag = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s.ema_params, s.params)
    assert max(jax.tree_util.tree_leaves(d_lag)) > 0


def test_step_deterministic(setup):
    _, step, state = setup
    _, logs1 = step(state, _batch(), jax.random.PRNGKey(7))
    _, logs2 = step(state, _batch(), jax.random.PRNGKey(7))
    assert float(logs1['loss']) == float(logs2['loss'])


def test_supervised_only_step():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=False)
    cfg = SemiConfig()  # all defaults, no semi
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    batch = {k: v for k, v in _batch().items() if k.startswith('sup')}
    new_state, logs = step(state, batch, jax.random.PRNGKey(0))
    assert 'unsup.loss_seg_unsup' not in logs
    assert np.isfinite(float(logs['loss']))


def test_loss_decreases_supervised():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=False)
    cfg = SemiConfig()
    step = jax.jit(make_semi_train_step(
        model, cfg, num_classes=5, base_lr=0.05, max_iters=10000,
        min_lr=0.0))
    batch = {k: v for k, v in _batch().items() if k.startswith('sup')}
    first = None
    for i in range(12):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(logs['decode.loss_ce'])
    assert float(logs['decode.loss_ce']) < first


def _make_step(cfg, ema=True, **kw):
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=ema)
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=5,
                                        base_lr=0.01, max_iters=100, **kw))
    return step, state


@pytest.mark.parametrize('mode', ['sup_only', 'both'])
def test_sup_ncr_modes(mode):
    """Sup-branch NCR (reference encoder_decoder.py:443-474): student on
    the strong labeled view vs EMA teacher on the weak view. 'sup_only' is
    the reference constructor DEFAULT — enabling negative_class_ranking
    must produce loss_ncr_sup, not silently nothing."""
    cfg = SemiConfig(ema=True, ema_momentum=0.99, unsup_weight=1.0,
                     unsup_confidence=0.95, negative_class_ranking=True,
                     negative_class_ranking_mode=mode)
    step, state = _make_step(cfg)
    batch = _batch()
    batch['sup_student_img'] = batch['sup_img'] + 0.1
    _, logs = step(state, batch, jax.random.PRNGKey(1))
    assert 'loss_ncr_sup' in logs
    assert np.isfinite(float(logs['loss_ncr_sup']))
    assert float(logs['loss_ncr_sup']) >= 0
    if mode == 'both':
        assert 'unsup.loss_ncr_unsup' in logs
        assert np.isfinite(float(logs['unsup.loss_ncr_unsup']))
    else:
        assert 'unsup.loss_ncr_unsup' not in logs


def test_sup_ncr_without_strong_view_falls_back():
    """Without a sup_student stream the weak view is reused (documented
    fallback) — the loss must still appear and be finite."""
    cfg = SemiConfig(ema=True, unsup_weight=0.0,
                     negative_class_ranking=True,
                     negative_class_ranking_mode='sup_only')
    step, state = _make_step(cfg)
    batch = {k: v for k, v in _batch().items() if k.startswith('sup')}
    _, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs['loss_ncr_sup']))


def test_sup_ema_distillation():
    """sup_ema (reference :476-487): CE of the supervised logits against
    the EMA teacher's argmax labels on the weak labeled view."""
    cfg = SemiConfig(ema=True, sup_ema=True, unsup_weight=0.0)
    step, state = _make_step(cfg)
    batch = {k: v for k, v in _batch().items() if k.startswith('sup')}
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert 'loss_decode_sup_ema' in logs
    assert np.isfinite(float(logs['loss_decode_sup_ema']))
    assert int(new_state.step) == 1
