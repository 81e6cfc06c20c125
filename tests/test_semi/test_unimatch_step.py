"""UniMatch dual-stream branch test (reference foward_unsup_train_unimatch,
encoder_decoder.py:689-830 — untested in the reference)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models import build_segmentor, init_segmentor_variables
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.train_step import (create_train_state,
                                          make_semi_train_step)

TINY_MODEL = dict(
    type='EncoderDecoder',
    backbone=dict(
        type='VisionTransformer', img_size=(64, 64), patch_size=16,
        embed_dims=32, num_layers=2, num_heads=4, out_indices=(1,),
        use_flash=False),
    decode_head=dict(
        type='SETRUPHead', in_channels=32, channels=16, num_classes=5,
        in_index=0, num_convs=2, up_scale=2, kernel_size=3,
        loss_decode=dict(type='CrossEntropyLoss', loss_weight=1.0)),
)


def test_unimatch_step_losses():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    cfg = SemiConfig(
        ema=True, unimatch=True, unsup_weight=1.0, unsup_confidence=0.95,
        attn_mask_seperate_head=True, attn_mask_weight=5.0,
        adaptive_attn_mask=True, use_PatchShuffle=True, PatchMix_N=2,
        negative_class_ranking=True,
        negative_class_ranking_mode='unsup_only')
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    r = np.random.RandomState(0)

    def img():
        return jnp.asarray(r.randn(2, 64, 64, 3), jnp.float32)

    batch = {
        'sup_img': img(),
        'sup_gt': jnp.asarray(r.randint(0, 5, (2, 64, 64)), jnp.int32),
        'unsup_teacher_img': img(),
        'unsup_teacher_mix_img': img(),
        'unsup_student_img': img(),
        'unsup_student_2_img': img(),
        'unsup_student_mix_img': img(),
        'unsup_student_2_mix_img': img(),
    }
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    for key in ('unsup.loss_seg_unsup_attn_mask', 'unsup.loss_seg_unsup_1',
                'unsup.loss_seg_unsup_2', 'unsup.loss_ncr_unsup_1',
                'unsup.loss_ncr_unsup_2', 'loss'):
        assert key in logs, (key, sorted(logs))
        assert np.isfinite(float(logs[key])), key
    assert int(new_state.step) == 1


def test_momentum_annealing_updates_state():
    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    cfg = SemiConfig(ema=True, unsup_weight=1.0, unsup_confidence=0.95,
                     momentum_head_exp=0.1)
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    r = np.random.RandomState(1)
    batch = {
        'sup_img': jnp.asarray(r.randn(2, 64, 64, 3), jnp.float32),
        'sup_gt': jnp.asarray(r.randint(0, 5, (2, 64, 64)), jnp.int32),
        'unsup_teacher_img': jnp.asarray(r.randn(2, 64, 64, 3),
                                         jnp.float32),
        'unsup_student_img': jnp.asarray(r.randn(2, 64, 64, 3),
                                         jnp.float32),
    }
    s1, logs = step(state, batch, jax.random.PRNGKey(2))
    assert s1.annealed_momentum is not None
    assert 'momentum_head' in logs
    # next step consumes the annealed value without error
    s2, _ = step(s1, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(s2.annealed_momentum))
