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


def _norm():
    return [dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], to_rgb=True),
            dict(type='Pad', size=(64, 64), pad_val=0, seg_pad_val=255)]


def _branch(tag, strong):
    steps = ([dict(type='PhotoMetricDistortion')] if strong else []) + \
        _norm() + [dict(type='ExtraAttrs', tag=tag),
                   dict(type='Collect', keys=['img', 'gt_semantic_seg'])]
    return steps


def _unsup_pipeline(suffix=''):
    """3-branch MultiBranch pipeline: teacher (weak) + two students
    (strong), reference UniSemiDataset stream layout
    (dataset_wrappers.py:308, encoder_decoder.py:689-830)."""
    return [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Resize', img_scale=(128, 64), ratio_range=(0.5, 2.0)),
        dict(type='RandomCrop', crop_size=(64, 64), cat_max_ratio=0.75),
        dict(type='RandomFlip', prob=0.5),
        dict(type='MultiBranch', **{
            f'unsup_teacher{suffix}': _branch(f'unsup_teacher{suffix}',
                                              strong=False),
            f'unsup_student{suffix}': _branch(f'unsup_student{suffix}',
                                              strong=True),
            f'unsup_student_2{suffix}': _branch(f'unsup_student_2{suffix}',
                                                strong=True)}),
    ]


def test_unimatch_loader_to_step_contract(tmp_path):
    """End-to-end: SemiLoader (sup + unsup + unsup_mix 3-way, UniSemiDataset
    equivalent) emits exactly the batch keys the unimatch train step
    consumes; the jitted step runs sharded over an 8-device mesh."""
    import os
    from PIL import Image
    from s4former_tpu.data.datasets.custom import PascalVOCDataset
    from s4former_tpu.data.loader import SemiLoader
    from s4former_tpu.parallel.mesh import (make_mesh, replicate_state,
                                            shard_batch)

    root = tmp_path / 'voc'
    os.makedirs(root / 'JPEGImages')
    os.makedirs(root / 'SegmentationClassAug')
    rng = np.random.RandomState(0)
    stems = []
    for i in range(3):
        stem = f'im{i}'
        stems.append(stem)
        Image.fromarray(rng.randint(0, 255, (70, 90, 3), dtype=np.uint8)
                        ).save(root / 'JPEGImages' / f'{stem}.jpg')
        Image.fromarray(rng.randint(0, 5, (70, 90)).astype(np.uint8)
                        ).save(root / 'SegmentationClassAug' / f'{stem}.png')
    (root / 'split.txt').write_text('\n'.join(stems))

    sup_pipeline = [
        dict(type='LoadImageFromFile'),
        dict(type='LoadAnnotations'),
        dict(type='Resize', img_scale=(128, 64), ratio_range=(0.5, 2.0)),
        dict(type='RandomCrop', crop_size=(64, 64), cat_max_ratio=0.75),
        dict(type='RandomFlip', prob=0.5),
    ] + _branch('sup', strong=False)

    kw = dict(img_dir='JPEGImages', ann_dir='SegmentationClassAug',
              split='split.txt', data_root=str(root))
    sup = PascalVOCDataset(pipeline=sup_pipeline, **kw)
    unsup = PascalVOCDataset(pipeline=_unsup_pipeline(), **kw)
    unsup_mix = PascalVOCDataset(pipeline=_unsup_pipeline('_mix'), **kw)

    loader = SemiLoader(sup, unsup, unsup_mix, sup_per_batch=8,
                        unsup_per_batch=8, num_workers=2, max_iter_size=1)
    batch = next(iter(loader))
    expected = {'sup_img', 'sup_gt',
                'unsup_teacher_img', 'unsup_student_img',
                'unsup_student_2_img', 'unsup_teacher_mix_img',
                'unsup_student_mix_img', 'unsup_student_2_mix_img'}
    assert expected.issubset(batch.keys()), sorted(batch.keys())
    assert batch['unsup_student_2_mix_img'].shape == (8, 64, 64, 3)

    model = build_segmentor(TINY_MODEL)
    variables = init_segmentor_variables(
        model, jax.random.PRNGKey(0), (2, 64, 64, 3))
    state = create_train_state(variables, ema=True)
    cfg = SemiConfig(ema=True, unimatch=True, unsup_weight=1.0,
                     unsup_confidence=0.95, attn_mask_seperate_head=True,
                     use_PatchShuffle=True, PatchMix_N=2)
    step = jax.jit(make_semi_train_step(model, cfg, num_classes=5,
                                        base_lr=0.01, max_iters=100))
    mesh = make_mesh(8)
    with mesh:
        sharded = shard_batch(mesh, {k: v for k, v in batch.items()
                                     if k in expected})
        rstate = replicate_state(mesh, state)
        new_state, logs = step(rstate, sharded, jax.random.PRNGKey(1))
    for key in ('unsup.loss_seg_unsup_attn_mask', 'unsup.loss_seg_unsup_1',
                'unsup.loss_seg_unsup_2', 'loss'):
        assert key in logs and np.isfinite(float(logs[key])), key
    assert int(new_state.step) == 1
