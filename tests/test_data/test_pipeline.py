"""Data pipeline + dataset tests on a synthetic miniature dataset
(mirrors the reference's tests/data/pseudo_dataset strategy, SURVEY.md §4).
"""
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

import s4former_tpu.data  # noqa: F401
from s4former_tpu.data.datasets.custom import (PascalVOCDataset,
                                               build_dataset)
from s4former_tpu.data.loader import SemiBalanceSampler, SemiLoader
from s4former_tpu.data.pipelines.transforms import (Compose,
                                                    PhotoMetricDistortion)

CROP = (64, 64)

TRAIN_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=(128, 64), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.75),
    dict(type='RandomFlip', prob=0.5),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', mean=[123.675, 116.28, 103.53],
         std=[58.395, 57.12, 57.375], to_rgb=True),
    dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
    dict(type='ExtraAttrs', tag='sup'),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]

UNSUP_PIPELINE = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=(128, 64), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=CROP, cat_max_ratio=0.75),
    dict(type='RandomFlip', flip_ratio=0.5),
    dict(type='MultiBranch',
         unsup_student=[
             dict(type='PhotoMetricDistortion'),
             dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                  std=[58.395, 57.12, 57.375], to_rgb=True),
             dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
             dict(type='ExtraAttrs', tag='unsup_student'),
             dict(type='Collect', keys=['img', 'gt_semantic_seg'])],
         unsup_teacher=[
             dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                  std=[58.395, 57.12, 57.375], to_rgb=True),
             dict(type='Pad', size=CROP, pad_val=0, seg_pad_val=255),
             dict(type='ExtraAttrs', tag='unsup_teacher'),
             dict(type='Collect', keys=['img', 'gt_semantic_seg'])]),
]


@pytest.fixture(scope='module')
def mini_voc(tmp_path_factory):
    """3-image synthetic VOC-style dataset with a split file."""
    root = tmp_path_factory.mktemp('voc')
    img_dir = root / 'JPEGImages'
    ann_dir = root / 'SegmentationClassAug'
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.RandomState(0)
    stems = []
    for i in range(3):
        stem = f'img_{i:03d}'
        stems.append(stem)
        h, w = 48 + 16 * i, 80 + 8 * i
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(img_dir / f'{stem}.jpg')
        seg = rng.randint(0, 5, (h, w)).astype(np.uint8)
        seg[:4, :4] = 255
        Image.fromarray(seg).save(ann_dir / f'{stem}.png')
    split = root / 'split.txt'
    split.write_text('\n'.join(stems))
    return str(root), stems


def test_train_pipeline_shapes(mini_voc):
    root, stems = mini_voc
    ds = PascalVOCDataset(
        pipeline=TRAIN_PIPELINE, img_dir='JPEGImages',
        ann_dir='SegmentationClassAug', split='split.txt', data_root=root)
    assert len(ds) == 3
    item = ds[0]
    assert item['img'].shape == (64, 64, 3)
    assert item['img'].dtype == np.float32
    assert item['gt_semantic_seg'].shape == (64, 64)
    assert item['tag'] == 'sup'
    labels = np.unique(item['gt_semantic_seg'])
    assert set(labels).issubset(set(range(5)) | {255})
    assert 'img_shape' in item['img_metas']


def test_multibranch_weak_strong(mini_voc):
    root, _ = mini_voc
    ds = PascalVOCDataset(
        pipeline=UNSUP_PIPELINE, img_dir='JPEGImages',
        ann_dir='SegmentationClassAug', split='split.txt', data_root=root)
    branches = ds[1]
    assert isinstance(branches, list) and len(branches) == 2
    tags = {b['tag'] for b in branches}
    assert tags == {'unsup_student', 'unsup_teacher'}
    for b in branches:
        assert b['img'].shape == (64, 64, 3)


def test_semi_loader_batches(mini_voc):
    root, _ = mini_voc
    sup = PascalVOCDataset(
        pipeline=TRAIN_PIPELINE, img_dir='JPEGImages',
        ann_dir='SegmentationClassAug', split='split.txt', data_root=root)
    unsup = PascalVOCDataset(
        pipeline=UNSUP_PIPELINE, img_dir='JPEGImages',
        ann_dir='SegmentationClassAug', split='split.txt', data_root=root)
    loader = SemiLoader(sup, unsup, sup_per_batch=2, unsup_per_batch=2,
                        num_workers=2, max_iter_size=3)
    batches = list(iter(loader))
    assert len(batches) == 3
    b = batches[0]
    assert b['sup_img'].shape == (2, 64, 64, 3)
    assert b['sup_gt'].shape == (2, 64, 64) and b['sup_gt'].dtype == np.int32
    assert b['unsup_student_img'].shape == (2, 64, 64, 3)
    assert b['unsup_teacher_img'].shape == (2, 64, 64, 3)
    # weak and strong views differ (strong has PhotoMetricDistortion) on
    # at least one batch
    assert any(not np.allclose(bb['unsup_student_img'],
                               bb['unsup_teacher_img']) for bb in batches)


def test_sampler_covers_and_reshuffles():
    s = SemiBalanceSampler(num_sup=3, num_unsup=10, sup_per_batch=2,
                           unsup_per_batch=4, seed=0, max_iter_size=6)
    seen_sup = []
    for sup_idx, unsup_idx, mix_idx in s:
        assert len(sup_idx) == 2 and len(unsup_idx) == 4
        assert mix_idx == []
        seen_sup.extend(sup_idx)
    # the small sup pool is recycled: each of the 3 indices appears
    assert set(seen_sup) == {0, 1, 2}
    # re-iterating advances the epoch -> a different shuffle
    second = [tuple(si) for si, _, _ in s]
    assert s.epoch == 2 and len(second) == 6


def test_pmd_preserves_dtype_and_range():
    rng = np.random.default_rng(0)
    results = {'img': rng.integers(0, 255, (32, 32, 3)).astype(np.uint8),
               'rng': rng}
    out = PhotoMetricDistortion()(results)
    assert out['img'].dtype == np.uint8
    assert out['img'].min() >= 0 and out['img'].max() <= 255


def test_pre_eval_and_evaluate(mini_voc):
    root, _ = mini_voc
    ds = PascalVOCDataset(
        pipeline=TRAIN_PIPELINE, img_dir='JPEGImages',
        ann_dir='SegmentationClassAug', split='split.txt', data_root=root)
    # perfect predictions -> mIoU over present classes = 1
    preds = [ds.get_gt_seg_map(i) for i in range(len(ds))]
    res = ds.evaluate(ds.pre_eval(preds, list(range(len(ds)))),
                      metric='mIoU')
    assert res['mIoU'] == pytest.approx(1.0)
    assert res['aAcc'] == pytest.approx(1.0)
