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


def test_resize_multiscale_mode_value():
    """Mode 4 (reference random_select, transforms.py:241-258): a scale
    picked uniformly from the list; scale_idx recorded."""
    from s4former_tpu.data.pipelines.transforms import Resize
    scales = [(100, 60), (200, 120), (300, 180)]
    t = Resize(img_scale=scales, multiscale_mode='value', keep_ratio=True)
    seen = set()
    for seed in range(40):
        img = np.full((60, 100, 3), 7, np.uint8)
        res = {'img': img, 'seg_fields': [],
               'rng': np.random.default_rng(seed)}
        out = t(res)
        idx = out['scale_idx']
        assert idx in (0, 1, 2)
        seen.add(idx)
        # keep_ratio rescale of a 100x60 image to scale (long, short):
        # f = min(long/100, short/60); both scales here are exact x1/x2/x3
        f = (idx + 1)
        assert out['img'].shape[:2] == (60 * f, 100 * f), \
            (idx, out['img'].shape)
    assert seen == {0, 1, 2}          # all candidates actually sampled


def test_resize_multiscale_mode_range():
    """Mode 3 (reference random_sample, transforms.py:260-284): long and
    short edges sampled independently and uniformly (inclusive) between
    the two bounding scales' long/short extents."""
    from s4former_tpu.data.pipelines.transforms import Resize
    t = Resize(img_scale=[(80, 40), (160, 100)], multiscale_mode='range',
               keep_ratio=False)
    longs, shorts = [], []
    for seed in range(60):
        img = np.zeros((30, 50, 3), np.uint8)
        res = {'img': img, 'seg_fields': [],
               'rng': np.random.default_rng(seed)}
        out = t(res)
        # keep_ratio=False: output = (w, h) = sampled (long, short)
        h, w = out['img'].shape[:2]
        longs.append(w)
        shorts.append(h)
        assert 80 <= w <= 160 and 40 <= h <= 100, (w, h)
        assert out['scale_idx'] is None
    # the inclusive-uniform draw must cover a wide span of each range
    assert max(longs) - min(longs) > 40
    assert max(shorts) - min(shorts) > 30


def test_resize_multiscale_constructor_contract():
    """ratio_range forbids multi-scale lists; bad modes rejected —
    a mode-4 config can no longer be silently mis-handled."""
    import pytest as _pytest
    from s4former_tpu.data.pipelines.transforms import Resize
    with _pytest.raises(AssertionError):
        Resize(img_scale=[(80, 40), (160, 100)], ratio_range=(0.5, 2.0))
    with _pytest.raises(AssertionError):
        Resize(img_scale=[(80, 40)], multiscale_mode='nonsense')
    # single tuple + ratio_range stays the flagship mode-2 path
    t = Resize(img_scale=(128, 64), ratio_range=(0.5, 2.0))
    assert t.img_scale == [(128, 64)]


def test_load_image_color_type(tmp_path):
    """LoadImageFromFile color_type: 'color' -> 3-channel RGB,
    'grayscale' -> 2-D (reference loading.py:36-49 / mmcv imfrombytes
    flags)."""
    from PIL import Image
    from s4former_tpu.data.pipelines.transforms import LoadImageFromFile
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
    p = tmp_path / 'x.png'
    Image.fromarray(arr).save(p)
    res = {'img_info': {'filename': str(p)}}
    out = LoadImageFromFile()(dict(res))
    assert out['img'].shape == (8, 10, 3)
    out = LoadImageFromFile(color_type='grayscale')(dict(res))
    assert out['img'].shape == (8, 10)
    # non-default backend: accepted with a one-time warning, not an error
    LoadImageFromFile._warned_backend = False
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        LoadImageFromFile(imdecode_backend='turbojpeg')
        assert any('imdecode_backend' in str(x.message) for x in w)
