"""Extra pipeline transforms (reference transforms zoo)."""
import numpy as np

import s4former_tpu.data  # noqa: F401
from s4former_tpu.data.pipelines.extra_transforms import (GaussianBlur,
                                                          RandErase,
                                                          RandomGrayscale,
                                                          RandomRotate)


def _results(seed=0, h=32, w=40):
    rng = np.random.default_rng(seed)
    return {'img': rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
            'gt_semantic_seg': rng.integers(0, 5, (h, w)).astype(np.uint8),
            'seg_fields': ['gt_semantic_seg'],
            'rng': rng}


def test_rand_erase():
    out = RandErase(prob=1.0, ratio=(0.1, 0.3))(_results())
    assert out['img'].shape == (32, 40, 3)


def test_grayscale_channels_equal():
    out = RandomGrayscale(prob=1.0)(_results())
    np.testing.assert_array_equal(out['img'][..., 0], out['img'][..., 1])
    np.testing.assert_array_equal(out['img'][..., 1], out['img'][..., 2])


def test_gaussian_blur_smooths():
    r = _results()
    var_before = np.var(r['img'].astype(np.float64))
    out = GaussianBlur(prob=1.0, sigma=(2.0, 2.0))(r)
    assert np.var(out['img'].astype(np.float64)) < var_before


def test_random_rotate_keeps_shapes():
    out = RandomRotate(prob=1.0, degree=(30, 30))(_results())
    assert out['img'].shape == (32, 40, 3)
    assert out['gt_semantic_seg'].shape == (32, 40)
    # rotation introduces seg padding value at corners
    assert 255 in np.unique(out['gt_semantic_seg'])


def test_random_mosaic_requires_mix_results():
    from s4former_tpu.data.pipelines.extra_transforms import RandomMosaic
    import pytest
    with pytest.raises(KeyError, match='mix_results'):
        RandomMosaic(prob=1.0, img_scale=(32, 40))(_results())


def test_random_mosaic_composes_four():
    from s4former_tpu.data.pipelines.extra_transforms import RandomMosaic
    r = _results()
    r['mix_results'] = [_results(i + 1) for i in range(3)]
    out = RandomMosaic(prob=1.0, img_scale=(32, 40),
                       center_ratio_range=(1.0, 1.0))(r)
    assert out['img'].shape == (64, 80, 3)
    assert out['gt_semantic_seg'].shape == (64, 80)
    # all four quadrants carry image content (non-pad) at their centers
    img = out['img']
    for y, x in [(16, 20), (16, 60), (48, 20), (48, 60)]:
        assert img[y, x].any()


def test_multi_image_mix_dataset_feeds_mosaic():
    from s4former_tpu.data.datasets.custom import MultiImageMixDataset

    class _DS:
        CLASSES = ('a', 'b')
        PALETTE = None

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return _results(i)

    ds = MultiImageMixDataset(
        _DS(), pipeline=[dict(type='RandomMosaic', prob=1.0,
                              img_scale=(32, 40))])
    out = ds[0]
    assert out['img'].shape == (64, 80, 3)
    assert 'mix_results' not in out


def test_rare_remain_prefers_rare_classes():
    from s4former_tpu.data.pipelines.extra_transforms import \
        RandomCropRareRemain
    rng = np.random.default_rng(0)
    # one dominant class; a rare class (16) in a small corner region
    seg = np.zeros((64, 64), np.uint8)
    seg[:8, :8] = 16
    seg[50:, 50:] = 1
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    hits = 0
    for seed in range(20):
        r = {'img': img.copy(), 'gt_semantic_seg': seg.copy(),
             'seg_fields': ['gt_semantic_seg'],
             'rng': np.random.default_rng(seed)}
        out = RandomCropRareRemain((16, 16), cat_max_ratio=0.9)(r)
        assert out['img'].shape == (16, 16, 3)
        if 16 in np.unique(out['gt_semantic_seg']):
            hits += 1
    # chance for a plain RandomCrop to contain the 8x8 rare corner is
    # (8/49)^2 ~ 2.7% per draw (~0.5 hits in 20); the 15-retry accept
    # loop must land on it far more often
    assert hits >= 4, hits


def test_patchwise_class_mask():
    import jax
    import jax.numpy as jnp
    from s4former_tpu.semi.mixes import _patchwise_class_mask
    lab = np.zeros((32, 32), np.int32)
    # top-left patch: 3 classes {1,2,3} -> selects n//2+1 = 2 of 3
    lab[:16, :5] = 1
    lab[:16, 5:10] = 2
    lab[:16, 10:16] = 3
    lab[16:, 16:] = 255        # bottom-right: all-255 -> fully masked
    # top-right / bottom-left: single class 0 -> nothing selected
    m = _patchwise_class_mask(jax.random.PRNGKey(0), jnp.asarray(lab),
                              num_classes=5, patchsize=16)
    m = np.asarray(m)
    assert m.shape == (32, 32)
    assert m[16:, 16:].all()            # 255 always kept
    assert not m[:16, 16:].any()        # single-class patch: none
    assert not m[16:, :16].any()
    tl = m[:16, :16]
    assert tl.any() and not tl.all()    # 2 of the 3 classes selected
