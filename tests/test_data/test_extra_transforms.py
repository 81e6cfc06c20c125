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


# ---- round-4 additions: the remaining reference transform roster ----

def test_adjust_gamma_matches_reference_lut():
    """(ref transforms.py:1099-1121): LUT with truncating uint8 cast."""
    from s4former_tpu.data.pipelines.extra_transforms import AdjustGamma
    res = _results(1)
    img = res['img'].copy()
    out = AdjustGamma(gamma=2.2)(res)['img']
    inv = 1.0 / 2.2
    table = np.array([(i / 255.0) ** inv * 255
                      for i in np.arange(256)]).astype('uint8')
    np.testing.assert_array_equal(out, table[img])
    assert AdjustGamma(gamma=1.0)(_results(1))['img'].dtype == np.uint8


def test_rerange_bounds_and_linearity():
    """(ref transforms.py:615-652)."""
    from s4former_tpu.data.pipelines.extra_transforms import Rerange
    res = _results(2)
    img = res['img'].astype(np.float32)
    out = Rerange(min_value=10, max_value=20)(res)['img']
    ref = (img - img.min()) / (img.max() - img.min()) * 10 + 10
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_rgb2gray_weights_and_channels():
    """(ref transforms.py:1043-1094): weighted mean, repeat channels."""
    from s4former_tpu.data.pipelines.extra_transforms import RGB2Gray
    res = _results(3)
    img = res['img']
    out = RGB2Gray()(dict(res))['img']
    ref = (img * np.array([0.299, 0.587, 0.114]).reshape(1, 1, 3)
           ).sum(2, keepdims=True).repeat(3, axis=2)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert out.shape[2] == 3
    out1 = RGB2Gray(out_channels=1)(dict(_results(3)))['img']
    assert out1.shape[2] == 1


def test_clahe_matches_cv2():
    """(ref transforms.py:661-700): mmcv.clahe IS cv2 CLAHE per channel."""
    import cv2
    from s4former_tpu.data.pipelines.extra_transforms import CLAHE
    res = _results(4)
    img = res['img'].copy()
    out = CLAHE(clip_limit=40.0, tile_grid_size=(8, 8))(res)['img']
    op = cv2.createCLAHE(40.0, (8, 8))
    for c in range(3):
        np.testing.assert_array_equal(out[..., c], op.apply(img[..., c]))


def test_resize_to_multiple_geometry():
    """(ref transforms.py:114-160): ceil to divisor, seg nearest."""
    from s4former_tpu.data.pipelines.extra_transforms import ResizeToMultiple
    res = _results(5, h=33, w=41)
    out = ResizeToMultiple(size_divisor=32)(res)
    assert out['img'].shape[:2] == (64, 64)
    assert out['gt_semantic_seg'].shape == (64, 64)
    assert out['img_shape'] == out['img'].shape == out['pad_shape']
    # seg stays label-valued (nearest)
    assert set(np.unique(out['gt_semantic_seg'])) <= set(range(5))
    # already-aligned input is untouched
    res2 = _results(5, h=64, w=32)
    img2 = res2['img'].copy()
    np.testing.assert_array_equal(
        ResizeToMultiple(size_divisor=32)(res2)['img'], img2)


def test_seg_rescale_rounding():
    """(ref transforms.py:1135-1161): mmcv int(d*f + 0.5) rounding."""
    from s4former_tpu.data.pipelines.extra_transforms import SegRescale
    res = _results(6, h=33, w=41)
    out = SegRescale(scale_factor=0.5)(res)
    assert out['gt_semantic_seg'].shape == (17, 21)
    assert set(np.unique(out['gt_semantic_seg'])) <= set(range(5))
    res1 = _results(6)
    seg = res1['gt_semantic_seg'].copy()
    np.testing.assert_array_equal(
        SegRescale(scale_factor=1)(res1)['gt_semantic_seg'], seg)


def test_random_cutout_fill_and_seg():
    """(ref transforms.py:1286-1366): boxes clip at border; optional
    seg fill; prob=0 is identity."""
    from s4former_tpu.data.pipelines.extra_transforms import RandomCutOut
    res = _results(7)
    img = res['img'].copy()
    out = RandomCutOut(prob=1.0, n_holes=3, cutout_shape=(8, 8),
                       fill_in=(7, 7, 7), seg_fill_in=255)(res)
    changed = np.any(out['img'] != img, axis=2)
    assert changed.any()
    assert np.all(out['img'][changed] == 7)
    np.testing.assert_array_equal(changed,
                                  out['gt_semantic_seg'] == 255)
    res0 = _results(7)
    img0 = res0['img'].copy()
    np.testing.assert_array_equal(
        RandomCutOut(prob=0.0, n_holes=1, cutout_ratio=(0.2, 0.2))(
            res0)['img'], img0)
