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
