"""Bit-parity tests for the native C++ data-path runtime.

The native module replaces PIL on the loader hot path (decode + resample,
reference pipelines/loading.py:24,104 and transforms.py:171 semantics);
these tests pin bit-exact agreement with PIL so the augmentation
distribution — and therefore mIoU — cannot drift between the two paths.
Skipped wholesale when the toolchain/libs are unavailable (the framework
then runs on the PIL path).
"""
import io

import numpy as np
import pytest
from PIL import Image

from s4former_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason='native extension not built')

RNG = np.random.RandomState(42)


def _png_bytes(arr, mode=None):
    b = io.BytesIO()
    (Image.fromarray(arr) if mode is None
     else Image.fromarray(arr, mode=mode)).save(b, 'PNG')
    return b.getvalue()


def test_decode_rgb_png_exact():
    img = RNG.randint(0, 256, (37, 53, 3), np.uint8)
    out = native.decode_rgb(_png_bytes(img))
    assert np.array_equal(out, img)


def test_decode_rgb_gray_png_replicates():
    g = RNG.randint(0, 256, (21, 33), np.uint8)
    data = _png_bytes(g)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    out = native.decode_rgb(data)
    assert np.array_equal(out, pil)


def test_decode_rgb_rgba_drops_alpha():
    img = RNG.randint(0, 256, (19, 23, 4), np.uint8)
    data = _png_bytes(img)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    out = native.decode_rgb(data)
    assert np.array_equal(out, pil)


def test_decode_rgb_jpeg_matches_pil():
    # Same libjpeg underneath -> identical pixels.
    img = RNG.randint(0, 256, (64, 48, 3), np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, 'JPEG', quality=85)
    data = b.getvalue()
    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    out = native.decode_rgb(data)
    assert np.array_equal(out, pil)


def test_decode_label_palette_indices():
    # VOC-style 'P' PNG: the LABEL is the palette index, not the color.
    lab = RNG.randint(0, 21, (33, 41), np.uint8)
    pi = Image.fromarray(lab, mode='P')
    pi.putpalette([v for i in range(256) for v in (i, 0, 255 - i)])
    b = io.BytesIO()
    pi.save(b, 'PNG')
    data = b.getvalue()
    pil = np.asarray(Image.open(io.BytesIO(data)))
    out = native.decode_label(data)
    assert np.array_equal(out, pil)
    assert np.array_equal(out, lab)


def test_decode_label_gray_png():
    lab = RNG.randint(0, 256, (17, 29), np.uint8)
    data = _png_bytes(lab)
    out = native.decode_label(data)
    assert np.array_equal(out, lab)


def test_decode_label_is_writable():
    lab = RNG.randint(0, 21, (9, 9), np.uint8)
    out = native.decode_label(_png_bytes(lab))
    out[0, 0] = 255  # LoadAnnotations mutates via label_map remaps


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_rgb(b'not an image at all')


@pytest.mark.parametrize('shape,size', [
    ((64, 80, 3), (37, 51)),    # downscale
    ((37, 51, 3), (128, 100)),  # upscale
    ((64, 80), (31, 31)),       # gray
    ((50, 50, 3), (100, 100)),  # exact 2x
    ((512, 683, 3), (256, 341)),  # eval-path geometry
    ((7, 9, 3), (5, 3)),        # tiny
])
def test_resize_bilinear_bit_exact_vs_pil(shape, size):
    a = RNG.randint(0, 256, shape, np.uint8)
    pil = np.asarray(Image.fromarray(a).resize(size, Image.BILINEAR))
    out = native.resize_u8(a, size)
    assert np.array_equal(out, pil)


@pytest.mark.parametrize('shape,size', [
    ((64, 80), (37, 51)),       # downscale (accumulation-order sensitive)
    ((37, 51), (128, 100)),
    ((33, 47, 3), (67, 31)),
    ((513, 771), (256, 385)),
    ((100, 100), (33, 77)),
])
def test_resize_nearest_bit_exact_vs_pil(shape, size):
    a = RNG.randint(0, 256, shape, np.uint8)
    pil = np.asarray(Image.fromarray(a).resize(size, Image.NEAREST))
    out = native.resize_u8(a, size, nearest=True)
    assert np.array_equal(out, pil)


def test_pipeline_uses_native_transparently(tmp_path):
    """LoadImageFromFile/LoadAnnotations/_pil_resize give identical results
    with the native path on and off."""
    from s4former_tpu.data.pipelines import transforms as T
    img = RNG.randint(0, 256, (40, 56, 3), np.uint8)
    lab = RNG.randint(0, 21, (40, 56), np.uint8)
    ip = tmp_path / 'img.png'
    lp = tmp_path / 'lab.png'
    Image.fromarray(img).save(ip)
    pi = Image.fromarray(lab, mode='P')
    pi.putpalette([v for i in range(256) for v in (i, i, i)])
    pi.save(lp)

    def run():
        r = {'img_info': {'filename': str(ip)},
             'ann_info': {'seg_map': str(lp)}}
        r = T.LoadImageFromFile()(r)
        r = T.LoadAnnotations()(r)
        return r['img'].copy(), r['gt_semantic_seg'].copy()

    import os
    i1, l1 = run()
    native._tried, native._mod = True, native._mod  # native on
    assert native.available()
    old = os.environ.get('S4_NATIVE')
    try:
        # force the PIL fallback by faking unavailability
        saved_mod, native._mod = native._mod, None
        i2, l2 = run()
    finally:
        native._mod = saved_mod
        if old is not None:
            os.environ['S4_NATIVE'] = old
    assert np.array_equal(i1, i2)
    assert np.array_equal(l1, l2)


# ---- PhotoMetricDistortion primitives (bit-parity with the numpy
# reference implementations; these ops were 74% of the pipeline cost)

def _np_sat(img, alpha):
    from s4former_tpu.data.pipelines.transforms import (_hsv_to_rgb_cv,
                                                        _rgb_to_hsv_cv)
    hsv = _rgb_to_hsv_cv(img)
    hsv[..., 1] = np.clip(hsv[..., 1].astype(np.float32) * alpha,
                          0, 255).astype(np.uint8)
    return _hsv_to_rgb_cv(hsv)


def _np_hue(img, dh):
    from s4former_tpu.data.pipelines.transforms import (_hsv_to_rgb_cv,
                                                        _rgb_to_hsv_cv)
    hsv = _rgb_to_hsv_cv(img)
    hsv[..., 0] = (hsv[..., 0].astype(int) + dh) % 180
    return _hsv_to_rgb_cv(hsv)


@pytest.mark.parametrize('alpha,beta', [(1.0, 17.3), (0.5, 0.0),
                                        (1.49, -20.0), (1.5, 32.0)])
def test_convert_u8_parity(alpha, beta):
    img = RNG.randint(0, 256, (31, 47, 3), np.uint8)
    ref = np.clip(img.astype(np.float32) * alpha + beta,
                  0, 255).astype(np.uint8)
    assert np.array_equal(native.convert_u8(img, alpha, beta), ref)


@pytest.mark.parametrize('alpha', [0.5, 0.77, 1.0, 1.31, 1.5])
def test_saturation_u8_parity(alpha):
    img = RNG.randint(0, 256, (29, 41, 3), np.uint8)
    assert np.array_equal(native.saturation_u8(img, alpha),
                          _np_sat(img, alpha))


@pytest.mark.parametrize('dh', [-18, -1, 0, 7, 17])
def test_hue_u8_parity(dh):
    img = RNG.randint(0, 256, (29, 41, 3), np.uint8)
    assert np.array_equal(native.hue_u8(img, dh), _np_hue(img, dh))


def test_hsv_edge_cases():
    # grayscale (diff=0), primaries, near-black
    edges = np.array([[[0, 0, 0], [255, 255, 255], [255, 0, 0],
                       [0, 255, 0], [0, 0, 255], [128, 128, 128],
                       [255, 255, 0], [1, 0, 0], [254, 255, 255]]],
                     np.uint8)
    for dh in (-18, 7):
        assert np.array_equal(native.hue_u8(edges, dh), _np_hue(edges, dh))
    for a in (0.5, 1.5):
        assert np.array_equal(native.saturation_u8(edges, a),
                              _np_sat(edges, a))


def test_normalize_f32_parity():
    img = RNG.randint(0, 256, (23, 37, 3), np.uint8)
    mean = np.asarray([123.675, 116.28, 103.53], np.float32)
    std = np.asarray([58.395, 57.12, 57.375], np.float32)
    ref = (img.astype(np.float32) - mean) / std
    got = native.normalize_f32(img, mean, std)
    assert np.array_equal(got, ref)


def test_pmd_transform_native_off_on_identical():
    """PhotoMetricDistortion output is identical with the native path
    forced off (same RNG draws, bit-equal pixels)."""
    from s4former_tpu.data.pipelines.transforms import \
        PhotoMetricDistortion
    img = RNG.randint(0, 256, (40, 56, 3), np.uint8)

    def run():
        t = PhotoMetricDistortion()
        r = {'img': img.copy(), 'rng': np.random.default_rng(5)}
        return t(r)['img']

    on = run()
    saved, native._mod = native._mod, None
    try:
        off = run()
    finally:
        native._mod = saved
    assert np.array_equal(on, off)
