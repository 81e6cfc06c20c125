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
