"""API-layer end-to-end tests (reference: tests/test_apis/,
tests/test_inference.py): init a segmentor from a config file, run
inference on an image, TTA, attention capture."""
import os.path as osp
import textwrap

import jax
import numpy as np
import pytest
from PIL import Image

import s4former_tpu.models  # noqa: F401
from s4former_tpu.apis import (init_segmentor, inference_segmentor,
                               inference_segmentor_tta,
                               inference_segmentor_with_attn,
                               inference_with_teacher_pasa,
                               show_result_pyplot)

TINY_CFG = """
crop_size = (64, 64)
img_norm_cfg = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True)
model = dict(
    type='EncoderDecoder',
    backbone=dict(
        type='VisionTransformer', img_size=(64, 64), patch_size=16,
        embed_dims=32, num_layers=2, num_heads=4, out_indices=(0, 1),
        use_flash=False),
    decode_head=dict(
        type='SETRUPHead', in_channels=32, channels=16, num_classes=5,
        in_index=1, num_convs=2, up_scale=2, kernel_size=3),
    test_cfg=dict(mode='whole'))
"""


@pytest.fixture(scope='module')
def seg(tmp_path_factory):
    d = tmp_path_factory.mktemp('cfg')
    cfg_path = d / 'tiny.py'
    cfg_path.write_text(textwrap.dedent(TINY_CFG))
    return init_segmentor(str(cfg_path))


@pytest.fixture(scope='module')
def image(tmp_path_factory):
    d = tmp_path_factory.mktemp('img')
    arr = np.random.RandomState(0).randint(0, 255, (50, 70, 3),
                                           dtype=np.uint8)
    path = d / 'demo.png'
    Image.fromarray(arr).save(path)
    return str(path), arr


def test_inference_from_path_and_array(seg, image):
    path, arr = image
    seg_map = inference_segmentor(seg, path)
    assert seg_map.shape == (50, 70)
    assert seg_map.dtype == np.int32
    seg_map2 = inference_segmentor(seg, arr)
    np.testing.assert_array_equal(seg_map, seg_map2)


def test_show_result(seg, image, tmp_path):
    path, arr = image
    seg_map = inference_segmentor(seg, arr)
    out = show_result_pyplot(seg, arr, seg_map,
                             out_file=str(tmp_path / 'vis.png'))
    assert out.shape == (50, 70, 3)
    assert osp.isfile(tmp_path / 'vis.png')


def test_inference_with_attn(seg, image):
    _, arr = image
    seg_map, logits, attns = inference_segmentor_with_attn(seg, arr)
    assert seg_map.shape == (50, 70)
    assert len(attns) == 2  # one per out_index
    # [B, heads, patches, patches] with cls stripped. Exact eval (round 5)
    # pads each dim only to the ViT AdaptivePadding divisor (16):
    # 50x70 -> 64x80 -> 4x5 grid = 20 patch tokens.
    assert attns[0].shape == (1, 4, 20, 20)
    # rows of attention (before cls-strip) summed to 1; stripped rows < 1
    assert np.all(attns[0] >= 0)


def test_teacher_pasa_inference(seg, image):
    _, arr = image
    seg_map = inference_with_teacher_pasa(seg, arr, seg.variables,
                                          patch_size=16)
    assert seg_map.shape == (50, 70)


def test_tta(seg, image):
    _, arr = image
    seg_map = inference_segmentor_tta(seg, arr, ratios=(1.0, 1.5),
                                      flip=True)
    assert seg_map.shape == (50, 70)
