"""Backbone shape tests (mirrors reference test_vit.py / test_mit.py /
test_resnet.py strategy: shape assertions on random tensors)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import s4former_tpu.models  # noqa: F401
from s4former_tpu.registry import BACKBONES


def _run(cfg, img_shape):
    model = BACKBONES.build(cfg)
    img = jnp.asarray(np.random.RandomState(0).randn(*img_shape),
                      jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, img)
    return model.apply(variables, img)


def test_mit_shapes():
    outs = _run(dict(type='MixVisionTransformer', embed_dims=8,
                     num_layers=[1, 1, 1, 1], num_heads=[1, 2, 4, 8]),
                (1, 64, 64, 3))
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 8)
    assert outs[1].shape == (1, 8, 8, 16)
    assert outs[2].shape == (1, 4, 4, 40)
    assert outs[3].shape == (1, 2, 2, 64)


def test_mit_accepts_pasa_unconfidence_map():
    model = BACKBONES.build(dict(
        type='MixVisionTransformer', embed_dims=8,
        num_layers=[1, 1, 1, 1], num_heads=[1, 2, 4, 8]))
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init({'params': jax.random.PRNGKey(0)}, img)
    bias_map = jnp.ones((1, 64, 64)) * 5.0
    outs = model.apply(variables, img, attn_bias=bias_map)
    assert outs[3].shape == (1, 2, 2, 64)


def test_resnet50_shapes():
    outs = _run(dict(type='ResNet', depth=50, base_channels=8,
                     stem_channels=8), (1, 64, 64, 3))
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 32)
    assert outs[3].shape == (1, 2, 2, 256)


def test_resnet_dilated_output_stride_8():
    outs = _run(dict(type='ResNetV1c', depth=50, base_channels=8,
                     stem_channels=8, strides=(1, 2, 1, 1),
                     dilations=(1, 1, 2, 4)), (1, 64, 64, 3))
    # stages 3/4 dilated: spatial stays at 1/8
    assert outs[1].shape[1:3] == (8, 8)
    assert outs[2].shape[1:3] == (8, 8)
    assert outs[3].shape[1:3] == (8, 8)


def test_swin_shapes():
    outs = _run(dict(type='SwinTransformer', embed_dims=8,
                     depths=(1, 1, 1), num_heads=(1, 2, 4),
                     window_size=4), (1, 32, 32, 3))
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 8)
    assert outs[1].shape == (1, 4, 4, 16)
    assert outs[2].shape == (1, 2, 2, 32)


def test_backbones_ignore_semi_kwargs():
    """CNN/Swin students must accept the semi kwargs like the reference
    (resnet.py:663-665, swin.py:742-744)."""
    for cfg, shape in [
        (dict(type='ResNet', depth=18, base_channels=8, stem_channels=8),
         (1, 32, 32, 3)),
        (dict(type='SwinTransformer', embed_dims=8, depths=(1,),
              num_heads=(1,), window_size=4), (1, 32, 32, 3)),
    ]:
        model = BACKBONES.build(cfg)
        img = jnp.zeros(shape)
        variables = model.init({'params': jax.random.PRNGKey(0)}, img)
        out = model.apply(variables, img, attn_bias=None,
                          pos_mode='default', use_fdrop=False)
        assert len(out) >= 1


def test_unet_shapes():
    outs = _run(dict(type='UNet', base_channels=8, num_stages=3,
                     strides=(1, 1, 1), downsamples=(True, True)),
                (1, 32, 32, 3))
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 32)   # bottleneck
    assert outs[-1].shape == (1, 32, 32, 8)  # full-res decoder


def test_mobilenet_v2_shapes():
    outs = _run(dict(type='MobileNetV2', widen_factor=0.5), (1, 64, 64, 3))
    assert len(outs) == 4
    assert outs[0].shape[1:3] == (16, 16)
    assert outs[-1].shape[1:3] == (2, 2)


def test_mobilenet_v3_runs():
    # default arch is 'small' like the reference; 'large' here
    outs = _run(dict(type='MobileNetV3', arch='large',
                     out_indices=(1, 3, 15)), (1, 64, 64, 3))
    assert len(outs) == 3


def test_hrnet_shapes():
    extra = dict(
        stage1=dict(num_modules=1, num_branches=1, num_blocks=(1,),
                    num_channels=(8,)),
        stage2=dict(num_modules=1, num_branches=2, num_blocks=(1, 1),
                    num_channels=(8, 16)),
        stage3=dict(num_modules=1, num_branches=3, num_blocks=(1, 1, 1),
                    num_channels=(8, 16, 32)),
        stage4=dict(num_modules=1, num_branches=4,
                    num_blocks=(1, 1, 1, 1), num_channels=(8, 16, 32, 64)))
    outs = _run(dict(type='HRNet', extra=extra), (1, 64, 64, 3))
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 8)
    assert outs[1].shape == (1, 8, 8, 16)
    assert outs[2].shape == (1, 4, 4, 32)
    assert outs[3].shape == (1, 2, 2, 64)
