"""Resize parity vs torch F.interpolate (the reference's resize wrapper,
mmseg/ops/wrappers.py:8-52). torch (CPU) is the oracle."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from s4former_tpu.ops.resize import resize, resize_bilinear, resize_nearest


@pytest.mark.parametrize('in_hw,out_hw', [
    ((32, 32), (64, 64)), ((32, 32), (512, 512)), ((17, 23), (40, 50)),
    ((64, 64), (32, 32)), ((512, 512), (375, 500)),
])
@pytest.mark.parametrize('align_corners', [False, True])
def test_bilinear_matches_torch(in_hw, out_hw, align_corners):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(xt, size=out_hw, mode='bilinear',
                        align_corners=align_corners)
    ref = ref.permute(0, 2, 3, 1).numpy()
    # float32 accumulation order differs from torch at large downscales;
    # 1.5e-4 absolute on ~4-magnitude values is numerically identical
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=5e-4)


@pytest.mark.parametrize('in_hw,out_hw', [
    ((32, 32), (512, 512)), ((512, 512), (32, 32)), ((17, 23), (40, 50)),
])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randint(0, 255, size=(2, *in_hw)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x)[:, None]
    ref = F.interpolate(xt, size=out_hw, mode='nearest')[:, 0].numpy()
    np.testing.assert_array_equal(ours, ref)


def test_resize_wrapper_scale_factor():
    x = jnp.ones((1, 8, 8, 4))
    y = resize(x, scale_factor=2, mode='bilinear', align_corners=False)
    assert y.shape == (1, 16, 16, 4)
    lab = jnp.zeros((2, 8, 8), jnp.int32)
    y2 = resize(lab, size=(16, 16), mode='nearest')
    assert y2.shape == (2, 16, 16) and y2.dtype == jnp.int32
