"""DPT / DAFormer / PointRend / K-Net head tests."""
import jax
import jax.numpy as jnp
import numpy as np

import s4former_tpu.models  # noqa: F401
from s4former_tpu.registry import HEADS

B = 2


def _pyramid():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    return [jax.random.normal(k, (B, 8, 8, 32)) for k in ks]


def test_dpt_head():
    head = HEADS.build(dict(type='DPTHead', in_channels=(32,) * 4,
                            channels=16, num_classes=5,
                            post_process_channels=(8, 16, 24, 32),
                            in_index=(0, 1, 2, 3)))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    # reassemble scales 4/2/1/0.5 then fusion doubles each level: the
    # finest level (8*4=32) doubled once more -> 64
    assert out.shape[0] == B and out.shape[-1] == 5
    assert out.shape[1] == 64
    assert np.isfinite(np.asarray(out)).all()


def test_daformer_head():
    # reference config surface: decoder_params (daformer_head.py:126-156)
    head = HEADS.build(dict(
        type='DAFormerHead', in_channels=(32,) * 4, channels=16,
        num_classes=5, in_index=(0, 1, 2, 3),
        decoder_params=dict(
            embed_dims=16, embed_cfg=dict(type='mlp'),
            embed_neck_cfg='same_as_embed_cfg',
            fusion_cfg=dict(type='aspp', sep=True, dilations=(1, 2),
                            pool=False))))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, 8, 8, 5)


def test_point_head_refine_and_train_points():
    head = HEADS.build(dict(type='PointHead', in_channels=(32,),
                            channels=16, num_classes=5, num_points=16,
                            num_fcs=2, in_index=(0,)))
    feats = _pyramid()[:1]
    prev = jax.random.normal(jax.random.PRNGKey(3), (B, 8, 8, 5))
    inputs = feats + [prev]
    v = head.init({'params': jax.random.PRNGKey(0)}, inputs)
    # test path: one subdivision round -> 2x refined logits
    out = head.apply(v, inputs, train=False)
    assert out.shape == (B, 16, 16, 5)
    # refined logits only differ from the plain upsample at <=num_points
    from s4former_tpu.ops.resize import resize_bilinear
    up = np.asarray(resize_bilinear(prev, (16, 16), False))
    diff = (np.abs(np.asarray(out) - up).max(-1) > 1e-6).sum(axis=(1, 2))
    assert (diff <= 16).all() and (diff > 0).any()
    # train path: importance-sampled points -> point logits
    pts = head.apply(v, method='sample_points_train',
                     rng=jax.random.PRNGKey(1), prev_logits=prev)
    assert pts.shape == (B, 16, 2)
    assert float(jnp.min(pts)) >= 0 and float(jnp.max(pts)) <= 1
    pl = head.apply(v, inputs, points=pts)
    assert pl.shape == (B, 16, 5)


def test_knet_iterative_head():
    head = HEADS.build(dict(type='IterativeDecodeHead', in_channels=32,
                            channels=16, num_classes=5, num_stages=2,
                            num_heads=4, in_index=1))
    feats = _pyramid()
    v = head.init({'params': jax.random.PRNGKey(0)}, feats)
    out = head.apply(v, feats, train=False)
    assert out.shape == (B, 8, 8, 5)
    assert np.isfinite(np.asarray(out)).all()
    # kernels actually refine: stage params exist per stage (reference
    # module names since the round-4 exact rebuild)
    assert 'kernel_update_head_0' in v['params']
    assert 'kernel_update_head_1' in v['params']
    assert 'kernel_generate_head' in v['params']


def test_point_sample_matches_torch_grid_sample():
    import torch
    from s4former_tpu.ops.point_sample import point_sample
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 7, 3).astype(np.float32)
    pts = rng.uniform(0.05, 0.95, (2, 11, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(x), jnp.asarray(pts)))
    # torch reference: grid_sample with align_corners=False, like mmcv
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    grid = torch.from_numpy(pts * 2 - 1).unsqueeze(1)   # [B,1,P,2] xy
    ref = torch.nn.functional.grid_sample(
        tx, grid, align_corners=False)[:, :, 0].permute(0, 2, 1)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)
