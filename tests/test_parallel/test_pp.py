"""Pipeline parallelism: GPipe schedule == sequential stack, fwd + grad.

(data=2, pipe=4) over the 8-device CPU mesh; the layer is the real ViT
TransformerEncoderLayer (flash off — CPU), params stacked like the
backbone's scan layout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s4former_tpu.models.backbones.vit import TransformerEncoderLayer
from s4former_tpu.parallel.pp import make_pp_mesh, pipeline_apply

L, C, HEADS, T = 8, 16, 2, 17
M = 4  # microbatches


def _setup():
    layer = TransformerEncoderLayer(
        embed_dims=C, num_heads=HEADS, feedforward_channels=4 * C,
        use_flash=False)
    keys = jax.random.split(jax.random.PRNGKey(0), L)
    stacked = jax.vmap(
        lambda k: layer.init(k, jnp.zeros((1, T, C)))['params'])(keys)

    def layer_fn(p, x):
        out, _ = layer.apply({'params': p}, x)
        return out

    return layer_fn, stacked


def _sequential(layer_fn, stacked, x):
    def body(c, p1):
        return layer_fn(p1, c), None
    out, _ = jax.lax.scan(body, x, stacked)
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_pipeline_matches_sequential():
    layer_fn, stacked = _setup()
    mesh = make_pp_mesh(num_stages=4, n_devices=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, T, C))

    ref = _sequential(layer_fn, stacked, x)
    got = jax.jit(lambda p, x: pipeline_apply(layer_fn, p, x, mesh, M))(
        stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_pipeline_grads_match_sequential():
    layer_fn, stacked = _setup()
    mesh = make_pp_mesh(num_stages=4, n_devices=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, T, C))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (8, T, C))

    def loss_seq(p):
        return jnp.mean((_sequential(layer_fn, p, x) - tgt) ** 2)

    def loss_pp(p):
        return jnp.mean((pipeline_apply(layer_fn, p, x, mesh, M) - tgt)
                        ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_seq)(stacked)
    l_pp, g_pp = jax.jit(jax.value_and_grad(loss_pp))(stacked)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_pp = jax.tree_util.tree_leaves(g_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_pipeline_bubble_independence():
    """Output is invariant to the microbatch count (schedule-only knob)."""
    layer_fn, stacked = _setup()
    mesh = make_pp_mesh(num_stages=4, n_devices=8)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, T, C))
    a = pipeline_apply(layer_fn, stacked, x, mesh, 2)
    b = pipeline_apply(layer_fn, stacked, x, mesh, 4)
    # microbatch shape changes XLA's fusion tiling -> f32 noise only
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------- 3-D composition
from s4former_tpu.parallel.pp import make_pp_tp_mesh, pipeline_apply_tp


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_pipeline_tp_matches_sequential():
    """data=2 x pipe=2 x model=2: the manual-Megatron block inside the
    GPipe schedule reproduces the sequential flax stack."""
    layer_fn, stacked = _setup()
    mesh = make_pp_tp_mesh(num_stages=2, model_parallel=2, n_devices=8)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, T, C))

    ref = _sequential(layer_fn, stacked, x)
    got = jax.jit(lambda p, x: pipeline_apply_tp(p, x, mesh, M, HEADS))(
        stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_pipeline_tp_grads_match_sequential():
    layer_fn, stacked = _setup()
    mesh = make_pp_tp_mesh(num_stages=2, model_parallel=2, n_devices=8)
    x = jax.random.normal(jax.random.PRNGKey(6), (8, T, C))
    tgt = jax.random.normal(jax.random.PRNGKey(7), (8, T, C))

    def loss_seq(p):
        return jnp.mean((_sequential(layer_fn, p, x) - tgt) ** 2)

    def loss_3d(p):
        return jnp.mean((pipeline_apply_tp(p, x, mesh, M, HEADS) - tgt)
                        ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_seq)(stacked)
    l_3d, g_3d = jax.jit(jax.value_and_grad(loss_3d))(stacked)
    np.testing.assert_allclose(float(l_3d), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_3d),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_pipeline_tp_sequence_parallel_matches_sequential():
    """Megatron-SP inside the 3-D composition: inter-block activations
    sequence-sharded over 'model' (all-gather before the column matmuls,
    reduce-scatter after the row matmuls) — numerics unchanged. L=16
    (L % model_parallel == 0 required)."""
    layer_fn, stacked = _setup()
    mesh = make_pp_tp_mesh(num_stages=2, model_parallel=2, n_devices=8)
    x = jax.random.normal(jax.random.PRNGKey(8), (8, 16, C))

    ref = _sequential(layer_fn, stacked, x)
    got = jax.jit(lambda p, x: pipeline_apply_tp(
        p, x, mesh, M, HEADS, sequence_parallel=True))(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # grads too
    tgt = jax.random.normal(jax.random.PRNGKey(9), (8, 16, C))

    def loss_seq(p):
        return jnp.mean((_sequential(layer_fn, p, x) - tgt) ** 2)

    def loss_sp(p):
        return jnp.mean((pipeline_apply_tp(
            p, x, mesh, M, HEADS, sequence_parallel=True) - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_seq)(stacked)
    l_sp, g_sp = jax.jit(jax.value_and_grad(loss_sp))(stacked)
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
