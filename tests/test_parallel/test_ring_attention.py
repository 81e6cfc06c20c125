"""Ring attention (context parallelism) == dense attention, fwd + grad,
with and without the PASA additive bias. 8-device ('ctx',) CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s4former_tpu.ops.attention import dot_product_attention
from s4former_tpu.parallel.ring_attention import (make_cp_mesh,
                                                  ring_attention_sharded)

B, L, H, D = 2, 32, 2, 8


def _qkv(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (B, L, H, D))
    k = jax.random.normal(ks[1], (B, L, H, D))
    v = jax.random.normal(ks[2], (B, L, H, D))
    bias = 3.0 * jax.random.normal(ks[3], (B, H, L, L))
    return q, k, v, bias


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
@pytest.mark.parametrize('with_bias', [False, True])
def test_ring_attention_matches_dense(with_bias):
    q, k, v, bias = _qkv(0)
    bias = bias if with_bias else None
    mesh = make_cp_mesh(8)
    ref, _ = dot_product_attention(q, k, v, bias)
    got = jax.jit(
        lambda q, k, v, b: ring_attention_sharded(q, k, v, mesh, bias=b),
        static_argnames=())(q, k, v, bias) if with_bias else jax.jit(
        lambda q, k, v: ring_attention_sharded(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_ring_attention_grads_match_dense():
    q, k, v, bias = _qkv(1)
    mesh = make_cp_mesh(8)
    tgt = jax.random.normal(jax.random.PRNGKey(5), (B, L, H, D))

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, bias)
        return jnp.mean((out - tgt) ** 2)

    def loss_ring(q, k, v):
        out = ring_attention_sharded(q, k, v, mesh, bias=bias)
        return jnp.mean((out - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    l_r, g_r = jax.jit(jax.value_and_grad(loss_ring,
                                          argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(float(l_r), float(l_ref), rtol=1e-5)
    for a, b in zip(g_r, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
