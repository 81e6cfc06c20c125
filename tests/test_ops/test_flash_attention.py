"""Flash-attention kernel vs XLA reference.

``flash_attention(interpret=None)`` auto-enables the Pallas interpreter on
non-TPU backends, so BOTH the forward and the custom-VJP backward kernels
execute for real here (on the CPU test mesh) and compiled on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s4former_tpu.ops.attention import dot_product_attention
from s4former_tpu.ops.flash_attention import flash_attention

B, L, H, D = 2, 256, 4, 64


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


@pytest.fixture(scope='module')
def qkvb():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = _rand(ks[0], (B, L, H, D))
    k = _rand(ks[1], (B, L, H, D))
    v = _rand(ks[2], (B, L, H, D))
    bias = _rand(ks[3], (B, 1, L, L))
    return q, k, v, bias


def _flash(q, k, v, bias):
    return flash_attention(q, k, v, bias, blk_q=128, blk_k=128)


@pytest.mark.slow
def test_forward_matches_xla(qkvb):
    q, k, v, bias = qkvb
    ref, _ = dot_product_attention(q, k, v, bias)
    out = _flash(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_forward_no_bias_and_padding(qkvb):
    q, k, v, _ = qkvb
    # odd length exercises the in-kernel key masking / padding path
    q2, k2, v2 = q[:, :130], k[:, :130], v[:, :130]
    ref, _ = dot_product_attention(q2, k2, v2, None)
    out = _flash(q2, k2, v2, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize('with_bias', [True, False],
                         ids=['pasa_bias', 'no_bias'])
def test_backward_matches_xla(qkvb, with_bias):
    q, k, v, bias = qkvb
    bias = bias if with_bias else None

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, bias)
        return jnp.sum(out ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f'd{name}')


@pytest.mark.slow
def test_backward_odd_length(qkvb):
    """Gradients through the padded/masked path (L not a block multiple)."""
    q, k, v, _ = qkvb
    q2, k2, v2 = q[:, :130], k[:, :130], v[:, :130]

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, None) ** 2)

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, None)
        return jnp.sum(out ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q2, k2, v2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f'd{name}')


@pytest.mark.slow
@pytest.mark.parametrize('with_bias', [True, False],
                         ids=['pasa_bias', 'no_bias'])
def test_backward_fused_single_block(qkvb, with_bias):
    """Default (adaptive) blocks at L=256 put the whole sequence in one
    (q, k) block, which dispatches the FUSED single-pass backward kernel
    (the flagship L=1025 schedule) instead of the two-kernel path."""
    q, k, v, bias = qkvb
    bias = bias if with_bias else None

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, bias)
        return jnp.sum(out ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f'd{name}')


@pytest.mark.slow
def test_backward_fused_odd_length(qkvb):
    """Fused-kernel padded row/col masking: L=130 pads to one 256 block;
    dk/dv must be clean of padded-row contributions and dq of padded-col
    ones (both masks live in the ONE fused score matrix)."""
    q, k, v, _ = qkvb
    q2, k2, v2 = q[:, :130], k[:, :130], v[:, :130]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None) ** 2)

    def loss_ref(q, k, v):
        out, _ = dot_product_attention(q, k, v, None)
        return jnp.sum(out ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q2, k2, v2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f'd{name}')


def test_differentiable_bias_contract(qkvb):
    """Guard: the flash path's bias is non-differentiable by API contract —
    stop_gradient is applied inside flash_attention (bias grads are exactly
    zero, never silently wrong), and a caller that NEEDS bias gradients
    (learnable-sigma ablation) must pass bias_differentiable=True, which
    raises and directs to the XLA path."""
    q, k, v, bias = qkvb

    with pytest.raises(NotImplementedError, match='XLA'):
        flash_attention(q, k, v, bias, bias_differentiable=True)

    def loss(b):
        return jnp.sum(_flash(q, k, v, b) ** 2)

    g = jax.grad(loss)(bias)
    assert float(jnp.max(jnp.abs(g))) == 0.0


@pytest.mark.parametrize('fused', [True, False],
                         ids=['fused_single_block', 'two_kernel'])
def test_padded_with_bias_mask_folded(qkvb, fused):
    """Round-5 mask folding: with a bias AND a non-block-multiple L (the
    flagship L=1025 shape class) the wrapper -inf-pads the bias tile
    instead of running in-kernel iota/where masks. Forward and all three
    gradients must still match XLA at the exact length — in both the
    fused-single-block and the two-kernel backward schedules."""
    q, k, v, bias = qkvb
    n = 130
    q2, k2, v2 = q[:, :n], k[:, :n], v[:, :n]
    b2 = bias[:, :, :n, :n]
    kw = {} if fused else dict(blk_q=128, blk_k=128)

    out = flash_attention(q2, k2, v2, b2, **kw)
    ref, _ = dot_product_attention(q2, k2, v2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, b2, **kw) ** 2)

    def loss_ref(q, k, v):
        o, _ = dot_product_attention(q, k, v, b2)
        return jnp.sum(o ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q2, k2, v2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3,
                                   err_msg=f'd{name}')
