"""Compute-dtype (bf16) head logits: bounded divergence, f32 unchanged.

Round-4 byte cut: SETRUPHead/SegformerHead return logits in the module
compute dtype instead of casting to f32 before the deferred upsample —
the [B,512,512,C] f32 logit maps (x5 heads x fwd+bwd) were the step's
largest tensors. Consumers all upcast internally (cross_entropy.py:36,
pseudo.py:37, ncr.py:68, inference.py:71,103), so this test pins:

1. an f32-configured head still returns f32 (no behavior change on the
   parity-harness path);
2. a bf16 head returns bf16 and its CE loss / teacher max-prob stay
   within bf16 blend tolerance of the f32 reference path.
"""
import jax
import jax.numpy as jnp
import numpy as np

import s4former_tpu.models  # noqa: F401
from s4former_tpu.models.decode_heads.setr_up import SETRUPHead
from s4former_tpu.models.losses.cross_entropy import cross_entropy_loss
from s4former_tpu.semi.pseudo import extract_teacher_info


def _head(dtype):
    return SETRUPHead(in_channels=32, channels=16, num_classes=21,
                      in_index=0, num_convs=2, up_scale=2, kernel_size=3,
                      align_corners=False, dtype=dtype)


def _logits(dtype, x):
    head = _head(dtype)
    variables = head.init(jax.random.PRNGKey(0), [x])
    return head.apply(variables, [x])


def test_f32_head_returns_f32():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 32),
                    jnp.float32)
    out = _logits(jnp.float32, x)
    assert out.dtype == jnp.float32
    assert out.shape == (2, 64, 64, 21)


def test_bf16_head_logits_bounded_vs_f32():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(2, 16, 16, 32), jnp.float32)
    out32 = _logits(jnp.float32, x)
    out16 = _logits(jnp.bfloat16, x)
    assert out16.dtype == jnp.bfloat16

    label = jnp.asarray(r.randint(0, 21, (2, 64, 64)), jnp.int32)
    l32 = float(cross_entropy_loss(out32, label))
    l16 = float(cross_entropy_loss(out16, label))
    # bf16 has ~2^-8 relative mantissa; the 2-conv + upsample pipeline
    # accumulates a few ULPs of blend error on O(1) logits
    assert abs(l16 - l32) / max(abs(l32), 1e-6) < 2e-2, (l16, l32)

    t32 = extract_teacher_info(out32, 0.95)
    t16 = extract_teacher_info(out16, 0.95)
    np.testing.assert_allclose(np.asarray(t16.max_prob),
                               np.asarray(t32.max_prob), atol=2e-2)
    agree = np.mean(np.asarray(t16.hard_label) == np.asarray(t32.hard_label))
    assert agree > 0.98, agree
