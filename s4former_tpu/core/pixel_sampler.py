"""OHEM pixel sampler (reference: mmseg/core/seg/sampler/
ohem_pixel_sampler.py, pluggable via head cfg decode_head.py:102-105).

Functional form: returns per-pixel weights (1 keep / 0 drop) instead of the
reference's index selection — fixed-shape for TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from s4former_tpu.registry import MODELS


@MODELS.register_module()
class OHEMPixelSampler:
    def __init__(self, thresh: float = 0.7, min_kept: int = 100000,
                 context=None):
        self.thresh = thresh
        self.min_kept = min_kept

    def __call__(self, seg_logits: jax.Array, seg_label: jax.Array,
                 ignore_index: int = 255) -> jax.Array:
        """seg_logits [..., C], seg_label [...]; returns f32 weights."""
        probs = jax.nn.softmax(seg_logits.astype(jnp.float32), axis=-1)
        valid = seg_label != ignore_index
        safe = jnp.where(valid, seg_label, 0).astype(jnp.int32)
        tgt = jnp.take_along_axis(probs, safe[..., None], -1)[..., 0]
        hard = (tgt < self.thresh) & valid
        order = jnp.where(valid, tgt, jnp.inf).reshape(-1)
        rank = jnp.argsort(jnp.argsort(order)).reshape(seg_label.shape)
        kept = hard | ((rank < self.min_kept) & valid)
        return kept.astype(jnp.float32)
