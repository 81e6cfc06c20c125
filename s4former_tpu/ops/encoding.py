"""Encoding layer: learnable residual encoder (EncNet).

Rebuild of (reference: mmseg/ops/encoding.py:7-76) in NHWC flax: soft-assign
every pixel to K codewords by scaled L2 distance, aggregate residuals.
The reference's [B, N, K, C] expanded residual tensor is avoided: both the
scaled-L2 logits and the residual aggregation expand into einsums over
``x``/``codewords`` separately, so the peak memory is [B, N, K] instead of
[B, N, K, C].
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class Encoding(nn.Module):
    """Input [B, H, W, C] -> encoded residuals [B, num_codes, C]."""
    num_codes: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        k = self.num_codes
        std = 1.0 / ((k * c) ** 0.5)
        # params hold the EFFECTIVE values (torch layout) so checkpoint
        # ingestion maps 1:1; init matches the reference's uniform ranges
        codewords = self.param(
            'codewords',
            lambda key, shape: jax.random.uniform(key, shape,
                                                  jnp.float32, -std, std),
            (k, c))
        scale = self.param(
            'scale',
            lambda key, shape: jax.random.uniform(key, shape,
                                                  jnp.float32, -1.0, 0.0),
            (k,))
        feats = x.reshape(b, h * w, c).astype(jnp.float32)
        cw = codewords.astype(jnp.float32)
        # scaled_l2(x, cw) = scale_k * (|x|^2 - 2 x.cw_k + |cw_k|^2)
        x2 = jnp.sum(feats ** 2, axis=-1, keepdims=True)        # [B,N,1]
        c2 = jnp.sum(cw ** 2, axis=-1)                          # [K]
        xc = jnp.einsum('bnc,kc->bnk', feats, cw)               # [B,N,K]
        logits = scale * (x2 - 2.0 * xc + c2)
        assign = jax.nn.softmax(logits, axis=2)                 # [B,N,K]
        # aggregate residuals: sum_n a_nk (x_n - cw_k)
        agg_x = jnp.einsum('bnk,bnc->bkc', assign, feats)
        agg_c = jnp.sum(assign, axis=1)[..., None] * cw[None]
        return (agg_x - agg_c).astype(x.dtype)
