"""PASA: Pseudo-label-confidence-driven Additive Self-Attention bias.

Rebuild of the reference's in-backbone mask construction
(reference: mmseg/models/backbones/vit.py:519-541 and the per-patch
unconfidence pooling in encoder_decoder.py:547-567) as pure fixed-shape
functions producing an additive logit bias [B, 1, L+1, L+1] that the
backbone/attention kernel consumes directly.

Semantics preserved exactly:
- per-patch unconfidence = mean over the patch's pixels of (1 - conf_mask)
  (encoder_decoder.py:550-553);
- bias value depends only on the KEY patch: bias[b, q, k] = w * unconf[b, k]
  (attention toward unconfident patches is *increased*);
- cls token gets unconfidence 0 (vit.py:521-522);
- adaptive: the rows (query positions) of the 50% most-confident patches are
  zeroed — "if the patch is more confident than half, don't encourage it to
  be changed" (vit.py:523-529). The reference uses torch.topk(largest=False);
  we use an argsort-rank selection which picks the same set up to ties.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def patch_unconfidence(conf_mask: Array, patch_size: int) -> Array:
    """[B, H, W] {0,1} confidence mask -> [B, h*w] mean unconfidence per
    patch_size x patch_size patch (raster order)."""
    b, h, w = conf_mask.shape
    ph, pw = h // patch_size, w // patch_size
    unconf = 1.0 - conf_mask.astype(jnp.float32)
    unconf = unconf.reshape(b, ph, patch_size, pw, patch_size)
    return jnp.mean(unconf, axis=(2, 4)).reshape(b, ph * pw)


def build_pasa_bias(unconf: Array,
                    attn_mask_weight: float,
                    adaptive: bool,
                    with_cls_token: bool = True,
                    layer_scales: Optional[Array] = None) -> Array:
    """unconf [B, L] in [0,1] -> additive bias [B, 1, L(+1), L(+1)].

    ``layer_scales`` (optional, [num_layers]) reproduces the
    ``w_PatchRelativeAttention`` learnable per-layer sigma ablation
    (vit.py:130-134, 540-541); when given, returns [num_layers, B, 1, T, T].
    """
    b, l = unconf.shape
    if with_cls_token:
        vec = jnp.concatenate(
            [jnp.zeros((b, 1), unconf.dtype), unconf], axis=1)
    else:
        vec = unconf
    t = vec.shape[1]
    # bias rows all equal the key-unconfidence vector
    bias = jnp.broadcast_to(vec[:, None, :], (b, t, t))
    if adaptive:
        # zero the query-rows of the most-confident half of the PATCHES
        # (cls row is never zeroed: reference offsets indices by +1,
        # vit.py:526-528)
        k = int(0.5 * l)
        order = jnp.argsort(unconf, axis=1)  # ascending: most confident first
        ranks = jnp.argsort(order, axis=1)
        row_zero_patches = ranks < k  # [B, L]
        if with_cls_token:
            row_zero = jnp.concatenate(
                [jnp.zeros((b, 1), bool), row_zero_patches], axis=1)
        else:
            row_zero = row_zero_patches
        bias = jnp.where(row_zero[:, :, None], 0.0, bias)
    bias = bias * attn_mask_weight
    bias = bias[:, None, :, :]  # head axis (identical per head, vit.py:535)
    if layer_scales is not None:
        return bias[None] * layer_scales[:, None, None, None, None]
    return bias


def pasa_bias_from_conf_mask(conf_mask: Array,
                             patch_size: int,
                             attn_mask_weight: float,
                             adaptive: bool,
                             with_cls_token: bool = True) -> Array:
    """Full pipeline: image-resolution confidence mask -> attention bias."""
    unconf = patch_unconfidence(conf_mask, patch_size)
    return build_pasa_bias(unconf, attn_mask_weight, adaptive, with_cls_token)


def mit_stage_bias(unconf: Array, attn_mask_weight: float,
                   adaptive: bool) -> Array:
    """MiT per-stage PASA bias from POOLED per-token unconfidence
    (reference mit.py:464-475). ``unconf`` [B, L] in [0, 1] ->
    [B, 1, L, L] additive bias.

    Non-adaptive: every query row equals the key-unconfidence vector.
    Adaptive: the key vector is INVERTED (1 - unconf = confidence,
    mit.py:470 ``attn_mask_A = 1 - attn_mask_A``) and the query rows of
    the most-confident half of tokens are zeroed. The reference computes
    the top-k over ``attn_mask[:, 1:]`` but indexes rows with the SLICE
    positions (no +1 — a ViT-cls leftover, mit.py:469-471); replicated
    as-is and documented.
    """
    b, l = unconf.shape
    if adaptive:
        vec = 1.0 - unconf
        bias = jnp.broadcast_to(vec[:, None, :], (b, l, l))
        k = int(0.5 * (l - 1))
        sliced = unconf[:, 1:]
        order = jnp.argsort(sliced, axis=1)   # ascending: most confident
        ranks = jnp.argsort(order, axis=1)
        zero_slice = ranks < k                # positions within the slice
        row_zero = jnp.concatenate(
            [zero_slice, jnp.zeros((b, 1), bool)], axis=1)  # ref quirk:
        # slice positions used as row indices directly (rows 0..l-2)
        bias = jnp.where(row_zero[:, :, None], 0.0, bias)
    else:
        bias = jnp.broadcast_to(unconf[:, None, :], (b, l, l))
    return (bias * attn_mask_weight)[:, None, :, :]
