"""Multi-head attention compute path.

Replaces torch ``nn.MultiheadAttention`` inside the reference's ViT encoder
layer (reference: mmseg/models/backbones/vit.py:100-127) with a TPU-native
implementation:

- ``dot_product_attention``: XLA einsum path; always available, can return
  the attention probabilities (the reference depends on a locally patched
  mmcv exposing ``.self_attn`` for visualization — vit.py:550; here it is an
  explicit, documented debug output instead of a hidden side effect).
- A fused Pallas flash-attention path (ops/flash_attention.py) is used for
  the hot training/inference path when shapes allow; both accept an additive
  logit bias, which is how PASA injects per-patch confidence (vit.py:519-541).

Shapes: q,k,v are [B, L, H, D] (batch, length, heads, head_dim);
bias is broadcastable to [B, H, Lq, Lk] (PASA uses [B, 1, L, L]).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def dot_product_attention(
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        bias: Optional[jax.Array] = None,
        return_probs: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """XLA attention. Returns (out [B,L,H,D], probs [B,H,Lq,Lk] or None).

    Logits are accumulated in f32 regardless of input dtype (bf16-safe).
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    return (out, probs) if return_probs else (out, None)


def multi_head_attention(
        q: jax.Array,
        k: jax.Array,
        v: jax.Array,
        bias: Optional[jax.Array] = None,
        return_probs: bool = False,
        use_flash: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Dispatch to the fused Pallas kernel or the XLA path.

    The Pallas kernel never materializes [B,H,L,L] probabilities, so any
    ``return_probs=True`` request falls back to XLA (debug/visualization
    only — mirrors the reference where attention capture is a side path).
    """
    if return_probs or not use_flash or not _flash_available():
        return dot_product_attention(q, k, v, bias, return_probs)
    from s4former_tpu.ops.flash_attention import flash_attention
    return flash_attention(q, k, v, bias=bias), None


_FLASH_OK = None


def _flash_available() -> bool:
    """Pallas TPU kernels require a TPU backend; the CPU test mesh and any
    virtual-device dry run take the XLA path."""
    global _FLASH_OK
    if _FLASH_OK is None:
        try:
            _FLASH_OK = jax.default_backend() == 'tpu'
        except Exception:
            _FLASH_OK = False
    return _FLASH_OK
