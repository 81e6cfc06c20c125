"""NCR: Negative Class Ranking consistency loss.

Rebuild of the reference's per-class python loop
(reference: mmseg/models/segmentors/encoder_decoder.py:936-1040, 5 modes,
plus the sup-only variant at :443-474) as fixed-shape masked math — the
reference loops over 21 classes with boolean indexing, a GPU-sync-heavy
scalar loop; here it is a single batched computation.

Semantics: for every pixel whose (pseudo/ground-truth) label is class i,
take the student and teacher logits, drop class i, softmax over the
remaining C-1 classes, and accumulate either the pairwise L2 distance or
KL(teacher || log student) summed over pixels; normalize by B*H*W (NOT by
the number of valid pixels — reference :952-954).

Fixed-shape trick: "drop class i then softmax" == softmax with class i's
logit masked to -inf; the L2/KL over the C-1 remaining entries equals the
same reduction over all C entries because the masked entry is exactly 0 in
both distributions. Ordering of classes inside the reduced vector does not
matter for either distance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30


def _excluded_softmax(logits: Array, label: Array, num_classes: int) -> Array:
    """softmax over classes != label[pixel]; the label class gets prob 0.

    logits [..., C] f32, label [...] int (may contain 255 -> handled by
    caller's valid mask).
    """
    safe = jnp.clip(label, 0, num_classes - 1)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logits.dtype)
    masked = jnp.where(onehot > 0, _NEG_INF, logits)
    return jax.nn.softmax(masked, axis=-1)


def ncr_loss(student_logits: Array,
             teacher_logits: Array,
             label: Array,
             num_classes: int,
             mode: str = 'unsup_only') -> Array:
    """NCR loss. logits [B, H, W, C]; label [B, H, W] int (255 ignored by
    construction: 255 pixels match no class in the reference loop, so they
    are excluded here too).

    Modes (encoder_decoder.py:936-1040):
    - 'unsup_only' / 'both': L2 distance between excluded-softmaxes.
    - 'all': L2 between FULL softmaxes (no exclusion).
    - 'kl': KL(teacher || student) on full softmaxes.
    - 'unsup_only_kl' / 'reweight_unsup_only_kl': KL on excluded softmaxes
      (reweight adds a final x0.5).
    - 'sup': the SUPERVISED-branch loop (encoder_decoder.py:443-474):
      KL(teacher || student) on excluded softmaxes PLUS the pairwise L2 —
      the reference adds pdist unconditionally after the KL branch
      (:468-472, the "double-pdist" quirk), so the effective per-class
      contribution is KL_sum + L2_sum. Reproduced deliberately.
    The reference's per-class KL>1e6 fallback-to-L2 is a numerical guard
    for empty/degenerate classes; with the fixed-shape masked formulation
    empty classes contribute exactly 0, so the guard is unnecessary (the
    divergence from the reference is documented, not accidental).
    """
    sl = student_logits.astype(jnp.float32)
    tl = teacher_logits.astype(jnp.float32)
    valid = (label != 255) & (label < num_classes)
    validf = valid.astype(jnp.float32)

    if mode == 'all' or mode == 'kl':
        sp = jax.nn.softmax(sl, axis=-1)
        tp = jax.nn.softmax(tl, axis=-1)
    else:
        sp = _excluded_softmax(sl, label, num_classes)
        tp = _excluded_softmax(tl, label, num_classes)

    eps = 1e-12
    if mode in ('unsup_only', 'both', 'all'):
        # pairwise L2 distance per pixel, summed
        per_pixel = jnp.sqrt(jnp.sum((sp - tp) ** 2, axis=-1) + 1e-12)
    elif mode in ('kl', 'unsup_only_kl', 'reweight_unsup_only_kl'):
        # F.kl_div(log(sp), tp, reduction='sum') = sum tp*(log tp - log sp)
        per_pixel = jnp.sum(
            tp * (jnp.log(tp + eps) - jnp.log(sp + eps)), axis=-1)
    elif mode == 'sup':
        kl = jnp.sum(tp * (jnp.log(tp + eps) - jnp.log(sp + eps)), axis=-1)
        l2 = jnp.sqrt(jnp.sum((sp - tp) ** 2, axis=-1) + 1e-12)
        per_pixel = kl + l2
    else:
        raise ValueError(f'unknown NCR mode {mode}')

    total = jnp.sum(per_pixel * validf)
    denom = jnp.asarray(label.size, jnp.float32)  # B*H*W (reference :952)
    loss = total / denom
    if mode == 'reweight_unsup_only_kl':
        loss = 0.5 * loss
    return loss
