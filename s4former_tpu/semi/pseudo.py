"""Teacher pseudo-label extraction and the pseudo CE loss.

Rebuild of ``extract_teacher_info[_ema]`` and ``compute_pseudo_loss``
(reference: mmseg/models/segmentors/encoder_decoder.py:852-935) as pure
functions over logits. Fixed-shape throughout; the reference's boolean
255-assignment becomes a ``where``.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from s4former_tpu.models.losses.cross_entropy import \
    softmax_cross_entropy_with_ignore

Array = jax.Array


class TeacherInfo(NamedTuple):
    seg_logits: Array        # [B, H, W, C] raw teacher logits
    hard_label: Array        # [B, H, W] int32 argmax (255 where unconfident)
    conf_mask: Array         # [B, H, W] int32 {0,1}
    max_prob: Array          # [B, H, W] f32 max softmax prob
    soft_label: Optional[Array] = None  # [B, H, W, C] when unsup_soft


def extract_teacher_info(seg_logits: Array,
                         unsup_confidence: float,
                         unsup_temperature: float = 1.0,
                         unsup_soft: bool = False) -> TeacherInfo:
    """(encoder_decoder.py:875-904). The hard label always comes from the
    UN-tempered softmax (reference :891); temperature only affects the soft
    label. The reference applies temperature as logits**(1/T) — a literal
    power on raw logits (:883) — reproduced as-is."""
    logits = seg_logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    max_prob = jnp.max(probs, axis=-1)
    hard = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    conf = (max_prob > unsup_confidence).astype(jnp.int32)
    # conf-masked pixels become ignore (encoder_decoder.py:541-542)
    hard = jnp.where(conf == 0, 255, hard)
    soft = None
    if unsup_soft:
        t_logits = jnp.power(logits, 1.0 / unsup_temperature) \
            if unsup_temperature != 1.0 else logits
        soft = jax.nn.softmax(t_logits, axis=-1)
    return TeacherInfo(seg_logits=logits, hard_label=hard, conf_mask=conf,
                       max_prob=max_prob, soft_label=soft)


def pseudo_ce_loss(student_logits: Array, hard_label: Array) -> Array:
    """CE vs hard pseudo-label, ignore 255, MEAN over all pixels
    (compute_pseudo_loss: CrossEntropyLoss(reduction='none',
    ignore_index=255) then torch.mean over everything,
    encoder_decoder.py:908-935)."""
    if student_logits.shape[1:3] != hard_label.shape[1:3]:
        from s4former_tpu.ops.resize import resize_bilinear
        student_logits = resize_bilinear(
            student_logits, hard_label.shape[1:3], align_corners=False)
    nll, _ = softmax_cross_entropy_with_ignore(student_logits, hard_label,
                                               ignore_index=255)
    return jnp.mean(nll)


def soft_pseudo_ce_loss(student_logits: Array, soft_label: Array,
                        conf_mask: Optional[Array] = None) -> Array:
    """Soft-label CE (unsup_soft=True path, :914-918). When
    unsup_confidence != 0 the reference multiplies the per-pixel loss by
    the teacher conf mask before the mean (:918-922 ``mask = mask *
    teacher_info['conf_mask']``) — pass ``conf_mask`` [B,H,W] to match."""
    logp = jax.nn.log_softmax(student_logits.astype(jnp.float32), axis=-1)
    per = -jnp.sum(soft_label * logp, axis=-1)
    if conf_mask is not None:
        per = per * conf_mask.astype(per.dtype)
    return jnp.mean(per)


def mask_ratio(conf_mask: Array) -> Array:
    """Fraction of confident pixels, logged every step
    (encoder_decoder.py:923-925)."""
    return jnp.mean(conf_mask.astype(jnp.float32))
