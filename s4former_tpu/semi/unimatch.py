"""UniMatch-style dual-stream unsupervised branch.

Rebuild of ``foward_unsup_train_unimatch``
(reference: mmseg/models/segmentors/encoder_decoder.py:689-830):

- teacher pseudo-labels on the weak view AND on a second 'mix-source' weak
  view;
- a PASA separate-head pass (x0.5) or an fdrop pass (x0.5) on stream 1;
- two strong streams; each is (prob strong_aug_prob) CutMix'd against its
  mix-source counterpart — image from the mix stream, labels from the mix
  teacher (generate_unsup_cutmix_data_unimatch, generate_unsup_data.py:456)
  — then optionally PatchShuffled; each stream's pseudo-CE (and NCR) is
  0.25-weighted.

Pure function: all forwards go through the supplied ``apply_decode`` /
teacher logits; invoked inside the jitted train step.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from s4former_tpu.semi import mixes
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.ncr import ncr_loss
from s4former_tpu.semi.pseudo import TeacherInfo, pseudo_ce_loss

Array = jax.Array


def cutmix_unimatch(key: jax.Array, imgs: Array, mix_imgs: Array,
                    labels: Array, mix_labels: Array,
                    ratio: float = 2.0,
                    masks: Optional[Array] = None) -> Tuple[Array, Array]:
    """Per-sample box: inside the box take the MIX stream's pixels/labels
    (same batch index), outside keep the original. Labels may live at
    head-output resolution; mix at image resolution, resize back (the
    reference's nearest pre/post-resize, generate_unsup_data.py:410-452).
    ``masks`` ([B,H,W] {0,1}, 0 = take the mix stream) overrides the
    random boxes — parity-harness injection.
    """
    from s4former_tpu.ops.resize import resize_nearest
    b, h, w, _ = imgs.shape
    label_hw = labels.shape[1:]
    lab = labels if label_hw == (h, w) else resize_nearest(labels, (h, w))
    mix_lab = mix_labels if label_hw == (h, w) else \
        resize_nearest(mix_labels, (h, w))
    if masks is None:
        masks = jax.vmap(lambda k: mixes.random_box_mask(k, (h, w), ratio))(
            jax.random.split(key, b))
    m4 = masks[..., None]
    new_imgs = imgs * m4 + mix_imgs * (1.0 - m4)
    new_labels = jnp.where(masks > 0.5, lab, mix_lab)
    if label_hw != (h, w):
        new_labels = resize_nearest(new_labels, label_hw)
    return new_imgs, new_labels.astype(labels.dtype)


def unimatch_unsup_losses(
        cfg: SemiConfig,
        rng: Array,
        batch: Dict[str, Array],
        teacher: TeacherInfo,
        teacher_mix: TeacherInfo,
        pasa_bias: Optional[Array],
        apply_decode: Callable,
        num_classes: int,
        overrides: Optional[Dict[str, Array]] = None) -> Dict[str, Array]:
    """apply_decode(img, attn_bias=None, use_fdrop=False, patchmix_perm=None,
    patchmix_n=0) -> student decode logits (threads batch_stats in caller).

    ``overrides`` (parity harness only): 'um_cutmix_mask_{1,2}' [B,H,W]
    {0,1} boxes (forces the strong-aug gate ON), 'um_patchmix_perm_{1,2}'
    [B, G*G] permutations (identity row = unshuffled sample).
    """
    ov = overrides or {}
    k = jax.random.split(rng, 6)
    losses: Dict[str, Array] = {}

    # head 1: PASA separate-head pass OR fdrop pass (reference :762-797)
    if cfg.attn_mask_seperate_head and pasa_bias is not None:
        logits = apply_decode(batch['unsup_student_img'],
                              attn_bias=pasa_bias,
                              use_fdrop=cfg.attn_mask_w_fdrop)
        losses['loss_seg_unsup_attn_mask'] = 0.5 * pseudo_ce_loss(
            logits, teacher.hard_label)
    else:
        logits = apply_decode(batch['unsup_student_img'], use_fdrop=True)
        losses['loss_seg_unsup_fdrop'] = 0.5 * pseudo_ce_loss(
            logits, teacher.hard_label)

    def stream(idx, img_key, mix_key, kk):
        imgs = batch[img_key]
        mix_imgs = batch[mix_key]
        labels = teacher.hard_label
        kg, kc, kp = jax.random.split(kk, 3)
        inj_mask = ov.get(f'um_cutmix_mask_{idx}')
        gate = jnp.asarray(True) if inj_mask is not None else \
            jax.random.bernoulli(kg, cfg.strong_aug_prob)
        mi, ml = cutmix_unimatch(kc, imgs, mix_imgs, labels,
                                 teacher_mix.hard_label, cfg.cutout_area,
                                 masks=inj_mask)
        imgs = jnp.where(gate, mi, imgs)
        labels = jnp.where(gate, ml, labels)
        perm = None
        n = 0
        if cfg.use_PatchShuffle:
            inj_perm = ov.get(f'um_patchmix_perm_{idx}')
            if inj_perm is not None:
                perm = inj_perm
                imgs = mixes.apply_patch_perm(imgs, perm, cfg.PatchMix_N,
                                              cfg.patchsize)
            else:
                imgs, perm = mixes.patch_shuffle(
                    kp, imgs, cfg.PatchMix_N, cfg.patchsize,
                    cfg.patchmix_ratio)
            n = cfg.PatchMix_N
        logits = apply_decode(imgs, patchmix_perm=perm, patchmix_n=n)
        losses[f'loss_seg_unsup_{idx}'] = 0.25 * pseudo_ce_loss(
            logits, labels)
        if cfg.negative_class_ranking and \
                cfg.negative_class_ranking_mode != 'sup_only':
            losses[f'loss_ncr_unsup_{idx}'] = 0.25 * ncr_loss(
                logits, teacher.seg_logits, labels, num_classes,
                cfg.negative_class_ranking_mode)

    stream(1, 'unsup_student_img', 'unsup_student_mix_img', k[0])
    stream(2, 'unsup_student_2_img', 'unsup_student_2_mix_img', k[1])
    return losses
