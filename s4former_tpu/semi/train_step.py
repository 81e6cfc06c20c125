"""The S4Former semi-supervised training step — one jitted program.

Rebuild of the reference hot loop
(reference: mmseg/models/segmentors/encoder_decoder.py:386-935 plus
mmcv OptimizerHook/PolyLR): EMA update, supervised branch, teacher
pseudo-labels, PASA separate-head pass, CutMix + PatchShuffle, final
student pass, pseudo CE + NCR, SGD step — all inside a single
``jax.jit``-able function with zero host round-trips.

Data-parallelism is implicit: shard the batch axis of ``batch`` over a
``jax.sharding.Mesh`` and XLA inserts the gradient all-reduce and the
cross-replica BatchNorm reductions (the reference needed NCCL DDP +
SyncBN + an explicit log-var all_reduce for the same effect,
apis/train.py:129-138, base.py:259-276).

Known reference bugs consciously NOT replicated (SURVEY.md §7):
- train_step's npy/json debug dump every iteration (base.py:182-196);
- the dead ``attn_frozen`` string-literal branch (:1055);
- NCR being computed-and-discarded inside the PASA pass.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from s4former_tpu.core.optim import (build_lr_mult_tree, clip_grads_by_norm,
                                     poly_lr, sgd_init, sgd_update)
from s4former_tpu.models.losses.cross_entropy import accuracy
from s4former_tpu.ops.resize import resize_bilinear
from s4former_tpu.registry import LOSSES
from s4former_tpu.semi import mixes
from s4former_tpu.semi.config import SemiConfig
from s4former_tpu.semi.ema import ema_update_scoped
from s4former_tpu.semi.ncr import ncr_loss
from s4former_tpu.semi.pasa import pasa_bias_from_conf_mask
from s4former_tpu.semi.pseudo import (extract_teacher_info, mask_ratio,
                                      pseudo_ce_loss, soft_pseudo_ce_loss)

Array = jax.Array
Pytree = Any


@flax.struct.dataclass
class TrainState:
    """Everything that evolves across steps, as one pytree."""
    step: Array
    params: Pytree
    batch_stats: Pytree
    momentum: Pytree                     # SGD buffers
    ema_params: Optional[Pytree] = None  # mean teacher
    ema_batch_stats: Optional[Pytree] = None
    # mask-ratio-annealed EMA momentum (encoder_decoder.py:926-932);
    # None unless momentum_head_exp/momentum_exp configured
    annealed_momentum: Optional[Array] = None


def create_train_state(variables: Dict, ema: bool = False) -> TrainState:
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        momentum=sgd_init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
        ema_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats)
        if ema else None,
        annealed_momentum=None,
    )


def _head_loss_fns(model) -> Tuple[Callable, list]:
    """Build loss callables from head configs (loss_decode entries)."""
    def build(head_cfg):
        loss_cfg = dict(head_cfg.get('loss_decode',
                                     {'type': 'CrossEntropyLoss'}))
        return LOSSES.build(loss_cfg)

    head_cfg = model.decode_head
    cascade_list = []
    if isinstance(head_cfg, (list, tuple)):
        # CascadeEncoderDecoder: the LAST stage is the main head; earlier
        # stages train like aux heads (forward_train_heads returns their
        # logits ahead of the real aux logits, ref
        # cascade_encoder_decoder.py _decode_head_forward_train)
        cascade_list = [build(h) for h in head_cfg[:-1]]
        head_cfg = head_cfg[-1]
    main = build(head_cfg)
    aux_cfgs = model.auxiliary_head
    if aux_cfgs is None:
        aux_list = []
    else:
        if hasattr(aux_cfgs, 'keys'):
            aux_cfgs = [aux_cfgs]
        aux_list = [build(a) for a in aux_cfgs]
    return main, cascade_list + aux_list


def _find_sown(tree, key):
    """First value sown under ``key`` anywhere in an intermediates
    collection (depth-first over nested dicts)."""
    if isinstance(tree, dict):
        if key in tree:
            return tree[key]
        for v in tree.values():
            r = _find_sown(v, key)
            if r is not None:
                return r
    return None


def _is_knet(model) -> bool:
    head = getattr(model, 'decode_head', None)
    return isinstance(head, dict) and \
        head.get('type') == 'IterativeDecodeHead'


def _sup_losses(model, main_loss, aux_losses, variables, img, gt, rng):
    """Supervised branch: all heads vs GT (encoder_decoder.py:426-441).
    Returns (losses dict, new batch_stats, main logits at GT resolution).

    K-Net (IterativeDecodeHead): the reference trains EVERY stage's mask
    logits, suffixing each loss with ``.s{i}`` (knet_head.py:446-453) —
    here the head sows its per-stage logits and this branch turns each
    into a ``decode.loss_ce.s{i}`` entry (all join the total via the
    'loss'-substring sum, the mmcv _parse_losses convention)."""
    knet = _is_knet(model)
    mutable = ['batch_stats', 'intermediates'] if knet else ['batch_stats']
    (main, aux), upd = model.apply(
        variables, mutable=mutable,
        method='forward_train_heads_from_img', img=img, train=True,
        rngs={'dropout': rng})
    losses = {}
    gt_hw = gt.shape[1:3]

    def to_gt(logits):
        if logits.shape[1:3] != gt_hw:
            return resize_bilinear(logits, gt_hw,
                                   model.align_corners)
        return logits

    main = to_gt(main)
    if knet:
        stage_segs = _find_sown(upd['intermediates'], 'stage_segs')[0]
        for i, seg in enumerate(stage_segs):
            losses[f'decode.loss_ce.s{i}'] = main_loss(
                to_gt(seg.astype(jnp.float32)), gt)
    else:
        losses['decode.loss_ce'] = main_loss(main, gt)
    losses['decode.acc_seg'] = accuracy(main, gt)
    for i, (a, lfn) in enumerate(zip(aux, aux_losses)):
        losses[f'aux_{i}.loss_ce'] = lfn(to_gt(a), gt)
    return losses, upd['batch_stats'], main


def apply_strong_mixes(cfg: SemiConfig, rng: Array,
                       imgs: Array, labels: Array,
                       teacher_info, sup_imgs, sup_gts,
                       num_classes: int,
                       overrides: Optional[Dict[str, Array]] = None):
    """The strong-augmentation cascade on (student imgs, teacher labels)
    (encoder_decoder.py:584-648). Returns (imgs, labels, patchmix_perm).

    ``overrides`` (parity harness only): {'cutmix_mask': [B,H,W] {0,1},
    'patchmix_perm': [B,GG] int32} replace the sampled CutMix box / the
    sampled PatchShuffle gate+permutation with fixed arrays so a torch
    oracle can run the identical randomness. Never set in production.
    """
    overrides = overrides or {}
    perm = None
    raw_imgs = imgs  # pre-mix student images (for cutmix_adaptive below)
    k = jax.random.split(rng, 8)

    if cfg.mix_with_labeled:
        imgs, labels = mixes.mix_with_labeled(
            imgs, labels, sup_imgs, sup_gts, teacher_info.conf_mask,
            cfg.patchsize)

    def gated(key, prob, fn, imgs, labels):
        kg, kf = jax.random.split(key)
        gate = jax.random.bernoulli(kg, prob)
        new_imgs, new_labels = fn(kf, imgs, labels)
        return (jnp.where(gate, new_imgs, imgs),
                jnp.where(gate, new_labels, labels))

    ps = cfg.patchsize * cfg.PatchMix_N
    if cfg.use_CutMix:
        imgs, labels = gated(
            k[0], cfg.strong_aug_prob,
            lambda kk, i, l: mixes.cutmix(kk, i, l, cfg.cutout_area,
                                          cfg.patchwise, ps),
            imgs, labels)
    if cfg.use_CutOut:
        imgs, labels = gated(
            k[1], 0.5,
            lambda kk, i, l: mixes.cutout(kk, i, l, cfg.cutout_area,
                                          cfg.patchwise, ps),
            imgs, labels)
    if cfg.use_ClassMix:
        imgs, labels = gated(
            k[2], 0.5,
            lambda kk, i, l: mixes.classmix(kk, i, l, num_classes,
                                            patchwise=cfg.patchwise),
            imgs, labels)
    if cfg.use_cutmix_adaptive:
        # per-sample confidence = mean((1 - normalized entropy) * maxprob)
        # (encoder_decoder.py:608-620). The reference mixes the PRE-mix
        # student images (student_imgs, not student_info['img']) with a
        # FRESH teacher argmax (before 255 masking) and then overwrites
        # both — discarding earlier CutMix/CutOut/ClassMix effects
        # (:621-630). Reproduced exactly.
        probs = jax.nn.softmax(teacher_info.seg_logits, axis=-1)
        ent = -jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)
        ent = ent / jnp.log(num_classes)
        confidence = jnp.mean((1.0 - ent) * teacher_info.max_prob,
                              axis=(1, 2))
        fresh_argmax = jnp.argmax(probs, axis=-1).astype(
            teacher_info.hard_label.dtype)
        imgs, new_labels, new_probs = mixes.cutmix_label_adaptive(
            k[3], raw_imgs, fresh_argmax,
            teacher_info.max_prob, sup_imgs, sup_gts, confidence)
        labels = jnp.where(new_probs < cfg.unsup_confidence, 255, new_labels)
    if cfg.use_PatchShuffle:
        imgs, perm = mixes.patch_shuffle(
            k[4], imgs, cfg.PatchMix_N, cfg.patchsize, cfg.patchmix_ratio)
    if cfg.use_PatchShuffle_w_Cutmix:
        if 'cutmix_mask' in overrides:
            imgs, labels = mixes.cutmix_with_masks(
                overrides['cutmix_mask'], imgs, labels)
        else:
            imgs, labels = gated(
                k[5], cfg.strong_aug_prob,
                lambda kk, i, l: mixes.cutmix(kk, i, l, cfg.cutout_area),
                imgs, labels)
        if 'patchmix_perm' in overrides:
            perm = overrides['patchmix_perm']
            imgs = mixes.apply_patch_perm(imgs, perm, cfg.PatchMix_N,
                                          cfg.patchsize)
        else:
            imgs, perm = mixes.patch_shuffle(
                k[6], imgs, cfg.PatchMix_N, cfg.patchsize,
                cfg.patchmix_ratio)
    if cfg.use_PatchShuffle_w_Classmix:
        # reference passes patchsize=16*PatchMix_N here (:644-648)
        imgs, labels = gated(
            k[5], 0.5,
            lambda kk, i, l: mixes.classmix(
                kk, i, l, num_classes, patchwise=cfg.patchwise,
                patchsize=cfg.patchsize * cfg.PatchMix_N),
            imgs, labels)
        imgs, perm = mixes.patch_shuffle(
            k[6], imgs, cfg.PatchMix_N, cfg.patchsize, cfg.patchmix_ratio)
    return imgs, labels, perm


def make_semi_train_step(model,
                         semi_cfg: SemiConfig,
                         num_classes: int,
                         base_lr: float = 0.001,
                         max_iters: int = 80001,
                         power: float = 0.9,
                         min_lr: float = 1e-4,
                         sgd_momentum: float = 0.9,
                         weight_decay: float = 0.0,
                         custom_keys: Optional[Dict[str, float]] = None,
                         grad_clip_norm: Optional[float] = None,
                         patch_size: int = 16,
                         paramwise_cfg: Optional[Dict] = None):
    """Returns train_step(state, batch, rng) -> (state, logs).

    ``batch``: dict with
      'sup_img' [B,H,W,3], 'sup_gt' [B,H,W] int32, and (when semi)
      'unsup_teacher_img' / 'unsup_student_img' [Bu,H,W,3].
    All float images are normalized NHWC.
    """
    cfg = semi_cfg
    main_loss, aux_losses = _head_loss_fns(model)
    if custom_keys is None:
        custom_keys = {'head': 10.0}
    # MiT PASA uses a raw unconfidence MAP whose "no bias" is NOT a zero
    # tensor under the adaptive inversion, so the 2B-batch fusion trick
    # (zero bias for the mixed half) only applies to the ViT token-bias
    mit_backbone = isinstance(model.backbone, dict) and \
        model.backbone.get('type') == 'MixVisionTransformer'

    def train_step(state: TrainState, batch: Dict[str, Array],
                   rng: Array) -> Tuple[TrainState, Dict[str, Array]]:
        logs: Dict[str, Array] = {}
        # per-step randomness derived INSIDE the program from the base key
        # and the step counter: the host loop passes the same key object
        # every step (no per-step host dispatch; steps pipeline freely) and
        # a resumed run reproduces the same stream at the same step.
        rng = jax.random.fold_in(rng, state.step)
        r_ema, r_sup, r_mix, r_drop, r_fdrop = jax.random.split(rng, 5)
        # independent dropout masks per student forward (the reference's
        # torch Dropout draws fresh per call; reusing one key would give
        # identical masks across the sup / PASA / fdrop / final passes)
        r_drop_sup, r_drop_pasa, r_drop_fd, r_drop_final, r_drop_ncr = (
            jax.random.fold_in(r_drop, i) for i in range(5))

        # ---- 1. EMA update BEFORE forwards (encoder_decoder.py:416-423)
        ema_params = state.ema_params
        ema_bs = state.ema_batch_stats
        anneal = cfg.momentum_head_exp != 0 or cfg.momentum_exp != 0
        if cfg.ema:
            m_backbone = cfg.effective_momentum_backbone
            m_head = cfg.effective_momentum_head
            if anneal and state.annealed_momentum is not None:
                # previous step's mask_ratio**exp (reference applies the
                # annealed momentum on the NEXT step's EMA update,
                # encoder_decoder.py:926-932)
                m_head = state.annealed_momentum
                if cfg.momentum_exp != 0:
                    m_backbone = state.annealed_momentum
            # plain self.momentum (neck/aux heads, :420/:423) is never
            # annealed (:926-932 only reassigns momentum_head/_backbone)
            m_plain = cfg.ema_momentum
            ema_params = ema_update_scoped(
                state.ema_params, state.params,
                m_backbone, m_head, m_plain,
                dropout_head=cfg.momentum_head_dropout,
                key=r_ema, is_params=True)
            ema_bs = ema_update_scoped(
                state.ema_batch_stats, state.batch_stats,
                m_backbone, m_head, m_plain, is_params=False)

        has_unsup = 'unsup_teacher_img' in batch and cfg.unsup_weight != 0
        has_unimatch = cfg.unimatch and 'unsup_teacher_mix_img' in batch
        ncr_sup = (cfg.negative_class_ranking and
                   cfg.negative_class_ranking_mode in ('sup_only', 'both'))

        # ---- sup strong mixes (encoder_decoder.py:429-434) — pure data
        # augmentation, applied BEFORE the unsup branch so the mixed sup
        # images/labels feed mix_with_labeled / cutmix_adaptive exactly
        # like the reference's reassigned locals (:488, :584-594).
        sup_img, sup_gt = batch['sup_img'], batch['sup_gt']
        if cfg.sup_cutmix or cfg.sup_ClassMix:
            kg, kf = jax.random.split(r_sup)
            if cfg.sup_cutmix:
                gate = jax.random.bernoulli(kg, cfg.strong_aug_prob)
                mi, ml = mixes.sup_cutmix(kf, sup_img, sup_gt)
            else:
                gate = jax.random.bernoulli(kg, 0.5)
                mi, ml = mixes.classmix(kf, sup_img, sup_gt, num_classes)
            sup_img = jnp.where(gate, mi, sup_img)
            sup_gt = jnp.where(gate, ml, sup_gt)
        # strong labeled view: feeds the sup-NCR student pass and replaces
        # sup imgs in the unsup mixes when present (:451, :490-492)
        sup_student_img = batch.get('sup_student_img', sup_img)

        # ---- 2. teacher pseudo-labels (no grad, eval mode; :516-542)
        teacher = None
        pasa_bias = None
        mixed_imgs = mixed_labels = perm = None
        if has_unsup:
            t_vars = {'params': ema_params if cfg.ema else state.params,
                      'batch_stats': ema_bs if cfg.ema else state.batch_stats}
            t_logits = model.apply(
                t_vars, method='forward_decode_from_img',
                img=batch['unsup_teacher_img'], train=False)
            t_logits = jax.lax.stop_gradient(t_logits)
            teacher = extract_teacher_info(
                t_logits, cfg.unsup_confidence, cfg.unsup_temperature,
                cfg.unsup_soft)
            logs['mask_ratio'] = mask_ratio(teacher.conf_mask)
            if anneal:
                exp = cfg.momentum_head_exp or cfg.momentum_exp
                new_annealed = logs['mask_ratio'] ** exp
                logs['momentum_head'] = new_annealed

            if cfg.attn_mask_seperate_head or cfg.use_attn_mask_inline:
                # separate-head PASA (":547-567") or inline PASA (":656-675").
                bb_cfg = model.backbone if isinstance(model.backbone, dict) \
                    else {}
                if bb_cfg.get('type') == 'MixVisionTransformer':
                    # MiT consumes the RAW per-pixel unconfidence map at
                    # input resolution and builds per-stage biases itself
                    # (mit.py; weight/adaptivity are module config) — the
                    # conf mask must be lifted from head-output to image
                    # resolution first
                    unconf = 1.0 - teacher.conf_mask.astype(jnp.float32)
                    img_hw = batch['unsup_teacher_img'].shape[1:3]
                    if unconf.shape[1:3] != img_hw:
                        from s4former_tpu.ops.resize import resize_nearest
                        unconf = resize_nearest(unconf[..., None],
                                                img_hw)[..., 0]
                    pasa_bias = unconf
                else:
                    # ViT: [B, 1, L+1, L+1] additive token bias. The conf
                    # mask lives at head-output resolution; pool it to the
                    # backbone token grid (the reference hardcodes 16 for
                    # ViT / 8 for MiT, encoder_decoder.py:548-553 —
                    # deriving it from shapes covers both).
                    grid_h = batch['unsup_teacher_img'].shape[1] \
                        // patch_size
                    attn_ps = teacher.conf_mask.shape[1] // grid_h
                    pasa_bias = pasa_bias_from_conf_mask(
                        teacher.conf_mask, attn_ps,
                        cfg.attn_mask_weight, cfg.adaptive_attn_mask)

            if has_unimatch:
                t_mix_logits = jax.lax.stop_gradient(model.apply(
                    t_vars, method='forward_decode_from_img',
                    img=batch['unsup_teacher_mix_img'], train=False))
                teacher_mix = extract_teacher_info(
                    t_mix_logits, cfg.unsup_confidence,
                    cfg.unsup_temperature, cfg.unsup_soft)
            else:
                bu = batch['unsup_student_img'].shape[0]
                if bu > sup_student_img.shape[0]:
                    raise ValueError(
                        f"unsup batch ({bu}) > sup batch "
                        f"({sup_student_img.shape[0]}): the strong-mix "
                        "cascade pairs each unsup sample with a labeled "
                        "one (encoder_decoder.py:584-594); configure "
                        "sample_ratio with sup >= unsup per chip.")
                # 'dbg_'-prefixed batch keys are fixed-randomness
                # injections for the torch parity harness (static
                # presence; zero cost when absent)
                mix_overrides = {key[4:]: v for key, v in batch.items()
                                 if key.startswith('dbg_')}
                mixed_imgs, mixed_labels, perm = apply_strong_mixes(
                    cfg, r_mix, batch['unsup_student_img'],
                    teacher.hard_label, teacher,
                    sup_student_img[:bu], sup_gt[:bu],
                    num_classes, overrides=mix_overrides)

        # ---- 2b. EMA pass on WEAK labeled images — shared by the sup-NCR
        # teacher (:447-449) and sup_ema distillation (:477-480). Uses the
        # ORIGINAL (un-cutmixed) sup images like the reference's
        # data_groups['sup']['img'].
        sup_ema_logits = None
        if ncr_sup or cfg.sup_ema:
            e_vars = {'params': ema_params if cfg.ema else state.params,
                      'batch_stats': ema_bs if cfg.ema else state.batch_stats}
            sup_ema_logits = jax.lax.stop_gradient(model.apply(
                e_vars, method='forward_decode_from_img',
                img=batch['sup_img'], train=False))

        # ---- 3. differentiable student losses
        def loss_fn(params):
            bs = state.batch_stats
            losses: Dict[str, Array] = {}
            variables = {'params': params, 'batch_stats': bs}

            sup_losses, bs, sup_main_logits = _sup_losses(
                model, main_loss, aux_losses, variables, sup_img, sup_gt,
                r_drop_sup)
            losses.update(sup_losses)

            if ncr_sup:
                # Supervised NCR (encoder_decoder.py:443-474): student on
                # the STRONG labeled view vs the EMA teacher on the weak
                # view, per-GT-class excluded softmax, KL + pdist ('sup'
                # mode keeps the reference's double-pdist quirk).
                stu_sup_logits, upd = model.apply(
                    {'params': params, 'batch_stats': bs},
                    mutable=['batch_stats'],
                    method='forward_decode_from_img',
                    img=sup_student_img, train=True,
                    rngs={'dropout': r_drop_ncr})
                bs = upd['batch_stats']
                img_hw = sup_student_img.shape[1:3]
                s_logits = stu_sup_logits
                t_logits = sup_ema_logits
                if s_logits.shape[1:3] != img_hw:   # (:453-456)
                    s_logits = resize_bilinear(s_logits, img_hw, False)
                    t_logits = resize_bilinear(t_logits, img_hw, False)
                losses['loss_ncr_sup'] = ncr_loss(
                    s_logits, t_logits, batch['sup_gt'], num_classes, 'sup')

            if cfg.sup_ema:
                # sup_ema distillation (:476-487): EMA softmax on the weak
                # labeled view, NEAREST-resized to GT shape (the reference
                # ``resize`` default), argmax -> pseudo GT; CE of the
                # supervised main logits against it. (The reference reuses
                # whatever ``labeled_features`` holds — which the sup-NCR
                # branch silently rebinds to the STRONG view; we always use
                # the supervised pass, documented in PARITY.md.)
                from s4former_tpu.ops.resize import resize_nearest
                ema_probs = jax.nn.softmax(
                    sup_ema_logits.astype(jnp.float32), axis=-1)
                if ema_probs.shape[1:3] != sup_gt.shape[1:3]:
                    ema_probs = resize_nearest(ema_probs, sup_gt.shape[1:3])
                ema_labels = jnp.argmax(ema_probs, axis=-1).astype(jnp.int32)
                losses['loss_decode_sup_ema'] = main_loss(
                    sup_main_logits, ema_labels)

            if has_unsup and has_unimatch:
                # UniMatch dual-stream branch (encoder_decoder.py:689-830)
                from s4former_tpu.semi.unimatch import unimatch_unsup_losses
                bs_box = {'bs': bs, 'n': 0}

                def apply_decode(img, attn_bias=None, use_fdrop=False,
                                 patchmix_perm=None, patchmix_n=0):
                    # fresh dropout mask per forward (reference torch
                    # semantics); counter-folded off the step key
                    bs_box['n'] += 1
                    out, upd = model.apply(
                        {'params': params, 'batch_stats': bs_box['bs']},
                        mutable=['batch_stats'],
                        method='forward_decode_from_img', img=img,
                        train=True, attn_bias=attn_bias,
                        pos_mode=cfg.pos_mode, use_fdrop=use_fdrop,
                        patchmix_perm=patchmix_perm, patchmix_n=patchmix_n,
                        rngs={'dropout': jax.random.fold_in(r_drop_final,
                                                            bs_box['n']),
                              'fdrop': r_fdrop})
                    bs_box['bs'] = upd['batch_stats']
                    return out

                unsup = unimatch_unsup_losses(
                    cfg, r_mix, batch, teacher, teacher_mix, pasa_bias,
                    apply_decode, num_classes,
                    overrides={key[4:]: v for key, v in batch.items()
                               if key.startswith('dbg_')})
                bs = bs_box['bs']
                logs_w = jnp.asarray(cfg.unsup_weight, jnp.float32)
                if cfg.iter_unsup_start != 0:
                    logs_w = jnp.where(state.step > cfg.iter_unsup_start,
                                       logs_w, 0.0)
                for kk, vv in unsup.items():
                    losses[f'unsup.{kk}'] = vv * logs_w
            elif has_unsup and cfg.fuse_unsup_passes and \
                    cfg.attn_mask_seperate_head and not cfg.use_fdrop and \
                    not cfg.attn_mask_w_fdrop and not mit_backbone:
                # FUSED unsup branch: PASA pass (unmixed strong images +
                # bias) and the final pass (mixed images, PatchShuffle
                # undo) run as one 2B-batch forward. Per-sample math
                # matches the sequential reference passes
                # (encoder_decoder.py:547-567 + :650-679); only BN moments
                # span the fused batch (see SemiConfig.fuse_unsup_passes).
                unsup: Dict[str, Array] = {}
                bu = batch['unsup_student_img'].shape[0]
                bias2 = jnp.concatenate(
                    [pasa_bias, jnp.zeros((bu,) + pasa_bias.shape[1:],
                                          pasa_bias.dtype)], axis=0)
                imgs2 = jnp.concatenate(
                    [batch['unsup_student_img'], mixed_imgs], axis=0)
                if perm is not None:
                    gg = perm.shape[-1]
                    identity = jnp.broadcast_to(jnp.arange(gg), (bu, gg)
                                                ).astype(perm.dtype)
                    perm2 = jnp.concatenate([identity, perm], axis=0)
                    n2 = cfg.PatchMix_N
                else:
                    perm2, n2 = None, 0
                logits2, upd = model.apply(
                    {'params': params, 'batch_stats': bs},
                    mutable=['batch_stats'],
                    method='forward_decode_from_img', img=imgs2,
                    train=True, attn_bias=bias2, pos_mode=cfg.pos_mode,
                    patchmix_perm=perm2, patchmix_n=n2,
                    rngs={'dropout': r_drop_final})
                bs = upd['batch_stats']
                pasa_logits = logits2[:bu]
                stu_logits = logits2[bu:]
                unsup['loss_seg_unsup_attn_mask'] = 0.5 * pseudo_ce_loss(
                    pasa_logits, teacher.hard_label)
                soft_conf = (teacher.conf_mask
                             if cfg.unsup_confidence != 0 else None)
                main_pseudo = (soft_pseudo_ce_loss(stu_logits,
                                                   teacher.soft_label,
                                                   soft_conf)
                               if cfg.unsup_soft else
                               pseudo_ce_loss(stu_logits, mixed_labels))
                unsup['loss_seg_unsup'] = main_pseudo * cfg.fdrop_loss_weight
                if cfg.negative_class_ranking and \
                        cfg.negative_class_ranking_mode != 'sup_only':
                    unsup['loss_ncr_unsup'] = 0.5 * ncr_loss(
                        stu_logits, teacher.seg_logits, mixed_labels,
                        num_classes, cfg.negative_class_ranking_mode)
                w = jnp.asarray(cfg.unsup_weight, jnp.float32)
                if cfg.iter_unsup_start != 0:
                    w = jnp.where(state.step > cfg.iter_unsup_start, w, 0.0)
                for k, v in unsup.items():
                    losses[f'unsup.{k}'] = v * w
            elif has_unsup:
                unsup: Dict[str, Array] = {}
                variables = {'params': params, 'batch_stats': bs}
                if cfg.attn_mask_seperate_head:
                    # PASA separate-head pass on UNMIXED strong images
                    # (":547-567"), 0.5-weighted
                    pasa_logits, upd = model.apply(
                        variables, mutable=['batch_stats'],
                        method='forward_decode_from_img',
                        img=batch['unsup_student_img'], train=True,
                        attn_bias=pasa_bias, pos_mode=cfg.pos_mode,
                        use_fdrop=cfg.attn_mask_w_fdrop,
                        rngs={'dropout': r_drop_pasa, 'fdrop': r_fdrop})
                    bs = upd['batch_stats']
                    unsup['loss_seg_unsup_attn_mask'] = 0.5 * pseudo_ce_loss(
                        pasa_logits, teacher.hard_label)
                if cfg.use_fdrop:
                    fdrop_logits, upd = model.apply(
                        {'params': params, 'batch_stats': bs},
                        mutable=['batch_stats'],
                        method='forward_decode_from_img',
                        img=batch['unsup_student_img'], train=True,
                        pos_mode=cfg.pos_mode, use_fdrop=True,
                        rngs={'dropout': r_drop_fd, 'fdrop': r_fdrop})
                    bs = upd['batch_stats']
                    unsup['loss_seg_unsup_fdrop'] = 0.5 * pseudo_ce_loss(
                        fdrop_logits, teacher.hard_label)

                # final student pass on mixed images; inline-PASA configs
                # pass the bias here instead (":650-679")
                inline_bias = pasa_bias if cfg.use_attn_mask_inline else None
                stu_logits, upd = model.apply(
                    {'params': params, 'batch_stats': bs},
                    mutable=['batch_stats'],
                    method='forward_decode_from_img',
                    img=mixed_imgs, train=True,
                    attn_bias=inline_bias, pos_mode=cfg.pos_mode,
                    patchmix_perm=perm,
                    patchmix_n=cfg.PatchMix_N if perm is not None else 0,
                    rngs={'dropout': r_drop_final})
                bs = upd['batch_stats']

                if cfg.unsup_soft:
                    main_pseudo = soft_pseudo_ce_loss(
                        stu_logits, teacher.soft_label,
                        teacher.conf_mask
                        if cfg.unsup_confidence != 0 else None)
                else:
                    main_pseudo = pseudo_ce_loss(stu_logits, mixed_labels)

                if cfg.use_fdrop or cfg.attn_mask_seperate_head:
                    unsup['loss_seg_unsup'] = \
                        main_pseudo * cfg.fdrop_loss_weight
                else:
                    unsup['loss_seg_unsup'] = main_pseudo
                if cfg.negative_class_ranking and \
                        cfg.negative_class_ranking_mode != 'sup_only':
                    ncr = ncr_loss(stu_logits, teacher.seg_logits,
                                   mixed_labels, num_classes,
                                   cfg.negative_class_ranking_mode)
                    scale = 0.5 if (cfg.use_fdrop or
                                    cfg.attn_mask_seperate_head) else 1.0
                    unsup['loss_ncr_unsup'] = ncr * scale

                # weighted_loss * unsup_weight, gated by iter_unsup_start
                # (encoder_decoder.py:488-512)
                w = jnp.asarray(cfg.unsup_weight, jnp.float32)
                if cfg.iter_unsup_start != 0:
                    w = jnp.where(state.step > cfg.iter_unsup_start, w, 0.0)
                for k, v in unsup.items():
                    losses[f'unsup.{k}'] = v * w

            total = sum(v for k, v in losses.items() if 'loss' in k)
            return total, (bs, losses)

        (total, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if grad_clip_norm is not None:
            grads = clip_grads_by_norm(grads, grad_clip_norm)

        # ---- 4. SGD + poly LR
        lr = poly_lr(state.step, base_lr, max_iters, power, min_lr)
        lr_mults = build_lr_mult_tree(state.params, custom_keys)
        wd_mults = None
        if paramwise_cfg is not None:
            # layer-wise LR decay (LearningRateDecayOptimizerConstructor)
            # composed multiplicatively with the custom_keys lr_mult
            from s4former_tpu.core.optim import build_layer_decay_trees
            ld_mults, wd_mults = build_layer_decay_trees(
                state.params, paramwise_cfg['num_layers'],
                paramwise_cfg['decay_rate'],
                paramwise_cfg.get('decay_type', 'layer_wise'))
            lr_mults = jax.tree_util.tree_map(
                lambda a, b: a * b, lr_mults, ld_mults)
        new_params, new_momentum = sgd_update(
            state.params, grads, state.momentum, lr, lr_mults,
            sgd_momentum, weight_decay, wd_mults)

        logs.update(losses)
        logs['loss'] = total
        logs['lr'] = lr
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            momentum=new_momentum,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
            annealed_momentum=(new_annealed if (cfg.ema and anneal and
                                                has_unsup)
                               else state.annealed_momentum),
        )
        return new_state, logs

    return train_step
