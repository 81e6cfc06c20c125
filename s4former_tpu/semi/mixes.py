"""Strong-augmentation mix family as pure device ops.

Rebuild of the reference's per-sample python-loop mixes
(reference: mmseg/utils/generate_unsup_data.py) as vmapped fixed-shape jnp
ops driven by explicit PRNG keys — the whole family runs inside the jitted
train step with zero host round-trips.

All image tensors are NHWC; labels are [B, H, W] int32 (255 = ignore).
Teacher hard labels arrive at image resolution for SETR (head output =
input size), so the reference's nearest pre/post-resize is a no-op here;
``cutmix``/``classmix`` still resize if shapes differ.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_nearest

Array = jax.Array


# --------------------------------------------------------------- box masks
def random_box_mask(key: jax.Array, hw: Tuple[int, int],
                    ratio: float = 2.0) -> Array:
    """One {0,1} float mask, 0 inside a random box of area H*W/ratio
    (reference generate_cutout_mask, generate_unsup_data.py:7-26)."""
    h, w = hw
    area = h * w / ratio
    kw, kx, ky = jax.random.split(key, 3)
    # torch: w ~ randint(W/ratio + 1, W)  (exclusive high)
    box_w = jax.random.randint(kw, (), int(w / ratio) + 1, w)
    box_h = jnp.round(area / box_w).astype(jnp.int32)
    box_h = jnp.minimum(box_h, h)
    x0 = jax.random.randint(kx, (), 0, w)  # clamp below to valid range
    x0 = jnp.minimum(x0, w - box_w)
    y0 = jax.random.randint(ky, (), 0, h)
    y0 = jnp.minimum(y0, h - box_h)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((ys >= y0) & (ys < y0 + box_h) &
              (xs >= x0) & (xs < x0 + box_w))
    return jnp.where(inside, 0.0, 1.0)


def _batch_box_masks(key: jax.Array, b: int, hw: Tuple[int, int],
                     ratio: float) -> Array:
    keys = jax.random.split(key, b)
    return jax.vmap(lambda k: random_box_mask(k, hw, ratio))(keys)


def random_patchwise_mask(key: jax.Array, hw: Tuple[int, int],
                          patchsize: int, ratio: float = 2.0) -> Array:
    """{0,1} mask zeroing ``num_patches // ratio`` random patchsize^2
    patches (reference generate_patchwise_cutout_mask,
    generate_unsup_data.py:351-365). Fixed-shape: random per-patch scores,
    rank-select the k lowest."""
    h, w = hw
    gh, gw = h // patchsize, w // patchsize
    n = gh * gw
    k = int(n // ratio)
    scores = jax.random.uniform(key, (n,))
    ranks = jnp.argsort(jnp.argsort(scores))
    cut = (ranks < k).astype(jnp.float32).reshape(gh, gw)
    mask = 1.0 - jnp.repeat(jnp.repeat(cut, patchsize, 0), patchsize, 1)
    return mask


def _batch_patchwise_masks(key: jax.Array, b: int, hw: Tuple[int, int],
                           patchsize: int, ratio: float) -> Array:
    keys = jax.random.split(key, b)
    return jax.vmap(lambda k: random_patchwise_mask(
        k, hw, patchsize, ratio))(keys)


# ------------------------------------------------------------------ CutMix
def cutmix_with_masks(masks: Array, imgs: Array, labels: Array
                      ) -> Tuple[Array, Array]:
    """CutMix given explicit per-sample {0,1} masks (0 = take from the
    next sample). The deterministic core of ``cutmix``; also the
    injection point for randomness-controlled parity tests."""
    b, h, w, _ = imgs.shape
    if labels.shape[1:] != (h, w):
        labels_full = resize_nearest(labels, (h, w))
    else:
        labels_full = labels
    nxt = jnp.roll(jnp.arange(b), -1)
    m4 = masks[..., None]
    new_imgs = imgs * m4 + imgs[nxt] * (1.0 - m4)
    new_labels = jnp.where(masks > 0.5, labels_full, labels_full[nxt])
    if labels.shape[1:] != (h, w):
        new_labels = resize_nearest(new_labels, labels.shape[1:])
    return new_imgs, new_labels.astype(labels.dtype)


def cutmix(key: jax.Array, imgs: Array, labels: Array,
           ratio: float = 2.0, patchwise: bool = False,
           patchsize: int = 128) -> Tuple[Array, Array]:
    """Sample i mixed with sample (i+1) % B under a per-sample box — or a
    random patch set when ``patchwise`` (generate_unsup_cutmix_data,
    generate_unsup_data.py:400-453)."""
    b, h, w, _ = imgs.shape
    if patchwise:
        masks = _batch_patchwise_masks(key, b, (h, w), patchsize, ratio)
    else:
        masks = _batch_box_masks(key, b, (h, w), ratio)  # [B,H,W], 0 in box
    return cutmix_with_masks(masks, imgs, labels)


def sup_cutmix(key: jax.Array, imgs: Array, labels: Array
               ) -> Tuple[Array, Array]:
    """Supervised CutMix (generate_sup_cutmix_data, :105-140); ratio=2."""
    return cutmix(key, imgs, labels, ratio=2.0)


# ------------------------------------------------------------------ CutOut
def cutout(key: jax.Array, imgs: Array, labels: Array,
           ratio: float = 2.0, patchwise: bool = False,
           patchsize: int = 64) -> Tuple[Array, Array]:
    """Zero a box (or random patches when ``patchwise``) in the image,
    set its label region to 255 (generate_unsup_cutout_data, :368-397)."""
    b, h, w, _ = imgs.shape
    if patchwise:
        masks = _batch_patchwise_masks(key, b, (h, w), patchsize, ratio)
    else:
        masks = _batch_box_masks(key, b, (h, w), ratio)
    new_imgs = imgs * masks[..., None]
    lab_full = labels if labels.shape[1:] == (h, w) else \
        resize_nearest(labels, (h, w))
    new_labels = jnp.where(masks > 0.5, lab_full, 255)
    if labels.shape[1:] != (h, w):
        new_labels = resize_nearest(new_labels, labels.shape[1:])
    return new_imgs, new_labels.astype(labels.dtype)


# ---------------------------------------------------------------- ClassMix
def _class_mask(key: jax.Array, label: Array, num_classes: int) -> Array:
    """DACS-style mask over a random 'half' of the classes present in
    ``label`` (generate_class_mask, :518-542): with n present classes
    (255 excluded when others exist), select m = n//2 + 1 of them.
    Fixed-shape: random per-class scores, rank among present classes."""
    flat = label.reshape(-1)
    # presence histogram over [0, num_classes] + ignore bucket
    onehot = jax.nn.one_hot(jnp.clip(flat, 0, num_classes), num_classes + 1,
                            dtype=jnp.int32)
    onehot = onehot * (flat[:, None] != 255)
    present = jnp.sum(onehot, axis=0) > 0  # [C+1], last bucket unused
    present = present[:num_classes]
    n = jnp.sum(present.astype(jnp.int32))
    m = n // 2 + 1
    scores = jax.random.uniform(key, (num_classes,))
    scores = jnp.where(present, scores, jnp.inf)
    order = jnp.argsort(scores)
    ranks = jnp.argsort(order)
    selected = (ranks < m) & present  # [C]
    sel_ext = jnp.concatenate([selected,
                               jnp.zeros((256 - num_classes,), bool)])
    return sel_ext[jnp.clip(label, 0, 255)].astype(jnp.float32)


def _patchwise_class_mask(key: jax.Array, label: Array, num_classes: int,
                          patchsize: int) -> Array:
    """Per-super-patch class mask (generate_patchwise_class_mask,
    :491-515): each ``patchsize``-square selects half of ITS present
    classes independently; 255-pixels are always masked (kept); patches
    with <=1 non-255 classes select nothing."""
    h, w = label.shape
    gh, gw = h // patchsize, w // patchsize
    patches = label.reshape(gh, patchsize, gw, patchsize) \
        .transpose(0, 2, 1, 3).reshape(gh * gw, patchsize, patchsize)

    def per_patch(k, patch):
        flat = patch.reshape(-1)
        onehot = jax.nn.one_hot(jnp.clip(flat, 0, num_classes),
                                num_classes + 1, dtype=jnp.int32)
        onehot = onehot * (flat[:, None] != 255)
        present = (jnp.sum(onehot, axis=0) > 0)[:num_classes]
        n = jnp.sum(present.astype(jnp.int32))
        m = n // 2 + 1
        scores = jnp.where(present, jax.random.uniform(k, (num_classes,)),
                           jnp.inf)
        ranks = jnp.argsort(jnp.argsort(scores))
        selected = (ranks < m) & present & (n > 1)
        sel_ext = jnp.concatenate(
            [selected, jnp.zeros((256 - num_classes,), bool)])
        return (sel_ext[jnp.clip(patch, 0, 255)] | (patch == 255)
                ).astype(jnp.float32)

    masks = jax.vmap(per_patch)(jax.random.split(key, gh * gw), patches)
    return masks.reshape(gh, gw, patchsize, patchsize) \
        .transpose(0, 2, 1, 3).reshape(h, w)


def classmix(key: jax.Array, imgs: Array, labels: Array,
             num_classes: int, patchwise: bool = False,
             patchsize: int = 128) -> Tuple[Array, Array]:
    """(generate_unsup_classmix_data, :665-704): keep pixels of the selected
    classes of sample i, fill the rest from sample i+1. ``patchwise``
    selects classes independently per ``patchsize`` super-patch
    (default 16*8, the reference signature :665)."""
    b, h, w, _ = imgs.shape
    lab_full = labels if labels.shape[1:] == (h, w) else \
        resize_nearest(labels, (h, w))
    keys = jax.random.split(key, b)
    if patchwise:
        masks = jax.vmap(lambda k, lab: _patchwise_class_mask(
            k, lab, num_classes, patchsize))(keys, lab_full)
    else:
        masks = jax.vmap(lambda k, lab: _class_mask(k, lab, num_classes))(
            keys, lab_full)
    nxt = jnp.roll(jnp.arange(b), -1)
    m4 = masks[..., None]
    new_imgs = imgs * m4 + imgs[nxt] * (1.0 - m4)
    new_labels = jnp.where(masks > 0.5, lab_full, lab_full[nxt])
    if labels.shape[1:] != (h, w):
        new_labels = resize_nearest(new_labels, labels.shape[1:])
    return new_imgs, new_labels.astype(labels.dtype)


# ------------------------------------------------------------ PatchShuffle
def patch_shuffle(key: jax.Array, imgs: Array,
                  patchmix_n: int, patch_size: int = 16,
                  patchmix_ratio: float = 0.5
                  ) -> Tuple[Array, Array]:
    """PatchShuffle (generate_unsup_patchmix_data, :737-819).

    With per-sample probability ``patchmix_ratio``, permute the image as
    (patch_size*patchmix_n)^2-pixel super-patches; otherwise identity.
    Returns (new_imgs, perm [B, G*G] int32) where shuffled super-patch j =
    original super-patch perm[j] (identity row = unshuffled sample).
    The permutation feeds the decode-head feature un-shuffle
    (models/decode_heads/base.py:unshuffle_tokens).
    """
    b, h, w, c = imgs.shape
    s = patch_size * patchmix_n
    gg = (h // s) * (w // s)
    kgate, kperm = jax.random.split(key)
    gates = jax.random.bernoulli(kgate, patchmix_ratio, (b,))
    perm_keys = jax.random.split(kperm, b)
    perms = jax.vmap(lambda k: jax.random.permutation(k, gg))(perm_keys)
    identity = jnp.broadcast_to(jnp.arange(gg), (b, gg))
    perms = jnp.where(gates[:, None], perms, identity).astype(jnp.int32)
    return apply_patch_perm(imgs, perms, patchmix_n, patch_size), perms


def apply_patch_perm(imgs: Array, perms: Array, patchmix_n: int,
                     patch_size: int = 16) -> Array:
    """Permute images as (patch_size*patchmix_n)^2 super-patches with the
    given per-sample permutations (identity row = untouched sample). The
    deterministic core of ``patch_shuffle``."""
    b, h, w, c = imgs.shape
    s = patch_size * patchmix_n
    g = h // s
    gg = g * (w // s)
    x = imgs.reshape(b, g, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gg, s, s, c)
    x = jnp.take_along_axis(x, perms[:, :, None, None, None], axis=1)
    x = x.reshape(b, g, w // s, s, s, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


# ------------------------------------------------- mix with labeled images
def mix_with_labeled(imgs: Array, labels: Array,
                     sup_imgs: Array, sup_labels: Array,
                     conf_mask: Array, patch_size: int = 16
                     ) -> Tuple[Array, Array]:
    """Replace fully-unconfident patch_size^2 patches with labeled content
    (encoder_decoder.py:584-594 + generate_mix_with_labeled_data, :545-578).
    """
    b, h, w, _ = imgs.shape
    ph, pw = h // patch_size, w // patch_size
    conf = conf_mask.astype(jnp.float32).reshape(
        b, ph, patch_size, pw, patch_size)
    patch_sum = jnp.sum(conf, axis=(2, 4))  # [B, ph, pw]
    take_labeled = (patch_sum == 0).astype(jnp.float32)
    mask = jnp.repeat(jnp.repeat(take_labeled, patch_size, axis=1),
                      patch_size, axis=2)  # [B, H, W], 1 = labeled
    m4 = mask[..., None]
    new_imgs = sup_imgs * m4 + imgs * (1.0 - m4)
    new_labels = jnp.where(mask > 0.5, sup_labels, labels)
    return new_imgs, new_labels.astype(labels.dtype)


# ---------------------------------------------------------- adaptive CutMix
def cutmix_label_adaptive(key: jax.Array,
                          unlabeled_imgs: Array, hard_labels: Array,
                          max_probs: Array,
                          sup_imgs: Array, sup_labels: Array,
                          confidences: Array
                          ) -> Tuple[Array, Array, Array]:
    """AugSeg-style confidence-adaptive CutMix
    (cut_mix_label_adaptive, generate_unsup_data.py:608-663).

    confidences: [B] per-sample mean(1-entropy)*maxprob scores computed by
    the caller (encoder_decoder.py:608-620). Returns (imgs, labels, probs).
    """
    b, h, w, _ = unlabeled_imgs.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    rand_index = jax.random.permutation(k1, b)
    lam_l = jax.random.beta(k2, 8.0, 2.0)
    lam_u = jax.random.beta(k3, 4.0, 4.0)

    def boxes(key, lam):
        cut_rat = jnp.sqrt(1.0 - lam)
        cut_w = (w * cut_rat).astype(jnp.int32)
        cut_h = (h * cut_rat).astype(jnp.int32)
        kx, ky = jax.random.split(key)
        cx = jax.random.randint(kx, (b,), w // 8, w)
        cy = jax.random.randint(ky, (b,), h // 8, h)
        x1 = jnp.clip(cx - cut_w // 2, 0, w)
        y1 = jnp.clip(cy - cut_h // 2, 0, h)
        x2 = jnp.clip(cx + cut_w // 2, 0, w)
        y2 = jnp.clip(cy + cut_h // 2, 0, h)
        ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
        xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
        # reference indexes rows with bbx (first spatial dim) — keep that
        inside = ((ys >= x1[:, None, None]) & (ys < x2[:, None, None]) &
                  (xs >= y1[:, None, None]) & (xs < y2[:, None, None]))
        return inside

    inside_l = boxes(k4, lam_l)
    inside_u = boxes(k5, lam_u)
    # independent draw for the paste gate (the reference draws torch.rand
    # separately from the permutation; reusing k1 would correlate them)
    paste_lab = (jax.random.uniform(k6, (b,)) > confidences)

    mix_imgs = jnp.where(
        (inside_l & paste_lab[:, None, None])[..., None],
        sup_imgs[rand_index], unlabeled_imgs)
    mix_labels = jnp.where(inside_l & paste_lab[:, None, None],
                           sup_labels[rand_index], hard_labels)
    mix_probs = jnp.where(inside_l & paste_lab[:, None, None],
                          1.0, max_probs)

    out_imgs = jnp.where(inside_u[..., None],
                         mix_imgs[rand_index], unlabeled_imgs)
    out_labels = jnp.where(inside_u, mix_labels[rand_index], hard_labels)
    out_probs = jnp.where(inside_u, mix_probs[rand_index], max_probs)
    return out_imgs, out_labels.astype(hard_labels.dtype), out_probs
