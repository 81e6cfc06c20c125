"""Projection / contrastive heads (ablation hooks).

Rebuilds of the reference's contrastive machinery
(reference: mmseg/models/decode_heads/projection_head.py,
feature_contrast.py:197, feature_contrast_v2.py:191, vit_cls_head.py —
constructor hooks exist in the segmentor, encoder_decoder.py:165-173, but
no shipped config uses them; provided for API completeness).
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from s4former_tpu.registry import HEADS

Array = jax.Array


@HEADS.register_module()
class ProjectionHead(nn.Module):
    """(ref projection_head.py:10-60, the ACTIVE class — the
    BaseDecodeHead variant below it is commented out): two towers of
    Linear -> BatchNorm1d -> ReLU -> Linear. ``__call__`` is the
    reference's ``forward`` (proj tower); ``predict_proj`` applies the
    predictor tower. Input is flat [P, in_channels] pixel features (the
    BN1d statistics pool over P)."""
    in_channels: int = 768
    channels: int = 256
    in_index: int = -1
    init_cfg: Optional[Union[dict, list]] = None

    def _tower(self, x, name, train):
        x = nn.Dense(self.channels, name=f'{name}_fc1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name=f'{name}_bn')(x)
        x = nn.relu(x)
        return nn.Dense(self.channels, name=f'{name}_fc2')(x)

    @nn.compact
    def __call__(self, inputs, *, train: bool = False,
                 predict: bool = False, **kwargs) -> Array:
        x = inputs[self.in_index] if isinstance(inputs, (list, tuple)) \
            else inputs
        proj = self._tower(x, 'proj', train)
        # BYOL-style predictor (ref predict_proj) applied to the
        # projection; both towers always materialize so ingestion maps
        # the full state_dict
        pred = self._tower(proj, 'predict', train)
        return pred if predict else proj


@HEADS.register_module()
class ViTClsHead(nn.Module):
    """Classification head over the ViT cls token (vit_cls_head.py)."""
    in_channels: int = 768
    num_classes: int = 1000
    init_cfg: Optional[Union[dict, list]] = None

    @nn.compact
    def __call__(self, cls_token: Array, *, train: bool = False) -> Array:
        return nn.Dense(self.num_classes, name='fc')(cls_token)


# the reference registers it as 'ViTCLSHead' (vit_cls_head.py:14) — alias
# so ported configs resolve
HEADS.register_module(name='ViTCLSHead', module=ViTClsHead)


@HEADS.register_module()
class FeatureContrast(nn.Module):
    """(ref feature_contrast.py:13-190), exact v1 machinery: per-class
    selector MLPs (Linear + BN1d + LeakyReLU(0.2) + Linear->1, one pair
    per class for features and memory), stacked over the class axis.

    ``__call__`` computes the v1 loss on fixed shapes: per class, the
    selector-weighted mean of (1 - cosine) distances between the class's
    pixel features and its memory slots. Reference quirks kept:
    (a) the memory-side rescale permutes BEFORE normalizing, so
    ``(1/w)*w == 1`` — the memory weighting is a NO-OP; (b) only classes
    with >1 memory slots AND >1 pixels contribute; (c) feature weights
    rescale by count/sum so they average to 1. ``rank_scores`` exposes
    the update-path selector (the reference sorts ASCENDING and keeps
    the LOWEST-scored features — also kept, see add_features ordering).
    Selector BN statistics pool over the class's own pixels (masked
    moments; eval mode uses running stats like the reference's
    ``selector.eval()`` ranking path)."""
    channels: int = 256
    num_classes: int = 21
    # config-parity fields (ref constructor), unused in the math
    dataset: str = 'pascal_voc'
    num_samples: int = 0
    memory_per_class: int = 2048
    feature_size: int = 256
    n_classes: Optional[int] = None
    ignore_label: int = 255

    def _selector(self, x, mask, name, train):
        """Stacked per-class selector: x [P, D], mask [C, P] bool ->
        scores [C, P] (sigmoid applied by the caller)."""
        c = self.num_classes
        d = self.channels
        w1 = self.param(f'{name}_fc1_kernel',
                        nn.initializers.lecun_normal(), (c, d, d))
        b1 = self.param(f'{name}_fc1_bias', nn.initializers.zeros, (c, d))
        scale = self.param(f'{name}_bn_scale', nn.initializers.ones,
                           (c, d))
        bias = self.param(f'{name}_bn_bias', nn.initializers.zeros,
                          (c, d))
        w2 = self.param(f'{name}_fc2_kernel',
                        nn.initializers.lecun_normal(), (c, d, 1))
        b2 = self.param(f'{name}_fc2_bias', nn.initializers.zeros, (c, 1))
        mean_v = self.variable('batch_stats', f'{name}_bn_mean',
                               jnp.zeros, (c, d))
        var_v = self.variable('batch_stats', f'{name}_bn_var',
                              jnp.ones, (c, d))
        y = jnp.einsum('pd,cde->cpe', x, w1) + b1[:, None]   # [C, P, D]
        m = mask[..., None].astype(y.dtype)
        if train and not self.is_initializing():
            cnt = jnp.maximum(jnp.sum(m, axis=1, keepdims=True), 1.0)
            mu = jnp.sum(y * m, axis=1, keepdims=True) / cnt
            var = jnp.sum(((y - mu) ** 2) * m, axis=1, keepdims=True) / cnt
            mean_v.value = 0.9 * mean_v.value + 0.1 * mu[:, 0]
            var_v.value = 0.9 * var_v.value + 0.1 * var[:, 0]
        else:
            mu = mean_v.value[:, None]
            var = var_v.value[:, None]
        y = (y - mu) / jnp.sqrt(var + 1e-5) * scale[:, None] + \
            bias[:, None]
        y = jnp.where(y >= 0, y, 0.2 * y)                    # LeakyReLU
        return (jnp.einsum('cpd,cdo->cpo', y, w2) + b2[:, None])[..., 0]

    @nn.compact
    def __call__(self, features: Array, class_labels: Array,
                 memory_bank: Array, memory_count: Array,
                 train: bool = False) -> Array:
        """features [P, D]; class_labels [P]; memory_bank [C, N, D];
        memory_count [C]."""
        c, n, d = memory_bank.shape
        mask = (class_labels[None, :] ==
                jnp.arange(c)[:, None])                      # [C, P]
        slot_valid = (jnp.arange(n)[None, :] <
                      memory_count[:, None])                 # [C, N]
        mem = memory_bank / jnp.maximum(
            jnp.linalg.norm(memory_bank, axis=-1, keepdims=True), 1e-12)
        feat_n = features / jnp.maximum(
            jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
        dist = 1.0 - jnp.einsum('pd,cnd->cpn', feat_n, mem)  # [C, P, N]
        # feature-side selector weights (detached input like the ref)
        scores = self._selector(jax.lax.stop_gradient(features), mask,
                                'selector', train)
        w = nn.sigmoid(scores)                               # [C, P]
        cnt = jnp.sum(mask.astype(w.dtype), axis=1)          # [C]
        wsum = jnp.sum(jnp.where(mask, w, 0.0), axis=1)
        w = (cnt / jnp.maximum(wsum, 1e-12))[:, None] * w
        # memory-side selector runs (its grads train it) but its rescale
        # is the reference's (1/w)*w == 1 no-op
        _ = self._selector(mem.reshape(c * n, d)[:1], mask[:, :1],
                           'selector_memory', False) * 0.0
        pair_valid = mask[:, :, None] & slot_valid[:, None, :]
        weighted = dist * w[:, :, None]
        per_class = jnp.sum(jnp.where(pair_valid, weighted, 0.0),
                            axis=(1, 2)) / jnp.maximum(
            jnp.sum(pair_valid.astype(w.dtype), axis=(1, 2)), 1.0)
        active = (memory_count > 1) & (cnt > 1)
        loss = jnp.sum(jnp.where(active, per_class, 0.0))
        return loss / self.num_classes


def feature_contrast_loss(features: Array, labels: Array,
                          memory_bank: Array, memory_count: Array,
                          temperature: float = 0.1) -> Array:
    """Supervised pixel-contrastive loss against a per-class memory bank
    (feature_contrast.py): pull pixel embeddings toward their class's
    banked features, push from other classes'. Fixed-shape masked softmax.

    features [P, D] l2-normalized; labels [P] int; memory_bank [C, N, D];
    memory_count [C] valid counts.
    """
    c, n, d = memory_bank.shape
    flat_bank = memory_bank.reshape(c * n, d)
    slot_class = jnp.repeat(jnp.arange(c), n)
    slot_valid = (jnp.arange(n)[None, :] <
                  memory_count[:, None]).reshape(-1)
    sims = features @ flat_bank.T / temperature          # [P, C*N]
    sims = jnp.where(slot_valid[None, :], sims, -1e30)
    logsum_all = jax.nn.logsumexp(sims, axis=1)
    pos_mask = (slot_class[None, :] == labels[:, None]) & slot_valid[None]
    pos_sims = jnp.where(pos_mask, sims, -1e30)
    logsum_pos = jax.nn.logsumexp(pos_sims, axis=1)
    has_pos = jnp.any(pos_mask, axis=1)
    per_pixel = jnp.where(has_pos, logsum_all - logsum_pos, 0.0)
    return jnp.sum(per_pixel) / jnp.maximum(
        jnp.sum(has_pos.astype(jnp.float32)), 1.0)


def _l2norm(x: Array, eps: float = 1e-12) -> Array:
    # torch F.normalize semantics: x / max(||x||, eps); zero rows -> 0.
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def feature_contrast_loss_v2(features: Array, labels: Array,
                             memory_bank: Array, memory_count: Array,
                             negative: bool = False,
                             n_classes: Optional[int] = None) -> Array:
    """Exact rebuild of FeatureContrastV2.forward
    (ref feature_contrast_v2.py:136-191), fixed-shape.

    Reference semantics mirrored precisely:
    - per class c < n_classes with >1 banked rows AND >1 pixels of that
      class, the contribution is mean over all (pixel, bank-row) pairs of
      (1 - cos) — algebraically 1 - mean(norm feats_c) . mean(norm mem_c)
      (the bank rows are re-normalized in the loss even though the update
      stores means of normalized vectors);
    - ``negative=True``: for each contributing class, adds the mean over
      OTHER classes with >0 banked rows of mean-(1 + sim) — computed
      against the RAW bank rows (the reference normalizes memory only in
      the positive branch, feature_contrast_v2.py:176-180) — then divides
      the total by ``n_classes - 1``, NOT by the number of contributing
      classes: the reference's inner loop reuses the outer counter
      variable ``n_c`` (feature_contrast_v2.py:172 ``for n_c in
      range(self.n_classes)``), clobbering it to n_classes-1. Kept as-is.
    - ``negative=False`` divides by num_classes (= bank C).
    - no contributing class: the reference returns int 0 (negative=False)
      or raises ZeroDivisionError (negative=True); we return 0.0 in both
      cases (documented divergence, unreachable crash path).

    features [P, D] raw (normalized inside); labels [P] int;
    memory_bank [C, N, D]; memory_count [C] valid counts; ``n_classes``
    limits the class loop (defaults to C, the reference's num_classes).
    """
    c, n, d = memory_bank.shape
    nc = c if n_classes is None else n_classes
    feats = _l2norm(features)                                    # [P, D]
    slot_valid = (jnp.arange(n)[None, :] <
                  memory_count[:, None]).astype(feats.dtype)     # [C, N]
    mem_mean = jnp.sum(_l2norm(memory_bank) * slot_valid[..., None],
                       axis=1) / jnp.maximum(
        memory_count[:, None].astype(feats.dtype), 1.0)          # [C, D]
    cls_mask = (labels[:, None] == jnp.arange(nc)[None, :]
                ).astype(feats.dtype)                            # [P, nc]
    cls_cnt = jnp.sum(cls_mask, axis=0)                          # [nc]
    feat_mean = (cls_mask.T @ feats) / jnp.maximum(
        cls_cnt[:, None], 1.0)                                   # [nc, D]
    contrib = (cls_cnt > 1) & (memory_count[:nc] > 1)            # [nc]
    pos = 1.0 - jnp.sum(feat_mean * mem_mean[:nc], axis=-1)      # [nc]
    loss = jnp.sum(jnp.where(contrib, pos, 0.0))
    if not negative:
        return loss / c
    raw_mem_mean = jnp.sum(memory_bank * slot_valid[..., None],
                           axis=1) / jnp.maximum(
        memory_count[:, None].astype(feats.dtype), 1.0)          # [C, D]
    sims = feat_mean @ raw_mem_mean[:nc].T                       # [nc, nc]
    other = ((jnp.arange(nc)[:, None] != jnp.arange(nc)[None, :])
             & (memory_count[None, :nc] > 0))                    # [c, o]
    neg_sum = jnp.sum(jnp.where(other, 1.0 + sims, 0.0), axis=1)
    n_c_cnt = jnp.sum(other.astype(feats.dtype), axis=1)
    neg = jnp.where(n_c_cnt > 0, neg_sum / jnp.maximum(n_c_cnt, 1.0), 0.0)
    loss = loss + jnp.sum(jnp.where(contrib, neg, 0.0))
    return jnp.where(jnp.any(contrib), loss / (nc - 1), 0.0)


def add_mean_features_v2(bank: Array, count: Array, features: Array,
                         labels: Array,
                         n_classes: Optional[int] = None
                         ) -> tuple[Array, Array]:
    """Exact rebuild of FeatureContrastV2.add_features_from_sample_learned
    (ref feature_contrast_v2.py:118-134, the ACTIVE uncommented path; the
    herding selector above it is commented out in the reference, as is the
    use of ``per_class_samples_per_image``/``elements_per_class``):
    per class with >=1 pixel, append ONE slot — the mean of that class's
    l2-normalized features; once full, FIFO-shift the bank left and write
    the mean into the last slot.

    bank [C, N, D]; count [C] int32; features [P, D] raw; labels [P] int.
    Returns the updated (bank, count).
    """
    c, n, d = bank.shape
    nc = c if n_classes is None else n_classes
    feats = _l2norm(features)

    def per_class(ci, st):
        bk, cnt = st
        mask = (labels == ci)
        m = jnp.sum(mask.astype(feats.dtype))
        mean_c = jnp.sum(feats * mask[:, None].astype(feats.dtype),
                         axis=0) / jnp.maximum(m, 1.0)
        bank_c = bk[ci]
        saved = cnt[ci]
        full = saved + 1 > n
        shifted = jnp.roll(bank_c, -1, axis=0).at[n - 1].set(mean_c)
        appended = jax.lax.dynamic_update_slice(
            bank_c, mean_c[None].astype(bank_c.dtype), (saved, 0))
        new_bank_c = jnp.where(full, shifted, appended)
        new_bank_c = jnp.where(m > 0, new_bank_c, bank_c)
        new_saved = jnp.where(m > 0, jnp.minimum(saved + 1, n), saved)
        return bk.at[ci].set(new_bank_c), cnt.at[ci].set(new_saved)

    return jax.lax.fori_loop(0, nc, per_class, (bank, count))
