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


def feature_contrast_loss_v2(features: Array, labels: Array,
                             memory_bank: Array, memory_count: Array,
                             negative: bool = False) -> Array:
    """V2 variant (feature_contrast_v2.py): drops the learned per-class
    selector MLPs of v1 — features are l2-normalized and pulled toward the
    MEAN of their class's banked features by plain (1 - cosine) distance;
    ``negative=True`` additionally pushes away the other classes' means.

    features [P, D]; labels [P] int; memory_bank [C, N, D] l2-normalized;
    memory_count [C] valid counts.
    """
    c, n, d = memory_bank.shape
    feats = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    slot_valid = (jnp.arange(n)[None, :] < memory_count[:, None])
    class_mean = jnp.sum(memory_bank * slot_valid[..., None], axis=1) / \
        jnp.maximum(memory_count[:, None].astype(jnp.float32), 1.0)
    class_mean = class_mean / jnp.maximum(
        jnp.linalg.norm(class_mean, axis=-1, keepdims=True), 1e-12)
    cos = feats @ class_mean.T                              # [P, C]
    has_bank = memory_count > 0                             # [C]
    own = jnp.take_along_axis(cos, labels[:, None], axis=1)[:, 0]
    valid = has_bank[labels] & (labels < c)
    pull = jnp.where(valid, 1.0 - own, 0.0)
    loss = jnp.sum(pull) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0)
    if negative:
        other = (labels[:, None] != jnp.arange(c)[None]) & has_bank[None]
        push = jnp.sum(jnp.where(other, jnp.maximum(cos, 0.0), 0.0),
                       axis=1) / jnp.maximum(
            jnp.sum(other.astype(jnp.float32), axis=1), 1.0)
        loss = loss + jnp.sum(jnp.where(valid, push, 0.0)) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0)
    return loss
