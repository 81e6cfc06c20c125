"""Per-class feature memory bank + curriculum class balancing.

Rebuilds of the reference's ablation utilities (no shipped config uses
them, SURVEY.md §2.5 — provided for API completeness):

- ``FeatureMemory`` (reference: mmseg/utils/feature_memory.py:9-146):
  fixed-size per-class bank of high-quality features for contrastive
  objectives. TPU design: a fixed-shape [C, N, D] jnp buffer with ring
  insertion (the reference uses python lists + learned selectors; the
  selector MLP scoring hook is exposed as a callable).
- ``ClassBalancing`` (reference: mmseg/utils/class_balancing.py:13-118):
  curriculum median-frequency class weights from label + pseudo-label
  histograms.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class FeatureMemoryState(NamedTuple):
    bank: Array      # [C, N, D]
    ptr: Array       # [C] int32 ring pointers
    count: Array     # [C] int32 filled counts


def init_feature_memory(num_classes: int, per_class: int,
                        feature_dim: int) -> FeatureMemoryState:
    return FeatureMemoryState(
        bank=jnp.zeros((num_classes, per_class, feature_dim), jnp.float32),
        ptr=jnp.zeros((num_classes,), jnp.int32),
        count=jnp.zeros((num_classes,), jnp.int32),
    )


def add_features(state: FeatureMemoryState,
                 features: Array,  # [P, D]
                 labels: Array,    # [P] int
                 scores: Array,    # [P] quality scores (e.g. selector MLP)
                 per_class_add: int = 32) -> FeatureMemoryState:
    """Insert the top-``per_class_add`` highest-scoring features of each
    class into its ring slot (fixed-shape: rank within class)."""
    c, n, d = state.bank.shape

    def per_class(ci, st):
        bank, ptr, count = st
        mask = (labels == ci)
        masked_scores = jnp.where(mask, scores, -jnp.inf)
        top_idx = jnp.argsort(-masked_scores)[:per_class_add]
        top_valid = mask[top_idx]
        feats = features[top_idx]
        base = ptr[ci]
        slots = (base + jnp.arange(per_class_add)) % n
        old = bank[ci, slots]
        new = jnp.where(top_valid[:, None], feats, old)
        bank = bank.at[ci, slots].set(new)
        added = jnp.sum(top_valid.astype(jnp.int32))
        ptr = ptr.at[ci].set((base + added) % n)
        count = count.at[ci].set(jnp.minimum(count[ci] + added, n))
        return bank, ptr, count

    bank, ptr, count = jax.lax.fori_loop(
        0, c, per_class, (state.bank, state.ptr, state.count))
    return FeatureMemoryState(bank, ptr, count)


def class_balancing_weights(label_hist: Array,
                            pseudo_hist: Optional[Array] = None,
                            ramp: float = 1.0) -> Array:
    """Median-frequency class weights (class_balancing.py:13-118):
    w_c = (median(freq) / freq_c) ** ramp, 0-frequency classes get 1."""
    hist = label_hist.astype(jnp.float32)
    if pseudo_hist is not None:
        hist = hist + pseudo_hist.astype(jnp.float32)
    freq = hist / jnp.maximum(jnp.sum(hist), 1.0)
    present = freq > 0
    med = jnp.median(jnp.where(present, freq, jnp.nan))
    med = jnp.nan_to_num(med, nan=1.0)
    w = jnp.where(present, (med / jnp.maximum(freq, 1e-12)) ** ramp, 1.0)
    return w
