"""Batch-grouping and loss-weighting utilities.

Rebuild of ``mmseg/models/utils/structual_utils.py`` (reference: :49
``dict_split``, :132 ``weighted_loss``). In the TPU design the loader
already delivers group-separated arrays, so ``dict_split`` is a host-side
helper used at the API boundary; ``weighted_loss`` matches the reference
semantics including the warmup counter.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Union

import jax.numpy as jnp


def dict_split(batch: Dict[str, Sequence], key: str = 'tag'
               ) -> Dict[str, Dict[str, List]]:
    """Group a dict of per-sample lists by ``batch[key]`` values
    (reference structual_utils.py:49). Works on host-side lists, e.g.
    right after the data pipeline."""
    tags = batch[key]
    groups: Dict[str, Dict[str, List]] = {}
    for i, tag in enumerate(tags):
        g = groups.setdefault(tag, {k: [] for k in batch})
        for k, v in batch.items():
            g[k].append(v[i])
    return groups


def weighted_loss(losses: Union[Dict[str, Any], Sequence, Any],
                  weight: float,
                  ignore_keys: Sequence[str] = ('mask_ratio',
                                                'momentum_head'),
                  warmup: int = 0,
                  current_step: int = 0):
    """Scale every loss entry by ``weight`` (reference
    structual_utils.py:132): dicts are scaled per-key (keys in
    ``ignore_keys`` pass through), with optional linear warmup of the
    weight over ``warmup`` steps."""
    w = weight
    if warmup > 0:
        w = weight * min(float(current_step) / warmup, 1.0)
    if isinstance(losses, dict):
        out = {}
        for k, v in losses.items():
            out[k] = v if any(t in k for t in ignore_keys) else v * w
        return out
    if isinstance(losses, (list, tuple)):
        return type(losses)(v * w for v in losses)
    return losses * w
