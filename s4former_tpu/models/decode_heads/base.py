"""Decode-head shared machinery: input transform + PatchShuffle undo.

TPU-native rebuild of ``BaseDecodeHead`` helpers
(reference: mmseg/models/decode_heads/decode_head.py):

- ``transform_inputs``: resize_concat / multiple_select / index selection
  (decode_head.py:159-184), NHWC.
- ``unshuffle_tokens``: the ``_repatchmix_inputs`` feature un-shuffle
  (decode_head.py:186-212). The reference carries per-sample permutations in
  ``img_metas`` and un-shuffles with python loops; here the permutation is a
  [B, G*G] int array and the undo is one fixed-shape batched gather, fully
  jit-traceable.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_bilinear

Array = jax.Array


def transform_inputs(inputs: Sequence[Array],
                     in_index: Union[int, Sequence[int]],
                     input_transform: Optional[str] = None,
                     align_corners: bool = False):
    """Select/assemble backbone features (NHWC)."""
    if input_transform == 'resize_concat':
        sel = [inputs[i] for i in in_index]
        target_hw = sel[0].shape[1:3]
        up = [resize_bilinear(x, target_hw, align_corners) for x in sel]
        return jnp.concatenate(up, axis=-1)
    if input_transform == 'multiple_select':
        return [inputs[i] for i in in_index]
    return inputs[in_index]


def invert_permutation(perm: Array) -> Array:
    """Batched inverse permutation: inv[b, perm[b, j]] = j."""
    return jnp.argsort(perm, axis=-1)


def unshuffle_tokens(tokens: Array, perm: Array, patchmix_n: int) -> Array:
    """Undo a PatchShuffle on a token sequence.

    tokens: [B, P*P, C] raster-ordered patch tokens (P patches per side).
    perm:   [B, G*G] with G = P // patchmix_n: the shuffle used on the input
            image, where shuffled super-patch j = original super-patch
            perm[j]. An identity row means that sample was not shuffled.

    Mirrors decode_head.py:186-212 exactly (output super-patch k =
    shuffled super-patch inv[k]) but as one gather.
    """
    b, l, c = tokens.shape
    p = int(round(float(l) ** 0.5))
    n = patchmix_n
    g = p // n
    x = tokens.reshape(b, g, n, g, n, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, n * n, c)
    inv = invert_permutation(perm)
    x = jnp.take_along_axis(x, inv[:, :, None, None], axis=1)
    x = x.reshape(b, g, g, n, n, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, l, c)


def unshuffle_feature_map(feat: Array, perm: Array, patchmix_n: int) -> Array:
    """Same undo on an NHWC feature map whose spatial grid is the patch grid
    (reference get_repatchmix_feat, setr_up_head.py:79-91)."""
    b, h, w, c = feat.shape
    tokens = feat.reshape(b, h * w, c)
    tokens = unshuffle_tokens(tokens, perm, patchmix_n)
    return tokens.reshape(b, h, w, c)
