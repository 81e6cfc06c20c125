"""Inference paths: whole-image, sliding-window, flip TTA.

Rebuild of the reference inference stack
(reference: mmseg/models/segmentors/encoder_decoder.py:1068-1271):

- ``whole_inference``: encode_decode + bilinear resize to target size.
- ``slide_inference``: overlapping crops averaged by a count matrix
  (:1068-1116). The reference runs a python loop of device calls per crop;
  here the loop is a ``lax.fori_loop`` with dynamic-slice + scatter-add so
  the whole sliding window compiles to ONE XLA program (SURVEY.md §5
  long-context note) — crop grid is static, so there is exactly one
  compilation per image shape.
- ``inference``: softmax + optional horizontal-flip averaging (:1174-1212).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s4former_tpu.ops.resize import resize_bilinear

Array = jax.Array


def whole_inference(apply_fn, img: Array,
                    out_hw: Optional[Tuple[int, int]] = None,
                    align_corners: bool = False) -> Array:
    """apply_fn(img) -> logits at img resolution; resized to out_hw."""
    logits = apply_fn(img)
    if out_hw is not None and logits.shape[1:3] != tuple(out_hw):
        logits = resize_bilinear(logits, tuple(out_hw), align_corners)
    return logits


def slide_inference(apply_fn, img: Array, num_classes: int,
                    crop_size: Tuple[int, int],
                    stride: Tuple[int, int],
                    out_hw: Optional[Tuple[int, int]] = None,
                    align_corners: bool = False) -> Array:
    """Overlapping-window logits, count-normalized (reference :1068-1116).

    Window coordinates follow the reference exactly: starts at
    i*stride clipped so the last window ends at the image edge.
    """
    b, h, w, _ = img.shape
    ch, cw = crop_size
    sh, sw = stride
    grid_h = max(h - ch + sh - 1, 0) // sh + 1
    grid_w = max(w - cw + sw - 1, 0) // sw + 1

    # static list of window origins (python ints -> no dynamic shapes)
    origins = []
    for i in range(grid_h):
        for j in range(grid_w):
            y = min(i * sh, h - ch)
            x = min(j * sw, w - cw)
            origins.append((y, x))
    ys = jnp.asarray([o[0] for o in origins], jnp.int32)
    xs = jnp.asarray([o[1] for o in origins], jnp.int32)

    preds0 = jnp.zeros((b, h, w, num_classes), jnp.float32)
    count0 = jnp.zeros((1, h, w, 1), jnp.float32)

    def body(k, carry):
        preds, count = carry
        y, x = ys[k], xs[k]
        crop = jax.lax.dynamic_slice(img, (0, y, x, 0), (b, ch, cw,
                                                         img.shape[3]))
        logits = apply_fn(crop).astype(jnp.float32)
        pred_patch = jax.lax.dynamic_slice(
            preds, (0, y, x, 0), (b, ch, cw, num_classes))
        preds = jax.lax.dynamic_update_slice(
            preds, pred_patch + logits, (0, y, x, 0))
        cnt_patch = jax.lax.dynamic_slice(count, (0, y, x, 0),
                                          (1, ch, cw, 1))
        count = jax.lax.dynamic_update_slice(
            count, cnt_patch + 1.0, (0, y, x, 0))
        return preds, count

    preds, count = jax.lax.fori_loop(0, len(origins), body, (preds0, count0))
    logits = preds / count
    if out_hw is not None and tuple(out_hw) != (h, w):
        logits = resize_bilinear(logits, tuple(out_hw), align_corners)
    return logits


def inference(apply_fn, img: Array, num_classes: int,
              mode: str = 'whole',
              out_hw: Optional[Tuple[int, int]] = None,
              crop_size: Tuple[int, int] = (512, 512),
              stride: Tuple[int, int] = (341, 341),
              flip: bool = False,
              align_corners: bool = False) -> Array:
    """Softmax probabilities with optional flip averaging (:1174-1212)."""
    def probs_of(x):
        if mode == 'slide':
            logits = slide_inference(apply_fn, x, num_classes, crop_size,
                                     stride, out_hw, align_corners)
        else:
            logits = whole_inference(apply_fn, x, out_hw, align_corners)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    probs = probs_of(img)
    if flip:
        probs_f = probs_of(img[:, :, ::-1, :])
        probs = 0.5 * (probs + probs_f[:, :, ::-1, :])
    return probs


def predict(apply_fn, img: Array, num_classes: int, **kwargs) -> Array:
    """argmax segmentation map [B, H, W] int32 (simple_test, :1214-1232)."""
    probs = inference(apply_fn, img, num_classes, **kwargs)
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)
