"""Bilinear point sampling (mmcv.ops.point_sample rebuild).

Samples NHWC feature maps at normalized [0,1] point coordinates with
bilinear interpolation (align_corners=False grid_sample semantics), as a
fixed-shape gather — used by PointRend (reference:
mmseg/models/decode_heads/point_head.py via mmcv point_sample).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def point_sample(x: Array, points: Array,
                 align_corners: bool = False) -> Array:
    """x: [B, H, W, C]; points: [B, P, 2] in [0, 1] (x, y order like
    mmcv). Returns [B, P, C]."""
    b, h, w, c = x.shape
    px = points[..., 0]
    py = points[..., 1]
    if align_corners:
        fx = px * (w - 1)
        fy = py * (h - 1)
    else:
        fx = px * w - 0.5
        fy = py * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]

    def gather(yi, xi):
        # grid_sample padding_mode='zeros': out-of-range taps contribute 0
        valid = ((yi >= 0) & (yi <= h - 1) &
                 (xi >= 0) & (xi <= w - 1))[..., None]
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        flat = x.reshape(b, h * w, c)
        idx = yc * w + xc                       # [B, P]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(valid, vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
