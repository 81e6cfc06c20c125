"""Parameter initialization helpers.

``EncoderDecoder.__call__`` only traces the main head, so initializing via it
would never create aux-head parameters; always init through
``forward_train_heads_from_img`` which touches every submodule.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def init_segmentor_variables(model, rng: jax.Array,
                             img_shape: Tuple[int, int, int, int] = None,
                             dtype=jnp.float32):
    """Initialize all parameter collections of a segmentor.

    Returns the full variables dict ({'params', 'batch_stats', ...}).
    """
    if img_shape is None:
        bb = model.backbone
        size = bb['img_size'] if hasattr(bb, 'keys') else bb.img_size
        if isinstance(size, int):
            size = (size, size)
        img_shape = (1, size[0], size[1], 3)
    img = jnp.zeros(img_shape, dtype)
    return model.init({'params': rng}, img=img, train=False,
                      method='forward_train_heads_from_img')
