"""Palette overlay for qualitative results (reference: BaseSegmentor
.show_result, mmseg/models/segmentors/base.py:278-350)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def colorize(seg: np.ndarray,
             palette: Optional[Sequence[Sequence[int]]]) -> np.ndarray:
    if palette is None:
        # datasets registered without a PALETTE: seeded random colors,
        # like the reference's state.palette fallback (base.py:295-300)
        palette = np.random.RandomState(42).randint(
            0, 255, (256, 3)).tolist()
    pal = np.asarray(palette, np.uint8)
    seg = np.clip(seg, 0, len(pal) - 1)
    return pal[seg]


def paint_result(img_or_path, seg: np.ndarray,
                 palette: Sequence[Sequence[int]],
                 opacity: float = 0.5) -> np.ndarray:
    """Blend the colorized segmentation onto the image (base.py:316-339)."""
    if isinstance(img_or_path, str):
        from PIL import Image
        img = np.asarray(Image.open(img_or_path).convert('RGB'))
    else:
        img = np.asarray(img_or_path)
    if img.shape[:2] != seg.shape:
        from PIL import Image
        img = np.asarray(Image.fromarray(img).resize(
            (seg.shape[1], seg.shape[0]), Image.BILINEAR))
    color = colorize(seg, palette)
    out = img * (1 - opacity) + color * opacity
    return out.astype(np.uint8)
