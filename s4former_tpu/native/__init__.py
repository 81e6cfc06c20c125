"""Native (C++) data-path runtime: decode + PIL-parity resampling.

The reference's loader gets its native speed from torch DataLoader worker
processes and PIL/cv2's C internals (reference: mmseg/datasets/
builder.py:116-211, pipelines/loading.py:24,104). This package is the
framework's own native runtime for the same role: ``src/s4_native.cpp``
implements JPEG/PNG decode (libjpeg/libpng) and PIL-semantics
bilinear/nearest resampling with the GIL released, so the thread-pool
loader (data/loader.py) runs decode+aug truly in parallel on multi-core
hosts.

Build model: the extension is compiled in place on first use (g++, ~3 s,
cached as ``_s4_native.so``). Everything degrades gracefully — if the
toolchain or the image libraries are unavailable the callers fall back to
PIL, and ``S4_NATIVE=0`` disables the native path outright. Parity is
pinned by tests/test_native/ (bit-exact vs PIL on decode and resize).
"""
from __future__ import annotations

import os
import subprocess
import sys
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, '_s4_native.so')

_mod = None
_tried = False


def _load():
    """Import the extension, building it in place if needed. None on any
    failure (callers fall back to PIL)."""
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    if os.environ.get('S4_NATIVE', '1') != '1':
        return None
    try:
        if not os.path.exists(_SO):
            subprocess.run(
                ['bash', os.path.join(_DIR, 'build.sh')],
                check=True, capture_output=True, timeout=300)
        import importlib.util
        spec = importlib.util.spec_from_file_location('_s4_native', _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:  # toolchain/libs absent: stay on the PIL path
        _mod = None
    return _mod


def available() -> bool:
    return _load() is not None


def _wrap(res) -> np.ndarray:
    buf, h, w, c = res
    arr = np.frombuffer(buf, np.uint8).reshape(h, w, c)
    return arr[..., 0] if c == 1 else arr


def decode_rgb(data: bytes) -> Optional[np.ndarray]:
    """JPEG/PNG bytes -> RGB uint8 [h, w, 3]; None if native unavailable."""
    m = _load()
    if m is None:
        return None
    return _wrap(m.decode_rgb(data))


def decode_label(data: bytes) -> Optional[np.ndarray]:
    """Label PNG bytes -> uint8 [h, w] raw palette indices / gray values."""
    m = _load()
    if m is None:
        return None
    return _wrap(m.decode_label(data))


def _u8_buf(img: np.ndarray):
    return np.ascontiguousarray(img, np.uint8).data


def convert_u8(img: np.ndarray, alpha: float = 1.0,
               beta: float = 0.0) -> Optional[np.ndarray]:
    """clip(img*alpha + beta, 0, 255) truncated to uint8 (PMD._convert)."""
    m = _load()
    if m is None:
        return None
    out = np.frombuffer(m.convert_u8(_u8_buf(img), float(alpha),
                                     float(beta)), np.uint8)
    return out.reshape(img.shape)


def saturation_u8(img: np.ndarray, alpha: float) -> Optional[np.ndarray]:
    """HSV saturation scale on RGB uint8 [h, w, 3] (cv2 convention)."""
    m = _load()
    if m is None:
        return None
    out = np.frombuffer(m.saturation_u8(_u8_buf(img), float(alpha)),
                        np.uint8)
    return out.reshape(img.shape)


def hue_u8(img: np.ndarray, dh: int) -> Optional[np.ndarray]:
    """HSV hue shift (mod 180) on RGB uint8 [h, w, 3]."""
    m = _load()
    if m is None:
        return None
    return np.frombuffer(m.hue_u8(_u8_buf(img), int(dh)),
                         np.uint8).reshape(img.shape)


def normalize_f32(img: np.ndarray, mean, std) -> Optional[np.ndarray]:
    """(u8 RGB - mean) / std -> float32 [h, w, 3]."""
    m = _load()
    if m is None or img.dtype != np.uint8 or img.ndim != 3 \
            or img.shape[-1] != 3:
        return None
    mean = [float(x) for x in mean]
    std = [float(x) for x in std]
    out = np.frombuffer(m.normalize_f32(_u8_buf(img), *mean, *std),
                        np.float32)
    return out.reshape(img.shape)


def resize_u8(img: np.ndarray, size_wh: Tuple[int, int],
              nearest: bool = False) -> Optional[np.ndarray]:
    """PIL-semantics resize of a uint8 [h, w] or [h, w, c] array.

    Returns None when the native module is unavailable (caller falls back
    to PIL)."""
    m = _load()
    if m is None or img.dtype != np.uint8:
        return None
    ow, oh = int(size_wh[0]), int(size_wh[1])
    squeeze = img.ndim == 2
    a = img[..., None] if squeeze else img
    a = np.ascontiguousarray(a)
    h, w, c = a.shape
    fn = m.resize_nearest if nearest else m.resize_bilinear
    out = _wrap(fn(a.data, h, w, c, oh, ow))
    return out[..., 0] if (squeeze and out.ndim == 3) else out
