"""BC1 (DXT1) transform / untransform (numpy bit-exact reference).

Block layout (8 bytes, little-endian; reference
``bc1/src/transform/standard/mod.rs:6-38``):

    offset 0: color0 (RGB565, u16 LE)
    offset 2: color1 (RGB565, u16 LE)
    offset 4: 16x 2-bit color indices (u32 LE)

Transformed stream layouts (reference ``bc1/src/transform/transform_with_settings.rs:41-59``):

    no split: [colors u32 x N][indices u32 x N]            (colors possibly decorrelated)
    split:    [c0 u16 x N][c1 u16 x N][indices u32 x N]    (c1 at len/4, indices at len/2)

The inverse is byte-exact.
"""

from __future__ import annotations

import numpy as np

from .. import endian
from ..settings import Bc1TransformSettings, YCoCgVariant
from . import ycocg

BLOCK_SIZE = 8


def _require_len(data: bytes) -> int:
    if len(data) % BLOCK_SIZE != 0:
        raise ValueError(f"BC1 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return len(data) // BLOCK_SIZE


def split_blocks(data) -> tuple[np.ndarray, np.ndarray]:
    """De-interleave BC1 bytes into (colors u32[N], indices u32[N]) lanes."""
    words = endian.from_bytes(data, "u4").reshape(-1, 2)
    return words[:, 0].copy(), words[:, 1].copy()


def interleave_blocks(colors: np.ndarray, indices: np.ndarray) -> bytes:
    """Inverse of :func:`split_blocks`: rebuild interleaved BC1 bytes."""
    words = endian.empty((len(colors), 2), "u4")
    words[:, 0] = colors
    words[:, 1] = indices
    return endian.to_bytes(words, "u4")


def decorrelate_colors(colors_u32: np.ndarray, variant: int) -> np.ndarray:
    """Apply YCoCg-R to both u16 halves of interleaved c0|c1<<16 u32 lanes."""
    if int(variant) == int(YCoCgVariant.NONE):
        return np.asarray(colors_u32, np.uint32)
    c = np.asarray(colors_u32, np.int64)
    c0 = ycocg.decorrelate(c & 0xFFFF, variant).astype(np.int64)
    c1 = ycocg.decorrelate((c >> 16) & 0xFFFF, variant).astype(np.int64)
    return (c0 | (c1 << 16)).astype(np.uint32)


def recorrelate_colors(colors_u32: np.ndarray, variant: int) -> np.ndarray:
    if int(variant) == int(YCoCgVariant.NONE):
        return np.asarray(colors_u32, np.uint32)
    c = np.asarray(colors_u32, np.int64)
    c0 = ycocg.recorrelate(c & 0xFFFF, variant).astype(np.int64)
    c1 = ycocg.recorrelate((c >> 16) & 0xFFFF, variant).astype(np.int64)
    return (c0 | (c1 << 16)).astype(np.uint32)


def transform(data, settings: Bc1TransformSettings = Bc1TransformSettings()) -> bytes:
    """Transform interleaved BC1 data into the compressible stream layout."""
    _require_len(data)
    colors, indices = split_blocks(data)
    colors = decorrelate_colors(colors, settings.decorrelation_mode)
    if settings.split_colour_endpoints:
        c = colors.astype(np.int64)
        return (endian.to_bytes(c & 0xFFFF, "u2")
                + endian.to_bytes((c >> 16) & 0xFFFF, "u2")
                + endian.to_bytes(indices, "u4"))
    return endian.to_bytes(colors, "u4") + endian.to_bytes(indices, "u4")


def untransform(data, settings: Bc1TransformSettings = Bc1TransformSettings()) -> bytes:
    """Bit-exact inverse of :func:`transform`."""
    n = _require_len(data)
    half = len(data) // 2
    if settings.split_colour_endpoints:
        quarter = len(data) // 4
        c0 = endian.from_bytes(data[:quarter], "u2").astype(np.int64)
        c1 = endian.from_bytes(data[quarter:half], "u2").astype(np.int64)
        colors = (c0 | (c1 << 16)).astype(np.uint32)
    else:
        colors = endian.from_bytes(data[:half], "u4").copy()
    indices = endian.from_bytes(data[half:], "u4")
    colors = recorrelate_colors(colors, settings.decorrelation_mode)
    assert len(colors) == n
    return interleave_blocks(colors, indices)
