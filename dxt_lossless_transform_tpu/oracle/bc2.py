"""BC2 (DXT2/3) transform / untransform (numpy bit-exact reference).

Block layout (16 bytes, little-endian; reference
``bc2/src/transform/standard/mod.rs:16-40``):

    offset 0:  8 bytes explicit 4-bit-per-pixel alpha (u64 LE lane)
    offset 8:  color0 (RGB565 u16 LE), color1 (u16 LE)
    offset 12: 16x 2-bit color indices (u32 LE)

Transformed stream layouts (reference ``bc2/src/transform/transform_with_settings.rs:30-75``):

    no split: [alpha u64 x N][colors u32 x N @ len/2][indices u32 x N @ 3*len/4]
    split:    [alpha u64 x N][c0 u16 x N @ len/2][c1 u16 x N @ len/2+len/8][indices @ len/2+len/4]

Alpha bytes are moved to their own stream but never themselves transformed
(reference ``bc2/src/transform/settings.rs:17-28``).
"""

from __future__ import annotations

import numpy as np

from .. import endian
from ..settings import Bc2TransformSettings
from .bc1 import decorrelate_colors, recorrelate_colors

BLOCK_SIZE = 16


def _require_len(data: bytes) -> int:
    if len(data) % BLOCK_SIZE != 0:
        raise ValueError(f"BC2 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return len(data) // BLOCK_SIZE


def split_blocks(data) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """De-interleave BC2 bytes into (alpha u64[N], colors u32[N], indices u32[N])."""
    words = endian.from_bytes(data, "u4").reshape(-1, 4)
    alpha = words[:, 0].astype(np.uint64) | (words[:, 1].astype(np.uint64) << np.uint64(32))
    return alpha, words[:, 2].copy(), words[:, 3].copy()


def interleave_blocks(alpha: np.ndarray, colors: np.ndarray, indices: np.ndarray) -> bytes:
    words = endian.empty((len(colors), 4), "u4")
    words[:, 0] = (alpha & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    words[:, 1] = (alpha >> np.uint64(32)).astype(np.uint32)
    words[:, 2] = colors
    words[:, 3] = indices
    return endian.to_bytes(words, "u4")


def transform(data, settings: Bc2TransformSettings = Bc2TransformSettings()) -> bytes:
    _require_len(data)
    alpha, colors, indices = split_blocks(data)
    colors = decorrelate_colors(colors, settings.decorrelation_mode)
    parts = [endian.to_bytes(alpha, "u8")]
    if settings.split_colour_endpoints:
        c = colors.astype(np.int64)
        parts.append(endian.to_bytes(c & 0xFFFF, "u2"))
        parts.append(endian.to_bytes((c >> 16) & 0xFFFF, "u2"))
    else:
        parts.append(endian.to_bytes(colors, "u4"))
    parts.append(endian.to_bytes(indices, "u4"))
    return b"".join(parts)


def untransform(data, settings: Bc2TransformSettings = Bc2TransformSettings()) -> bytes:
    n = _require_len(data)
    half = len(data) // 2
    alpha = endian.from_bytes(data[:half], "u8").copy()
    if settings.split_colour_endpoints:
        eighth = len(data) // 8
        c0 = endian.from_bytes(data[half:half + eighth], "u2").astype(np.int64)
        c1 = endian.from_bytes(data[half + eighth:half + 2 * eighth], "u2").astype(np.int64)
        colors = (c0 | (c1 << 16)).astype(np.uint32)
        indices = endian.from_bytes(data[half + 2 * eighth:], "u4")
    else:
        quarter = len(data) // 4
        colors = endian.from_bytes(data[half:half + quarter], "u4").copy()
        indices = endian.from_bytes(data[half + quarter:], "u4")
    colors = recorrelate_colors(colors, settings.decorrelation_mode)
    assert len(colors) == n
    return interleave_blocks(alpha, colors, indices)
