"""BC3 (DXT4/5) transform / untransform (numpy bit-exact reference).

Block layout (16 bytes, little-endian; reference ``bc3/src/transform/standard/mod.rs:10-45``):

    offset 0:  alpha0, alpha1 (2x u8 alpha endpoints)
    offset 2:  6 bytes of 16x 3-bit alpha indices
    offset 8:  color0 (RGB565 u16 LE), color1 (u16 LE)
    offset 12: 16x 2-bit color indices (u32 LE)

Transformed stream layouts -- 8 families from 3 boolean knobs (reference
``bc3/src/transform/transform_with_settings.rs:44-140``). All offsets in bytes for
N blocks (len = 16N):

    alpha endpoints:  no split -> [a0a1 u16 x N] at 0
                      split    -> [a0 u8 x N] at 0, [a1 u8 x N] at N
    alpha indices:    [6 bytes x N] at 2N (always)
    colors:           no split -> [colors u32 x N] at 8N (possibly decorrelated)
                      split    -> [c0 u16 x N] at 8N, [c1 u16 x N] at 10N
    color indices:    [indices u32 x N] at 12N (always)
"""

from __future__ import annotations

import numpy as np

from .. import endian
from ..settings import Bc3TransformSettings
from .bc1 import decorrelate_colors, recorrelate_colors

BLOCK_SIZE = 16


def _require_len(data: bytes) -> int:
    if len(data) % BLOCK_SIZE != 0:
        raise ValueError(f"BC3 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return len(data) // BLOCK_SIZE


def split_blocks(data) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """De-interleave BC3 bytes into lanes.

    Returns ``(alpha_endpoints u16[N], alpha_indices u16[N,3], colors u32[N],
    color_indices u32[N])``. The 6-byte alpha-index field is carried as 3 u16 lanes
    per block (its exact LE byte image), which keeps everything at >=16-bit lane
    granularity -- the TPU-friendly representation of the reference's awkward 2B/6B
    fields (``bc3-api/README.MD`` perf notes).
    """
    halves = endian.from_bytes(data, "u2").reshape(-1, 8)
    alpha_ep = halves[:, 0].copy()
    alpha_idx = halves[:, 1:4].copy()
    colors = halves[:, 4].astype(np.uint32) | (halves[:, 5].astype(np.uint32) << 16)
    cidx = halves[:, 6].astype(np.uint32) | (halves[:, 7].astype(np.uint32) << 16)
    return alpha_ep, alpha_idx, colors, cidx


def interleave_blocks(alpha_ep, alpha_idx, colors, cidx) -> bytes:
    halves = endian.empty((len(alpha_ep), 8), "u2")
    halves[:, 0] = alpha_ep
    halves[:, 1:4] = alpha_idx
    colors = np.asarray(colors, np.uint32)
    cidx = np.asarray(cidx, np.uint32)
    halves[:, 4] = colors & 0xFFFF
    halves[:, 5] = colors >> 16
    halves[:, 6] = cidx & 0xFFFF
    halves[:, 7] = cidx >> 16
    return endian.to_bytes(halves, "u2")


def transform(data, settings: Bc3TransformSettings = Bc3TransformSettings()) -> bytes:
    _require_len(data)
    alpha_ep, alpha_idx, colors, cidx = split_blocks(data)
    colors = decorrelate_colors(colors, settings.decorrelation_mode)

    parts = []
    if settings.split_alpha_endpoints:
        a = alpha_ep.astype(np.int64)
        parts.append((a & 0xFF).astype(np.uint8).tobytes())       # alpha0 stream at 0
        parts.append(((a >> 8) & 0xFF).astype(np.uint8).tobytes())  # alpha1 stream at N
    else:
        parts.append(endian.to_bytes(alpha_ep, "u2"))             # a0a1 u16 stream at 0
    parts.append(endian.to_bytes(alpha_idx, "u2"))                # 6B/blk stream at 2N
    if settings.split_colour_endpoints:
        c = colors.astype(np.int64)
        parts.append(endian.to_bytes(c & 0xFFFF, "u2"))           # c0 at 8N
        parts.append(endian.to_bytes((c >> 16) & 0xFFFF, "u2"))     # c1 at 10N
    else:
        parts.append(endian.to_bytes(colors, "u4"))               # colors at 8N
    parts.append(endian.to_bytes(cidx, "u4"))                     # color indices at 12N
    return b"".join(parts)


def untransform(data, settings: Bc3TransformSettings = Bc3TransformSettings()) -> bytes:
    n = _require_len(data)
    if settings.split_alpha_endpoints:
        a0 = np.frombuffer(data[:n], dtype=np.uint8).astype(np.int64)
        a1 = np.frombuffer(data[n:2 * n], dtype=np.uint8).astype(np.int64)
        alpha_ep = (a0 | (a1 << 8)).astype(np.uint16)
    else:
        alpha_ep = endian.from_bytes(data[:2 * n], "u2").copy()
    alpha_idx = endian.from_bytes(data[2 * n:8 * n], "u2").reshape(n, 3)
    if settings.split_colour_endpoints:
        c0 = endian.from_bytes(data[8 * n:10 * n], "u2").astype(np.int64)
        c1 = endian.from_bytes(data[10 * n:12 * n], "u2").astype(np.int64)
        colors = (c0 | (c1 << 16)).astype(np.uint32)
    else:
        colors = endian.from_bytes(data[8 * n:12 * n], "u4").copy()
    cidx = endian.from_bytes(data[12 * n:16 * n], "u4")
    colors = recorrelate_colors(colors, settings.decorrelation_mode)
    return interleave_blocks(alpha_ep, alpha_idx, colors, cidx)
