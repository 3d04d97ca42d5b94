"""Minimal BC1/BC3 encoders (numpy, range-fit) for corpus generation.

Not part of the reference's surface (it consumes already-encoded DDS files); used
here to synthesize realistic texture corpora for ratio benchmarks and tests. Quality
is range-fit (min/max box endpoints, nearest-palette indices) -- crude visually, but
statistically representative of real BC data for compression purposes.
"""

from __future__ import annotations

import numpy as np

from ..oracle import color565


def _blockify(img: np.ndarray):
    """(H, W, C) -> (N, 16, C) raster-ordered 4x4 blocks."""
    h, w, c = img.shape
    assert h % 4 == 0 and w % 4 == 0
    b = img.reshape(h // 4, 4, w // 4, 4, c).transpose(0, 2, 1, 3, 4)
    return b.reshape(-1, 16, c)


def encode_bc1(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 image to BC1 bytes (opaque, 4-color mode)."""
    blocks = _blockify(np.ascontiguousarray(rgb)).astype(np.int32)
    n = len(blocks)
    # luma-extreme endpoints per block
    luma = blocks @ np.asarray([299, 587, 114])
    lo = blocks[np.arange(n), luma.argmin(1)]
    hi = blocks[np.arange(n), luma.argmax(1)]
    c0 = color565.from_rgb(hi[:, 0], hi[:, 1], hi[:, 2]).astype(np.uint32)
    c1 = color565.from_rgb(lo[:, 0], lo[:, 1], lo[:, 2]).astype(np.uint32)
    # force 4-color mode: c0 > c1 (swap where needed; equal -> indices all 0)
    swap = c0 < c1
    c0s, c1s = np.where(swap, c1, c0), np.where(swap, c0, c1)
    # palette in expanded 8-bit space
    p0 = color565.to_rgba8888(c0s.astype(np.uint16))[:, :3].astype(np.int32)
    p1 = color565.to_rgba8888(c1s.astype(np.uint16))[:, :3].astype(np.int32)
    pal = np.stack([p0, p1, (2 * p0 + p1) // 3, (p0 + 2 * p1) // 3], axis=1)  # (N,4,3)
    dist = ((blocks[:, :, None, :] - pal[:, None, :, :]) ** 2).sum(-1)  # (N,16,4)
    idx = dist.argmin(-1).astype(np.uint32)
    packed = np.zeros(n, np.uint32)
    for k in range(16):
        packed |= idx[:, k] << np.uint32(2 * k)
    words = np.empty((n, 2), "<u4")
    words[:, 0] = c0s | (c1s << 16)
    words[:, 1] = packed
    return words.tobytes()


def encode_bc2(rgba: np.ndarray) -> bytes:
    """Encode an (H, W, 4) uint8 image to BC2 bytes (explicit 4-bit alpha)."""
    color_part = np.frombuffer(encode_bc1(rgba[..., :3]), "<u4").reshape(-1, 2)
    ab = _blockify(rgba[..., 3:4]).astype(np.uint64)[:, :, 0] >> 4  # (N, 16) 4-bit
    n = len(ab)
    field = np.zeros(n, np.uint64)
    for k in range(16):
        field |= ab[:, k] << np.uint64(4 * k)
    words = np.empty((n, 4), "<u4")
    words[:, 0] = (field & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    words[:, 1] = (field >> np.uint64(32)).astype(np.uint32)
    words[:, 2] = color_part[:, 0]
    words[:, 3] = color_part[:, 1]
    return words.tobytes()


def encode_bc3(rgba: np.ndarray) -> bytes:
    """Encode an (H, W, 4) uint8 image to BC3 bytes (range-fit alpha + color)."""
    color_part = np.frombuffer(encode_bc1(rgba[..., :3]), "<u4").reshape(-1, 2)
    ab = _blockify(rgba[..., 3:4]).astype(np.int32)[:, :, 0]  # (N, 16)
    n = len(ab)
    a0 = ab.max(1)
    a1 = ab.min(1)
    # 8-interp mode needs a0 > a1; equal alphas -> indices 0 (select a0)
    lut = np.zeros((n, 8), np.int32)
    lut[:, 0], lut[:, 1] = a0, a1
    for code in range(2, 8):
        w = code - 1
        lut[:, code] = ((8 - code) * a0 + w * a1) // 7
    dist = np.abs(ab[:, :, None] - lut[:, None, :])
    idx = dist.argmin(-1).astype(np.uint64)  # (N,16) 3-bit codes
    field = np.zeros(n, np.uint64)
    for k in range(16):
        field |= idx[:, k] << np.uint64(3 * k)
    words = np.empty((n, 4), "<u4")
    words[:, 0] = (a0.astype(np.uint32) | (a1.astype(np.uint32) << 8)
                   | ((field & np.uint64(0xFFFF)) << np.uint64(16)).astype(np.uint32))
    words[:, 1] = (field >> np.uint64(16)).astype(np.uint32)
    words[:, 2] = color_part[:, 0]
    words[:, 3] = color_part[:, 1]
    return words.tobytes()


def procedural_texture(size: int = 512, seed: int = 0, kind: str = "albedo") -> np.ndarray:
    """Multi-octave value-noise texture, (size, size, 4) uint8 -- a stand-in for
    photographic game textures."""
    rng = np.random.default_rng(seed)
    acc = np.zeros((size, size))
    for octave in range(3, int(np.log2(size))):
        cells = 1 << octave
        grid = rng.standard_normal((cells, cells))
        # bilinear upsample to full size
        up = np.kron(grid, np.ones((size // cells, size // cells)))
        up = (up + np.roll(up, size // cells // 2 or 1, axis=0)
              + np.roll(up, size // cells // 2 or 1, axis=1)) / 3
        acc += up / (1 << (octave - 3))
    acc = (acc - acc.min()) / (np.ptp(acc) + 1e-9)
    base = rng.integers(40, 216, 3)
    tint = rng.standard_normal(3) * 60
    img = np.zeros((size, size, 4), np.uint8)
    for ch in range(3):
        img[..., ch] = np.clip(base[ch] + acc * tint[ch] + rng.normal(0, 3, acc.shape),
                               0, 255).astype(np.uint8)
    if kind == "albedo":
        img[..., 3] = 255
    else:  # alpha-mapped foliage-style
        img[..., 3] = np.clip((acc - 0.4) * 510, 0, 255).astype(np.uint8)
    return img
