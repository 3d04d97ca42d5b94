"""Lane packing/unpacking primitives shared by the device transforms.

TPU layout rules (measured on v5e; see git history for the microbenchmarks):

- 1-D contiguous arrays tile fine (~370 GB/s r+w elementwise);
- arrays shaped ``(N, k)`` with tiny trailing dims are catastrophic (lane dim holds
  k of 128 slots -> ~7 GB/s). Every AoS<->SoA step is therefore expressed on wide
  2-D views:
  * de-interleave: ``x.reshape(-1, k*LANE)[:, i::k]`` lane-strided slices (~106 GB/s);
  * interleave: strided ``.at[:, i::k].set()`` into an uninitialized row buffer
    (~55 GB/s);
- 16-bit quantities travel as int32 lanes (non-negative, shift-safe); 32-bit as
  uint32.

Padded block counts are powers of two >= 2048 so every stream length divides the row
width used by these primitives.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LANE = 1024
MIN_BUCKET = 2048


def device_threshold_bytes() -> int:
    """Payloads smaller than this stay on the host (numpy oracle path).

    Device dispatch through the single-chip relay costs tens of ms per call (and
    seconds per first-compile); numpy handles small buffers faster than the round
    trip. Override with ``DLT_DEVICE_MIN_BYTES`` (0 forces everything on device).
    """
    import os

    return int(os.environ.get("DLT_DEVICE_MIN_BYTES", 1 << 20))


def bucket_size(n: int) -> int:
    """Next power of two >= max(n, MIN_BUCKET); compile-cache friendly padding size."""
    b = MIN_BUCKET
    while b < n:
        b <<= 1
    return b


def pad_rows(arr: np.ndarray, n_padded: int) -> np.ndarray:
    """Zero-pad axis 0 of a host array to ``n_padded`` rows."""
    if arr.shape[0] == n_padded:
        return arr
    pad = [(0, n_padded - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def _row_width(size: int, k: int) -> int:
    """Widest lane count w <= LANE such that k*w divides size."""
    assert size % k == 0, (size, k)
    m = size // k
    w = LANE
    while m % w:
        w >>= 1
    return k * w


def deinterleave(x, k: int):
    """Split a flat array of k-interleaved lanes into k contiguous streams.

    ``deinterleave(x, k)[i][j] == x[k*j + i]`` -- the AoS->SoA step.
    """
    rows = x.reshape(-1, _row_width(x.size, k))
    return tuple(rows[:, i::k].reshape(-1) for i in range(k))


def interleave(parts, k: int = None):
    """Inverse of :func:`deinterleave`: merge k streams back into one flat array."""
    parts = tuple(parts)
    k = len(parts) if k is None else k
    size = parts[0].size * k
    w = _row_width(size, k)
    out = jnp.empty((size // w, w), parts[0].dtype)
    per = w // k
    for i, p in enumerate(parts):
        out = out.at[:, i::k].set(p.reshape(-1, per))
    return out.reshape(-1)


def pack_pairs(v):
    """Flat even-length 16-bit lane stream -> u32 words (LE pair order)."""
    lo, hi = deinterleave(v.astype(jnp.uint32), 2)
    return lo | (hi << jnp.uint32(16))


def unpack_pairs(w):
    """Inverse of :func:`pack_pairs`: u32 words -> flat int32 16-bit lane stream."""
    w = w.astype(jnp.uint32)
    lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (w >> jnp.uint32(16)).astype(jnp.int32)
    return interleave((lo, hi))


def pack_quads(v):
    """Flat 8-bit lane stream (int32 values 0..255), length % 4 == 0 -> u32 words."""
    b0, b1, b2, b3 = (b.astype(jnp.uint32) for b in deinterleave(v, 4))
    return b0 | (b1 << jnp.uint32(8)) | (b2 << jnp.uint32(16)) | (b3 << jnp.uint32(24))


def unpack_quads(w):
    """Inverse of :func:`pack_quads`: u32 words -> flat int32 byte-lane stream."""
    w = w.astype(jnp.uint32)
    parts = [((w >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.int32)
             for i in range(4)]
    return interleave(parts)


def split_u32(w):
    """uint32 lane -> (lo int32, hi int32) 16-bit halves (elementwise)."""
    w = w.astype(jnp.uint32)
    lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (w >> jnp.uint32(16)).astype(jnp.int32)
    return lo, hi


def join_u32(lo, hi):
    """(lo, hi) 16-bit lanes -> uint32 lane lo | hi<<16 (elementwise)."""
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << jnp.uint32(16))


def u16_to_byte_lanes(v):
    """16-bit lanes -> flat int32 byte-lane stream (LE), for the device estimator."""
    v = v.astype(jnp.int32)
    return interleave((v & 0xFF, (v >> 8) & 0xFF))


def u32_to_byte_lanes(w):
    """uint32 lanes -> flat int32 byte-lane stream (LE)."""
    return unpack_quads(w)
