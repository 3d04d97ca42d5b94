"""Lane packing/unpacking helpers shared by the device transforms.

Conventions:
- 16-bit quantities travel as ``int32`` lanes (always non-negative, so shifts are safe).
- 32-bit quantities travel as ``uint32`` lanes (top bit is data; shifts are logical).
- The padded-block count for a buffer of N blocks is the next power of two >= 256,
  which bounds the number of distinct compiled shapes to ~log2(max_blocks) per family.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

MIN_BUCKET = 256


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


# --- device-side packing --------------------------------------------------------------

def split_u32(w):
    """uint32 lane -> (lo int32, hi int32) 16-bit halves."""
    w = w.astype(jnp.uint32)
    lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (w >> jnp.uint32(16)).astype(jnp.int32)
    return lo, hi


def join_u32(lo, hi):
    """(lo, hi) 16-bit lanes -> uint32 lane lo | hi<<16."""
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << jnp.uint32(16))


def u16_pairs_to_u32(v):
    """Pack a flat even-length 16-bit lane stream into u32 words (LE pair order)."""
    r = v.reshape(-1, 2)
    return join_u32(r[:, 0], r[:, 1])


def u32_to_u16_pairs(w):
    """Inverse of :func:`u16_pairs_to_u32`: u32 words -> flat 16-bit lane stream."""
    lo, hi = split_u32(w)
    return jnp.stack([lo, hi], axis=-1).reshape(-1)


def u16_to_bytes(v):
    """16-bit lanes -> uint8 byte stream (LE)."""
    v = v.astype(jnp.int32)
    return jnp.stack([v & 0xFF, (v >> 8) & 0xFF], axis=-1).reshape(-1).astype(jnp.uint8)


def u32_to_bytes(w):
    """uint32 lanes -> uint8 byte stream (LE)."""
    w = w.astype(jnp.uint32)
    bs = [(w >> jnp.uint32(8 * i)) & jnp.uint32(0xFF) for i in range(4)]
    return jnp.stack(bs, axis=-1).reshape(-1).astype(jnp.uint8)
