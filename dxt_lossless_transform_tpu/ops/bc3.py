"""BC3 device transforms (JAX).

Stream layouts match the oracle / reference
(``bc3/src/transform/transform_with_settings.rs:44-140``); see :mod:`..oracle.bc3`.

The reference calls BC3 "SIMD-unfriendly" because of its 2B+6B alpha fields
(``bc3-api/README.MD:69-95``, AVX512VBMI permutes); on TPU the whole block is just
eight 16-bit lanes per block -- the alpha-index field is carried as 3 u16 lanes, and
every family reduces to elementwise mask/shift plus reshapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import Bc3TransformSettings
from . import lanes
from .bc1 import decorrelate_pair, recorrelate_pair

BLOCK_SIZE = 16


@partial(jax.jit, static_argnames=("split_alpha", "split_colour"))
def transform_words(words, variant, split_alpha: bool, split_colour: bool):
    """BC3 transform on uint32 block words (N, 4).

    Word columns: [a0|a1<<8|i0<<16|i1<<24, i2|i3<<8|i4<<16|i5<<24, colors, color_indices].

    Returns a tuple of logical streams in on-disk order:
      alpha endpoints (``(a0_u8, a1_u8)`` if split_alpha else ``(alpha_ep_u16,)``),
      then ``aidx`` int32 (N,3) u16 lanes, then colours (``(c0, c1)`` if split_colour
      else ``(colors_u32,)``), then ``cidx`` uint32.
    """
    w0 = words[:, 0].astype(jnp.uint32)
    w1 = words[:, 1].astype(jnp.uint32)
    ep = (w0 & jnp.uint32(0xFFFF)).astype(jnp.int32)
    h1 = (w0 >> jnp.uint32(16)).astype(jnp.int32)
    h2 = (w1 & jnp.uint32(0xFFFF)).astype(jnp.int32)
    h3 = (w1 >> jnp.uint32(16)).astype(jnp.int32)
    aidx = jnp.stack([h1, h2, h3], axis=1)
    d0, d1 = decorrelate_pair(words[:, 2], variant)
    cidx = words[:, 3].astype(jnp.uint32)

    alpha = ((ep & 0xFF, ep >> 8) if split_alpha else (ep,))
    colours = ((d0, d1) if split_colour else (lanes.join_u32(d0, d1),))
    return alpha + (aidx,) + colours + (cidx,)


@partial(jax.jit, static_argnames=("split_alpha", "split_colour"))
def untransform_words(streams, variant, split_alpha: bool, split_colour: bool):
    """Inverse of :func:`transform_words`; returns uint32 block words (N, 4)."""
    streams = list(streams)
    if split_alpha:
        a0, a1 = streams.pop(0), streams.pop(0)
        ep = (a0 & 0xFF) | ((a1 & 0xFF) << 8)
    else:
        ep = streams.pop(0)
    aidx = streams.pop(0)
    if split_colour:
        d0, d1 = streams.pop(0), streams.pop(0)
        colors = lanes.join_u32(d0, d1)
    else:
        colors = streams.pop(0)
    cidx = streams.pop(0).astype(jnp.uint32)
    r0, r1 = recorrelate_pair(colors, variant)
    w0 = lanes.join_u32(ep, aidx[:, 0])
    w1 = lanes.join_u32(aidx[:, 1], aidx[:, 2])
    return jnp.stack([w0, w1, lanes.join_u32(r0, r1), cidx], axis=1)


@partial(jax.jit, static_argnames=("split_alpha", "split_colour"))
def transform_words_fused(words, variant, split_alpha: bool, split_colour: bool):
    """uint32[N,4] -> uint32[4N] flat transformed words (byte-exact LE image)."""
    out = transform_words(words, variant, split_alpha, split_colour)
    out = list(out)
    if split_alpha:
        a0, a1 = out.pop(0), out.pop(0)
        s = jnp.concatenate([a0, a1])           # 2N bytes -> N u16 lanes
        pairs = s.reshape(-1, 2)
        alpha_u16 = (pairs[:, 0] & 0xFF) | ((pairs[:, 1] & 0xFF) << 8)
    else:
        alpha_u16 = out.pop(0)
    aidx = out.pop(0)                           # (N, 3) u16 lanes at byte offset 2N
    head_u16 = jnp.concatenate([alpha_u16, aidx.reshape(-1)])   # 8N bytes total
    head_words = lanes.u16_pairs_to_u32(head_u16)
    if split_colour:
        d0, d1 = out.pop(0), out.pop(0)
        colors_words = lanes.u16_pairs_to_u32(jnp.concatenate([d0, d1]))
    else:
        colors_words = out.pop(0)
    cidx = out.pop(0)
    return jnp.concatenate([head_words, colors_words, cidx])


@partial(jax.jit, static_argnames=("split_alpha", "split_colour"))
def untransform_words_fused(flat, variant, split_alpha: bool, split_colour: bool):
    n = flat.shape[0] // 4
    head_u16 = lanes.u32_to_u16_pairs(flat[:2 * n])             # 4N u16 lanes
    alpha_u16, aidx = head_u16[:n], head_u16[n:].reshape(-1, 3)
    if split_alpha:
        s = jnp.stack([alpha_u16 & 0xFF, (alpha_u16 >> 8) & 0xFF], axis=-1).reshape(-1)
        alpha = (s[:n], s[n:])
    else:
        alpha = (alpha_u16,)
    colors_words = flat[2 * n:3 * n]
    if split_colour:
        s = lanes.u32_to_u16_pairs(colors_words)
        colours = (s[:n], s[n:])
    else:
        colours = (colors_words,)
    streams = alpha + (aidx,) + colours + (flat[3 * n:],)
    return untransform_words(streams, variant, split_alpha, split_colour)


# --- host wrappers --------------------------------------------------------------------

def _words_from_bytes(data) -> np.ndarray:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC3 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return np.frombuffer(data, dtype="<u4").reshape(-1, 4)


def transform(data, settings: Bc3TransformSettings = Bc3TransformSettings()) -> bytes:
    words = _words_from_bytes(data)
    n = len(words)
    if n == 0:
        return b""
    padded = lanes.pad_rows(words, lanes.bucket_size(n))
    variant = jnp.int32(int(settings.decorrelation_mode))
    out = list(jax.device_get(transform_words(
        padded, variant, settings.split_alpha_endpoints, settings.split_colour_endpoints)))
    parts = []
    if settings.split_alpha_endpoints:
        parts.append(out.pop(0)[:n].astype(np.uint8).tobytes())
        parts.append(out.pop(0)[:n].astype(np.uint8).tobytes())
    else:
        parts.append(out.pop(0)[:n].astype("<u2").tobytes())
    parts.append(out.pop(0)[:n].astype("<u2").tobytes())        # aidx (N,3)
    if settings.split_colour_endpoints:
        parts.append(out.pop(0)[:n].astype("<u2").tobytes())
        parts.append(out.pop(0)[:n].astype("<u2").tobytes())
    else:
        parts.append(out.pop(0)[:n].astype("<u4").tobytes())
    parts.append(out.pop(0)[:n].astype("<u4").tobytes())
    return b"".join(parts)


def untransform(data, settings: Bc3TransformSettings = Bc3TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC3 data length {len(data)} not divisible by {BLOCK_SIZE}")
    n = len(data) // BLOCK_SIZE
    if n == 0:
        return b""
    npad = lanes.bucket_size(n)
    variant = jnp.int32(int(settings.decorrelation_mode))
    streams = []
    if settings.split_alpha_endpoints:
        streams.append(lanes.pad_rows(
            np.frombuffer(data[:n], np.uint8).astype(np.int32), npad))
        streams.append(lanes.pad_rows(
            np.frombuffer(data[n:2 * n], np.uint8).astype(np.int32), npad))
    else:
        streams.append(lanes.pad_rows(
            np.frombuffer(data[:2 * n], "<u2").astype(np.int32), npad))
    streams.append(lanes.pad_rows(
        np.frombuffer(data[2 * n:8 * n], "<u2").astype(np.int32).reshape(n, 3), npad))
    if settings.split_colour_endpoints:
        streams.append(lanes.pad_rows(
            np.frombuffer(data[8 * n:10 * n], "<u2").astype(np.int32), npad))
        streams.append(lanes.pad_rows(
            np.frombuffer(data[10 * n:12 * n], "<u2").astype(np.int32), npad))
    else:
        streams.append(lanes.pad_rows(np.frombuffer(data[8 * n:12 * n], "<u4"), npad))
    streams.append(lanes.pad_rows(np.frombuffer(data[12 * n:16 * n], "<u4"), npad))
    words = untransform_words(
        tuple(streams), variant, settings.split_alpha_endpoints,
        settings.split_colour_endpoints)
    return np.asarray(jax.device_get(words))[:n].astype("<u4").tobytes()
