"""BC1 device transforms (JAX).

Stream layouts match the oracle / reference
(``bc1/src/transform/transform_with_settings.rs:41-59``); see :mod:`..oracle.bc1`.

Design: the device core operates on uint32 block words ``(N, 2)`` (column 0 =
c0|c1<<16, column 1 = indices) and returns *logical streams*; the host wrapper
handles byte-exact (de)serialization, zero-padding to a size bucket, and exact-length
slicing. A fused whole-buffer words->words path is provided for on-device pipelines
and benchmarking (one array in, one array out, no host assembly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import Bc1TransformSettings
from . import lanes, ycocg

BLOCK_SIZE = 8


# --- device cores ---------------------------------------------------------------------

def decorrelate_pair(colors_u32, variant):
    """Apply YCoCg-R (traced variant) to both u16 halves of c0|c1<<16 lanes."""
    c0, c1 = lanes.split_u32(colors_u32)
    both = jnp.stack([c0, c1])           # decorrelate once over both endpoint lanes
    d = ycocg.decorrelate(both, variant)
    return d[0], d[1]


def recorrelate_pair(colors_u32, variant):
    c0, c1 = lanes.split_u32(colors_u32)
    both = jnp.stack([c0, c1])
    r = ycocg.recorrelate(both, variant)
    return r[0], r[1]


@partial(jax.jit, static_argnames=("split",))
def transform_words(words, variant, split: bool):
    """BC1 transform on uint32 block words (N, 2).

    Returns ``(c0, c1, indices)`` int32/uint32 stream lanes when ``split`` else
    ``(colors_u32, indices)``.
    """
    d0, d1 = decorrelate_pair(words[:, 0], variant)
    idx = words[:, 1].astype(jnp.uint32)
    if split:
        return d0, d1, idx
    return lanes.join_u32(d0, d1), idx


@partial(jax.jit, static_argnames=("split",))
def untransform_words(streams, variant, split: bool):
    """Inverse of :func:`transform_words`; returns uint32 block words (N, 2)."""
    if split:
        d0, d1, idx = streams
        colors = lanes.join_u32(d0, d1)
    else:
        colors, idx = streams
    r0, r1 = recorrelate_pair(colors, variant)
    return jnp.stack([lanes.join_u32(r0, r1), idx.astype(jnp.uint32)], axis=1)


@partial(jax.jit, static_argnames=("split",))
def transform_words_fused(words, variant, split: bool):
    """Whole-buffer path: uint32[N,2] -> uint32[2N] flat transformed words.

    The flat word image equals the byte-exact transformed buffer (LE). Used by the
    on-device pipeline and throughput benches.
    """
    out = transform_words(words, variant, split)
    if split:
        d0, d1, idx = out
        colors_words = lanes.u16_pairs_to_u32(jnp.concatenate([d0, d1]))
    else:
        colors_words, idx = out
    return jnp.concatenate([colors_words, idx])


@partial(jax.jit, static_argnames=("split",))
def untransform_words_fused(flat, variant, split: bool):
    """Inverse of :func:`transform_words_fused`: uint32[2N] -> uint32[N,2]."""
    n = flat.shape[0] // 2
    colors_words, idx = flat[:n], flat[n:]
    if split:
        s = lanes.u32_to_u16_pairs(colors_words)
        streams = (s[:n], s[n:], idx)
    else:
        streams = (colors_words, idx)
    return untransform_words(streams, variant, split)


# --- host wrappers (bytes -> bytes, bit-exact) ---------------------------------------

def _words_from_bytes(data) -> np.ndarray:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC1 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return np.frombuffer(data, dtype="<u4").reshape(-1, 2)


def transform(data, settings: Bc1TransformSettings = Bc1TransformSettings()) -> bytes:
    words = _words_from_bytes(data)
    n = len(words)
    if n == 0:
        return b""
    padded = lanes.pad_rows(words, lanes.bucket_size(n))
    variant = jnp.int32(int(settings.decorrelation_mode))
    if settings.split_colour_endpoints:
        d0, d1, idx = transform_words(padded, variant, True)
        d0, d1, idx = jax.device_get((d0, d1, idx))
        return (d0[:n].astype("<u2").tobytes() + d1[:n].astype("<u2").tobytes()
                + idx[:n].astype("<u4").tobytes())
    colors, idx = jax.device_get(transform_words(padded, variant, False))
    return colors[:n].astype("<u4").tobytes() + idx[:n].astype("<u4").tobytes()


def untransform(data, settings: Bc1TransformSettings = Bc1TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC1 data length {len(data)} not divisible by {BLOCK_SIZE}")
    n = len(data) // BLOCK_SIZE
    if n == 0:
        return b""
    half = len(data) // 2
    npad = lanes.bucket_size(n)
    variant = jnp.int32(int(settings.decorrelation_mode))
    idx = lanes.pad_rows(np.frombuffer(data[half:], dtype="<u4"), npad)
    if settings.split_colour_endpoints:
        q = len(data) // 4
        d0 = lanes.pad_rows(np.frombuffer(data[:q], dtype="<u2").astype(np.int32), npad)
        d1 = lanes.pad_rows(np.frombuffer(data[q:half], dtype="<u2").astype(np.int32), npad)
        words = untransform_words((d0, d1, idx), variant, True)
    else:
        colors = lanes.pad_rows(np.frombuffer(data[:half], dtype="<u4"), npad)
        words = untransform_words((colors, idx), variant, False)
    return np.asarray(jax.device_get(words))[:n].astype("<u4").tobytes()
