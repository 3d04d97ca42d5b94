"""BC2 device transforms (JAX).

Stream layouts match the oracle / reference
(``bc2/src/transform/transform_with_settings.rs:30-75``); see :mod:`..oracle.bc2`.
Alpha travels as two uint32 lanes (lo/hi halves of the u64 alpha field) and is moved,
never transformed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import Bc2TransformSettings
from . import lanes
from .bc1 import decorrelate_pair, recorrelate_pair

BLOCK_SIZE = 16


@partial(jax.jit, static_argnames=("split",))
def transform_words(words, variant, split: bool):
    """BC2 transform on uint32 block words (N, 4) = [alpha_lo, alpha_hi, colors, indices].

    Returns ``(alpha_lo, alpha_hi, c0, c1, indices)`` when ``split`` else
    ``(alpha_lo, alpha_hi, colors, indices)``.
    """
    a_lo = words[:, 0].astype(jnp.uint32)
    a_hi = words[:, 1].astype(jnp.uint32)
    d0, d1 = decorrelate_pair(words[:, 2], variant)
    idx = words[:, 3].astype(jnp.uint32)
    if split:
        return a_lo, a_hi, d0, d1, idx
    return a_lo, a_hi, lanes.join_u32(d0, d1), idx


@partial(jax.jit, static_argnames=("split",))
def untransform_words(streams, variant, split: bool):
    if split:
        a_lo, a_hi, d0, d1, idx = streams
        colors = lanes.join_u32(d0, d1)
    else:
        a_lo, a_hi, colors, idx = streams
    r0, r1 = recorrelate_pair(colors, variant)
    return jnp.stack(
        [a_lo.astype(jnp.uint32), a_hi.astype(jnp.uint32),
         lanes.join_u32(r0, r1), idx.astype(jnp.uint32)], axis=1)


@partial(jax.jit, static_argnames=("split",))
def transform_words_fused(words, variant, split: bool):
    """uint32[N,4] -> uint32[4N] flat transformed words (byte-exact LE image)."""
    out = transform_words(words, variant, split)
    alpha_words = jnp.stack([out[0], out[1]], axis=1).reshape(-1)
    if split:
        _, _, d0, d1, idx = out
        colors_words = lanes.u16_pairs_to_u32(jnp.concatenate([d0, d1]))
    else:
        _, _, colors_words, idx = out
    return jnp.concatenate([alpha_words, colors_words, idx])


@partial(jax.jit, static_argnames=("split",))
def untransform_words_fused(flat, variant, split: bool):
    n = flat.shape[0] // 4
    alpha = flat[:2 * n].reshape(-1, 2)
    colors_words, idx = flat[2 * n:3 * n], flat[3 * n:]
    if split:
        s = lanes.u32_to_u16_pairs(colors_words)
        streams = (alpha[:, 0], alpha[:, 1], s[:n], s[n:], idx)
    else:
        streams = (alpha[:, 0], alpha[:, 1], colors_words, idx)
    return untransform_words(streams, variant, split)


# --- host wrappers --------------------------------------------------------------------

def _words_from_bytes(data) -> np.ndarray:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC2 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return np.frombuffer(data, dtype="<u4").reshape(-1, 4)


def transform(data, settings: Bc2TransformSettings = Bc2TransformSettings()) -> bytes:
    words = _words_from_bytes(data)
    n = len(words)
    if n == 0:
        return b""
    padded = lanes.pad_rows(words, lanes.bucket_size(n))
    variant = jnp.int32(int(settings.decorrelation_mode))
    out = jax.device_get(transform_words(padded, variant, settings.split_colour_endpoints))
    alpha = np.empty((n, 2), dtype="<u4")
    alpha[:, 0] = out[0][:n]
    alpha[:, 1] = out[1][:n]
    parts = [alpha.tobytes()]
    if settings.split_colour_endpoints:
        parts += [out[2][:n].astype("<u2").tobytes(), out[3][:n].astype("<u2").tobytes()]
        parts.append(out[4][:n].astype("<u4").tobytes())
    else:
        parts += [out[2][:n].astype("<u4").tobytes(), out[3][:n].astype("<u4").tobytes()]
    return b"".join(parts)


def untransform(data, settings: Bc2TransformSettings = Bc2TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC2 data length {len(data)} not divisible by {BLOCK_SIZE}")
    n = len(data) // BLOCK_SIZE
    if n == 0:
        return b""
    half = len(data) // 2
    npad = lanes.bucket_size(n)
    variant = jnp.int32(int(settings.decorrelation_mode))
    alpha = np.frombuffer(data[:half], dtype="<u4").reshape(-1, 2)
    a_lo = lanes.pad_rows(alpha[:, 0].copy(), npad)
    a_hi = lanes.pad_rows(alpha[:, 1].copy(), npad)
    if settings.split_colour_endpoints:
        eighth = len(data) // 8
        d0 = lanes.pad_rows(np.frombuffer(data[half:half + eighth], "<u2").astype(np.int32), npad)
        d1 = lanes.pad_rows(
            np.frombuffer(data[half + eighth:half + 2 * eighth], "<u2").astype(np.int32), npad)
        idx = lanes.pad_rows(np.frombuffer(data[half + 2 * eighth:], "<u4"), npad)
        words = untransform_words((a_lo, a_hi, d0, d1, idx), variant, True)
    else:
        quarter = len(data) // 4
        colors = lanes.pad_rows(np.frombuffer(data[half:half + quarter], "<u4"), npad)
        idx = lanes.pad_rows(np.frombuffer(data[half + quarter:], "<u4"), npad)
        words = untransform_words((a_lo, a_hi, colors, idx), variant, False)
    return np.asarray(jax.device_get(words))[:n].astype("<u4").tobytes()
