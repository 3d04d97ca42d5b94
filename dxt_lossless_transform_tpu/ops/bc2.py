"""BC2 device transforms.

Stream layouts match the oracle / reference
(``bc2/src/transform/transform_with_settings.rs:30-75``); see :mod:`..oracle.bc2`.
Word-stream interface with Pallas fused kernels on TPU and XLA fallback elsewhere
(see :mod:`.bc1` for the backend structure). Alpha is moved, never transformed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..oracle import bc2 as _oracle
from .. import runtime as _native
from ..settings import Bc2TransformSettings
from . import hostwrap, lanes
from .bc1 import decorrelate_halves, recorrelate_halves
from .pallas import shuffle as _pk
from ..errors import Bc2ValidationError

BLOCK_SIZE = 16


@partial(jax.jit, static_argnames=("split",))
def _transform_xla(flat, variant, split: bool):
    a_lo, a_hi, colors, idx = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    alpha_words = lanes.interleave((a_lo, a_hi))
    d0, d1 = decorrelate_halves(colors, variant)
    if split:
        return alpha_words, lanes.pack_pairs(d0), lanes.pack_pairs(d1), idx
    return alpha_words, lanes.join_u32(d0, d1), idx


@partial(jax.jit, static_argnames=("split",))
def _untransform_xla(streams, variant, split: bool):
    if split:
        alpha_words, c0w, c1w, idx = streams
        colors = lanes.join_u32(lanes.unpack_pairs(c0w), lanes.unpack_pairs(c1w))
    else:
        alpha_words, colors, idx = streams
    r0, r1 = recorrelate_halves(colors, variant)
    a_lo, a_hi = lanes.deinterleave(alpha_words.astype(jnp.uint32), 2)
    return lanes.interleave(
        (a_lo, a_hi, lanes.join_u32(r0, r1), idx.astype(jnp.uint32)))


def transform_device(flat, variant, split: bool):
    """Flat uint32[4N] -> ``(alpha_w u32[2N], [c0w, c1w | colors], idx u32[N])``."""
    if _pk.pallas_available():
        return _pk.bc2_transform_tpu(flat, variant, split)
    return _transform_xla(flat, variant, split)


def untransform_device(streams, variant, split: bool):
    if _pk.pallas_available():
        return _pk.bc2_untransform_tpu(tuple(streams), variant, split)
    return _untransform_xla(tuple(streams), variant, split)


@partial(jax.jit, static_argnames=("variant", "split"))
def transform_words_fused(flat, variant, split: bool):
    """uint32[4N] -> uint32[4N] flat transformed word image."""
    if _pk.pallas_available():
        out = _pk.bc2_transform_tpu.__wrapped__(flat, variant, split, False)
    else:
        out = _transform_xla.__wrapped__(flat, variant, split)
    return jnp.concatenate(out)


@partial(jax.jit, static_argnames=("variant", "split"))
def untransform_words_fused(flat, variant, split: bool):
    n = flat.shape[0] // 4
    alpha_words = flat[:2 * n]
    colors_words, idx = flat[2 * n:3 * n], flat[3 * n:]
    streams = ((alpha_words, colors_words[:n // 2], colors_words[n // 2:], idx)
               if split else (alpha_words, colors_words, idx))
    if _pk.pallas_available():
        return _pk.bc2_untransform_tpu.__wrapped__(streams, variant, split, False)
    return _untransform_xla.__wrapped__(streams, variant, split)


# --- host wrappers --------------------------------------------------------------------

def transform(data, settings: Bc2TransformSettings = Bc2TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise Bc2ValidationError(len(data), BLOCK_SIZE)
    if len(data) == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes():
        if _native.available():
            return _native.bc2_transform(data, int(settings.decorrelation_mode),
                                         settings.split_colour_endpoints)
        return _oracle.transform(data, settings)
    variant = int(settings.decorrelation_mode)
    split = settings.split_colour_endpoints
    return hostwrap.transform_chunked(
        data, BLOCK_SIZE, 4, hostwrap.bc2_stream_spec(settings),
        lambda flat: transform_device(flat, variant, split))


def untransform(data, settings: Bc2TransformSettings = Bc2TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise Bc2ValidationError(len(data), BLOCK_SIZE)
    if len(data) == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes():
        if _native.available():
            return _native.bc2_untransform(data, int(settings.decorrelation_mode),
                                           settings.split_colour_endpoints)
        return _oracle.untransform(data, settings)
    variant = int(settings.decorrelation_mode)
    split = settings.split_colour_endpoints
    return hostwrap.untransform_chunked(
        data, BLOCK_SIZE, 4, hostwrap.bc2_stream_spec(settings),
        lambda streams: untransform_device(streams, variant, split))
