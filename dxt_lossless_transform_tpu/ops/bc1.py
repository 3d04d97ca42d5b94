"""BC1 device transforms.

Stream layouts match the oracle / reference
(``bc1/src/transform/transform_with_settings.rs:41-59``); see :mod:`..oracle.bc1`.

Two device backends behind one word-stream interface (every stream is the exact
little-endian u32 word image of its on-disk bytes):

- Pallas fused kernels (:mod:`.pallas.shuffle`) on TPU -- one read->shuffle->write
  pass per direction (~57 GB/s payload on v5e).
- Plain XLA lane ops otherwise (CPU tests, interpret-unfriendly environments).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..oracle import bc1 as _oracle
from .. import runtime as _native
from ..settings import Bc1TransformSettings
from . import hostwrap, lanes, ycocg
from .pallas import shuffle as _pk
from ..errors import Bc1ValidationError

BLOCK_SIZE = 8


def decorrelate_halves(colors_u32, variant):
    """Apply YCoCg-R (traced variant) to both u16 halves of c0|c1<<16 lanes."""
    c0, c1 = lanes.split_u32(colors_u32)
    return ycocg.decorrelate(c0, variant), ycocg.decorrelate(c1, variant)


def recorrelate_halves(colors_u32, variant):
    c0, c1 = lanes.split_u32(colors_u32)
    return ycocg.recorrelate(c0, variant), ycocg.recorrelate(c1, variant)


# --- XLA fallback backend -------------------------------------------------------------

@partial(jax.jit, static_argnames=("split",))
def _transform_xla(flat, variant, split: bool):
    colors, indices = lanes.deinterleave(flat.astype(jnp.uint32), 2)
    d0, d1 = decorrelate_halves(colors, variant)
    if split:
        return lanes.pack_pairs(d0), lanes.pack_pairs(d1), indices
    return lanes.join_u32(d0, d1), indices


@partial(jax.jit, static_argnames=("split",))
def _untransform_xla(streams, variant, split: bool):
    if split:
        c0w, c1w, idx = streams
        colors = lanes.join_u32(lanes.unpack_pairs(c0w), lanes.unpack_pairs(c1w))
    else:
        colors, idx = streams
    r0, r1 = recorrelate_halves(colors, variant)
    return lanes.interleave((lanes.join_u32(r0, r1), idx.astype(jnp.uint32)))


# --- dispatching device API -----------------------------------------------------------

def transform_device(flat, variant, split: bool):
    """Flat uint32[2N] (N a power of two >= 2048) -> word-stream tuple.

    split: ``(c0w u32[N/2], c1w u32[N/2], idx u32[N])``; else ``(colors, idx)``.
    """
    if _pk.pallas_available():
        return _pk.bc1_transform_tpu(flat, variant, split)
    return _transform_xla(flat, variant, split)


def untransform_device(streams, variant, split: bool):
    """Inverse of :func:`transform_device`; returns flat uint32[2N]."""
    if _pk.pallas_available():
        return _pk.bc1_untransform_tpu(tuple(streams), variant, split)
    return _untransform_xla(tuple(streams), variant, split)


@partial(jax.jit, static_argnames=("variant", "split"))
def transform_words_fused(flat, variant, split: bool):
    """Whole-buffer path: uint32[2N] -> uint32[2N] flat transformed word image."""
    if _pk.pallas_available():
        out = _pk.bc1_transform_tpu.__wrapped__(flat, variant, split, False)
    else:
        out = _transform_xla.__wrapped__(flat, variant, split)
    return jnp.concatenate(out)


@partial(jax.jit, static_argnames=("variant", "split"))
def untransform_words_fused(flat, variant, split: bool):
    """Inverse of :func:`transform_words_fused`: uint32[2N] -> uint32[2N]."""
    n = flat.shape[0] // 2
    colors_words, idx = flat[:n], flat[n:]
    streams = (colors_words[:n // 2], colors_words[n // 2:], idx) if split \
        else (colors_words, idx)
    if _pk.pallas_available():
        return _pk.bc1_untransform_tpu.__wrapped__(streams, variant, split, False)
    return _untransform_xla.__wrapped__(streams, variant, split)


# --- host wrappers (bytes -> bytes, bit-exact) ---------------------------------------

def transform(data, settings: Bc1TransformSettings = Bc1TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise Bc1ValidationError(len(data), BLOCK_SIZE)
    if len(data) == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes():
        if _native.available():
            return _native.bc1_transform(data, int(settings.decorrelation_mode),
                                         settings.split_colour_endpoints)
        return _oracle.transform(data, settings)
    variant = int(settings.decorrelation_mode)
    split = settings.split_colour_endpoints
    return hostwrap.transform_chunked(
        data, BLOCK_SIZE, 2, hostwrap.bc1_stream_spec(settings),
        lambda flat: transform_device(flat, variant, split))


def untransform(data, settings: Bc1TransformSettings = Bc1TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise Bc1ValidationError(len(data), BLOCK_SIZE)
    if len(data) == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes():
        if _native.available():
            return _native.bc1_untransform(data, int(settings.decorrelation_mode),
                                           settings.split_colour_endpoints)
        return _oracle.untransform(data, settings)
    variant = int(settings.decorrelation_mode)
    split = settings.split_colour_endpoints
    return hostwrap.untransform_chunked(
        data, BLOCK_SIZE, 2, hostwrap.bc1_stream_spec(settings),
        lambda streams: untransform_device(streams, variant, split))
