"""BC3 device transforms.

Stream layouts match the oracle / reference
(``bc3/src/transform/transform_with_settings.rs:44-140``); see :mod:`..oracle.bc3`.

The reference calls BC3 "SIMD-unfriendly" because of its 2B+6B alpha fields
(``bc3-api/README.MD:69-95``, AVX512VBMI permutes); here every field is 16-bit lane
math on the u32 word image, with the 6-byte alpha-index stream produced by
elementwise phase packing plus one stride-3 interleave. Word-stream interface with
Pallas fused kernels on TPU and XLA fallback elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..oracle import bc3 as _oracle
from .. import runtime as _native
from ..settings import Bc3TransformSettings
from . import hostwrap, lanes
from .bc1 import decorrelate_halves, recorrelate_halves
from .pallas import shuffle as _pk
from ..errors import Bc3ValidationError

BLOCK_SIZE = 16


@partial(jax.jit, static_argnames=("split_alpha", "split_colour"))
def _transform_xla(flat, variant, split_alpha: bool, split_colour: bool):
    w0, w1, colors, cidx = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    ep, h1 = lanes.split_u32(w0)
    h2, h3 = lanes.split_u32(w1)
    aidx_words = lanes.pack_pairs(lanes.interleave((h1, h2, h3)))
    d0, d1 = decorrelate_halves(colors, variant)
    if split_alpha:
        alpha = (lanes.pack_quads(ep & 0xFF), lanes.pack_quads(ep >> 8))
    else:
        alpha = (lanes.pack_pairs(ep),)
    colours = ((lanes.pack_pairs(d0), lanes.pack_pairs(d1)) if split_colour
               else (lanes.join_u32(d0, d1),))
    return alpha + (aidx_words,) + colours + (cidx,)


@partial(jax.jit, static_argnames=("split_alpha", "split_colour"))
def _untransform_xla(streams, variant, split_alpha: bool, split_colour: bool):
    streams = list(streams)
    if split_alpha:
        a0 = lanes.unpack_quads(streams.pop(0))
        a1 = lanes.unpack_quads(streams.pop(0))
        ep = (a0 & 0xFF) | ((a1 & 0xFF) << 8)
    else:
        ep = lanes.unpack_pairs(streams.pop(0))
    h1, h2, h3 = lanes.deinterleave(lanes.unpack_pairs(streams.pop(0)), 3)
    if split_colour:
        d0 = lanes.unpack_pairs(streams.pop(0))
        d1 = lanes.unpack_pairs(streams.pop(0))
        colors = lanes.join_u32(d0, d1)
    else:
        colors = streams.pop(0)
    cidx = streams.pop(0).astype(jnp.uint32)
    r0, r1 = recorrelate_halves(colors, variant)
    w0 = lanes.join_u32(ep, h1)
    w1 = lanes.join_u32(h2, h3)
    return lanes.interleave((w0, w1, lanes.join_u32(r0, r1), cidx))


def transform_device(flat, variant, split_alpha: bool, split_colour: bool):
    """Flat uint32[4N] -> word streams in on-disk order (see module docstring)."""
    if _pk.pallas_available():
        return _pk.bc3_transform_tpu(flat, variant, split_alpha, split_colour)
    return _transform_xla(flat, variant, split_alpha, split_colour)


def untransform_device(streams, variant, split_alpha: bool, split_colour: bool):
    if _pk.pallas_available():
        return _pk.bc3_untransform_tpu(tuple(streams), variant, split_alpha, split_colour)
    return _untransform_xla(tuple(streams), variant, split_alpha, split_colour)


def _split_flat(flat, n, split_alpha: bool, split_colour: bool):
    head = flat[:2 * n]
    colors_words, cidx = flat[2 * n:3 * n], flat[3 * n:]
    streams = ((head[:n // 4], head[n // 4:n // 2]) if split_alpha
               else (head[:n // 2],))
    streams += (head[n // 2:],)
    streams += ((colors_words[:n // 2], colors_words[n // 2:]) if split_colour
                else (colors_words,))
    return streams + (cidx,)


@partial(jax.jit, static_argnames=("variant", "split_alpha", "split_colour"))
def transform_words_fused(flat, variant, split_alpha: bool, split_colour: bool):
    """uint32[4N] -> uint32[4N] flat transformed word image."""
    if _pk.pallas_available():
        out = _pk.bc3_transform_tpu.__wrapped__(flat, variant, split_alpha,
                                                split_colour, False)
    else:
        out = _transform_xla.__wrapped__(flat, variant, split_alpha, split_colour)
    return jnp.concatenate(out)


@partial(jax.jit, static_argnames=("variant", "split_alpha", "split_colour"))
def untransform_words_fused(flat, variant, split_alpha: bool, split_colour: bool):
    streams = _split_flat(flat, flat.shape[0] // 4, split_alpha, split_colour)
    if _pk.pallas_available():
        return _pk.bc3_untransform_tpu.__wrapped__(streams, variant, split_alpha,
                                                   split_colour, False)
    return _untransform_xla.__wrapped__(streams, variant, split_alpha, split_colour)


# --- host wrappers --------------------------------------------------------------------

def transform(data, settings: Bc3TransformSettings = Bc3TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise Bc3ValidationError(len(data), BLOCK_SIZE)
    if len(data) == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes():
        if _native.available():
            return _native.bc3_transform(data, int(settings.decorrelation_mode),
                                         settings.split_alpha_endpoints,
                                         settings.split_colour_endpoints)
        return _oracle.transform(data, settings)
    variant = int(settings.decorrelation_mode)
    sa, sc = settings.split_alpha_endpoints, settings.split_colour_endpoints
    return hostwrap.transform_chunked(
        data, BLOCK_SIZE, 4, hostwrap.bc3_stream_spec(settings),
        lambda flat: transform_device(flat, variant, sa, sc))


def untransform(data, settings: Bc3TransformSettings = Bc3TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise Bc3ValidationError(len(data), BLOCK_SIZE)
    if len(data) == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes():
        if _native.available():
            return _native.bc3_untransform(data, int(settings.decorrelation_mode),
                                           settings.split_alpha_endpoints,
                                           settings.split_colour_endpoints)
        return _oracle.untransform(data, settings)
    variant = int(settings.decorrelation_mode)
    sa, sc = settings.split_alpha_endpoints, settings.split_colour_endpoints
    return hostwrap.untransform_chunked(
        data, BLOCK_SIZE, 4, hostwrap.bc3_stream_spec(settings),
        lambda streams: untransform_device(streams, variant, sa, sc))
