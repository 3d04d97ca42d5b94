"""BC7 device ops: mode-aware transform plus the reference's MSB bit utilities.

The reference's BC7 crate is a stub carrying only MSB-order bit helpers ("BC7 has
unusual non-standard bit order"; ``bc7/src/lib.rs:8-13``, ``util/msb_extract_bits.rs:33``,
``util/msb_insert_bits.rs``) while the file-format layer reserves header space for a
real transform (``embed/mod.rs:97-103``). This build implements one -- see
:mod:`..oracle.bc7` for the byte-exact layout definition.

TPU mapping: the transform is a pure permutation, so it compiles to a gather (the
mode-stable sort, computed once as ``argsort`` keys on the host mode stream) plus a
(N, 16) -> (16, N) relayout -- both native XLA data movement with no arithmetic on
the block payload, which keeps it bit-exact by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import bc7 as _oracle
from ..settings import Bc7TransformSettings
from . import lanes

BLOCK_SIZE = 16


# --- MSB-order bit utilities (reference parity) ----------------------------------------

def extract_msb_bits(byte, start: int, end: int):
    """Extract bits [start..end] of a byte in MSB (left-to-right) order, right-aligned.

    Position 0 is the leftmost/most-significant bit (``util/msb_extract_bits.rs:33``).
    Works elementwise on numpy or jax integer arrays.
    """
    assert 0 <= start <= end <= 7
    num_bits = end - start + 1
    mask = (1 << num_bits) - 1
    return (byte >> (7 - end)) & mask


def insert_msb_bits(byte, value, start: int, end: int):
    """Insert ``value`` into bits [start..end] (MSB order) of ``byte``."""
    assert 0 <= start <= end <= 7
    num_bits = end - start + 1
    shift = 7 - end
    mask = ((1 << num_bits) - 1) << shift
    return (byte & ~mask & 0xFF) | ((value << shift) & mask)


# --- device kernels ---------------------------------------------------------------------

@partial(jax.jit, static_argnames=("sort", "planes"))
def _transform_xla(blocks, order, sort: bool, planes: bool):
    """uint8[Np, 16] (+ permutation) -> transformed 2D view; padding rows stay last."""
    x = jnp.take(blocks, order, axis=0) if sort else blocks
    return x.T if planes else x


@partial(jax.jit, static_argnames=("planes",))
def _untransform_xla(payload, inv, planes: bool):
    """Transformed 2D view (+ inverse permutation) -> uint8[Np, 16] original blocks."""
    blocks = payload.T if planes else payload
    return jnp.take(blocks, inv, axis=0)


def transform_device(blocks_u8, order, sort: bool, planes: bool):
    """Device entry: uint8[Np, 16] blocks, int32[Np] sort permutation (identity tail
    for padding rows). Returns the (16, Np) plane-major or (Np, 16) block-major image;
    callers slice off the padding columns/rows."""
    return _transform_xla(blocks_u8, order, sort, planes)


def untransform_device(payload2d, inv, planes: bool):
    """Inverse of :func:`transform_device` given the inverse permutation."""
    return _untransform_xla(payload2d, inv, planes)


# --- host wrappers (bytes -> bytes, bit-exact) ------------------------------------------

def transform(data, settings: Bc7TransformSettings = Bc7TransformSettings()) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise ValueError(f"BC7 data length {len(data)} not divisible by {BLOCK_SIZE}")
    n = len(data) // BLOCK_SIZE
    if n == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes() or \
            settings == Bc7TransformSettings(False, False):
        return _oracle.transform(data, settings)
    blocks = np.frombuffer(data, np.uint8).reshape(n, BLOCK_SIZE)
    n_pad = lanes.bucket_size(n)
    prefix = b""
    order = np.arange(n_pad, dtype=np.int32)
    if settings.sort_by_mode:
        modes = _oracle.block_modes(data)
        prefix = _oracle.pack_mode_stream(modes)
        order[:n] = np.argsort(modes, kind="stable")
    out2d = np.asarray(transform_device(lanes.pad_rows(blocks, n_pad),
                                        jnp.asarray(order),
                                        settings.sort_by_mode,
                                        settings.split_byte_planes))
    body = out2d[:, :n] if settings.split_byte_planes else out2d[:n]
    return prefix + np.ascontiguousarray(body).tobytes()


def untransform(data, settings: Bc7TransformSettings = Bc7TransformSettings()) -> bytes:
    if len(data) == 0:
        return b""
    n = _oracle.original_len(len(data), settings) // BLOCK_SIZE
    if n * BLOCK_SIZE < lanes.device_threshold_bytes() or \
            settings == Bc7TransformSettings(False, False):
        return _oracle.untransform(data, settings)
    msl = _oracle.mode_stream_len(n) if settings.sort_by_mode else 0
    payload = np.frombuffer(data, np.uint8, offset=msl, count=n * BLOCK_SIZE)
    n_pad = lanes.bucket_size(n)
    inv = np.arange(n_pad, dtype=np.int32)
    if settings.sort_by_mode:
        modes = _oracle.unpack_mode_stream(data[:msl], n)
        order = np.argsort(modes, kind="stable")
        inv[order] = np.arange(n, dtype=np.int32)
    if settings.split_byte_planes:
        pl = lanes.pad_rows(payload.reshape(BLOCK_SIZE, n).T, n_pad).T
        pl = np.ascontiguousarray(pl)
    else:
        pl = lanes.pad_rows(payload.reshape(n, BLOCK_SIZE), n_pad)
    out = np.asarray(untransform_device(pl, jnp.asarray(inv),
                                        settings.split_byte_planes))
    return np.ascontiguousarray(out[:n]).tobytes()


# --- auto-search ------------------------------------------------------------------------

def transform_bc7_auto(data, estimator, use_all_decorrelation_modes: bool = False,
                       candidates=None):
    """Pick the mode-layout whose full transformed stream the estimator ranks smallest.

    Unlike BC1-BC3 there is no cheap "endpoints only" estimation region (the mode-
    dependent field layout spans the whole block), so candidates are scored on their
    complete streams. The identity candidate is always in the set, so the chosen
    layout never loses to "no transform" under the estimator's ordering.
    """
    from ..settings import BC7_FAST_CANDIDATES

    cand = tuple(candidates) if candidates is not None else BC7_FAST_CANDIDATES
    if len(data) == 0:
        return b"", cand[-1]
    rows = [transform(data, s) for s in cand]
    best = int(np.argmin(estimator.estimate_batch(rows)))
    return rows[best], cand[best]
