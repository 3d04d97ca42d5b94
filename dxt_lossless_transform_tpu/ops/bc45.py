"""BC4/BC5 transforms (framework extension; layouts in :mod:`..oracle.bc4`).

Round 2 adds the device path: a BC4 block is exactly the BC3 alpha section
(w0 = ep | h1<<16, w1 = h2 | h3<<16) and a BC5 block is two of them, so large
payloads ride the same transposed-space Pallas kernels / XLA lane ops as BC3's
alpha streams. Small payloads stay on the numpy oracle (device dispatch latency
dominates below ``lanes.device_threshold_bytes``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..estimate.base import SizeEstimation
from ..oracle import bc4 as _oracle
from ..settings import Bc4TransformSettings, Bc5TransformSettings
from . import hostwrap, lanes
from .pallas import shuffle as _pk
from ..errors import Bc4ValidationError, Bc5ValidationError

BC4_BLOCK_SIZE = _oracle.BC4_BLOCK_SIZE
BC5_BLOCK_SIZE = _oracle.BC5_BLOCK_SIZE


# --- XLA fallback backend -------------------------------------------------------------

def _alpha_streams(w0, w1, split: bool):
    ep, h1 = lanes.split_u32(w0)
    h2, h3 = lanes.split_u32(w1)
    aidx = lanes.pack_pairs(lanes.interleave((h1, h2, h3)))
    if split:
        return lanes.pack_quads(ep & 0xFF), lanes.pack_quads(ep >> 8), aidx
    return lanes.pack_pairs(ep), aidx


def _alpha_words(ep_streams, aidxw, split: bool):
    if split:
        a0 = lanes.unpack_quads(ep_streams[0])
        a1 = lanes.unpack_quads(ep_streams[1])
        ep = a0 | (a1 << 8)
    else:
        ep = lanes.unpack_pairs(ep_streams[0])
    h1, h2, h3 = lanes.deinterleave(lanes.unpack_pairs(aidxw), 3)
    return lanes.join_u32(ep, h1), lanes.join_u32(h2, h3)


@partial(jax.jit, static_argnames=("split",))
def _bc4_transform_xla(flat, split: bool):
    w0, w1 = lanes.deinterleave(flat.astype(jnp.uint32), 2)
    return _alpha_streams(w0, w1, split)


@partial(jax.jit, static_argnames=("split",))
def _bc4_untransform_xla(streams, split: bool):
    streams = tuple(streams)
    w0, w1 = _alpha_words(streams[:-1], streams[-1], split)
    return lanes.interleave((w0, w1))


@partial(jax.jit, static_argnames=("split",))
def _bc5_transform_xla(flat, split: bool):
    rw0, rw1, gw0, gw1 = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    r = _alpha_streams(rw0, rw1, split)
    g = _alpha_streams(gw0, gw1, split)
    return r[:-1] + g[:-1] + (r[-1], g[-1])


@partial(jax.jit, static_argnames=("split",))
def _bc5_untransform_xla(streams, split: bool):
    streams = tuple(streams)
    k = 2 if split else 1
    rw0, rw1 = _alpha_words(streams[:k], streams[-2], split)
    gw0, gw1 = _alpha_words(streams[k:2 * k], streams[-1], split)
    return lanes.interleave((rw0, rw1, gw0, gw1))


# --- dispatching device API -----------------------------------------------------------

def bc4_transform_device(flat, split: bool):
    if _pk.pallas_available():
        return _pk.bc4_transform_tpu(flat, split)
    return _bc4_transform_xla(flat, split)


def bc4_untransform_device(streams, split: bool):
    if _pk.pallas_available():
        return _pk.bc4_untransform_tpu(tuple(streams), split)
    return _bc4_untransform_xla(tuple(streams), split)


def bc5_transform_device(flat, split: bool):
    if _pk.pallas_available():
        return _pk.bc5_transform_tpu(flat, split)
    return _bc5_transform_xla(flat, split)


def bc5_untransform_device(streams, split: bool):
    if _pk.pallas_available():
        return _pk.bc5_untransform_tpu(tuple(streams), split)
    return _bc5_untransform_xla(tuple(streams), split)


def _bc4_spec(split: bool) -> Tuple[int, ...]:
    return (1, 1, 6) if split else (2, 6)


def _bc5_spec(split: bool) -> Tuple[int, ...]:
    return (1, 1, 1, 1, 6, 6) if split else (2, 2, 6, 6)


# --- host wrappers (bytes -> bytes, bit-exact) ----------------------------------------

def transform_bc4(data, settings: Bc4TransformSettings = Bc4TransformSettings()) -> bytes:
    if len(data) % BC4_BLOCK_SIZE:
        raise Bc4ValidationError(len(data), BC4_BLOCK_SIZE)
    if len(data) < lanes.device_threshold_bytes():
        return _oracle.transform_bc4(data, settings)
    split = settings.split_endpoints
    return hostwrap.transform_chunked(
        data, BC4_BLOCK_SIZE, 2, _bc4_spec(split),
        lambda flat: bc4_transform_device(flat, split))


def untransform_bc4(data, settings: Bc4TransformSettings = Bc4TransformSettings()) -> bytes:
    if len(data) % BC4_BLOCK_SIZE:
        raise Bc4ValidationError(len(data), BC4_BLOCK_SIZE)
    if len(data) < lanes.device_threshold_bytes():
        return _oracle.untransform_bc4(data, settings)
    split = settings.split_endpoints
    return hostwrap.untransform_chunked(
        data, BC4_BLOCK_SIZE, 2, _bc4_spec(split),
        lambda streams: bc4_untransform_device(streams, split))


def transform_bc5(data, settings: Bc5TransformSettings = Bc5TransformSettings()) -> bytes:
    if len(data) % BC5_BLOCK_SIZE:
        raise Bc5ValidationError(len(data), BC5_BLOCK_SIZE)
    if len(data) < lanes.device_threshold_bytes():
        return _oracle.transform_bc5(data, settings)
    split = settings.split_endpoints
    return hostwrap.transform_chunked(
        data, BC5_BLOCK_SIZE, 4, _bc5_spec(split),
        lambda flat: bc5_transform_device(flat, split))


def untransform_bc5(data, settings: Bc5TransformSettings = Bc5TransformSettings()) -> bytes:
    if len(data) % BC5_BLOCK_SIZE:
        raise Bc5ValidationError(len(data), BC5_BLOCK_SIZE)
    if len(data) < lanes.device_threshold_bytes():
        return _oracle.untransform_bc5(data, settings)
    split = settings.split_endpoints
    return hostwrap.untransform_chunked(
        data, BC5_BLOCK_SIZE, 4, _bc5_spec(split),
        lambda streams: bc5_untransform_device(streams, split))


# --- auto-search ------------------------------------------------------------------------

def transform_bc4_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc4TransformSettings]] = None
                       ) -> Tuple[bytes, Bc4TransformSettings]:
    """Pick the endpoint layout whose stream the estimator ranks smallest."""
    cand = tuple(candidates if candidates is not None
                 else Bc4TransformSettings.all_combinations())
    n = len(data) // BC4_BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    ep = np.frombuffer(data, "<u2").reshape(-1, 4)[:, 0].copy()
    rows = [_oracle._ep_streams(ep, c.split_endpoints) for c in cand]
    best = cand[int(np.argmin(estimator.estimate_batch(rows)))]
    return transform_bc4(data, best), best


def transform_bc5_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc5TransformSettings]] = None
                       ) -> Tuple[bytes, Bc5TransformSettings]:
    cand = tuple(candidates if candidates is not None
                 else Bc5TransformSettings.all_combinations())
    n = len(data) // BC5_BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    halves = np.frombuffer(data, "<u2").reshape(-1, 8)
    r_ep, g_ep = halves[:, 0].copy(), halves[:, 4].copy()
    rows = [_oracle._ep_streams(r_ep, c.split_endpoints)
            + _oracle._ep_streams(g_ep, c.split_endpoints) for c in cand]
    best = cand[int(np.argmin(estimator.estimate_batch(rows)))]
    return transform_bc5(data, best), best
