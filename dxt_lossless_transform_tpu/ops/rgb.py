"""Uncompressed RGB(A) pixel-format device transforms.

See :mod:`..oracle.rgb` for the layout definition (reference reserves the header
flag -- ``embed/formats/rgba8888.rs`` -- but ships no transform; this build does).

TPU mapping: one (N, S) -> (S, N) u8 relayout (XLA handles this at ~46 GB/s on v5e)
plus wrapping uint8 adds/subs on whole channel planes -- pure VPU lane work. The
decorrelation is mod-256 lifting, so uint8 wraparound *is* the correct arithmetic.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from ..oracle import rgb as _oracle
from ..oracle.rgb import _LAYOUTS
from .. import runtime as _native
from ..settings import RgbTransformSettings
from . import lanes
from ..errors import RgbValidationError


@partial(jax.jit, static_argnames=("layout", "dec", "split"))
def _transform_xla(px, layout: str, dec: bool, split: bool):
    """uint8[Np, S] pixels -> (S, Np) planes (split) or (Np, S) pixels."""
    _, ri, gi, bi = _LAYOUTS[layout]
    cols = px.T
    if dec:
        cols = cols.at[ri].set(cols[ri] - cols[gi]).at[bi].set(cols[bi] - cols[gi])
    return cols if split else cols.T


@partial(jax.jit, static_argnames=("layout", "dec", "split"))
def _untransform_xla(payload, layout: str, dec: bool, split: bool):
    """Inverse: transformed 2D view -> uint8[Np, S] original pixels."""
    _, ri, gi, bi = _LAYOUTS[layout]
    cols = payload if split else payload.T
    if dec:
        cols = cols.at[ri].set(cols[ri] + cols[gi]).at[bi].set(cols[bi] + cols[gi])
    return cols.T


def transform(data, layout: str,
              settings: RgbTransformSettings = RgbTransformSettings()) -> bytes:
    size = _LAYOUTS[layout][0]
    if len(data) % size:
        raise RgbValidationError(layout, len(data), size)
    n = len(data) // size
    if n == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes() or \
            settings == RgbTransformSettings(False, False):
        if _native.available():
            return _native.rgb_transform(data, layout, settings.decorrelate,
                                         settings.split_channels)
        return _oracle.transform(data, layout, settings)
    px = np.frombuffer(data, np.uint8).reshape(n, size)
    n_pad = lanes.bucket_size(n)
    out = np.asarray(_transform_xla(lanes.pad_rows(px, n_pad), layout,
                                    settings.decorrelate, settings.split_channels))
    body = out[:, :n] if settings.split_channels else out[:n]
    return np.ascontiguousarray(body).tobytes()


def untransform(data, layout: str,
                settings: RgbTransformSettings = RgbTransformSettings()) -> bytes:
    size = _LAYOUTS[layout][0]
    if len(data) % size:
        raise RgbValidationError(layout, len(data), size)
    n = len(data) // size
    if n == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes() or \
            settings == RgbTransformSettings(False, False):
        if _native.available():
            return _native.rgb_untransform(data, layout, settings.decorrelate,
                                           settings.split_channels)
        return _oracle.untransform(data, layout, settings)
    raw = np.frombuffer(data, np.uint8)
    n_pad = lanes.bucket_size(n)
    if settings.split_channels:
        payload = np.ascontiguousarray(lanes.pad_rows(raw.reshape(size, n).T, n_pad).T)
    else:
        payload = lanes.pad_rows(raw.reshape(n, size), n_pad)
    out = np.asarray(_untransform_xla(payload, layout, settings.decorrelate,
                                      settings.split_channels))
    return np.ascontiguousarray(out[:n]).tobytes()


# --- auto-search ------------------------------------------------------------------------

def transform_rgb_auto(data, layout: str, estimator,
                       use_all_decorrelation_modes: bool = False, candidates=None):
    """Pick the pixel layout whose full transformed stream the estimator ranks
    smallest; identity is always a candidate."""
    from ..settings import RGB_FAST_CANDIDATES

    cand = tuple(candidates) if candidates is not None else RGB_FAST_CANDIDATES
    if len(data) == 0:
        return b"", cand[-1]
    rows = [transform(data, layout, s) for s in cand]
    best = int(np.argmin(estimator.estimate_batch(rows)))
    return rows[best], cand[best]
