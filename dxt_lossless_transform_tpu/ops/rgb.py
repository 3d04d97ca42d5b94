"""Uncompressed RGB(A) pixel-format device transforms.

See :mod:`..oracle.rgb` for the layout definition (reference reserves the header
flag -- ``embed/formats/rgba8888.rs`` -- but ships no transform; this build does).

TPU mapping (round-3 flat redesign): 4-byte layouts ride flat uint32 pixel-word
streams -- channel split/merge are Mosaic kernels with the mod-256 lifting fused
in (``ops/pallas/channels.py``), and the decorrelate-only layout is plain
elementwise byte surgery on u32 lanes. Narrow (N, S) device arrays are avoided
entirely: sub-128-lane minor dims pad to the full tile on TPU (8-32x write
amplification; see ``ops/bc7.py``). BGR888's 3-byte stride rides its own flat
Mosaic pair (12-byte/3-word/4-pixel period, 1536-lane tiles --
``ops/pallas/channels.py:split_bgr_tpu``); dec-only BGR888 and small payloads
keep the XLA fallback / host paths.
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


@partial(jax.jit, static_argnames=("layout", "dec"))
def _decorrelate_words_xla(flat, layout: str, dec: bool):
    """uint32[N] pixel words -> decorrelated words (dec-only, interleaved layout)."""
    import jax.numpy as jnp

    _, ri, gi, bi = _LAYOUTS[layout]
    g = (flat >> jnp.uint32(8 * gi)) & jnp.uint32(0xFF)
    out = flat
    for ci in (ri, bi) if dec else ():
        c = (flat >> jnp.uint32(8 * ci)) & jnp.uint32(0xFF)
        nc = (c - g) & jnp.uint32(0xFF)
        out = (out & ~jnp.uint32(0xFF << (8 * ci))) | (nc << jnp.uint32(8 * ci))
    return out


@partial(jax.jit, static_argnames=("layout", "dec"))
def _recorrelate_words_xla(flat, layout: str, dec: bool):
    """Inverse of :func:`_decorrelate_words_xla`."""
    import jax.numpy as jnp

    _, ri, gi, bi = _LAYOUTS[layout]
    g = (flat >> jnp.uint32(8 * gi)) & jnp.uint32(0xFF)
    out = flat
    for ci in (ri, bi) if dec else ():
        c = (flat >> jnp.uint32(8 * ci)) & jnp.uint32(0xFF)
        nc = (c + g) & jnp.uint32(0xFF)
        out = (out & ~jnp.uint32(0xFF << (8 * ci))) | (nc << jnp.uint32(8 * ci))
    return out


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
    n_pad = lanes.bucket_size(n)
    if size == 4:
        from .pallas.channels import channels_pallas_ok, split_channels_tpu

        _, ri, gi, bi = _LAYOUTS[layout]
        flat = lanes.pad_rows(np.frombuffer(data, "<u4"), n_pad)
        if settings.split_channels and channels_pallas_ok(n_pad):
            streams = split_channels_tpu(flat, ri, gi, bi, settings.decorrelate)
            return b"".join(np.asarray(s).astype("<u4").tobytes()[:n]
                            for s in streams)
        if not settings.split_channels:
            out = np.asarray(_decorrelate_words_xla(flat, layout,
                                                    settings.decorrelate))
            return out[:n].astype("<u4").tobytes()
    if size == 3 and settings.split_channels:
        from .pallas.channels import bgr_pallas_ok, split_bgr_tpu

        if bgr_pallas_ok(n_pad):
            raw = np.zeros(3 * n_pad, np.uint8)
            raw[:len(data)] = np.frombuffer(data, np.uint8)
            streams = split_bgr_tpu(raw.view("<u4"), settings.decorrelate)
            return b"".join(np.asarray(st).astype("<u4").tobytes()[:n]
                            for st in streams)
    px = np.frombuffer(data, np.uint8).reshape(n, size)
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
    if size == 4:
        from .pallas.channels import channels_pallas_ok, merge_channels_tpu

        _, ri, gi, bi = _LAYOUTS[layout]
        if settings.split_channels and channels_pallas_ok(n_pad):
            by_ch = raw.reshape(size, n)
            streams = tuple(lanes.pad_rows(by_ch[c], n_pad).view("<u4")
                            for c in range(size))
            out = np.asarray(merge_channels_tpu(streams, ri, gi, bi,
                                                settings.decorrelate))
            return out[:n].astype("<u4").tobytes()
        if not settings.split_channels:
            flat = lanes.pad_rows(raw.view("<u4"), n_pad)
            out = np.asarray(_recorrelate_words_xla(flat, layout,
                                                    settings.decorrelate))
            return out[:n].astype("<u4").tobytes()
    if size == 3 and settings.split_channels:
        from .pallas.channels import bgr_pallas_ok, merge_bgr_tpu

        if bgr_pallas_ok(n_pad):
            by_ch = raw.reshape(3, n)
            padded = np.zeros((3, n_pad), np.uint8)
            padded[:, :n] = by_ch
            out = np.asarray(merge_bgr_tpu(
                tuple(padded[c].view("<u4") for c in range(3)),
                settings.decorrelate))
            return out.astype("<u4").tobytes()[:3 * n]
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
