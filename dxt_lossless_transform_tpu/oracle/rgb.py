"""Uncompressed RGB(A) pixel-format transforms (numpy bit-exact reference).

The reference defines embeddable headers for RGBA8888 / BGRA8888 / BGR888 with a
reserved "decorrelation" flag but never implements the transform
(``file-formats-api/src/embed/formats/rgba8888.rs`` notes "decorrelation can still
be applied"; ``handlers/dispatch.rs`` has no arm for these tags). This build
implements it:

- ``decorrelate``: the reversible lifting color transform r' = r - g, b' = b - g
  (mod 256), green and alpha untouched -- the 8-bit analog of the RGB565 YCoCg-R
  decorrelation used for BC1-BC3 endpoints.
- ``split_channels``: de-interleave the pixel stream into per-channel planes
  (``[c0 xN][c1 xN]...``), the uncompressed analog of BC1's endpoint splitting.

Both knobs compose; (False, False) is the identity. Layouts are size-preserving and
the inverse is byte-exact.
"""

from __future__ import annotations

import numpy as np

from ..settings import RgbTransformSettings

# channel byte order within a pixel, and which indices hold R / G / B
_LAYOUTS = {
    "rgba8888": (4, 0, 1, 2),  # bytes R,G,B,A -> r at 0, g at 1, b at 2
    "bgra8888": (4, 2, 1, 0),  # bytes B,G,R,A
    "bgr888": (3, 2, 1, 0),    # bytes B,G,R
}


def _pixels(data, layout: str) -> np.ndarray:
    size = _LAYOUTS[layout][0]
    if len(data) % size:
        raise ValueError(f"{layout} data length {len(data)} not divisible by {size}")
    return np.frombuffer(data, np.uint8).reshape(-1, size)


def _decorrelate(px: np.ndarray, layout: str) -> np.ndarray:
    _, ri, gi, bi = _LAYOUTS[layout]
    out = px.copy()
    out[:, ri] = px[:, ri] - px[:, gi]
    out[:, bi] = px[:, bi] - px[:, gi]
    return out


def _recorrelate(px: np.ndarray, layout: str) -> np.ndarray:
    _, ri, gi, bi = _LAYOUTS[layout]
    out = px.copy()
    out[:, ri] = px[:, ri] + px[:, gi]
    out[:, bi] = px[:, bi] + px[:, gi]
    return out


def transform(data, layout: str,
              settings: RgbTransformSettings = RgbTransformSettings()) -> bytes:
    """Transform an interleaved pixel buffer into the decorrelated/planar layout."""
    px = _pixels(data, layout)
    if px.shape[0] == 0:
        return b""
    if settings.decorrelate:
        px = _decorrelate(px, layout)
    if settings.split_channels:
        return np.ascontiguousarray(px.T).tobytes()
    return px.tobytes()


def untransform(data, layout: str,
                settings: RgbTransformSettings = RgbTransformSettings()) -> bytes:
    """Bit-exact inverse of :func:`transform`."""
    size = _LAYOUTS[layout][0]
    if len(data) % size:
        raise ValueError(f"{layout} data length {len(data)} not divisible by {size}")
    n = len(data) // size
    if n == 0:
        return b""
    raw = np.frombuffer(data, np.uint8)
    px = raw.reshape(size, n).T if settings.split_channels else raw.reshape(n, size)
    if settings.decorrelate:
        px = _recorrelate(px, layout)
    return np.ascontiguousarray(px).tobytes()
