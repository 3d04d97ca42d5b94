"""YCoCg-R reversible decorrelation of RGB565 lanes (numpy, vectorized).

Behavioral reference: ``dxt-lossless-transform-common/src/color_565/decorrelate.rs``
(var1 fwd :101-127, var1 inv :148-171, var2 :187-251, var3 :274-345, dispatch :364-398).

The transform is a lifting scheme on the three 5-bit fields (the green low bit is
carried through untouched), fully reversible in 5-bit modular arithmetic:

    forward:  Co = R - B;  t = B + (Co >> 1);  Cg = G - t;  Y = t + (Cg >> 1)
    inverse:  t = Y - (Cg >> 1);  G = Cg + t;  B = t - (Co >> 1);  R = B + Co

with every intermediate masked to 5 bits. The variants differ only in the packing of
(Y, Co, Cg, g_low) into the 16-bit lane:

    var1: [Y:5 | Co:5 | g_low:1 | Cg:5]     (g_low at bit 5)
    var2: [g_low:1 | Y:5 | Co:5 | Cg:5]     (g_low at bit 15)
    var3: [Y:5 | Co:5 | Cg:5 | g_low:1]     (g_low at bit 0)

All functions take/return arrays of 16-bit values (any integer dtype holding 0..65535).
"""

from __future__ import annotations

import numpy as np

_M5 = 0x1F


def _fields_from_rgb(c):
    c = np.asarray(c, np.int64)
    r = (c >> 11) & _M5
    g = (c >> 6) & _M5  # top 5 of the 6-bit green field
    g_low = (c >> 5) & 0x1
    b = c & _M5
    return r, g, g_low, b


def _forward(r, g, b):
    co = (r - b) & _M5
    t = (b + (co >> 1)) & _M5
    cg = (g - t) & _M5
    y = (t + (cg >> 1)) & _M5
    return y, co, cg


def _inverse(y, co, cg):
    t = (y - (cg >> 1)) & _M5
    g = (cg + t) & _M5
    b = (t - (co >> 1)) & _M5
    r = (b + co) & _M5
    return r, g, b


def _pack_rgb(r, g, g_low, b):
    return ((r << 11) | (g << 6) | (g_low << 5) | b).astype(np.uint16)


def decorrelate_var1(c) -> np.ndarray:
    r, g, g_low, b = _fields_from_rgb(c)
    y, co, cg = _forward(r, g, b)
    return ((y << 11) | (co << 6) | (g_low << 5) | cg).astype(np.uint16)


def recorrelate_var1(c) -> np.ndarray:
    c = np.asarray(c, np.int64)
    y = (c >> 11) & _M5
    co = (c >> 6) & _M5
    g_low = (c >> 5) & 0x1
    cg = c & _M5
    r, g, b = _inverse(y, co, cg)
    return _pack_rgb(r, g, g_low, b)


def decorrelate_var2(c) -> np.ndarray:
    r, g, g_low, b = _fields_from_rgb(c)
    y, co, cg = _forward(r, g, b)
    return ((g_low << 15) | (y << 10) | (co << 5) | cg).astype(np.uint16)


def recorrelate_var2(c) -> np.ndarray:
    c = np.asarray(c, np.int64)
    g_low = (c >> 15) & 0x1
    y = (c >> 10) & _M5
    co = (c >> 5) & _M5
    cg = c & _M5
    r, g, b = _inverse(y, co, cg)
    return _pack_rgb(r, g, g_low, b)


def decorrelate_var3(c) -> np.ndarray:
    r, g, g_low, b = _fields_from_rgb(c)
    y, co, cg = _forward(r, g, b)
    return ((y << 11) | (co << 6) | (cg << 1) | g_low).astype(np.uint16)


def recorrelate_var3(c) -> np.ndarray:
    c = np.asarray(c, np.int64)
    y = (c >> 11) & _M5
    co = (c >> 6) & _M5
    cg = (c >> 1) & _M5
    g_low = c & 0x1
    r, g, b = _inverse(y, co, cg)
    return _pack_rgb(r, g, g_low, b)


_DECORRELATE = {0: lambda c: np.asarray(c, np.uint16), 1: decorrelate_var1,
                2: decorrelate_var2, 3: decorrelate_var3}
_RECORRELATE = {0: lambda c: np.asarray(c, np.uint16), 1: recorrelate_var1,
                2: recorrelate_var2, 3: recorrelate_var3}


def decorrelate(c, variant) -> np.ndarray:
    """Dispatch over YCoCgVariant (int value; 0 = no-op). decorrelate.rs:364-379."""
    return _DECORRELATE[int(variant)](c)


def recorrelate(c, variant) -> np.ndarray:
    """Dispatch over YCoCgVariant (int value; 0 = no-op). decorrelate.rs:383-398."""
    return _RECORRELATE[int(variant)](c)
