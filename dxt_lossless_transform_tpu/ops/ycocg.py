"""YCoCg-R decorrelation as JAX integer-lane ops.

Same lifting scheme and bit packings as :mod:`..oracle.ycocg` (behavioral reference
``common/src/color_565/decorrelate.rs``), expressed on int32 lanes for the TPU VPU.
The variant is a *traced* scalar dispatched with ``lax.switch``, so a single compiled
executable covers all four variants (including the identity).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_M5 = 0x1F


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


def _rgb_fields(c):
    return (c >> 11) & _M5, (c >> 6) & _M5, (c >> 5) & 0x1, c & _M5


def _pack_rgb(r, g, g_low, b):
    return (r << 11) | (g << 6) | (g_low << 5) | b


def decorrelate_var1(c):
    r, g, g_low, b = _rgb_fields(c)
    y, co, cg = _forward(r, g, b)
    return (y << 11) | (co << 6) | (g_low << 5) | cg


def recorrelate_var1(c):
    y, co, g_low, cg = (c >> 11) & _M5, (c >> 6) & _M5, (c >> 5) & 0x1, c & _M5
    r, g, b = _inverse(y, co, cg)
    return _pack_rgb(r, g, g_low, b)


def decorrelate_var2(c):
    r, g, g_low, b = _rgb_fields(c)
    y, co, cg = _forward(r, g, b)
    return (g_low << 15) | (y << 10) | (co << 5) | cg


def recorrelate_var2(c):
    g_low = (c >> 15) & 0x1
    y, co, cg = (c >> 10) & _M5, (c >> 5) & _M5, c & _M5
    r, g, b = _inverse(y, co, cg)
    return _pack_rgb(r, g, g_low, b)


def decorrelate_var3(c):
    r, g, g_low, b = _rgb_fields(c)
    y, co, cg = _forward(r, g, b)
    return (y << 11) | (co << 6) | (cg << 1) | g_low


def recorrelate_var3(c):
    y, co = (c >> 11) & _M5, (c >> 6) & _M5
    cg, g_low = (c >> 1) & _M5, c & 0x1
    r, g, b = _inverse(y, co, cg)
    return _pack_rgb(r, g, g_low, b)


def decorrelate(c, variant):
    """Dispatch on traced variant scalar (0 = identity). ``c``: int32 16-bit lanes."""
    c = c.astype(jnp.int32)
    return lax.switch(
        jnp.asarray(variant, jnp.int32),
        [lambda x: x, decorrelate_var1, decorrelate_var2, decorrelate_var3],
        c,
    )


def recorrelate(c, variant):
    c = c.astype(jnp.int32)
    return lax.switch(
        jnp.asarray(variant, jnp.int32),
        [lambda x: x, recorrelate_var1, recorrelate_var2, recorrelate_var3],
        c,
    )


# --- SWAR pair forms (static variant) -------------------------------------------------
# Process BOTH u16 halves of packed c0|c1<<16 uint32 lanes at once; guard bits
# (|0x0020_0020 before each subtraction, &0x000F_000F after each >>1) stop
# borrow/carry propagation across the 16-bit field boundary. Twin of the C++
# runtime's ycocg_{de,re}correlate_pair (dlt_native.cpp); the hot Pallas kernels
# specialize on a static variant, so this is plain Python dispatch at trace time.

_U = jnp.uint32
_P5 = 0x001F001F
_P4 = 0x000F000F
_PG = 0x00200020
_P1 = 0x00010001


def decorrelate_pair_swar(p, variant: int):
    """uint32 lanes of packed c0|c1<<16 -> both halves decorrelated (variant static)."""
    if variant == 0:
        return p
    r = (p >> _U(11)) & _U(_P5)
    g = (p >> _U(6)) & _U(_P5)
    gl = (p >> _U(5)) & _U(_P1)
    b = p & _U(_P5)
    co = ((r | _U(_PG)) - b) & _U(_P5)
    t = (b + ((co >> _U(1)) & _U(_P4))) & _U(_P5)
    cg = ((g | _U(_PG)) - t) & _U(_P5)
    y = (t + ((cg >> _U(1)) & _U(_P4))) & _U(_P5)
    if variant == 1:
        return (y << _U(11)) | (co << _U(6)) | (gl << _U(5)) | cg
    if variant == 2:
        return (gl << _U(15)) | (y << _U(10)) | (co << _U(5)) | cg
    return (y << _U(11)) | (co << _U(6)) | (cg << _U(1)) | gl


def recorrelate_pair_swar(p, variant: int):
    """Inverse of :func:`decorrelate_pair_swar`."""
    if variant == 0:
        return p
    if variant == 1:
        y = (p >> _U(11)) & _U(_P5)
        co = (p >> _U(6)) & _U(_P5)
        gl = (p >> _U(5)) & _U(_P1)
        cg = p & _U(_P5)
    elif variant == 2:
        gl = (p >> _U(15)) & _U(_P1)
        y = (p >> _U(10)) & _U(_P5)
        co = (p >> _U(5)) & _U(_P5)
        cg = p & _U(_P5)
    else:
        y = (p >> _U(11)) & _U(_P5)
        co = (p >> _U(6)) & _U(_P5)
        cg = (p >> _U(1)) & _U(_P5)
        gl = p & _U(_P1)
    t = ((y | _U(_PG)) - ((cg >> _U(1)) & _U(_P4))) & _U(_P5)
    g = (cg + t) & _U(_P5)
    b = ((t | _U(_PG)) - ((co >> _U(1)) & _U(_P4))) & _U(_P5)
    r = (b + co) & _U(_P5)
    return (r << _U(11)) | (g << _U(6)) | (gl << _U(5)) | b
