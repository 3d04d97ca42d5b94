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
