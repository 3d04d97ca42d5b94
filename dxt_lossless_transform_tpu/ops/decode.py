"""Device BC1/BC2/BC3 block decoders (JAX).

Same 'ideal' D3D9 rounding as :mod:`..oracle.decode` (behavioral reference
``bc{1,2,3}/src/util/bcN_decode.rs``), vectorized over blocks for device-side
visual-equivalence checks and future device normalization. Output is channel-planar
``(4, N, 16)`` int32 (RGBA x block x raster-pixel) -- TPU-friendly shapes; use
``jnp.moveaxis`` or the oracle for image-shaped output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expand565(c):
    c = c.astype(jnp.int32)
    r5 = (c >> 11) & 0x1F
    g6 = (c >> 5) & 0x3F
    b5 = c & 0x1F
    return ((r5 << 3) | (r5 >> 2), (g6 << 2) | (g6 >> 4), (b5 << 3) | (b5 >> 2))


def _lut4(c0, c1, always_four: bool):
    """Per-block 4-entry color LUT: returns (lut_rgb (3, N, 4) int32, lut_a (N, 4))."""
    r0, g0, b0 = _expand565(c0)
    r1, g1, b1 = _expand565(c1)

    def _third(a, b):
        return (2 * a + b) // 3

    rgb = []
    alpha3 = jnp.full_like(r0, 255)
    for a, b in ((r0, r1), (g0, g1), (b0, b1)):
        e2_4, e3_4 = _third(a, b), _third(b, a)
        if always_four:
            e2, e3 = e2_4, e3_4
        else:
            is4 = c0.astype(jnp.int32) > c1.astype(jnp.int32)
            e2 = jnp.where(is4, e2_4, (a + b) // 2)
            e3 = jnp.where(is4, e3_4, 0)
        rgb.append(jnp.stack([a, b, e2, e3], axis=-1))
    if not always_four:
        alpha3 = jnp.where(c0.astype(jnp.int32) > c1.astype(jnp.int32), 255, 0)
    lut_a = jnp.stack([jnp.full_like(r0, 255)] * 3 + [alpha3], axis=-1)
    return jnp.stack(rgb), lut_a


def _gather(lut, sel):
    """(N, 4) LUT gathered by (N, 16) 2-bit selectors -> (N, 16)."""
    return jnp.take_along_axis(lut, sel, axis=1)


def _color_planes(colors_u32, cidx_u32, always_four: bool):
    c0 = (colors_u32 & jnp.uint32(0xFFFF)).astype(jnp.int32)
    c1 = (colors_u32 >> jnp.uint32(16)).astype(jnp.int32)
    lut_rgb, lut_a = _lut4(c0, c1, always_four)
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    sel = ((cidx_u32.astype(jnp.uint32)[:, None] >> shifts) & jnp.uint32(3)).astype(jnp.int32)
    planes = [_gather(lut_rgb[ch], sel) for ch in range(3)]
    planes.append(_gather(lut_a, sel))
    return planes


@jax.jit
def decode_bc1(words):
    """uint32[N,2] block words -> (4, N, 16) int32 RGBA planes."""
    planes = _color_planes(words[:, 0], words[:, 1], always_four=False)
    return jnp.stack(planes)


@jax.jit
def decode_bc2(words):
    """uint32[N,4] block words -> (4, N, 16) int32 RGBA planes."""
    r, g, b, _ = _color_planes(words[:, 2], words[:, 3], always_four=True)
    nib = jnp.arange(16, dtype=jnp.uint32)
    lo_shifts = (4 * (nib % 8))[None, :]
    src = jnp.where(nib[None, :] < 8, words[:, 0:1], words[:, 1:2]).astype(jnp.uint32)
    a4 = (src >> lo_shifts) & jnp.uint32(0xF)
    return jnp.stack([r, g, b, (a4 * 17).astype(jnp.int32)])


@jax.jit
def decode_bc3(words):
    """uint32[N,4] block words -> (4, N, 16) int32 RGBA planes."""
    r, g, b, _ = _color_planes(words[:, 2], words[:, 3], always_four=True)
    w0 = words[:, 0].astype(jnp.uint32)
    w1 = words[:, 1].astype(jnp.uint32)
    a0 = (w0 & jnp.uint32(0xFF)).astype(jnp.int32)
    a1 = ((w0 >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.int32)

    seven = a0 > a1
    codes = []
    for code in range(8):
        if code == 0:
            codes.append(a0)
        elif code == 1:
            codes.append(a1)
        else:
            w = code - 1
            i7 = ((8 - code) * a0 + w * a1) // 7
            if code < 6:
                i5 = ((6 - code) * a0 + w * a1) // 5
            else:
                i5 = jnp.full_like(a0, 0 if code == 6 else 255)
            codes.append(jnp.where(seven, i7, i5))
    lut = jnp.stack(codes, axis=-1)

    # 48-bit index field: bits 16.. of w0 then w1; 3 bits per pixel
    sels = []
    for k in range(16):
        p = 3 * k + 16  # bit position within the 64-bit (w0, w1) pair
        if p % 32 <= 29:
            word = w0 if p < 32 else w1
            sel = (word >> jnp.uint32(p % 32)) & jnp.uint32(7)
        else:
            lo_bits = 32 - (p % 32)
            sel = ((w0 >> jnp.uint32(p % 32)) if p < 32 else (w1 >> jnp.uint32(p % 32)))
            hi = w1 if p < 32 else jnp.zeros_like(w1)
            sel = (sel | (hi << jnp.uint32(lo_bits))) & jnp.uint32(7)
        sels.append(sel.astype(jnp.int32))
    sel = jnp.stack(sels, axis=-1)
    alpha = jnp.take_along_axis(lut, sel, axis=1)
    return jnp.stack([r, g, b, alpha])
