"""Pallas channel split/merge kernels for uncompressed 4-byte pixel formats.

The RGBA8888/BGRA8888 ``split_channels`` transform is a stride-4 byte
de-interleave of the pixel stream (``oracle/rgb.py``; the reference reserves the
header flag -- ``embed/formats/rgba8888.rs`` -- but ships no transform). Like the
BC1-BC5/BC7 kernels this runs in transposed space on flat u32 streams: a pixel is
one u32 word, channel c is byte c of every word, and each channel stream packs 4
consecutive pixels per output word.

The r' = r - g / b' = b - g decorrelation is fused into the kernels (channel
bytes are extracted into full u32 lanes anyway, so the mod-256 lifting is a plain
subtract + mask, no SWAR guard bits needed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .shuffle import MAX_ROWS, WIDTH, _phases, _vspec, _weave

_U32 = jnp.uint32


def _grid_rows_px(n: int) -> tuple:
    if n % (MAX_ROWS * WIDTH):
        raise ValueError(
            f"channel kernels need a pixel count that is a multiple of "
            f"{MAX_ROWS * WIDTH} (got {n})")
    return n // (MAX_ROWS * WIDTH), MAX_ROWS


def channels_pallas_ok(n_padded: int) -> bool:
    """Gate: full-size tiles only (one tile = 1 MiB of 4-byte pixels)."""
    from .shuffle import pallas_available

    return pallas_available() and n_padded % (MAX_ROWS * WIDTH) == 0


def _split_kernel(ri: int, gi: int, bi: int, dec: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T                     # (WIDTH, R) pixel words
        b = [(xt >> _U32(8 * c)) & _U32(0xFF) for c in range(4)]
        if dec:
            b[ri] = (b[ri] - b[gi]) & _U32(0xFF)
            b[bi] = (b[bi] - b[gi]) & _U32(0xFF)
        for c in range(4):
            q = _phases(b[c], 4)                         # pixel phases mod 4
            out_refs[c][:] = (q[0] | (q[1] << _U32(8)) | (q[2] << _U32(16))
                              | (q[3] << _U32(24))).T
    return kernel


@partial(jax.jit, static_argnames=("ri", "gi", "bi", "dec", "interpret"))
def split_channels_tpu(flat, ri: int, gi: int, bi: int, dec: bool,
                       interpret: bool = False):
    """uint32[N] pixel words -> 4 channel streams (byte order), each uint32[N/4]."""
    n = flat.shape[0]
    grid, rows = _grid_rows_px(n)
    res = pl.pallas_call(
        _split_kernel(ri, gi, bi, dec, rows),
        grid=(grid,),
        in_specs=[_vspec(WIDTH, rows)],
        out_specs=[_vspec(WIDTH // 4, rows)] * 4,
        out_shape=[jax.ShapeDtypeStruct((grid * rows, WIDTH // 4), jnp.uint32)
                   for _ in range(4)],
        interpret=interpret,
    )(flat.reshape(grid * rows, WIDTH))
    return tuple(r.reshape(-1) for r in res)


def _merge_kernel(ri: int, gi: int, bi: int, dec: bool, rows: int):
    def kernel(*refs):
        ins, out_ref = refs[:4], refs[4]
        ch = [r[:].astype(_U32).T for r in ins]          # each (WIDTH/4, R)
        qs = []
        for j in range(4):                               # pixel phase j mod 4
            b = [(ch[c] >> _U32(8 * j)) & _U32(0xFF) for c in range(4)]
            if dec:
                b[ri] = (b[ri] + b[gi]) & _U32(0xFF)
                b[bi] = (b[bi] + b[gi]) & _U32(0xFF)
            qs.append(b[0] | (b[1] << _U32(8)) | (b[2] << _U32(16))
                      | (b[3] << _U32(24)))
        out_ref[:] = _weave(qs).T
    return kernel


@partial(jax.jit, static_argnames=("ri", "gi", "bi", "dec", "interpret"))
def merge_channels_tpu(streams, ri: int, gi: int, bi: int, dec: bool,
                       interpret: bool = False):
    """Inverse of :func:`split_channels_tpu`: 4x uint32[N/4] -> uint32[N] pixels."""
    n = streams[0].shape[0] * 4
    grid, rows = _grid_rows_px(n)
    res = pl.pallas_call(
        _merge_kernel(ri, gi, bi, dec, rows),
        grid=(grid,),
        in_specs=[_vspec(WIDTH // 4, rows)] * 4,
        out_specs=_vspec(WIDTH, rows),
        out_shape=jax.ShapeDtypeStruct((grid * rows, WIDTH), jnp.uint32),
        interpret=interpret,
    )(*(s.reshape(grid * rows, WIDTH // 4) for s in streams))
    return res.reshape(-1)


# --- BGR888 (3-byte pixels) -----------------------------------------------------------
# lcm(3-byte stride, 4-byte words) = 12 bytes = 3 words = 4 pixels, so the tile
# width is 1536 u32 lanes (512 pixel-quads/row; still a multiple of the 128-lane
# minor tile). Word phases mod 3 of the transposed tile give the three words of
# every quad; channel bytes fall out with static shifts:
#   w0 = B0 G0 R0 B1   w1 = G1 R1 B2 G2   w2 = R2 B3 G3 R3
# Each channel stream packs 4 consecutive pixels per output word (512 lanes).

W_BGR = 1536


def _grid_rows_bgr(n_px: int) -> tuple:
    if n_px % (MAX_ROWS * 4 * (W_BGR // 3)):
        raise ValueError(
            f"bgr kernels need a pixel count that is a multiple of "
            f"{MAX_ROWS * 4 * (W_BGR // 3)} (got {n_px})")
    return n_px // (MAX_ROWS * 4 * (W_BGR // 3)), MAX_ROWS


def bgr_pallas_ok(n_padded: int) -> bool:
    """Gate: full 262144-pixel (768 KiB) tiles only."""
    from .shuffle import pallas_available

    return pallas_available() and n_padded % (MAX_ROWS * 4 * (W_BGR // 3)) == 0


def _bgr_quad_channels(w0, w1, w2):
    """Channel bytes of the 4 pixels of every quad: ch[c][p], c=B,G,R, p=0..3."""
    ff = _U32(0xFF)
    ch0 = (w0 & ff, w0 >> _U32(24), (w1 >> _U32(16)) & ff, (w2 >> _U32(8)) & ff)
    ch1 = ((w0 >> _U32(8)) & ff, w1 & ff, w1 >> _U32(24), (w2 >> _U32(16)) & ff)
    ch2 = ((w0 >> _U32(16)) & ff, (w1 >> _U32(8)) & ff, w2 & ff, w2 >> _U32(24))
    return ch0, ch1, ch2


def _split_bgr_kernel(dec: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T                     # (W_BGR, R)
        w0, w1, w2 = _phases(xt, 3)                      # (W_BGR/3, R) each
        ch0, ch1, ch2 = _bgr_quad_channels(w0, w1, w2)
        if dec:  # b' = b - g, r' = r - g (bgr888: ri=2, gi=1, bi=0)
            ch0 = tuple((b - g) & _U32(0xFF) for b, g in zip(ch0, ch1))
            ch2 = tuple((r - g) & _U32(0xFF) for r, g in zip(ch2, ch1))
        for c, ch in enumerate((ch0, ch1, ch2)):
            out_refs[c][:] = (ch[0] | (ch[1] << _U32(8)) | (ch[2] << _U32(16))
                              | (ch[3] << _U32(24))).T
    return kernel


@partial(jax.jit, static_argnames=("dec", "interpret"))
def split_bgr_tpu(flat, dec: bool, interpret: bool = False):
    """uint32[3*N/4] BGR888 byte-stream words -> 3 channel streams (B, G, R),
    each uint32[N/4] (N = pixel count, a multiple of the tile gate)."""
    n_px = flat.shape[0] * 4 // 3
    grid, rows = _grid_rows_bgr(n_px)
    res = pl.pallas_call(
        _split_bgr_kernel(dec, rows),
        grid=(grid,),
        in_specs=[_vspec(W_BGR, rows)],
        out_specs=[_vspec(W_BGR // 3, rows)] * 3,
        out_shape=[jax.ShapeDtypeStruct((grid * rows, W_BGR // 3), jnp.uint32)
                   for _ in range(3)],
        interpret=interpret,
    )(flat.reshape(grid * rows, W_BGR))
    return tuple(r.reshape(-1) for r in res)


def _merge_bgr_kernel(dec: bool, rows: int):
    def kernel(c0_ref, c1_ref, c2_ref, out_ref):
        ff = _U32(0xFF)
        chs = []
        for r in (c0_ref, c1_ref, c2_ref):
            w = r[:].astype(_U32).T                      # (W_BGR/3, R)
            chs.append(tuple((w >> _U32(8 * p)) & ff for p in range(4)))
        ch0, ch1, ch2 = chs
        if dec:  # inverse lifting: b = b' + g, r = r' + g
            ch0 = tuple((b + g) & ff for b, g in zip(ch0, ch1))
            ch2 = tuple((r + g) & ff for r, g in zip(ch2, ch1))
        w0 = (ch0[0] | (ch1[0] << _U32(8)) | (ch2[0] << _U32(16))
              | (ch0[1] << _U32(24)))
        w1 = (ch1[1] | (ch2[1] << _U32(8)) | (ch0[2] << _U32(16))
              | (ch1[2] << _U32(24)))
        w2 = (ch2[2] | (ch0[3] << _U32(8)) | (ch1[3] << _U32(16))
              | (ch2[3] << _U32(24)))
        out_ref[:] = _weave([w0, w1, w2]).T
    return kernel


@partial(jax.jit, static_argnames=("dec", "interpret"))
def merge_bgr_tpu(streams, dec: bool, interpret: bool = False):
    """Inverse of :func:`split_bgr_tpu`: 3x uint32[N/4] -> uint32[3*N/4]."""
    n_px = streams[0].shape[0] * 4
    grid, rows = _grid_rows_bgr(n_px)
    res = pl.pallas_call(
        _merge_bgr_kernel(dec, rows),
        grid=(grid,),
        in_specs=[_vspec(W_BGR // 3, rows)] * 3,
        out_specs=_vspec(W_BGR, rows),
        out_shape=jax.ShapeDtypeStruct((grid * rows, W_BGR), jnp.uint32),
        interpret=interpret,
    )(*(s.reshape(grid * rows, W_BGR // 3) for s in streams))
    return res.reshape(-1)
