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
