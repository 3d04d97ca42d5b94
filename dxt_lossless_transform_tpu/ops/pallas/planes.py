"""Pallas byte-plane split/merge kernels for the BC7/BC6H mode-sort transform.

The byte-plane relayout is a stride-16 byte de-interleave; like the BC1-BC5
kernels this runs in transposed space (one transpose per array side, block-phase
packing as sublane reshapes). Measured ~24/25 GB/s single-dispatch vs ~9.8 GB/s
for the XLA shift/mask formulation on v5e.

Layout contract (see :mod:`...oracle.bc7`): plane p's byte stream holds byte p of
every block in payload order; as u32 words, word t packs blocks 4t..4t+3.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .shuffle import MAX_ROWS, _phases, _vspec, _weave

_U32 = jnp.uint32
W_IN = 512   # lanes per column tile: 4 column inputs together match the BC1-BC5
             # kernels' per-tile footprint (full-width column tiles OOM'd VMEM)


def _grid_rows_cols(n: int) -> tuple:
    if n % (MAX_ROWS * W_IN):
        raise ValueError(f"plane kernels need N % {MAX_ROWS * W_IN} == 0 (got {n})")
    return n // (MAX_ROWS * W_IN), MAX_ROWS


def _split_kernel(rows: int):
    def kernel(w0_ref, w1_ref, w2_ref, w3_ref, *out_refs):
        wt = [r[:].astype(_U32).T for r in (w0_ref, w1_ref, w2_ref, w3_ref)]
        for p in range(16):
            byte = (wt[p // 4] >> _U32(8 * (p % 4))) & _U32(0xFF)  # (W_IN, R)
            q = _phases(byte, 4)  # block phases mod 4 within the plane stream
            word = (q[0] | (q[1] << _U32(8)) | (q[2] << _U32(16))
                    | (q[3] << _U32(24)))
            out_refs[p][:] = word.T
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def split_planes_tpu(cols, interpret: bool = False):
    """uint32[4, N] block word columns (or a 4-tuple of uint32[N] streams, e.g.
    straight from a ``lax.sort``) -> 16 plane streams, each uint32[N/4]."""
    n = cols[0].shape[0] if isinstance(cols, (tuple, list)) else cols.shape[1]
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _split_kernel(rows),
        grid=(grid,),
        in_specs=[_vspec(W_IN, rows)] * 4,
        out_specs=[_vspec(W_IN // 4, rows)] * 16,
        out_shape=[jax.ShapeDtypeStruct((grid * rows, W_IN // 4), jnp.uint32)
                   for _ in range(16)],
        interpret=interpret,
    )(*(cols[w].reshape(grid * rows, W_IN) for w in range(4)))
    return tuple(r.reshape(-1) for r in res)


def _split_flat_kernel(rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T            # (4*W_IN, R) flat block words
        wt = _phases(xt, 4)                     # word w of each block: (W_IN, R)
        for p in range(16):
            byte = (wt[p // 4] >> _U32(8 * (p % 4))) & _U32(0xFF)
            q = _phases(byte, 4)                # block phases mod 4 within the plane
            word = (q[0] | (q[1] << _U32(8)) | (q[2] << _U32(16))
                    | (q[3] << _U32(24)))
            out_refs[p][:] = word.T
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def split_planes_flat_tpu(flat, interpret: bool = False):
    """uint32[4*N] interleaved block words -> 16 plane streams, each uint32[N/4].

    Same output contract as :func:`split_planes_tpu`, but reads the natural
    on-disk layout directly: the (N, 4) -> (4, N) column extraction that XLA
    would otherwise materialize (a padded-minor-dim relayout measured at ~27
    GB/s on v5e) never happens."""
    n = flat.shape[0] // 4
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _split_flat_kernel(rows),
        grid=(grid,),
        in_specs=[_vspec(4 * W_IN, rows)],
        out_specs=[_vspec(W_IN // 4, rows)] * 16,
        out_shape=[jax.ShapeDtypeStruct((grid * rows, W_IN // 4), jnp.uint32)
                   for _ in range(16)],
        interpret=interpret,
    )(flat.reshape(grid * rows, 4 * W_IN))
    return tuple(r.reshape(-1) for r in res)


def _merge_flat_kernel(rows: int):
    def kernel(*refs):
        ins, out_ref = refs[:16], refs[16]
        planes = [r[:].astype(_U32).T for r in ins]  # each (W_IN/4, R)
        words = []
        for w in range(4):
            qs = []
            for j in range(4):  # block phase j mod 4
                b = [(planes[4 * w + k] >> _U32(8 * j)) & _U32(0xFF)
                     for k in range(4)]
                qs.append(b[0] | (b[1] << _U32(8)) | (b[2] << _U32(16))
                          | (b[3] << _U32(24)))
            words.append(_weave(qs))            # word w of each block: (W_IN, R)
        out_ref[:] = _weave(words).T            # flat[4b + w] = word w of block b
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def merge_planes_flat_tpu(planes, interpret: bool = False):
    """Inverse of :func:`split_planes_flat_tpu`: 16x uint32[N/4] -> uint32[4*N]."""
    n = planes[0].shape[0] * 4
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _merge_flat_kernel(rows),
        grid=(grid,),
        in_specs=[_vspec(W_IN // 4, rows)] * 16,
        out_specs=_vspec(4 * W_IN, rows),
        out_shape=jax.ShapeDtypeStruct((grid * rows, 4 * W_IN), jnp.uint32),
        interpret=interpret,
    )(*(p.reshape(grid * rows, W_IN // 4) for p in planes))
    return res.reshape(-1)


def _weave_cols_kernel(rows: int):
    def kernel(c0_ref, c1_ref, c2_ref, c3_ref, out_ref):
        cols = [r[:].astype(_U32).T for r in (c0_ref, c1_ref, c2_ref, c3_ref)]
        out_ref[:] = _weave(cols).T
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def weave_cols_tpu(cols, interpret: bool = False):
    """4x uint32[N] word columns -> uint32[4*N] interleaved block words.

    The Mosaic twin of ``jnp.stack(cols).T.reshape(-1)``; XLA lowers that to a
    padded-minor-dim transpose (~27 GB/s on v5e) while this is a plain weave in
    transposed space."""
    n = cols[0].shape[0]
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _weave_cols_kernel(rows),
        grid=(grid,),
        in_specs=[_vspec(W_IN, rows)] * 4,
        out_specs=_vspec(4 * W_IN, rows),
        out_shape=jax.ShapeDtypeStruct((grid * rows, 4 * W_IN), jnp.uint32),
        interpret=interpret,
    )(*(c.reshape(grid * rows, W_IN) for c in cols))
    return res.reshape(-1)


@partial(jax.jit, static_argnames=("k", "interpret"))
def deinterleave_words_tpu(flat, k: int, interpret: bool = False):
    """uint32[k*N] -> k streams uint32[N]: the Mosaic twin of
    ``lanes.deinterleave(flat, k)`` (XLA's strided slices lower to ~31 GB/s on
    v5e; phases are sublane reshapes in transposed space). Needs only
    ``flat.shape[0] % 2048 == 0`` (the adaptive shuffle-kernel grid), unlike
    :func:`split_cols_tpu`'s full-tile gate."""
    from .shuffle import WIDTH, _call, _grid_rows

    grid, rows = _grid_rows(flat.shape[0])

    def kernel(x_ref, *out_refs):
        ps = _phases(x_ref[:].astype(_U32).T, k)
        for i in range(k):
            out_refs[i][:] = ps[i].T

    return _call(kernel, (flat,), [WIDTH], [WIDTH // k] * k, grid, rows, interpret)


def _split_cols_kernel(rows: int):
    def kernel(x_ref, *out_refs):
        wt = _phases(x_ref[:].astype(_U32).T, 4)
        for w in range(4):
            out_refs[w][:] = wt[w].T
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def split_cols_tpu(flat, interpret: bool = False):
    """Inverse of :func:`weave_cols_tpu`: uint32[4*N] -> 4x uint32[N]."""
    n = flat.shape[0] // 4
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _split_cols_kernel(rows),
        grid=(grid,),
        in_specs=[_vspec(4 * W_IN, rows)],
        out_specs=[_vspec(W_IN, rows)] * 4,
        out_shape=[jax.ShapeDtypeStruct((grid * rows, W_IN), jnp.uint32)
                   for _ in range(4)],
        interpret=interpret,
    )(flat.reshape(grid * rows, 4 * W_IN))
    return tuple(r.reshape(-1) for r in res)


def _merge_kernel(rows: int):
    def kernel(*refs):
        ins, out_refs = refs[:16], refs[16:]
        planes = [r[:].astype(_U32).T for r in ins]  # each (W_IN/4, R)
        for w in range(4):
            qs = []
            for j in range(4):  # block phase j mod 4
                b = [(planes[4 * w + k] >> _U32(8 * j)) & _U32(0xFF)
                     for k in range(4)]
                qs.append(b[0] | (b[1] << _U32(8)) | (b[2] << _U32(16))
                          | (b[3] << _U32(24)))
            out_refs[w][:] = _weave(qs).T
    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def merge_planes_tpu(planes, interpret: bool = False):
    """Inverse of :func:`split_planes_tpu`: 16x uint32[N/4] -> uint32[4, N]."""
    n = planes[0].shape[0] * 4
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _merge_kernel(rows),
        grid=(grid,),
        in_specs=[_vspec(W_IN // 4, rows)] * 16,
        out_specs=[_vspec(W_IN, rows)] * 4,
        out_shape=[jax.ShapeDtypeStruct((grid * rows, W_IN), jnp.uint32)
                   for _ in range(4)],
        interpret=interpret,
    )(*(p.reshape(grid * rows, W_IN // 4) for p in planes))
    return jnp.stack([r.reshape(-1) for r in res])


def _mode_bc7(b):
    """BC7 mode id of byte-0 lanes: index of the lowest set bit, 8 if zero
    (``oracle/bc7.py``); popcount-free static compare chain."""
    mode = jnp.full(b.shape, 8, _U32)
    for i in range(7, -1, -1):  # descending: the LOWEST set bit wins last
        is_i = ((b >> _U32(i)) & _U32(1)) == _U32(1)
        if i:
            is_i &= (b & _U32((1 << i) - 1)) == _U32(0)
        mode = jnp.where(is_i, _U32(i), mode)
    return mode


def _mode_bc6h(b):
    """BC6H grouping id (``oracle/bc6h.py``): 2-bit modes -> 0,1; valid 5-bit
    two-region -> 2..9; one-region -> 10..13; reserved -> 14."""
    two = b & _U32(3)
    v = b & _U32(31)
    v4 = v >> _U32(2)
    v4c = jnp.where(v4 > _U32(4), _U32(4), v4)  # Mosaic lacks arith.minui
    id5 = jnp.where((v & _U32(1)) != 0, _U32(10) + v4c, _U32(2) + v4)
    return jnp.where(two < 2, two, id5)


def _split_cols_modes_kernel(fmt: str, chunk: int, rows: int):
    def kernel(x_ref, *out_refs):
        g = pl.program_id(0)
        wt = _phases(x_ref[:].astype(_U32).T, 4)     # word w of each block
        for w in range(4):
            out_refs[w][:] = wt[w].T
        b0 = wt[0] & _U32(0xFF)
        mode = _mode_bc7(b0) if fmt == "bc7" else _mode_bc6h(b0)
        # within-chunk sort key (mode in the high bits; ops/bc7.py:_chunk_keys)
        lane = jax.lax.broadcasted_iota(jnp.int32, mode.shape, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, mode.shape, 1)
        idx = ((g * rows + row) * W_IN + lane).astype(_U32) & _U32(chunk - 1)
        out_refs[4][:] = (mode * _U32(chunk) + idx).T
        # packed 4-bit mode stream, 8 blocks per u32 word (low nibble first)
        q = _phases(mode, 8)
        packed = q[0]
        for i in range(1, 8):
            packed = packed | (q[i] << _U32(4 * i))
        out_refs[5][:] = packed.T
    return kernel


@partial(jax.jit, static_argnames=("fmt", "chunk", "interpret"))
def split_cols_modes_tpu(flat, fmt: str, chunk: int, interpret: bool = False):
    """Fused forward stage for the BC7/BC6H mode sort: uint32[4*N] block words ->
    (4 word columns uint32[N], raw sort keys uint32[N], packed mode words
    uint32[N/8]). Saves the separate mode-extract / key-build / nibble-pack
    passes over column 0 (~3 ms per 128 MiB measured round 4). Padding-block
    key/stream fixup happens outside (callers mask idx >= n_valid)."""
    n = flat.shape[0] // 4
    grid, rows = _grid_rows_cols(n)
    res = pl.pallas_call(
        _split_cols_modes_kernel(fmt, chunk, rows),
        grid=(grid,),
        in_specs=[_vspec(4 * W_IN, rows)],
        out_specs=[_vspec(W_IN, rows)] * 5 + [_vspec(W_IN // 8, rows)],
        out_shape=[jax.ShapeDtypeStruct((grid * rows, W_IN), jnp.uint32)
                   for _ in range(5)]
        + [jax.ShapeDtypeStruct((grid * rows, W_IN // 8), jnp.uint32)],
        interpret=interpret,
    )(flat.reshape(grid * rows, 4 * W_IN))
    return tuple(r.reshape(-1) for r in res[:4]), res[4].reshape(-1), \
        res[5].reshape(-1)
