"""Pallas candidate-region builder for the device auto-search.

The auto step scores each candidate's estimation region (BC1: the colors half,
``transform_auto.rs:248-256``). The XLA formulation (deinterleave + byte-lane
interleaves + dynamic placement) lowered to ~3.3 GB/s-payload on v5e; this kernel
emits every candidate's color streams in ONE pass over the input at transform-
kernel speed, as u32 word streams whose bytes ARE the region (the LTU scorer
unpacks u32 tiles in VMEM -- ``estimate/pallas_ltu.py:_unpack_words``).

A candidate's region is byte-identical to the color streams of the corresponding
transform: interleaved -> the decorrelated color-word stream; split -> the
``_pack_even_odd`` c0w/c1w streams concatenated by the caller.
"""

from __future__ import annotations

from functools import partial

import jax

from ..ycocg import decorrelate_pair_swar
from .shuffle import (
    WIDTH, _U32, _call, _grid_rows, _pack_even_odd, _phases, _weave,
)


def _emit_colour_rows(colE, colO, candidates, out_refs, oi: int) -> int:
    """Write each (variant, split) candidate's color streams; returns next ref index."""
    dec = {v: (decorrelate_pair_swar(colE, v), decorrelate_pair_swar(colO, v))
           for v in sorted({v for v, _ in candidates})}
    for v, split in candidates:
        dE, dO = dec[v]
        if split:
            c0w, c1w = _pack_even_odd(dE, dO)
            out_refs[oi][:] = c0w.T
            out_refs[oi + 1][:] = c1w.T
            oi += 2
        else:
            out_refs[oi][:] = _weave([dE, dO]).T
            oi += 1
    return oi


def _colour_widths(candidates, interleaved_w: int):
    widths = []
    for _v, split in candidates:
        widths += ([interleaved_w // 2] * 2 if split else [interleaved_w])
    return widths


def _bc1_regions_kernel(candidates, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        colE, _idxE, colO, _idxO = _phases(xt, 4)
        _emit_colour_rows(colE, colO, candidates, out_refs, 0)
    return kernel


@partial(jax.jit, static_argnames=("candidates", "interpret"))
def bc1_region_streams_tpu(flat, candidates, interpret: bool = False):
    """uint32[2N] BC1 words -> per-candidate color streams (u32, region bytes).

    ``candidates``: ((variant, split), ...). Returns one stream per interleaved
    candidate (u32[N]) and two (c0w, c1w; u32[N/2] each) per split candidate, in
    candidate order."""
    # 128-row tiles: all candidates' streams + shared decorrelation intermediates
    # live at once, which overflows the 16 MiB scoped VMEM at 256 rows
    grid, rows = _grid_rows(flat.shape[0], 128)
    return _call(_bc1_regions_kernel(candidates, rows), (flat,), [WIDTH],
                 _colour_widths(candidates, WIDTH // 2), grid, rows, interpret)


def _bc2_regions_kernel(candidates, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        _alo, _ahi, col, _idx = _phases(xt, 4)
        colE, colO = _phases(col, 2)
        _emit_colour_rows(colE, colO, candidates, out_refs, 0)
    return kernel


@partial(jax.jit, static_argnames=("candidates", "interpret"))
def bc2_region_streams_tpu(flat, candidates, interpret: bool = False):
    """uint32[4N] BC2 words -> per-candidate color-endpoint streams (u32)."""
    grid, rows = _grid_rows(flat.shape[0], 128)
    return _call(_bc2_regions_kernel(candidates, rows), (flat,), [WIDTH],
                 _colour_widths(candidates, WIDTH // 4), grid, rows, interpret)


def _bc3_regions_kernel(alpha_keys, colour_keys, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        w0, _w1, col, _cidx = _phases(xt, 4)
        ep = w0 & _U32(0xFFFF)                  # alpha endpoints, u16 in u32 lanes
        oi = 0
        for sa in alpha_keys:
            if sa:
                for b in (ep & _U32(0xFF), ep >> _U32(8)):
                    q = _phases(b, 4)
                    out_refs[oi][:] = (q[0] | (q[1] << _U32(8))
                                       | (q[2] << _U32(16))
                                       | (q[3] << _U32(24))).T
                    oi += 1
            else:
                epE, epO = _phases(ep, 2)
                out_refs[oi][:] = (epE | (epO << _U32(16))).T
                oi += 1
        colE, colO = _phases(col, 2)
        _emit_colour_rows(colE, colO, colour_keys, out_refs, oi)
    return kernel


@partial(jax.jit, static_argnames=("alpha_keys", "colour_keys", "interpret"))
def bc3_region_streams_tpu(flat, alpha_keys, colour_keys, interpret: bool = False):
    """uint32[4N] BC3 words -> alpha-endpoint + color-endpoint region streams (u32).

    ``alpha_keys``: distinct split_alpha values; ``colour_keys``: distinct
    (variant, split_colour) pairs -- the step maps per-candidate scores back from
    these deduplicated rows (identical rows score identically)."""
    grid, rows = _grid_rows(flat.shape[0], 128)
    widths = []
    for sa in alpha_keys:
        widths += [WIDTH // 16] * 2 if sa else [WIDTH // 8]
    widths += _colour_widths(colour_keys, WIDTH // 4)
    return _call(_bc3_regions_kernel(alpha_keys, colour_keys, rows), (flat,),
                 [WIDTH], widths, grid, rows, interpret)
