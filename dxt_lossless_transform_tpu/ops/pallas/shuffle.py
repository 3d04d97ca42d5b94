"""Fused single-pass BC1/BC2/BC3 transform/untransform Pallas kernels.

Round-2 design (measured on v5e; see scripts/perf_sweep*.py):

- *Transposed space*: each tile is transposed ONCE on entry; all block-phase
  de-/re-interleaves then become sublane reshapes/slices of the (words, rows)
  view, and each output is transposed back once on exit. Two full-tile
  transposes per direction (the round-1 design paid ~3).
- *SWAR pair math*: YCoCg-R runs on packed c0|c1<<16 uint32 lanes with guard
  bits (twin of the C++ runtime's ``ycocg_*_pair``), so no 16-bit unpack/repack
  lanes ever materialize.
- *Static variant*: kernels specialize on the YCoCg variant (4 small compiles
  per family, served by the persistent compile cache). The traced ``lax.switch``
  form both compiled slower and crashes Mosaic at the 128-row tile.
- Tiles are (FAMILY_ROWS[fmt], 2048) u32 on the widest array (256 rows for
  BC1-BC4, 128 for BC5): the transposed view has a full 128-lane minor dim, and
  sustained BC1 roundtrip reaches ~90 GB/s payload vs a ~111 GB/s
  chained-copy+transpose Pallas ceiling (a plain chained Pallas copy runs ~120,
  chained fused XLA elementwise ~177 -- see scripts/perf_bc7_inv.py for the
  measurement pattern).

All kernels process flat little-endian u32 word images; callers pad block counts
to powers of two >= 2048 (``lanes.bucket_size``), which guarantees divisibility
by every tile shape here.

Behavioral reference for the stream layouts: ``transform_with_settings.rs`` of
each format crate (see :mod:`...oracle`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ycocg import decorrelate_pair_swar, recorrelate_pair_swar

MAX_ROWS = 128
WIDTH = 2048  # lanes of the widest (block-image) array per tile
_U32 = jnp.uint32

# Per-family tile heights (rows of the widest array), swept on v5e: 256-row
# tiles lift sustained roundtrip +13% (BC1) / +10% (BC2) / +5% (BC3/BC4) over
# 128; BC5's kernel (two interleaved alpha-lane streams live at once) exceeds
# Mosaic's VMEM budget at 256 and stays at 128, as do the BC7 plane kernels
# (+2% only, not worth doubling their divisibility gate in ops/bc7.py).
FAMILY_ROWS = {"bc1": 256, "bc2": 256, "bc3": 256, "bc4": 256, "bc5": 128}


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _grid_rows(total_words: int, max_rows: int = 0) -> tuple:
    """(grid, rows) such that grid * rows * WIDTH == total_words."""
    if total_words < WIDTH or total_words % WIDTH:
        raise ValueError(
            f"pallas kernels need a word count that is a multiple of {WIDTH} "
            f"(got {total_words}); pad block counts with lanes.bucket_size first")
    all_rows = total_words // WIDTH
    rows = min(max_rows or MAX_ROWS, all_rows)
    if all_rows % rows:
        raise ValueError(f"row count {all_rows} not divisible by tile rows {rows}")
    return all_rows // rows, rows


def grid_rows_ok(total_words: int, max_rows: int = 0) -> bool:
    """True iff :func:`_grid_rows` accepts this word count -- callers gating a
    words-path fast path must check this on the FLAT word count each kernel will
    consume (a tile-row total above the cap must divide evenly)."""
    if total_words < WIDTH or total_words % WIDTH:
        return False
    all_rows = total_words // WIDTH
    return all_rows % min(max_rows or MAX_ROWS, all_rows) == 0


# --- transposed-space helpers ---------------------------------------------------------
# Work happens on (words, rows) views; `k` consecutive-lane phases of the original
# (rows, width) tile are sublane slices of a (w//k, k, rows) reshape.

def _phases(vt, k: int):
    """(W, R) transposed tile -> k phase views (W/k, R); phase c = lanes c::k."""
    w, rows = vt.shape
    v3 = vt.reshape(w // k, k, rows)
    return tuple(v3[:, c, :] for c in range(k))


def _weave(parts):
    """Inverse of :func:`_phases`: k tiles (W, R) -> (k*W, R) interleaved."""
    k = len(parts)
    w, rows = parts[0].shape
    return jnp.concatenate([p[:, None, :] for p in parts], axis=1).reshape(k * w, rows)


def _lo(p):
    return p & _U32(0xFFFF)


def _hi(p):
    return p >> _U32(16)


def _pack_even_odd(dE, dO):
    """Even/odd-phase u16 pairs -> (lo-halves word, hi-halves word) streams."""
    return (_lo(dE) | (dO << _U32(16)),          # c0 stream: lo(E) | lo(O)<<16
            _hi(dE) | (dO & _U32(0xFFFF0000)))   # c1 stream: hi(E) | hi(O)<<16


def _unpack_even_odd(c0w, c1w):
    """Inverse of :func:`_pack_even_odd`: -> (even words, odd words)."""
    return (_lo(c0w) | (c1w << _U32(16)),
            _hi(c0w) | (c1w & _U32(0xFFFF0000)))


def _vspec(w, rows):
    return pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _call(kernel, args, in_widths, out_widths, grid, rows, interpret: bool):
    res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[_vspec(w, rows) for w in in_widths],
        out_specs=[_vspec(w, rows) for w in out_widths],
        out_shape=[jax.ShapeDtypeStruct((grid * rows, w), jnp.uint32)
                   for w in out_widths],
        interpret=interpret,
    )(*(a.reshape(grid * rows, w) for a, w in zip(args, in_widths)))
    return tuple(r.reshape(-1) for r in res)


# ======================================== BC1 ========================================
# 2 words/block: flat[2b] = colors, flat[2b+1] = indices. Lane phases mod 4 of the
# tile are [colE, idxE, colO, idxO] (E/O = block parity).

def _bc1_t_kernel(variant: int, split: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        colE, idxE, colO, idxO = _phases(xt, 4)
        dE = decorrelate_pair_swar(colE, variant)
        dO = decorrelate_pair_swar(colO, variant)
        if split:
            c0w, c1w = _pack_even_odd(dE, dO)
            out_refs[0][:] = c0w.T
            out_refs[1][:] = c1w.T
            out_refs[2][:] = _weave([idxE, idxO]).T
        else:
            out_refs[0][:] = _weave([dE, dO]).T
            out_refs[1][:] = _weave([idxE, idxO]).T
    return kernel


@partial(jax.jit, static_argnames=("variant", "split", "interpret"))
def bc1_transform_tpu(flat, variant: int, split: bool, interpret: bool = False):
    """Flat uint32[2N] -> stream word arrays, one fused pass.

    split: ``(c0w u32[N/2], c1w u32[N/2], idx u32[N])``; else ``(colors, idx)``.
    """
    grid, rows = _grid_rows(flat.shape[0], FAMILY_ROWS["bc1"])
    outs = [WIDTH // 4, WIDTH // 4, WIDTH // 2] if split else [WIDTH // 2, WIDTH // 2]
    return _call(_bc1_t_kernel(variant, split, rows), (flat,), [WIDTH], outs,
                 grid, rows, interpret)


def _bc1_u_kernel(variant: int, split: bool, rows: int):
    def kernel(*refs):
        if split:
            c0_ref, c1_ref, idx_ref, out_ref = refs
            dE, dO = _unpack_even_odd(c0_ref[:].astype(_U32).T,
                                      c1_ref[:].astype(_U32).T)
        else:
            col_ref, idx_ref, out_ref = refs
            dE, dO = _phases(col_ref[:].astype(_U32).T, 2)
        colE = recorrelate_pair_swar(dE, variant)
        colO = recorrelate_pair_swar(dO, variant)
        idxE, idxO = _phases(idx_ref[:].astype(_U32).T, 2)
        out_ref[:] = _weave([colE, idxE, colO, idxO]).T
    return kernel


@partial(jax.jit, static_argnames=("variant", "split", "interpret"))
def bc1_untransform_tpu(streams, variant: int, split: bool, interpret: bool = False):
    """Inverse of :func:`bc1_transform_tpu`; returns flat uint32[2N]."""
    n = streams[-1].shape[0]  # indices count == blocks
    grid, rows = _grid_rows(2 * n, FAMILY_ROWS["bc1"])
    ins = [WIDTH // 4, WIDTH // 4, WIDTH // 2] if split else [WIDTH // 2, WIDTH // 2]
    (out,) = _call(_bc1_u_kernel(variant, split, rows), streams, ins, [WIDTH],
                   grid, rows, interpret)
    return out


# ======================================== BC2 ========================================
# 4 words/block: [a_lo, a_hi, col, idx]; only colors need block parity (for split).

def _bc2_t_kernel(variant: int, split: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        a_lo, a_hi, col, idx = _phases(xt, 4)
        out_refs[0][:] = _weave([a_lo, a_hi]).T
        if split:
            colE, colO = _phases(col, 2)
            dE = decorrelate_pair_swar(colE, variant)
            dO = decorrelate_pair_swar(colO, variant)
            c0w, c1w = _pack_even_odd(dE, dO)
            out_refs[1][:] = c0w.T
            out_refs[2][:] = c1w.T
            out_refs[3][:] = idx.T
        else:
            out_refs[1][:] = decorrelate_pair_swar(col, variant).T
            out_refs[2][:] = idx.T
    return kernel


@partial(jax.jit, static_argnames=("variant", "split", "interpret"))
def bc2_transform_tpu(flat, variant: int, split: bool, interpret: bool = False):
    """Flat uint32[4N] -> (alpha_w u32[2N], [c0w, c1w | colors], idx u32[N])."""
    grid, rows = _grid_rows(flat.shape[0], FAMILY_ROWS["bc2"])
    outs = ([WIDTH // 2, WIDTH // 8, WIDTH // 8, WIDTH // 4] if split
            else [WIDTH // 2, WIDTH // 4, WIDTH // 4])
    return _call(_bc2_t_kernel(variant, split, rows), (flat,), [WIDTH], outs,
                 grid, rows, interpret)


def _bc2_u_kernel(variant: int, split: bool, rows: int):
    def kernel(*refs):
        if split:
            alpha_ref, c0_ref, c1_ref, idx_ref, out_ref = refs
            dE, dO = _unpack_even_odd(c0_ref[:].astype(_U32).T,
                                      c1_ref[:].astype(_U32).T)
            colE = recorrelate_pair_swar(dE, variant)
            colO = recorrelate_pair_swar(dO, variant)
            col = _weave([colE, colO])
        else:
            alpha_ref, col_ref, idx_ref, out_ref = refs
            col = recorrelate_pair_swar(col_ref[:].astype(_U32).T, variant)
        a_lo, a_hi = _phases(alpha_ref[:].astype(_U32).T, 2)
        out_ref[:] = _weave([a_lo, a_hi, col, idx_ref[:].astype(_U32).T]).T
    return kernel


@partial(jax.jit, static_argnames=("variant", "split", "interpret"))
def bc2_untransform_tpu(streams, variant: int, split: bool, interpret: bool = False):
    """Inverse of :func:`bc2_transform_tpu`; returns flat uint32[4N]."""
    n = streams[-1].shape[0]
    grid, rows = _grid_rows(4 * n, FAMILY_ROWS["bc2"])
    ins = ([WIDTH // 2, WIDTH // 8, WIDTH // 8, WIDTH // 4] if split
           else [WIDTH // 2, WIDTH // 4, WIDTH // 4])
    (out,) = _call(_bc2_u_kernel(variant, split, rows), streams, ins, [WIDTH],
                   grid, rows, interpret)
    return out


# ======================================== BC3 ========================================
# 4 words/block: [w0, w1, col, cidx] with w0 = ep | h1<<16, w1 = h2 | h3<<16.
# Lane phases mod 8: [w0E, w1E, colE, cidxE, w0O, w1O, colO, cidxO].
# Alpha-index words: aw[3s]   = h1E | h2E<<16
#                    aw[3s+1] = h3E | h1O<<16
#                    aw[3s+2] = h2O | h3O<<16          (s = even-block pair index)

def _bc3_t_kernel(variant: int, split_alpha: bool, split_colour: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        w0E, w1E, colE, cidxE, w0O, w1O, colO, cidxO = _phases(xt, 8)
        epE, h1E = _lo(w0E), _hi(w0E)
        h2E, h3E = _lo(w1E), _hi(w1E)
        epO, h1O = _lo(w0O), _hi(w0O)
        h2O, h3O = _lo(w1O), _hi(w1O)
        out = list(out_refs)
        if split_alpha:
            ep0, ep2 = _phases(epE, 2)   # block phases 0,2 (mod 4)
            ep1, ep3 = _phases(epO, 2)   # block phases 1,3
            a0 = ((ep0 & _U32(0xFF)) | ((ep1 & _U32(0xFF)) << _U32(8))
                  | ((ep2 & _U32(0xFF)) << _U32(16)) | ((ep3 & _U32(0xFF)) << _U32(24)))
            a1 = ((ep0 >> _U32(8)) | ((ep1 >> _U32(8)) << _U32(8))
                  | ((ep2 >> _U32(8)) << _U32(16)) | ((ep3 >> _U32(8)) << _U32(24)))
            out.pop(0)[:] = a0.T
            out.pop(0)[:] = a1.T
        else:
            out.pop(0)[:] = (epE | (epO << _U32(16))).T
        aw0 = h1E | (h2E << _U32(16))
        aw1 = h3E | (h1O << _U32(16))
        aw2 = h2O | (h3O << _U32(16))
        out.pop(0)[:] = _weave([aw0, aw1, aw2]).T
        dE = decorrelate_pair_swar(colE, variant)
        dO = decorrelate_pair_swar(colO, variant)
        if split_colour:
            c0w, c1w = _pack_even_odd(dE, dO)
            out.pop(0)[:] = c0w.T
            out.pop(0)[:] = c1w.T
        else:
            out.pop(0)[:] = _weave([dE, dO]).T
        out.pop(0)[:] = _weave([cidxE, cidxO]).T
    return kernel


@partial(jax.jit, static_argnames=("variant", "split_alpha", "split_colour",
                                   "interpret"))
def bc3_transform_tpu(flat, variant: int, split_alpha: bool, split_colour: bool,
                      interpret: bool = False):
    """Flat uint32[4N] -> stream word arrays in on-disk order (see oracle.bc3)."""
    grid, rows = _grid_rows(flat.shape[0], FAMILY_ROWS["bc3"])
    outs = []
    outs += [WIDTH // 16, WIDTH // 16] if split_alpha else [WIDTH // 8]
    outs += [3 * WIDTH // 8]
    outs += [WIDTH // 8, WIDTH // 8] if split_colour else [WIDTH // 4]
    outs += [WIDTH // 4]
    return _call(_bc3_t_kernel(variant, split_alpha, split_colour, rows), (flat,),
                 [WIDTH], outs, grid, rows, interpret)


def _bc3_u_kernel(variant: int, split_alpha: bool, split_colour: bool, rows: int):
    def kernel(*refs):
        refs = list(refs)
        if split_alpha:
            a0 = refs.pop(0)[:].astype(_U32).T
            a1 = refs.pop(0)[:].astype(_U32).T
            ep_phases = []
            for sh in (0, 8, 16, 24):
                lo = (a0 >> _U32(sh)) & _U32(0xFF)
                hi = (a1 >> _U32(sh)) & _U32(0xFF)
                ep_phases.append(lo | (hi << _U32(8)))
            ep0, ep1, ep2, ep3 = ep_phases
            epE = _weave([ep0, ep2])
            epO = _weave([ep1, ep3])
        else:
            ept = refs.pop(0)[:].astype(_U32).T
            epE, epO = _lo(ept), _hi(ept)
        aw0, aw1, aw2 = _phases(refs.pop(0)[:].astype(_U32).T, 3)
        h1E, h2E = _lo(aw0), _hi(aw0)
        h3E, h1O = _lo(aw1), _hi(aw1)
        h2O, h3O = _lo(aw2), _hi(aw2)
        if split_colour:
            dE, dO = _unpack_even_odd(refs.pop(0)[:].astype(_U32).T,
                                      refs.pop(0)[:].astype(_U32).T)
        else:
            dE, dO = _phases(refs.pop(0)[:].astype(_U32).T, 2)
        colE = recorrelate_pair_swar(dE, variant)
        colO = recorrelate_pair_swar(dO, variant)
        cidxE, cidxO = _phases(refs.pop(0)[:].astype(_U32).T, 2)
        out_ref = refs.pop(0)
        w0E = epE | (h1E << _U32(16))
        w1E = h2E | (h3E << _U32(16))
        w0O = epO | (h1O << _U32(16))
        w1O = h2O | (h3O << _U32(16))
        out_ref[:] = _weave([w0E, w1E, colE, cidxE, w0O, w1O, colO, cidxO]).T
    return kernel


@partial(jax.jit, static_argnames=("variant", "split_alpha", "split_colour",
                                   "interpret"))
def bc3_untransform_tpu(streams, variant: int, split_alpha: bool, split_colour: bool,
                        interpret: bool = False):
    """Inverse of :func:`bc3_transform_tpu`; returns flat uint32[4N]."""
    n = streams[-1].shape[0]
    grid, rows = _grid_rows(4 * n, FAMILY_ROWS["bc3"])
    ins = []
    ins += [WIDTH // 16, WIDTH // 16] if split_alpha else [WIDTH // 8]
    ins += [3 * WIDTH // 8]
    ins += [WIDTH // 8, WIDTH // 8] if split_colour else [WIDTH // 4]
    ins += [WIDTH // 4]
    (out,) = _call(_bc3_u_kernel(variant, split_alpha, split_colour, rows), streams,
                   ins, [WIDTH], grid, rows, interpret)
    return out


# ===================================== BC4 / BC5 =====================================
# A BC4 block is the BC3 alpha section alone (w0 = ep | h1<<16, w1 = h2 | h3<<16);
# a BC5 block is two of them (red then green). Framework extension -- the reference
# only reserves the format tags (oracle/bc4.py documents the stream layouts).

def _alpha_section_pack(epE, epO, h1E, h2E, h3E, h1O, h2O, h3O, split: bool):
    """-> (endpoint stream tiles..., alpha-index word tile), transposed space."""
    aw = _weave([h1E | (h2E << _U32(16)), h3E | (h1O << _U32(16)),
                 h2O | (h3O << _U32(16))])
    if split:
        ep0, ep2 = _phases(epE, 2)
        ep1, ep3 = _phases(epO, 2)
        a0 = ((ep0 & _U32(0xFF)) | ((ep1 & _U32(0xFF)) << _U32(8))
              | ((ep2 & _U32(0xFF)) << _U32(16)) | ((ep3 & _U32(0xFF)) << _U32(24)))
        a1 = ((ep0 >> _U32(8)) | ((ep1 >> _U32(8)) << _U32(8))
              | ((ep2 >> _U32(8)) << _U32(16)) | ((ep3 >> _U32(8)) << _U32(24)))
        return (a0, a1, aw)
    return (epE | (epO << _U32(16)), aw)


def _alpha_section_unpack(ep_streams, aw_tile, split: bool):
    """Inverse: -> (epE, epO, h1E, h2E, h3E, h1O, h2O, h3O)."""
    if split:
        a0, a1 = ep_streams
        ep_phases = []
        for sh in (0, 8, 16, 24):
            lo = (a0 >> _U32(sh)) & _U32(0xFF)
            hi = (a1 >> _U32(sh)) & _U32(0xFF)
            ep_phases.append(lo | (hi << _U32(8)))
        ep0, ep1, ep2, ep3 = ep_phases
        epE = _weave([ep0, ep2])
        epO = _weave([ep1, ep3])
    else:
        (ept,) = ep_streams
        epE, epO = _lo(ept), _hi(ept)
    aw0, aw1, aw2 = _phases(aw_tile, 3)
    return (epE, epO, _lo(aw0), _hi(aw0), _lo(aw1), _hi(aw1), _lo(aw2), _hi(aw2))


def _bc4_t_kernel(split: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        w0E, w1E, w0O, w1O = _phases(xt, 4)
        tiles = _alpha_section_pack(_lo(w0E), _lo(w0O), _hi(w0E), _lo(w1E),
                                    _hi(w1E), _hi(w0O), _lo(w1O), _hi(w1O), split)
        for ref, t in zip(out_refs, tiles):
            ref[:] = t.T
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc4_transform_tpu(flat, split: bool, interpret: bool = False):
    """Flat uint32[2N] -> ([ep | a0, a1], alpha-index words) streams."""
    grid, rows = _grid_rows(flat.shape[0], FAMILY_ROWS["bc4"])
    outs = ([WIDTH // 8, WIDTH // 8] if split else [WIDTH // 4]) + [3 * WIDTH // 4]
    return _call(_bc4_t_kernel(split, rows), (flat,), [WIDTH], outs,
                 grid, rows, interpret)


def _bc4_u_kernel(split: bool, rows: int):
    def kernel(*refs):
        *ins, out_ref = refs
        eps = tuple(r[:].astype(_U32).T for r in ins[:-1])
        aw = ins[-1][:].astype(_U32).T
        epE, epO, h1E, h2E, h3E, h1O, h2O, h3O = _alpha_section_unpack(eps, aw, split)
        w0E = epE | (h1E << _U32(16))
        w1E = h2E | (h3E << _U32(16))
        w0O = epO | (h1O << _U32(16))
        w1O = h2O | (h3O << _U32(16))
        out_ref[:] = _weave([w0E, w1E, w0O, w1O]).T
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc4_untransform_tpu(streams, split: bool, interpret: bool = False):
    """Inverse of :func:`bc4_transform_tpu`; returns flat uint32[2N]."""
    total = streams[-1].shape[0] * 4 // 3  # flat 2N words; aidx = 3N/2 words
    grid, rows = _grid_rows(total, FAMILY_ROWS["bc4"])
    ins = ([WIDTH // 8, WIDTH // 8] if split else [WIDTH // 4]) + [3 * WIDTH // 4]
    (out,) = _call(_bc4_u_kernel(split, rows), streams, ins, [WIDTH],
                   grid, rows, interpret)
    return out


def _bc5_t_kernel(split: bool, rows: int):
    def kernel(x_ref, *out_refs):
        xt = x_ref[:].astype(_U32).T
        rw0E, rw1E, gw0E, gw1E, rw0O, rw1O, gw0O, gw1O = _phases(xt, 8)
        r_tiles = _alpha_section_pack(_lo(rw0E), _lo(rw0O), _hi(rw0E), _lo(rw1E),
                                      _hi(rw1E), _hi(rw0O), _lo(rw1O), _hi(rw1O),
                                      split)
        g_tiles = _alpha_section_pack(_lo(gw0E), _lo(gw0O), _hi(gw0E), _lo(gw1E),
                                      _hi(gw1E), _hi(gw0O), _lo(gw1O), _hi(gw1O),
                                      split)
        # on-disk order: R endpoints, G endpoints, R indices, G indices
        tiles = r_tiles[:-1] + g_tiles[:-1] + (r_tiles[-1], g_tiles[-1])
        for ref, t in zip(out_refs, tiles):
            ref[:] = t.T
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc5_transform_tpu(flat, split: bool, interpret: bool = False):
    """Flat uint32[4N] -> (R/G endpoint streams..., Ridx words, Gidx words)."""
    grid, rows = _grid_rows(flat.shape[0], FAMILY_ROWS["bc5"])
    ep = [WIDTH // 16] * 4 if split else [WIDTH // 8] * 2
    outs = ep + [3 * WIDTH // 8, 3 * WIDTH // 8]
    return _call(_bc5_t_kernel(split, rows), (flat,), [WIDTH], outs,
                 grid, rows, interpret)


def _bc5_u_kernel(split: bool, rows: int):
    def kernel(*refs):
        *ins, out_ref = refs
        k = 2 if split else 1  # endpoint streams per channel
        tiles = [r[:].astype(_U32).T for r in ins]
        r_eps, g_eps = tuple(tiles[:k]), tuple(tiles[k:2 * k])
        r_aw, g_aw = tiles[2 * k], tiles[2 * k + 1]
        repE, repO, rh1E, rh2E, rh3E, rh1O, rh2O, rh3O = _alpha_section_unpack(
            r_eps, r_aw, split)
        gepE, gepO, gh1E, gh2E, gh3E, gh1O, gh2O, gh3O = _alpha_section_unpack(
            g_eps, g_aw, split)
        out_ref[:] = _weave([
            repE | (rh1E << _U32(16)), rh2E | (rh3E << _U32(16)),
            gepE | (gh1E << _U32(16)), gh2E | (gh3E << _U32(16)),
            repO | (rh1O << _U32(16)), rh2O | (rh3O << _U32(16)),
            gepO | (gh1O << _U32(16)), gh2O | (gh3O << _U32(16)),
        ]).T
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc5_untransform_tpu(streams, split: bool, interpret: bool = False):
    """Inverse of :func:`bc5_transform_tpu`; returns flat uint32[4N]."""
    total = streams[-1].shape[0] * 8 // 3  # flat 4N words; Gidx = 3N/2 words
    grid, rows = _grid_rows(total, FAMILY_ROWS["bc5"])
    ep = [WIDTH // 16] * 4 if split else [WIDTH // 8] * 2
    ins = ep + [3 * WIDTH // 8, 3 * WIDTH // 8]
    (out,) = _call(_bc5_u_kernel(split, rows), streams, ins, [WIDTH],
                   grid, rows, interpret)
    return out