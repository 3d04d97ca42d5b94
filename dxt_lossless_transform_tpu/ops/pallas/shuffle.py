"""Fused single-pass BC1/BC2/BC3 transform/untransform Pallas kernels.

Key ideas:

- *Phase-space math*: stream words that pack multiple per-block values (u16 endpoint
  pairs, u8 quads, the BC3 6-byte alpha-index lanes) are computed elementwise from
  even/odd (or mod-4) block phases instead of by shuffling lanes -- e.g.
  ``c0w[t] = c0[2t] | c0[2t+1] << 16`` is just ``c0E | c0O << 16``.
- *Transpose sandwich*: the remaining AoS<->SoA steps (block-phase de-interleave of
  the input words, block re-interleave of outputs) are lane-granularity shuffles,
  which Mosaic cannot express directly; transposing in VMEM turns them into sublane
  reshapes, which it can. Measured ~122 GB/s r+w vs ~146 GB/s Pallas memcpy.
- The YCoCg variant is a traced SMEM scalar dispatched with ``lax.switch`` inside
  the kernel: one compiled kernel serves all four variants.

All kernels process flat little-endian u32 word images; tiles are (ROWS, 2048) u32
on the widest array. Callers pad block counts to powers of two >= 2048
(``lanes.bucket_size``), which guarantees divisibility by every tile shape here.

Behavioral reference for the stream layouts: ``transform_with_settings.rs`` of each
format crate (see :mod:`...oracle`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import ycocg

MAX_ROWS = 32
WIDTH = 2048  # lanes of the widest (block-image) array per tile


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def _grid_rows(total_words: int) -> tuple:
    """(grid, rows) such that grid * rows * WIDTH == total_words."""
    if total_words < WIDTH or total_words % WIDTH:
        raise ValueError(
            f"pallas kernels need a word count that is a multiple of {WIDTH} "
            f"(got {total_words}); pad block counts with lanes.bucket_size first")
    all_rows = total_words // WIDTH
    rows = min(MAX_ROWS, all_rows)
    if all_rows % rows:
        raise ValueError(f"row count {all_rows} not divisible by tile rows {rows}")
    return all_rows // rows, rows


# --- in-VMEM shuffle helpers (transpose sandwich) ------------------------------------

def _vmem_deinterleave(v, k: int):
    """(R, W) tile -> k tiles (R, W/k); part c holds lanes c, c+k, c+2k, ..."""
    rows, width = v.shape
    vt = v.T.reshape(width // k, k, rows)
    return tuple(vt[:, c, :].T for c in range(k))


def _vmem_interleave(parts):
    """Inverse of :func:`_vmem_deinterleave`: k tiles (R, W) -> (R, k*W)."""
    k = len(parts)
    rows, width = parts[0].shape
    stacked = jnp.concatenate([p.T[:, None, :] for p in parts], axis=1)
    return stacked.reshape(k * width, rows).T


def _decorr(variant, x):
    return lax.switch(variant, [lambda v: v, ycocg.decorrelate_var1,
                                ycocg.decorrelate_var2, ycocg.decorrelate_var3], x)


def _recorr(variant, x):
    return lax.switch(variant, [lambda v: v, ycocg.recorrelate_var1,
                                ycocg.recorrelate_var2, ycocg.recorrelate_var3], x)


def _split_halves(w):
    w = w.astype(jnp.uint32)
    return ((w & jnp.uint32(0xFFFF)).astype(jnp.int32),
            (w >> jnp.uint32(16)).astype(jnp.int32))


def _join(lo, hi):
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << jnp.uint32(16))


def _decorr_pairs(variant, colE, colO):
    """Decorrelate both u16 halves of even/odd-phase color words in one switch."""
    c0E, c1E = _split_halves(colE)
    c0O, c1O = _split_halves(colO)
    w = c0E.shape[1]
    d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
    return d[:, :w], d[:, w:2 * w], d[:, 2 * w:3 * w], d[:, 3 * w:]


def _recorr_pairs(variant, c0E, c1E, c0O, c1O):
    w = c0E.shape[1]
    r = _recorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
    return (_join(r[:, :w], r[:, w:2 * w]),       # colE
            _join(r[:, 2 * w:3 * w], r[:, 3 * w:]))  # colO


def _vspec(w, rows):
    return pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _call(kernel, variant, args, in_widths, out_widths, grid, rows,
          interpret: bool):
    res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [_vspec(w, rows) for w in in_widths],
        out_specs=[_vspec(w, rows) for w in out_widths],
        out_shape=[jax.ShapeDtypeStruct((grid * rows, w), jnp.uint32)
                   for w in out_widths],
        interpret=interpret,
    )(jnp.asarray(variant, jnp.int32).reshape(1),
      *(a.reshape(grid * rows, w) for a, w in zip(args, in_widths)))
    return tuple(r.reshape(-1) for r in res)


# ======================================== BC1 ========================================
# Block image phases (2 words/block): flat[4t..4t+3] = [colE, idxE, colO, idxO].

def _bc1_t_kernel(split: bool):
    def kernel(variant_ref, x_ref, *out_refs):
        variant = variant_ref[0]
        cE, iE, cO, iO = _vmem_deinterleave(x_ref[:].astype(jnp.uint32), 4)
        c0E, c1E, c0O, c1O = _decorr_pairs(variant, cE, cO)
        idx = _vmem_interleave([iE, iO])
        if split:
            out_refs[0][:] = _join(c0E, c0O)
            out_refs[1][:] = _join(c1E, c1O)
            out_refs[2][:] = idx
        else:
            out_refs[0][:] = _vmem_interleave([_join(c0E, c1E), _join(c0O, c1O)])
            out_refs[1][:] = idx
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc1_transform_tpu(flat, variant, split: bool, interpret: bool = False):
    """Flat uint32[2N] -> stream word arrays, one fused pass.

    split: ``(c0w u32[N/2], c1w u32[N/2], idx u32[N])``; else ``(colors, idx)``.
    """
    grid, rows = _grid_rows(flat.shape[0])
    outs = [WIDTH // 4, WIDTH // 4, WIDTH // 2] if split else [WIDTH // 2, WIDTH // 2]
    return _call(_bc1_t_kernel(split), variant, (flat,), [WIDTH], outs,
                 grid, rows, interpret)


def _bc1_u_kernel(split: bool):
    def kernel(variant_ref, *refs):
        variant = variant_ref[0]
        if split:
            c0_ref, c1_ref, idx_ref, out_ref = refs
            c0E, c0O = _split_halves(c0_ref[:])
            c1E, c1O = _split_halves(c1_ref[:])
        else:
            col_ref, idx_ref, out_ref = refs
            colE_raw, colO_raw = _vmem_deinterleave(col_ref[:].astype(jnp.uint32), 2)
            c0E, c1E = _split_halves(colE_raw)
            c0O, c1O = _split_halves(colO_raw)
        colE, colO = _recorr_pairs(variant, c0E, c1E, c0O, c1O)
        idxE, idxO = _vmem_deinterleave(refs[-2][:].astype(jnp.uint32), 2)
        out_ref[:] = _vmem_interleave([colE, idxE, colO, idxO])
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc1_untransform_tpu(streams, variant, split: bool, interpret: bool = False):
    """Inverse of :func:`bc1_transform_tpu`; returns flat uint32[2N]."""
    n = streams[-1].shape[0]  # indices count == blocks
    grid, rows = _grid_rows(2 * n)
    ins = [WIDTH // 4, WIDTH // 4, WIDTH // 2] if split else [WIDTH // 2, WIDTH // 2]
    (out,) = _call(_bc1_u_kernel(split), variant, streams, ins, [WIDTH],
                   grid, rows, interpret)
    return out


# ======================================== BC2 ========================================
# 4 words/block: [a_lo, a_hi, col, idx]; no block-phase needed for alpha/idx.

def _bc2_t_kernel(split: bool):
    def kernel(variant_ref, x_ref, *out_refs):
        variant = variant_ref[0]
        a_lo, a_hi, cols, idx = _vmem_deinterleave(x_ref[:].astype(jnp.uint32), 4)
        out_refs[0][:] = _vmem_interleave([a_lo, a_hi])
        if split:
            colE, colO = _vmem_deinterleave(cols, 2)
            c0E, c1E, c0O, c1O = _decorr_pairs(variant, colE, colO)
            out_refs[1][:] = _join(c0E, c0O)
            out_refs[2][:] = _join(c1E, c1O)
            out_refs[3][:] = idx
        else:
            c0, c1 = _split_halves(cols)
            w = c0.shape[1]
            d = _decorr(variant, jnp.concatenate([c0, c1], axis=1))
            out_refs[1][:] = _join(d[:, :w], d[:, w:])
            out_refs[2][:] = idx
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc2_transform_tpu(flat, variant, split: bool, interpret: bool = False):
    """Flat uint32[4N] -> (alpha_w u32[2N], [c0w, c1w | colors], idx u32[N])."""
    grid, rows = _grid_rows(flat.shape[0])
    outs = ([WIDTH // 2, WIDTH // 8, WIDTH // 8, WIDTH // 4] if split
            else [WIDTH // 2, WIDTH // 4, WIDTH // 4])
    return _call(_bc2_t_kernel(split), variant, (flat,), [WIDTH], outs,
                 grid, rows, interpret)


def _bc2_u_kernel(split: bool):
    def kernel(variant_ref, *refs):
        variant = variant_ref[0]
        if split:
            alpha_ref, c0_ref, c1_ref, idx_ref, out_ref = refs
            c0E, c0O = _split_halves(c0_ref[:])
            c1E, c1O = _split_halves(c1_ref[:])
            colE, colO = _recorr_pairs(variant, c0E, c1E, c0O, c1O)
            cols = _vmem_interleave([colE, colO])
        else:
            alpha_ref, col_ref, idx_ref, out_ref = refs
            c0, c1 = _split_halves(col_ref[:])
            w = c0.shape[1]
            r = _recorr(variant, jnp.concatenate([c0, c1], axis=1))
            cols = _join(r[:, :w], r[:, w:])
        a_lo, a_hi = _vmem_deinterleave(alpha_ref[:].astype(jnp.uint32), 2)
        out_ref[:] = _vmem_interleave(
            [a_lo, a_hi, cols, idx_ref[:].astype(jnp.uint32)])
    return kernel


@partial(jax.jit, static_argnames=("split", "interpret"))
def bc2_untransform_tpu(streams, variant, split: bool, interpret: bool = False):
    """Inverse of :func:`bc2_transform_tpu`; returns flat uint32[4N]."""
    n = streams[-1].shape[0]
    grid, rows = _grid_rows(4 * n)
    ins = ([WIDTH // 2, WIDTH // 8, WIDTH // 8, WIDTH // 4] if split
           else [WIDTH // 2, WIDTH // 4, WIDTH // 4])
    (out,) = _call(_bc2_u_kernel(split), variant, streams, ins, [WIDTH],
                   grid, rows, interpret)
    return out


# ======================================== BC3 ========================================
# 4 words/block: [w0, w1, col, cidx] with w0 = ep | h1<<16, w1 = h2 | h3<<16.
# 8 block-phase streams: [w0E, w1E, colE, cidxE, w0O, w1O, colO, cidxO].
# Alpha-index words: aw[3s]   = h1E | h2E<<16
#                    aw[3s+1] = h3E | h1O<<16
#                    aw[3s+2] = h2O | h3O<<16          (s = even-block pair index)

def _bc3_t_kernel(split_alpha: bool, split_colour: bool):
    def kernel(variant_ref, x_ref, *out_refs):
        variant = variant_ref[0]
        w0E, w1E, colE, cidxE, w0O, w1O, colO, cidxO = _vmem_deinterleave(
            x_ref[:].astype(jnp.uint32), 8)
        epE, h1E = _split_halves(w0E)
        h2E, h3E = _split_halves(w1E)
        epO, h1O = _split_halves(w0O)
        h2O, h3O = _split_halves(w1O)
        out = list(out_refs)
        if split_alpha:
            ep0, ep2 = _vmem_deinterleave(epE, 2)   # block phases 0,2 (mod 4)
            ep1, ep3 = _vmem_deinterleave(epO, 2)   # block phases 1,3
            a0 = ((ep0 & 0xFF) | ((ep1 & 0xFF) << 8)
                  | ((ep2 & 0xFF) << 16) | ((ep3 & 0xFF) << 24))
            a1 = ((ep0 >> 8) | ((ep1 >> 8) << 8)
                  | ((ep2 >> 8) << 16) | ((ep3 >> 8) << 24))
            out.pop(0)[:] = a0.astype(jnp.uint32)
            out.pop(0)[:] = a1.astype(jnp.uint32)
        else:
            out.pop(0)[:] = _join(epE, epO)
        aw0 = _join(h1E, h2E)
        aw1 = _join(h3E, h1O)
        aw2 = _join(h2O, h3O)
        out.pop(0)[:] = _vmem_interleave([aw0, aw1, aw2])
        c0E, c1E, c0O, c1O = _decorr_pairs(variant, colE, colO)
        if split_colour:
            out.pop(0)[:] = _join(c0E, c0O)
            out.pop(0)[:] = _join(c1E, c1O)
        else:
            out.pop(0)[:] = _vmem_interleave([_join(c0E, c1E), _join(c0O, c1O)])
        out.pop(0)[:] = _vmem_interleave([cidxE, cidxO])
    return kernel


@partial(jax.jit, static_argnames=("split_alpha", "split_colour", "interpret"))
def bc3_transform_tpu(flat, variant, split_alpha: bool, split_colour: bool,
                      interpret: bool = False):
    """Flat uint32[4N] -> stream word arrays in on-disk order (see oracle.bc3)."""
    grid, rows = _grid_rows(flat.shape[0])
    outs = []
    outs += [WIDTH // 16, WIDTH // 16] if split_alpha else [WIDTH // 8]
    outs += [3 * WIDTH // 8]
    outs += [WIDTH // 8, WIDTH // 8] if split_colour else [WIDTH // 4]
    outs += [WIDTH // 4]
    return _call(_bc3_t_kernel(split_alpha, split_colour), variant, (flat,),
                 [WIDTH], outs, grid, rows, interpret)


def _bc3_u_kernel(split_alpha: bool, split_colour: bool):
    def kernel(variant_ref, *refs):
        variant = variant_ref[0]
        refs = list(refs)
        if split_alpha:
            a0 = refs.pop(0)[:].astype(jnp.uint32)
            a1 = refs.pop(0)[:].astype(jnp.uint32)
            ep_phases = []
            for sh in (0, 8, 16, 24):
                lo = (a0 >> jnp.uint32(sh)) & jnp.uint32(0xFF)
                hi = (a1 >> jnp.uint32(sh)) & jnp.uint32(0xFF)
                ep_phases.append((lo | (hi << jnp.uint32(8))).astype(jnp.int32))
            ep0, ep1, ep2, ep3 = ep_phases
            epE = _vmem_interleave([ep0, ep2])
            epO = _vmem_interleave([ep1, ep3])
        else:
            epE, epO = _split_halves(refs.pop(0)[:])
        aw0, aw1, aw2 = _vmem_deinterleave(refs.pop(0)[:].astype(jnp.uint32), 3)
        h1E, h2E = _split_halves(aw0)
        h3E, h1O = _split_halves(aw1)
        h2O, h3O = _split_halves(aw2)
        if split_colour:
            c0E, c0O = _split_halves(refs.pop(0)[:])
            c1E, c1O = _split_halves(refs.pop(0)[:])
        else:
            colE_raw, colO_raw = _vmem_deinterleave(
                refs.pop(0)[:].astype(jnp.uint32), 2)
            c0E, c1E = _split_halves(colE_raw)
            c0O, c1O = _split_halves(colO_raw)
        colE, colO = _recorr_pairs(variant, c0E, c1E, c0O, c1O)
        cidxE, cidxO = _vmem_deinterleave(refs.pop(0)[:].astype(jnp.uint32), 2)
        out_ref = refs.pop(0)
        w0E = _join(epE, h1E)
        w1E = _join(h2E, h3E)
        w0O = _join(epO, h1O)
        w1O = _join(h2O, h3O)
        out_ref[:] = _vmem_interleave([w0E, w1E, colE, cidxE, w0O, w1O, colO, cidxO])
    return kernel


@partial(jax.jit, static_argnames=("split_alpha", "split_colour", "interpret"))
def bc3_untransform_tpu(streams, variant, split_alpha: bool, split_colour: bool,
                        interpret: bool = False):
    """Inverse of :func:`bc3_transform_tpu`; returns flat uint32[4N]."""
    n = streams[-1].shape[0]
    grid, rows = _grid_rows(4 * n)
    ins = []
    ins += [WIDTH // 16, WIDTH // 16] if split_alpha else [WIDTH // 8]
    ins += [3 * WIDTH // 8]
    ins += [WIDTH // 8, WIDTH // 8] if split_colour else [WIDTH // 4]
    ins += [WIDTH // 4]
    (out,) = _call(_bc3_u_kernel(split_alpha, split_colour), variant, streams,
                   ins, [WIDTH], grid, rows, interpret)
    return out
