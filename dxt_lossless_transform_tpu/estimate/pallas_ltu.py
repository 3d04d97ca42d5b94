"""Pallas TPU kernel for the sampled-offset LZ-coverage estimator.

The XLA formulation (:func:`.ltu._coverage_scores`) materializes per-offset equality
arrays in HBM (~10 GB of traffic for a 128 MiB search); this kernel keeps the whole
working set in VMEM. Each grid step DMAs exactly ONE new tile: a sliding window in
VMEM scratch holds the previous two tiles (the backward-offset halo, up to 4096
bytes) while the incoming tile provides the 3-byte gram lookahead, so HBM reads are
1x the data (the round-1 version re-fetched prev/cur/next per step = 3x).

Per tile: byte equalities for every offset with roll-composed flat shifts, 4-gram
matches selecting the nearest-offset weight (offsets descending; see
``ltu.offset_weight``), one partial weighted count accumulated per candidate row.
``valid_len`` is a scalar or a per-row array (the flattened batch x candidates
corpus grid).

Semantics match the XLA/numpy/C++ twins bit-exactly while the weighted total
stays below 2**24 (float32 integer-exact range; the twin-equality tests live
there). Larger regions accumulate in f32 -- within a few hundred of the exact
integer on a 128 MiB region, which only reorders candidates that are effective
ties (CORPUS_REPORT.md: such files are coin flips for any approximate
estimator).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ltu import WEIGHT_SCALE, offset_weight

ROWS = 32          # sublanes per tile
W = 1024           # lanes per tile
SPAN = ROWS * W    # flat bytes per tile


def _flat_shift_right(v, s: int):
    """out[i] = flat[i - s] over the row-major flattening of v (0 < s < W)."""
    rows, width = v.shape
    a = pltpu.roll(v, s, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    lane = lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    return jnp.where(lane >= s, a, b)


def _flat_shift_left(v, s: int):
    """out[i] = flat[i + s] (0 < s < W)."""
    rows, width = v.shape
    a = pltpu.roll(v, width - s, axis=1)   # == roll left by s
    b = pltpu.roll(a, rows - 1, axis=0)    # == roll rows up by 1
    lane = lax.broadcasted_iota(jnp.int32, (rows, width), 1)
    return jnp.where(lane < width - s, a, b)


W4 = W // 4        # u32 lanes per tile on the packed-words path


def _eq_bytes(x, y):
    """Per-byte equality of two u32 lanes as packed 0x80 bits (SWAR zero-detect)."""
    hi = jnp.uint32(0x80808080)
    lo7 = jnp.uint32(0x7F7F7F7F)
    t = x ^ y
    nz = ((t & lo7) + lo7) | t       # high bit set where the byte is nonzero
    return ~nz & hi


def _make_kernel_packed(offsets, grid_j, count_lo, count_hi):
    """SWAR twin of :func:`_make_kernel` over u32-packed byte streams.

    4 byte positions per lane: per offset the aligned source stream is one (two,
    for offsets not a multiple of 4) word-level flat shift, the byte equalities
    come from one SWAR zero-detect, the 4-gram AND is a shift-combine of the
    packed equality bits, and the nearest-offset weight is SWAR-selected into a
    packed per-byte weight word (offsets descending). Weighted counts are
    bit-identical to the byte-lane kernel (differential-tested).
    """
    rows_per_tile = ROWS

    def _weights(win, base, guard: bool):
        """Packed per-byte weights for the CUR tile (win rows [ROWS:2*ROWS)).

        ``win``: (2*ROWS+1, W4) u32 window [prev | cur | 1 lookahead row]."""
        cur_ext = win[rows_per_tile:2 * rows_per_tile + 1]     # (ROWS+1, W4)
        wf = jnp.zeros((rows_per_tile, W4), jnp.uint32)
        if guard:
            gw = (lax.broadcasted_iota(jnp.int32, (rows_per_tile, W4), 0) * (4 * W4)
                  + lax.broadcasted_iota(jnp.int32, (rows_per_tile, W4), 1) * 4
                  + base)                                      # byte 0 position
        for k in sorted(offsets, reverse=True):
            q, r = divmod(k, 4)
            if (q % W4 == 0) and r == 0:
                # pure static row slice (k in {4*W4, 8*W4, ...} = {1024, ...})
                d = q // W4
                src = win[rows_per_tile - d:2 * rows_per_tile + 1 - d]
            else:
                # minimal window: sources live in rows [ROWS-1, 2*ROWS+1)
                ext = win[rows_per_tile - 1:]
                s_q = _flat_shift_right(ext, q)[1:] if q else ext[1:]
                if r == 0:
                    src = s_q
                else:
                    s_q1 = _flat_shift_right(ext, q + 1)[1:]
                    src = ((s_q << jnp.uint32(8 * r))
                           | (s_q1 >> jnp.uint32(8 * (4 - r))))
            B = _eq_bytes(cur_ext, src)                        # (ROWS+1, W4)
            if guard:
                # no matches reaching before stream position 0: byte b of lane
                # matches only if its global position >= k
                gm = jnp.zeros((rows_per_tile, W4), jnp.uint32)
                for b in range(4):
                    gm |= jnp.where(gw + b >= k,
                                    jnp.uint32(0x80 << (8 * b)), jnp.uint32(0))
                # extend over the lookahead row (positions only grow) by masking
                # the sliced result below instead of B itself
            Bn = _flat_shift_left(B, 1)                        # word t+1 bits
            s1 = (B >> jnp.uint32(8)) | (Bn << jnp.uint32(24))
            s2 = (B >> jnp.uint32(16)) | (Bn << jnp.uint32(16))
            s3 = (B >> jnp.uint32(24)) | (Bn << jnp.uint32(8))
            c = (B & s1 & s2 & s3)[:rows_per_tile]
            if guard:
                c &= gm
            # byte-granular select: matched bytes take this offset's weight
            m8 = ((c >> jnp.uint32(7)) & jnp.uint32(0x01010101)) * jnp.uint32(0xFF)
            wk = jnp.uint32(offset_weight(k) * 0x01010101)
            wf = (wf & ~m8) | (wk & m8)
        return wf

    def kernel(valid_ref, pos0_ref, in_ref, out_ref, prev_ref, cur_ref, acc_ref):
        # Same windowing as the byte-lane kernel: grid step j delivers tile
        # min(j, grid_j-1); tile j-1 is computed once its lookahead is resident.
        j = pl.program_id(1)
        row_valid = valid_ref[pl.program_id(0)]
        pos0 = pos0_ref[0]
        incoming = in_ref[0].astype(jnp.uint32)

        @pl.when(j == 0)
        def _():
            prev_ref[...] = incoming
            cur_ref[...] = incoming
            acc_ref[0] = 0.0

        @pl.when(j > 0)
        def _():
            win = jnp.concatenate(
                [prev_ref[...], cur_ref[...], incoming[:1]], axis=0)
            base = pos0 + (j - 1) * SPAN
            wf = lax.cond(base < SPAN,
                          lambda: _weights(win, base, True),
                          lambda: _weights(win, base, False))
            local_w = ((j - 1) * SPAN
                       + lax.broadcasted_iota(jnp.int32, wf.shape, 0) * (4 * W4)
                       + lax.broadcasted_iota(jnp.int32, wf.shape, 1) * 4)
            total = jnp.zeros((), jnp.float32)
            for b in range(4):
                wb = ((wf >> jnp.uint32(8 * b))
                      & jnp.uint32(0xFF)).astype(jnp.int32)
                pos = local_w + b
                counted = ((pos >= count_lo) & (pos < count_hi)
                           & (pos0 + pos < row_valid - 3))
                total += jnp.sum(jnp.where(counted, wb, 0).astype(jnp.float32))
            acc_ref[0] += total

            prev_ref[...] = cur_ref[...]
            cur_ref[...] = incoming

        @pl.when(j == grid_j)
        def _():
            out_ref[...] = jnp.full(out_ref.shape, acc_ref[0], jnp.float32)

    return kernel


def _make_kernel(offsets, grid_j, count_lo, count_hi):
    """Windowed coverage-count kernel.

    ``count_lo``/``count_hi`` (static) bound the row-local flat positions that are
    accumulated -- the full row for the single-device scorer, the non-halo middle
    for the shard_map path. ``pos0`` (SMEM scalar) maps row-local position 0 to its
    global stream position, so the no-match-before-stream-start guard and the
    ``valid_len`` cutoff both work on global coordinates.
    """
    rows_per_tile = ROWS

    def _weights(g4, base, guard: bool):
        """Nearest-offset weights of the CUR tile (g4 rows [ROWS:2*ROWS)) against
        backward offsets (descending, so the smallest matching offset's weight
        lands last); all shift work happens on the minimal row window per offset.
        ``base`` is the global position of the tile's first byte."""
        g_cur = g4[rows_per_tile:2 * rows_per_tile]
        w = jnp.zeros(g_cur.shape, jnp.int32)
        if guard:
            gpos = (lax.broadcasted_iota(jnp.int32, g_cur.shape, 0) * W
                    + lax.broadcasted_iota(jnp.int32, g_cur.shape, 1) + base)
        for k in sorted(offsets, reverse=True):
            if k % W == 0:
                # pure static row slice, no vector shuffles at all
                r = rows_per_tile - k // W
                shifted_cur = g4[r:r + rows_per_tile]
            else:
                # minimal window: cur's backshift-k sources live in rows
                # [ROWS-1, 2*ROWS); one lane roll + row roll on ROWS+1 rows
                src = g4[rows_per_tile - 1:2 * rows_per_tile]
                shifted_cur = _flat_shift_right(src, k)[1:]
            eq = (g_cur == shifted_cur)
            if guard:
                eq &= gpos >= k  # stream head: no matches before position 0
            w = jnp.where(eq, jnp.int32(offset_weight(k)), w)
        return w

    def kernel(valid_ref, pos0_ref, in_ref, out_ref, prev_ref, cur_ref, acc_ref):
        # Grid step j delivers tile min(j, grid_j-1); tile j-1 is computed once its
        # 3-byte gram lookahead (tile j's first row) is resident. Scratch rolls the
        # [prev, cur] window forward; each tile is DMA'd from HBM exactly once.
        j = pl.program_id(1)
        row_valid = valid_ref[pl.program_id(0)]
        pos0 = pos0_ref[0]
        incoming = in_ref[0]

        @pl.when(j == 0)
        def _():
            # Window priming. prev's content never affects tile 0 (the guarded
            # stream-head path kills matches reaching before the stream).
            prev_ref[...] = incoming
            cur_ref[...] = incoming
            acc_ref[0] = 0.0

        @pl.when(j > 0)
        def _():
            # grams over [prev, cur, first row of next]: the extra row feeds the
            # lookahead of cur's last three byte positions and is then discarded
            win = jnp.concatenate(
                [prev_ref[...], cur_ref[...], incoming[:1]], axis=0).astype(jnp.int32)
            g4 = (win | (_flat_shift_left(win, 1) << 8)
                  | (_flat_shift_left(win, 2) << 16)
                  | (_flat_shift_left(win, 3) << 24))[:2 * rows_per_tile]

            base = pos0 + (j - 1) * SPAN  # global position of this tile's start
            w = lax.cond(base < SPAN,
                         lambda: _weights(g4, base, True),
                         lambda: _weights(g4, base, False))
            local = ((j - 1) * SPAN
                     + lax.broadcasted_iota(jnp.int32, w.shape, 0) * W
                     + lax.broadcasted_iota(jnp.int32, w.shape, 1))
            counted = ((local >= count_lo) & (local < count_hi)
                       & (pos0 + local < row_valid - 3))
            acc_ref[0] += jnp.sum(jnp.where(counted, w, 0).astype(jnp.float32))

            prev_ref[...] = cur_ref[...]
            cur_ref[...] = incoming

        @pl.when(j == grid_j)
        def _():
            out_ref[...] = jnp.full(out_ref.shape, acc_ref[0], jnp.float32)

    return kernel


def _counts_call(regions, valid_rows, pos0, offsets, count_lo, count_hi,
                 interpret=False):
    n_rows, length = regions.shape
    packed = regions.dtype == jnp.uint32
    nbytes = 4 * length if packed else length
    if nbytes % SPAN:
        raise ValueError(f"region length {nbytes} must be a multiple of {SPAN}")
    assert max(offsets) <= SPAN, "prev-tile halo covers offsets up to SPAN only"
    assert all(k < W or k % W == 0 for k in offsets), \
        "offsets >= one lane row must be row-aligned (static row-slice path)"
    grid_j = nbytes // SPAN
    in_w = W // 4 if packed else W
    tiled = regions.reshape(n_rows, grid_j * ROWS, in_w)

    # step j delivers tile min(j, grid_j-1); the last step (j == grid_j) re-reads
    # the final tile, matching the old clamped-next semantics for its lookahead
    spec_in = pl.BlockSpec((1, ROWS, in_w),
                           lambda c, j: (c, jnp.minimum(j, grid_j - 1), 0),
                           memory_space=pltpu.VMEM)
    scratch_dt = jnp.uint32 if packed else jnp.uint8
    scratch_w = W4 if packed else W
    make = _make_kernel_packed if packed else _make_kernel

    counts = pl.pallas_call(
        make(offsets, grid_j, count_lo, count_hi),
        grid=(n_rows, grid_j + 1),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM), spec_in],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c, j: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ROWS, scratch_w), scratch_dt),
                        pltpu.VMEM((ROWS, scratch_w), scratch_dt),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(valid_rows, pos0.reshape(1), tiled)
    return counts[:, 0, 0]


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def coverage_scores_pallas(regions, valid_len, offsets: tuple,
                           interpret: bool = False):
    """(C, L) uint8 regions -> (C,) float32 scores
    (WEIGHT_SCALE * valid_len - nearest-offset-weighted covered positions).

    ``regions`` may also be (C, L/4) uint32 rows carrying the same bytes as LE
    words (streams straight from the transform kernels); the kernel unpacks them
    in VMEM and the scores are bit-identical to the uint8 form.

    ``valid_len``: a scalar shared by all rows, or a (C,) per-row array (the
    flattened (batch x candidates) corpus-pipeline grid).
    """
    n_rows, length = regions.shape
    nbytes = 4 * length if regions.dtype == jnp.uint32 else length
    valid_rows = jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32).reshape(-1),
                                  (n_rows,))
    counts = _counts_call(regions, valid_rows, jnp.int32(0), offsets, 0, nbytes,
                          interpret=interpret)
    from .ltu import _entropy_terms_jax

    ent = _entropy_terms_jax(regions, valid_rows)  # scorer v4: outside the kernel
    return (WEIGHT_SCALE * valid_rows.astype(jnp.float32) - counts
            + ent.astype(jnp.float32))


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def coverage_counts_windowed(chunks, valid_rows, pos0, offsets: tuple,
                             interpret: bool = False):
    """Per-shard partial coverage counts for the shard_map scorer.

    ``chunks``: (C, SPAN + Lc + SPAN) uint8 rows -- a chunk of the global region
    with one halo tile prepended (previous shard's last SPAN bytes; zeros for the
    first shard) and one appended (next shard's first SPAN bytes; content
    irrelevant for the last shard -- it only feeds the masked-out tail window).
    May also be uint32 rows carrying the same bytes as LE words (the packed
    SWAR kernel; halo = SPAN/4 words each side).
    ``pos0``: global stream position of local byte 0 (i.e. shard_start - SPAN).
    Counts (weighted) positions local in [SPAN, SPAN+Lc) whose global position
    is below ``valid_rows`` - 3 (4-byte grams); summing these over shards equals
    the unsharded weighted count.
    """
    nbytes = chunks.shape[1] * (4 if chunks.dtype == jnp.uint32 else 1)
    return _counts_call(chunks, valid_rows.astype(jnp.int32),
                        jnp.asarray(pos0, jnp.int32), offsets,
                        SPAN, nbytes - SPAN, interpret=interpret)
