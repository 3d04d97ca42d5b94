"""Pallas TPU kernel for the sampled-offset LZ-coverage estimator.

The XLA formulation (:func:`.ltu._coverage_scores`) materializes per-offset equality
arrays in HBM (~10 GB of traffic for a 128 MiB search); this kernel keeps the whole
working set in VMEM: each grid step loads one tile plus its neighbours (previous tile
= halo for backward offsets up to 4096; next tile = halo for the 2-byte gram
lookahead), computes byte equalities for every offset with roll-composed flat shifts,
ORs the 3-gram matches, and accumulates one partial count per candidate row.

Semantics are bit-identical to the XLA/numpy/C++ twins (differential-tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _make_kernel(offsets, grid_j):
    def kernel(valid_ref, cur_ref, prev_ref, next_ref, out_ref, acc_ref):
        j = pl.program_id(1)
        row_valid = valid_ref[pl.program_id(0)]
        both = jnp.concatenate(
            [prev_ref[0], cur_ref[0], next_ref[0]], axis=0).astype(jnp.int32)
        # Mosaic rotates are 32-bit only, so build the 3-byte grams as int32 lanes
        # once (two flat shifts) and compare whole grams per offset (one shift each).
        g = (both | (_flat_shift_left(both, 1) << 8)
             | (_flat_shift_left(both, 2) << 16))

        # global flat byte position of every element of `both`
        local = (lax.broadcasted_iota(jnp.int32, both.shape, 0) * W
                 + lax.broadcasted_iota(jnp.int32, both.shape, 1))
        pos = (j - 1) * SPAN + local
        in_cur = (local >= SPAN) & (local < 2 * SPAN)

        covered = jnp.zeros(both.shape, jnp.int32)  # 0/1; bool vectors trip Mosaic
        for k in offsets:
            if k % W == 0:
                shifted = pltpu.roll(g, k // W, axis=0)
            else:
                shifted = _flat_shift_right(g, k % W)
                if k >= W:
                    shifted = pltpu.roll(shifted, k // W, axis=0)
            covered |= ((g == shifted) & (pos >= k)).astype(jnp.int32)
        valid = (in_cur & (pos < row_valid - 2)).astype(jnp.int32)
        partial_count = jnp.sum((covered * valid).astype(jnp.float32))

        @pl.when(j == 0)
        def _():
            acc_ref[0] = 0.0

        acc_ref[0] += partial_count

        @pl.when(j == grid_j - 1)
        def _():
            out_ref[...] = jnp.full(out_ref.shape, acc_ref[0], jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("offsets",))
def coverage_scores_pallas(regions, valid_len, offsets: tuple):
    """(C, L) uint8 regions -> (C,) float32 scores (valid_len - covered positions).

    ``valid_len``: a scalar shared by all rows, or a (C,) per-row array (the
    flattened (batch x candidates) corpus-pipeline grid).
    """
    n_rows, length = regions.shape
    if length % SPAN:
        raise ValueError(f"region length {length} must be a multiple of {SPAN}")
    assert max(offsets) <= SPAN, "prev-tile halo covers offsets up to SPAN only"
    grid_j = length // SPAN
    tiled = regions.reshape(n_rows, grid_j * ROWS, W)
    valid_rows = jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32).reshape(-1),
                                  (n_rows,))

    spec_cur = pl.BlockSpec((1, ROWS, W), lambda c, j: (c, j, 0),
                            memory_space=pltpu.VMEM)
    spec_prev = pl.BlockSpec((1, ROWS, W),
                             lambda c, j: (c, jnp.maximum(j - 1, 0), 0),
                             memory_space=pltpu.VMEM)
    spec_next = pl.BlockSpec((1, ROWS, W),
                             lambda c, j: (c, jnp.minimum(j + 1, grid_j - 1), 0),
                             memory_space=pltpu.VMEM)

    counts = pl.pallas_call(
        _make_kernel(offsets, grid_j),
        grid=(n_rows, grid_j),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec_cur, spec_prev,
                  spec_next],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c, j: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )(valid_rows, tiled, tiled, tiled)
    return valid_rows.astype(jnp.float32) - counts[:, 0, 0]
