"""Sharded end-to-end auto-transform steps.

``bc1_auto_step`` is the production multi-chip pipeline step and the analog of a
"training step" for this framework: a batch of texture block streams goes in, the
batched candidate search + estimator + per-file argmin + winning transform happen
on-device, and the sharded output streams plus the chosen-candidate index come out.

Sharding contract: inputs are placed with ``P("files", "blocks", ...)`` -- the batch
dimension across the DCN-ish axis, the block dimension across ICI. The transform is
per-block pure (zero communication); the estimator's coverage reduction induces one
small halo exchange per sampled offset plus a psum -- all inserted automatically by
GSPMD from the sharding annotations.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..estimate.ltu import DEFAULT_OFFSETS, _coverage_scores
from ..ops import lanes, ycocg
from ..ops.auto import _colour_region_row, _decorrelated_pairs
from ..settings import BC1_FAST_CANDIDATES

_DEFAULT_CANDIDATES: Tuple[Tuple[int, bool], ...] = tuple(
    (int(c.decorrelation_mode), c.split_colour_endpoints) for c in BC1_FAST_CANDIDATES)


@partial(jax.jit, static_argnames=("candidates", "offsets"))
def bc1_auto_step_single(flat, valid_len=None,
                         candidates: Tuple[Tuple[int, bool], ...] = _DEFAULT_CANDIDATES,
                         offsets: Tuple[int, ...] = DEFAULT_OFFSETS):
    """Single-texture auto step: flat uint32[2N] word image -> (c0, c1, indices, best).

    Always returns the split-form u16 lane streams decorrelated with the winning
    candidate's variant; the host serializes either layout from them (interleaving
    is free).
    """
    n = flat.shape[0] // 2
    if valid_len is None:
        valid_len = jnp.int32(4 * n)
    colors, indices = lanes.deinterleave(flat.astype(jnp.uint32), 2)
    dec = _decorrelated_pairs(colors, [v for v, _ in candidates])
    regions = jnp.stack([_colour_region_row(dec[v], split)
                         for v, split in candidates])
    scores = _coverage_scores(regions, valid_len, offsets)
    best = jnp.argmin(scores).astype(jnp.int32)

    variants = jnp.asarray([v for v, _ in candidates], jnp.int32)
    c0, c1 = lanes.split_u32(colors)
    d0 = ycocg.decorrelate(c0, variants[best])
    d1 = ycocg.decorrelate(c1, variants[best])
    return d0, d1, indices, best


def bc1_auto_step(mesh: Mesh,
                  candidates: Tuple[Tuple[int, bool], ...] = _DEFAULT_CANDIDATES,
                  offsets: Tuple[int, ...] = DEFAULT_OFFSETS):
    """Build the jitted batched step for ``mesh``.

    Returns ``step(flat (B, 2N) uint32 word images, valid_len (B,) int32) ->
    (c0 (B,N) int32, c1 (B,N) int32, indices (B,N) uint32, best (B,) int32)``
    with inputs/outputs sharded ``P("files", "blocks")``.
    """
    files_blocks = NamedSharding(mesh, P("files", "blocks"))
    files_sh = NamedSharding(mesh, P("files"))

    def step(flat, valid_len):
        single = partial(bc1_auto_step_single.__wrapped__,
                         candidates=candidates, offsets=offsets)
        return jax.vmap(single)(flat, valid_len)

    return jax.jit(step,
                   in_shardings=(files_blocks, files_sh),
                   out_shardings=(files_blocks, files_blocks, files_blocks, files_sh))
