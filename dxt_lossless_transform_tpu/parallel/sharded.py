"""Sharded end-to-end auto-transform steps (BC1/BC2/BC3).

These are the production multi-chip pipeline steps and the analog of a "training
step" for this framework: a batch of texture block streams goes in, the batched
candidate search + estimator + per-file argmin + winning transform happen on-device,
and the sharded output streams plus the chosen-candidate index come out.

Sharding contract: inputs are placed with ``P("files", "blocks")`` -- the batch
dimension across the DCN-ish axis, the block dimension across ICI. The transform is
per-block pure (zero communication); the estimator's coverage reduction induces one
small halo exchange per sampled offset plus a psum -- all inserted automatically by
GSPMD from the sharding annotations.

Each single-texture step returns *maximally split lane streams* decorrelated with the
winning candidate's variant -- every on-disk layout family serializes from them with
pure host-side packing, so the step's output shapes stay static across candidates.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..estimate.ltu import DEFAULT_OFFSETS, _coverage_scores

# Testing hook: run the Mosaic words path in Pallas interpret mode on CPU so the
# 8-virtual-device mesh tests exercise the same code path the chip runs.
_WORDS_INTERPRET = os.environ.get("DLT_WORDS_INTERPRET", "") == "1"


def _pallas_backend_ok(allow_pallas: bool) -> bool:
    return allow_pallas and (jax.default_backend() == "tpu" or _WORDS_INTERPRET)


def _interp() -> bool:
    """interpret= value for Mosaic kernels on the current backend."""
    return jax.default_backend() != "tpu"


def _scores(regions, valid_len, offsets, allow_pallas: bool):
    """Coverage scores; the Mosaic kernel when shapes allow and we are not under
    vmap (the batched steps), XLA otherwise."""
    import jax as _jax

    if allow_pallas and _jax.default_backend() == "tpu":
        from ..estimate.pallas_ltu import SPAN, coverage_scores_pallas

        if regions.shape[1] % SPAN == 0 and max(offsets) <= SPAN:
            return coverage_scores_pallas(regions, valid_len, offsets)
    return _coverage_scores(regions, valid_len, offsets)
from ..ops import lanes, ycocg
from ..ops.auto import _colour_region_row, _compact_pair, _decorrelated_pairs
from ..settings import (
    BC1_FAST_CANDIDATES, BC2_FAST_CANDIDATES, BC3_FAST_CANDIDATES,
    Bc4TransformSettings, Bc5TransformSettings,
)

_BC1_CANDIDATES: Tuple[Tuple[int, bool], ...] = tuple(
    (int(c.decorrelation_mode), c.split_colour_endpoints) for c in BC1_FAST_CANDIDATES)
_BC2_CANDIDATES: Tuple[Tuple[int, bool], ...] = tuple(
    (int(c.decorrelation_mode), c.split_colour_endpoints) for c in BC2_FAST_CANDIDATES)
_BC3_CANDIDATES: Tuple[Tuple[int, bool, bool], ...] = tuple(
    (int(c.decorrelation_mode), c.split_alpha_endpoints, c.split_colour_endpoints)
    for c in BC3_FAST_CANDIDATES)
_BC4_CANDIDATES: Tuple[Tuple[bool], ...] = tuple(
    (c.split_endpoints,) for c in Bc4TransformSettings.all_combinations())
_BC5_CANDIDATES: Tuple[Tuple[bool], ...] = tuple(
    (c.split_endpoints,) for c in Bc5TransformSettings.all_combinations())


def _words_gate(n_region_bytes: int, flat_words: int, offsets,
                allow_pallas: bool) -> bool:
    """Static gate for the Mosaic regions-kernel + packed-scorer fast path.

    ``flat_words`` is the FLAT word count the deinterleave/region kernels will
    consume (the whole stream, batch included) -- their 128-row tile grid needs
    the total tile-row count to divide evenly, not just the per-file length."""
    if not _pallas_backend_ok(allow_pallas):
        return False
    from ..estimate.pallas_ltu import SPAN
    from ..ops.pallas.shuffle import grid_rows_ok

    return (n_region_bytes % SPAN == 0 and max(offsets) <= SPAN
            and grid_rows_ok(flat_words, 128))


def _mesh_words_gate(n_region_bytes: int, B: int, W: int, wpb: int, offsets,
                     allow_pallas: bool, mesh) -> bool:
    """Gate for the per-shard Mosaic words path under a mesh.

    Each shard runs the deinterleave/region kernels on its local (Bl, Wc) block
    and the packed windowed scorer on its region chunk, so the LOCAL shapes must
    satisfy the kernels' tile grids; ``wpb`` = words per block (chunk boundaries
    must fall on even block pairs for the kernels' even/odd phase packing)."""
    if not _pallas_backend_ok(allow_pallas):
        return False
    from ..estimate.pallas_ltu import SPAN
    from ..ops.pallas.shuffle import grid_rows_ok

    nf, nb = mesh.shape["files"], mesh.shape["blocks"]
    if B % nf or W % nb:
        return False
    if (W // nb) % (2 * wpb):
        return False
    if not grid_rows_ok((B // nf) * (W // nb), 128):
        return False
    chunk_bytes = n_region_bytes // nb
    return (max(offsets) <= SPAN and n_region_bytes % nb == 0
            and chunk_bytes % SPAN == 0 and chunk_bytes >= SPAN)


def _rows_from_streams(streams, candidates):
    """Concatenate each candidate's 1 or 2 region streams into one u32 row each."""
    rows, si = [], 0
    for _v, split in candidates:
        if split:
            rows.append(jnp.concatenate([streams[si], streams[si + 1]]))
            si += 2
        else:
            rows.append(streams[si])
            si += 1
    return rows, si


def _concat_words_at(c0w, c1w, byte_pos):
    """u32 row ``[c0w | c1w-at-byte_pos]``: the word-lane twin of
    :func:`..ops.auto._compact_pair` on the streams' bytes.

    ``byte_pos`` is traced (ragged per-file valid prefixes land on arbitrary,
    not word-aligned, byte offsets); c1's bytes are pre-shifted by ``byte_pos %
    4`` with a one-word carry and the boundary word keeps c0's live bytes. The
    row tail beyond both valid streams differs from the byte twin (zeros vs
    stale c1 tail) -- unobservable to the scorer, which neither counts nor
    sources positions past ``valid_len``."""
    byte_pos = byte_pos.astype(jnp.int32)
    w0 = byte_pos // 4
    r = byte_pos % 4
    n_row = c0w.shape[0] + c1w.shape[0]
    # one scratch word so the shifted stream's final carry always fits unclamped
    row = jnp.concatenate([c0w, jnp.zeros((c1w.shape[0] + 1,), c1w.dtype)])
    prev = jnp.concatenate([jnp.zeros((1,), c1w.dtype), c1w[:-1]])
    rs = jnp.where(r == 0, 1, 32 - 8 * r).astype(jnp.uint32)  # r == 0 arm unused
    sh = jnp.where(r == 0, c1w,
                   (c1w << r.astype(jnp.uint32) * 8) | (prev >> rs))
    carry = jnp.where(r == 0, jnp.uint32(0), c1w[-1] >> rs)
    sh = jnp.concatenate([sh, carry[None]]).astype(c1w.dtype)
    cur = jax.lax.dynamic_slice(row, (w0,), (1,))[0]
    keep = jnp.where(r == 0, jnp.uint32(0), jnp.uint32(0xFFFFFFFF) >> rs)
    sh = sh.at[0].set((cur & keep) | (sh[0] & ~keep))
    return jax.lax.dynamic_update_slice(row, sh, (w0,))[:n_row]


def _batched_rows_from_streams(streams, candidates, byte_pos, full: bool = False):
    """Per-candidate (B, Lw) u32 rows from (B, half)-shaped candidate streams.

    ``byte_pos``: (B,) byte offsets for the second stream of split candidates.
    ``full`` (static): every file exactly fills its bucket, so the ragged
    compaction degenerates to a plain concatenation (the vmapped
    dynamic-update-slice machinery costs ~30% of the whole batched step)."""
    rows, si = [], 0
    for _v, split in candidates:
        if split:
            if full:
                rows.append(jnp.concatenate([streams[si], streams[si + 1]],
                                            axis=1))
            else:
                rows.append(jax.vmap(_concat_words_at)(
                    streams[si], streams[si + 1], byte_pos))
            si += 2
        else:
            rows.append(streams[si])
            si += 1
    return rows, si


def _batched_words_gate(n_region_bytes: int, B: int, W: int, wpb: int, offsets,
                        allow_pallas: bool, mesh) -> bool:
    """Words-path gate for the batched steps; ``W`` = words per file."""
    if mesh is not None:
        return _mesh_words_gate(n_region_bytes, B, W, wpb, offsets,
                                allow_pallas, mesh)
    return _words_gate(n_region_bytes, B * W, offsets, allow_pallas)


def _mesh_words_call(mesh: Mesh, fn, flats):
    """Run a per-block-pure flat-words kernel per shard of a (B, W) batch.

    ``fn``: uint32[T] -> tuple of uint32[T/f_i] streams. Because the kernel is
    per-block pure and every shard's chunk starts on an even block boundary
    (``_mesh_words_gate``), each shard's output chunks ARE the corresponding
    chunks of the global streams -- zero communication."""
    from jax import shard_map

    def local(fl):
        outs = fn(fl.reshape(-1))
        return tuple(o.reshape(fl.shape[0], -1) for o in outs)

    return shard_map(local, mesh=mesh, in_specs=(P("files", "blocks"),),
                     out_specs=P("files", "blocks"), check_vma=False)(flats)


def _words_deinterleave(flats, k: int, mesh, interp: bool):
    """(B, W) batch -> k streams (B, W/k) via the Mosaic deinterleave kernel
    (per shard under a mesh)."""
    from ..ops.pallas.planes import deinterleave_words_tpu

    fn = lambda f: deinterleave_words_tpu(f.astype(jnp.uint32), k,
                                          interpret=interp)
    if mesh is None:
        B = flats.shape[0]
        return tuple(s.reshape(B, -1) for s in fn(flats.reshape(-1)))
    return _mesh_words_call(mesh, fn, flats)


def _words_regions(flats, builder, mesh):
    """(B, W) batch -> per-candidate streams, each (B, half); per shard under a
    mesh (region construction is per-block pure -- no halo at all)."""
    if mesh is None:
        B = flats.shape[0]
        return tuple(s.reshape(B, -1) for s in builder(flats.reshape(-1)))
    return _mesh_words_call(mesh, builder, flats)


def _packed_scores(rows3, valid_lens, offsets, interp: bool = False):
    """(B, C, L/4) u32 candidate rows (stacked) -> (B, C) scores via the packed
    scorer."""
    from ..estimate.pallas_ltu import coverage_scores_pallas

    B, C, _ = rows3.shape
    flat = rows3.reshape(B * C, -1)
    valid = jnp.repeat(valid_lens.astype(jnp.int32), C)
    return coverage_scores_pallas(flat, valid, offsets,
                                  interpret=interp).reshape(B, C)


def _packed_scores_shardmap(mesh, rows3, valid_lens, offsets, interp: bool):
    """Packed-u32 entry for :func:`_scores_flat_shardmap` (one scorer, both
    element widths)."""
    return _scores_flat_shardmap(mesh, rows3, valid_lens, offsets, interp)


def _packed_scores_dispatch(rows3, valid_lens, offsets, mesh, interp: bool):
    if mesh is None:
        return _packed_scores(rows3, valid_lens, offsets, interp)
    return _packed_scores_shardmap(mesh, rows3, valid_lens, offsets, interp)


def _pick_and_decorrelate(colors, candidates, variant_col, scores):
    best = jnp.argmin(scores).astype(jnp.int32)
    variants = jnp.asarray([c[variant_col] for c in candidates], jnp.int32)
    c0, c1 = lanes.split_u32(colors)
    d0 = ycocg.decorrelate(c0, variants[best])
    d1 = ycocg.decorrelate(c1, variants[best])
    return d0, d1, best


@partial(jax.jit, static_argnames=("candidates", "offsets", "allow_pallas"))
def bc1_auto_step_single(flat, valid_len=None,
                         candidates: Tuple[Tuple[int, bool], ...] = _BC1_CANDIDATES,
                         offsets: Tuple[int, ...] = DEFAULT_OFFSETS,
                         allow_pallas: bool = True):
    """Flat uint32[2N] word image -> (c0, c1, indices, best).

    Full-buffer searches (``valid_len is None``) on TPU build every candidate's
    region as u32 word streams in one Mosaic pass and score them packed (the
    byte-lane XLA construction lowers to ~3.3 GB/s-payload; the kernel pair runs
    ~3x faster end to end). Ragged ``valid_len`` keeps the byte path: split
    regions compact c1 to the valid prefix at byte granularity."""
    n = flat.shape[0] // 2
    full = valid_len is None
    if full:
        valid_len = jnp.int32(4 * n)
    use_words = full and _words_gate(4 * n, 2 * n, offsets, allow_pallas)
    interp = _interp()
    if use_words:
        from ..ops.pallas.planes import deinterleave_words_tpu

        colors, indices = deinterleave_words_tpu(flat.astype(jnp.uint32), 2,
                                                 interpret=interp)
    else:
        colors, indices = lanes.deinterleave(flat.astype(jnp.uint32), 2)
    n_valid = valid_len // 4
    if use_words:
        from ..estimate.pallas_ltu import coverage_scores_pallas
        from ..ops.pallas.regions import bc1_region_streams_tpu

        streams = bc1_region_streams_tpu(flat, candidates, interpret=interp)
        rows, _ = _rows_from_streams(streams, candidates)
        scores = coverage_scores_pallas(jnp.stack(rows), valid_len, offsets,
                                        interpret=interp)
    else:
        dec = _decorrelated_pairs(colors, [v for v, _ in candidates])
        regions = jnp.stack([_colour_region_row(dec[v], split, n_valid)
                             for v, split in candidates])
        scores = _scores(regions, valid_len, offsets, allow_pallas)
    d0, d1, best = _pick_and_decorrelate(colors, candidates, 0, scores)
    return d0, d1, indices, best


@partial(jax.jit, static_argnames=("candidates", "offsets", "allow_pallas"))
def bc2_auto_step_single(flat, valid_len=None,
                         candidates: Tuple[Tuple[int, bool], ...] = _BC2_CANDIDATES,
                         offsets: Tuple[int, ...] = DEFAULT_OFFSETS,
                         allow_pallas: bool = True):
    """Flat uint32[4N] word image -> (alpha_lo, alpha_hi, c0, c1, indices, best).

    ``valid_len`` counts colour-region bytes (4 per block).
    """
    n = flat.shape[0] // 4
    full = valid_len is None
    if full:
        valid_len = jnp.int32(4 * n)
    use_words = full and _words_gate(4 * n, 4 * n, offsets, allow_pallas)
    interp = _interp()
    if use_words:
        from ..ops.pallas.planes import deinterleave_words_tpu

        a_lo, a_hi, colors, idx = deinterleave_words_tpu(
            flat.astype(jnp.uint32), 4, interpret=interp)
    else:
        a_lo, a_hi, colors, idx = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    n_valid = valid_len // 4
    if use_words:
        from ..estimate.pallas_ltu import coverage_scores_pallas
        from ..ops.pallas.regions import bc2_region_streams_tpu

        streams = bc2_region_streams_tpu(flat, candidates, interpret=interp)
        rows, _ = _rows_from_streams(streams, candidates)
        scores = coverage_scores_pallas(jnp.stack(rows), valid_len, offsets,
                                        interpret=interp)
    else:
        dec = _decorrelated_pairs(colors, [v for v, _ in candidates])
        regions = jnp.stack([_colour_region_row(dec[v], split, n_valid)
                             for v, split in candidates])
        scores = _scores(regions, valid_len, offsets, allow_pallas)
    d0, d1, best = _pick_and_decorrelate(colors, candidates, 0, scores)
    return a_lo, a_hi, d0, d1, idx, best


@partial(jax.jit, static_argnames=("candidates", "offsets", "allow_pallas"))
def bc3_auto_step_single(flat, valid_len=None,
                         candidates: Tuple[Tuple[int, bool, bool], ...] = _BC3_CANDIDATES,
                         offsets: Tuple[int, ...] = DEFAULT_OFFSETS,
                         allow_pallas: bool = True):
    """Flat uint32[4N] word image -> (ep, h1, h2, h3, c0, c1, cidx, best).

    Alpha endpoints (``ep``) and the three alpha-index u16 lanes come back unpacked;
    the host packs whichever of the 8 layout families won. ``valid_len`` counts
    colour-region bytes (4 per block); the alpha region is valid_len // 2.
    """
    n = flat.shape[0] // 4
    full = valid_len is None
    if full:
        valid_len = jnp.int32(4 * n)
    # score only DISTINCT region rows (identical rows score identically): the 8
    # fast candidates share 2 alpha layouts and 4 colour layouts, so the scorer
    # sees 6 rows instead of 16
    alpha_keys = tuple(dict.fromkeys(sa for _, sa, _ in candidates))
    colour_keys = tuple(dict.fromkeys((v, sc) for v, _, sc in candidates))
    use_words = full and _words_gate(2 * n, 4 * n, offsets, allow_pallas) \
        and _words_gate(4 * n, 4 * n, offsets, allow_pallas)
    interp = _interp()
    if use_words:
        from ..ops.pallas.planes import deinterleave_words_tpu

        w0, w1, colors, cidx = deinterleave_words_tpu(
            flat.astype(jnp.uint32), 4, interpret=interp)
    else:
        w0, w1, colors, cidx = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    ep, h1 = lanes.split_u32(w0)
    h2, h3 = lanes.split_u32(w1)
    n_valid = valid_len // 4
    if use_words:
        from ..estimate.pallas_ltu import coverage_scores_pallas
        from ..ops.pallas.regions import bc3_region_streams_tpu

        streams = bc3_region_streams_tpu(flat, alpha_keys, colour_keys,
                                         interpret=interp)
        a_rows, si = [], 0
        for sa in alpha_keys:
            if sa:
                a_rows.append(jnp.concatenate([streams[si], streams[si + 1]]))
                si += 2
            else:
                a_rows.append(streams[si])
                si += 1
        c_rows, _ = _rows_from_streams(streams[si:], colour_keys)
        a_scores = coverage_scores_pallas(jnp.stack(a_rows), valid_len // 2,
                                          offsets, interpret=interp)
        c_scores = coverage_scores_pallas(jnp.stack(c_rows), valid_len, offsets,
                                          interpret=interp)
    else:
        dec = _decorrelated_pairs(colors, [v for v, _ in colour_keys])
        alpha_interleaved = lanes.u16_to_byte_lanes(ep).astype(jnp.uint8)
        alpha_split = _compact_pair((ep & 0xFF).astype(jnp.uint8),
                                    (ep >> 8).astype(jnp.uint8), n_valid)
        a_scores = _scores(
            jnp.stack([alpha_split if sa else alpha_interleaved
                       for sa in alpha_keys]),
            valid_len // 2, offsets, allow_pallas)
        c_scores = _scores(
            jnp.stack([_colour_region_row(dec[v], sc, n_valid)
                       for v, sc in colour_keys]),
            valid_len, offsets, allow_pallas)
    a_ix = {k: i for i, k in enumerate(alpha_keys)}
    c_ix = {k: i for i, k in enumerate(colour_keys)}
    scores = jnp.stack([a_scores[a_ix[sa]] + c_scores[c_ix[(v, sc)]]
                        for v, sa, sc in candidates])
    d0, d1, best = _pick_and_decorrelate(colors, candidates, 0, scores)
    return ep, h1, h2, h3, d0, d1, cidx, best


# --- explicit batched steps ----------------------------------------------------------
# The corpus pipeline's throughput-critical scoring runs through the Mosaic coverage
# kernel by flattening the (batch, candidates) axes into the kernel's row grid with
# per-row valid lengths -- the vmap-of-single formulation could not (Mosaic kernels
# do not vmap). Under a GSPMD mesh a pallas_call is opaque to the partitioner, so
# the kernel runs per shard inside shard_map: each device scores its L-chunk with
# an explicit SPAN-byte halo fetched over the blocks axis (one small ppermute each
# way) and partial counts are psum-reduced -- bit-identical to the XLA twin.

def _scores_flat_shardmap(mesh, regions3, valid_lens, offsets, interpret: bool):
    """(B, C, L) regions -> (B, C) scores via the per-shard Mosaic coverage
    kernel: each shard scores its chunk with a SPAN-byte halo fetched over the
    blocks axis (one small ppermute each way) and partial weighted counts are
    psum-reduced -- bit-identical to the single-device scorer. ``regions3`` may
    be uint8 byte lanes or uint32 packed words (SPAN/4-word halos)."""
    from jax import shard_map

    from ..estimate.ltu import WEIGHT_SCALE
    from ..estimate.pallas_ltu import SPAN, coverage_counts_windowed

    epb = 4 if regions3.dtype == jnp.uint32 else 1  # bytes per element
    HW = SPAN // epb
    nb = mesh.shape["blocks"]
    regions3 = jax.lax.with_sharding_constraint(
        regions3, NamedSharding(mesh, P("files", None, "blocks")))

    def local(regions, valid):
        Bl, C, Lc = regions.shape
        s = jax.lax.axis_index("blocks")
        flat = regions.reshape(Bl * C, Lc)
        fwd = [(i, (i + 1) % nb) for i in range(nb)]
        bwd = [(i, (i - 1) % nb) for i in range(nb)]
        prev = jax.lax.ppermute(flat[:, -HW:], "blocks", fwd)
        nxt = jax.lax.ppermute(flat[:, :HW], "blocks", bwd)
        prev = jnp.where(s == 0, jnp.zeros_like(prev), prev)  # stream head halo
        win = jnp.concatenate([prev, flat, nxt], axis=1)
        valid_rows = jnp.repeat(valid.astype(jnp.int32), C)
        counts = coverage_counts_windowed(win, valid_rows, s * (epb * Lc) - SPAN,
                                          offsets, interpret=interpret)
        return jax.lax.psum(counts, "blocks").reshape(Bl, C)

    counts = shard_map(local, mesh=mesh,
                       in_specs=(P("files", None, "blocks"), P("files")),
                       out_specs=P("files", None),
                       check_vma=False)(regions3, valid_lens)
    # scorer v4 prefix-entropy term: computed on the GLOBAL rows outside the
    # shard_map (the 64 KiB prefix lives on the first blocks-shard; GSPMD
    # inserts the gather), identical to the single-device wrapper's term.
    from ..estimate.ltu import _entropy_terms_jax

    B, C = regions3.shape[0], regions3.shape[1]
    ent = _entropy_terms_jax(
        regions3.reshape(B * C, -1),
        jnp.repeat(valid_lens.astype(jnp.int32), C)).reshape(B, C)
    return (WEIGHT_SCALE * valid_lens.astype(jnp.float32)[:, None] - counts
            + ent.astype(jnp.float32))


def _scores_flat(regions3, valid_lens, offsets, allow_pallas: bool, mesh=None):
    """(B, C, L) uint8 regions + (B,) valid -> (B, C) scores."""
    import jax as _jax

    B, C, L = regions3.shape
    from ..estimate.pallas_ltu import SPAN

    if mesh is not None and max(offsets) <= SPAN:
        nb, nf = mesh.shape["blocks"], mesh.shape["files"]
        chunk = L // nb
        if L % nb == 0 and chunk % SPAN == 0 and chunk >= SPAN and B % nf == 0:
            interpret = _jax.default_backend() != "tpu"
            return _scores_flat_shardmap(mesh, regions3, valid_lens, offsets,
                                         interpret)
    if allow_pallas and mesh is None and _jax.default_backend() == "tpu":
        from ..estimate.pallas_ltu import coverage_scores_pallas

        if L % SPAN == 0 and max(offsets) <= SPAN:
            flat = regions3.reshape(B * C, L)
            valid = jnp.repeat(valid_lens.astype(jnp.int32), C)
            return coverage_scores_pallas(flat, valid, offsets).reshape(B, C)
    return jax.vmap(lambda r, v: _coverage_scores(r, v, offsets))(regions3, valid_lens)


def _colour_rows_batched(flats, valid_lens, candidates, offsets,
                         allow_pallas: bool, mesh, full: bool, wpb: int,
                         region_builder):
    """Shared BC1/BC2 batched row construction: (aux deinterleave streams,
    per-candidate colour rows, use_words). The words path runs the Mosaic
    deinterleave + region kernels (per shard under a mesh); the byte path builds
    uint8 regions with the XLA twins. Used by BOTH the device-argmin steps and
    the host-scored (zstd) region steps so the two cannot diverge."""
    B, W = flats.shape
    region_bytes = {2: 2 * W, 4: W}[wpb]  # colour region bytes per file
    use_words = _batched_words_gate(region_bytes, B, W, wpb, offsets,
                                    allow_pallas, mesh)
    interp = _interp()
    if use_words:
        aux = _words_deinterleave(flats, wpb, mesh, interp)
        streams = _words_regions(
            flats, lambda f: region_builder(f, candidates, interpret=interp),
            mesh)
        rows, _ = _batched_rows_from_streams(streams, candidates,
                                             valid_lens // 2, full)
        rows3 = jnp.stack(rows, axis=1)
    else:
        aux = jax.vmap(
            lambda f: lanes.deinterleave(f.astype(jnp.uint32), wpb))(flats)
        colors = aux[0] if wpb == 2 else aux[2]

        def regions_fn(flat_colors, vl):
            dec = _decorrelated_pairs(flat_colors, [v for v, _ in candidates])
            return jnp.stack([_colour_region_row(dec[v], split, vl // 4)
                              for v, split in candidates])

        rows3 = jax.vmap(regions_fn)(colors, valid_lens)
    return aux, rows3, use_words, interp


def _rows3_scores(rows3, valid_lens, offsets, allow_pallas, mesh, use_words,
                  interp):
    if use_words:
        return _packed_scores_dispatch(rows3, valid_lens, offsets, mesh, interp)
    return _scores_flat(rows3, valid_lens, offsets, allow_pallas, mesh)


def _bc1_batched_impl(flats, valid_lens, candidates, offsets, allow_pallas: bool,
                      mesh=None, full: bool = False):
    from ..ops.pallas.regions import bc1_region_streams_tpu

    (colors, indices), rows3, use_words, interp = _colour_rows_batched(
        flats, valid_lens, candidates, offsets, allow_pallas, mesh, full, 2,
        bc1_region_streams_tpu)
    scores = _rows3_scores(rows3, valid_lens, offsets, allow_pallas, mesh,
                           use_words, interp)
    d0, d1, best = jax.vmap(
        lambda col, sc: _pick_and_decorrelate(col, candidates, 0, sc))(colors, scores)
    return d0, d1, indices, best


def _bc2_batched_impl(flats, valid_lens, candidates, offsets, allow_pallas: bool,
                      mesh=None, full: bool = False):
    from ..ops.pallas.regions import bc2_region_streams_tpu

    (a_lo, a_hi, colors, idx), rows3, use_words, interp = _colour_rows_batched(
        flats, valid_lens, candidates, offsets, allow_pallas, mesh, full, 4,
        bc2_region_streams_tpu)
    scores = _rows3_scores(rows3, valid_lens, offsets, allow_pallas, mesh,
                           use_words, interp)
    d0, d1, best = jax.vmap(
        lambda col, sc: _pick_and_decorrelate(col, candidates, 0, sc))(colors, scores)
    return a_lo, a_hi, d0, d1, idx, best


def _bc3_batched_impl(flats, valid_lens, candidates, offsets, allow_pallas: bool,
                      mesh=None, full: bool = False):
    B, W4 = flats.shape
    # distinct rows only: the 8 fast candidates share 2 alpha + 4 colour layouts
    alpha_keys = tuple(dict.fromkeys(sa for _, sa, _ in candidates))
    colour_keys = tuple(dict.fromkeys((v, sc) for v, _, sc in candidates))
    use_words = (_batched_words_gate(W4, B, W4, 4, offsets, allow_pallas, mesh)
                 and _batched_words_gate(W4 // 2, B, W4, 4, offsets,
                                         allow_pallas, mesh))
    interp = _interp()
    if use_words:
        w0, w1, colors, cidx = _words_deinterleave(flats, 4, mesh, interp)
    else:
        w0, w1, colors, cidx = jax.vmap(
            lambda f: lanes.deinterleave(f.astype(jnp.uint32), 4))(flats)
    ep, h1 = lanes.split_u32(w0)
    h2, h3 = lanes.split_u32(w1)
    if use_words:
        from ..ops.pallas.regions import bc3_region_streams_tpu

        streams = _words_regions(
            flats, lambda f: bc3_region_streams_tpu(f, alpha_keys, colour_keys,
                                                    interpret=interp), mesh)
        a_rows, si = [], 0
        for sa in alpha_keys:
            if sa:
                if full:
                    a_rows.append(jnp.concatenate(
                        [streams[si], streams[si + 1]], axis=1))
                else:
                    a_rows.append(jax.vmap(_concat_words_at)(
                        streams[si], streams[si + 1], valid_lens // 4))
                si += 2
            else:
                a_rows.append(streams[si])
                si += 1
        c_rows, _ = _batched_rows_from_streams(streams[si:], colour_keys,
                                               valid_lens // 2, full)
        a_scores = _packed_scores_dispatch(jnp.stack(a_rows, axis=1),
                                           valid_lens // 2, offsets, mesh,
                                           interp)
        c_scores = _packed_scores_dispatch(jnp.stack(c_rows, axis=1),
                                           valid_lens, offsets, mesh, interp)
    else:
        def regions_fn(flat_colors, flat_ep, vl):
            n_valid = vl // 4
            dec = _decorrelated_pairs(flat_colors, [v for v, _ in colour_keys])
            alpha_interleaved = lanes.u16_to_byte_lanes(flat_ep).astype(jnp.uint8)
            alpha_split = _compact_pair((flat_ep & 0xFF).astype(jnp.uint8),
                                        (flat_ep >> 8).astype(jnp.uint8), n_valid)
            alpha_rows = jnp.stack([alpha_split if sa else alpha_interleaved
                                    for sa in alpha_keys])
            colour_rows = jnp.stack([_colour_region_row(dec[v], sc, n_valid)
                                     for v, sc in colour_keys])
            return alpha_rows, colour_rows

        alpha_rows, colour_rows = jax.vmap(regions_fn)(colors, ep, valid_lens)
        a_scores = _scores_flat(alpha_rows, valid_lens // 2, offsets,
                                allow_pallas, mesh)
        c_scores = _scores_flat(colour_rows, valid_lens, offsets, allow_pallas,
                                mesh)
    a_ix = {k: i for i, k in enumerate(alpha_keys)}
    c_ix = {k: i for i, k in enumerate(colour_keys)}
    scores = jnp.stack([a_scores[:, a_ix[sa]] + c_scores[:, c_ix[(v, sc)]]
                        for v, sa, sc in candidates], axis=1)
    d0, d1, best = jax.vmap(
        lambda col, sc: _pick_and_decorrelate(col, candidates, 0, sc))(colors, scores)
    return ep, h1, h2, h3, d0, d1, cidx, best


def _ep_region_rows(ep, n_valid, candidates):
    """BC4/BC5 endpoint-region rows per candidate: split -> [lo stream][hi stream]
    (compacted), else interleaved u16 bytes. ``ep`` is an int32 u16 lane array."""
    interleaved = lanes.u16_to_byte_lanes(ep).astype(jnp.uint8)
    split_row = _compact_pair((ep & 0xFF).astype(jnp.uint8),
                              ((ep >> 8) & 0xFF).astype(jnp.uint8), n_valid)
    return jnp.stack([split_row if sp else interleaved for (sp,) in candidates])


def _bc4_batched_impl(flats, valid_lens, candidates, offsets, allow_pallas: bool,
                      mesh=None, full: bool = False):
    """BC4 estimation region = the endpoint stream (2 B/block; the 6 B/block index
    section is never itself transformed -- ``oracle/bc4.py`` layout)."""
    def regions_fn(flat, vl):
        w0, w1 = lanes.deinterleave(flat.astype(jnp.uint32), 2)
        ep, h1 = lanes.split_u32(w0)
        h2, h3 = lanes.split_u32(w1)
        return _ep_region_rows(ep, vl // 4, candidates), ep, h1, h2, h3

    rows, ep, h1, h2, h3 = jax.vmap(regions_fn)(flats, valid_lens)
    scores = _scores_flat(rows, valid_lens // 2, offsets, allow_pallas, mesh)
    best = jnp.argmin(scores, axis=1).astype(jnp.int32)
    return ep, h1, h2, h3, best


def _bc5_batched_impl(flats, valid_lens, candidates, offsets, allow_pallas: bool,
                      mesh=None, full: bool = False):
    """BC5 = two BC4 channels; the R and G endpoint regions are scored separately
    and summed (the host auto concatenates them -- rank-equivalent for the
    coverage estimator)."""
    def regions_fn(flat, vl):
        rw0, rw1, gw0, gw1 = lanes.deinterleave(flat.astype(jnp.uint32), 4)
        r_ep, rh1 = lanes.split_u32(rw0)
        rh2, rh3 = lanes.split_u32(rw1)
        g_ep, gh1 = lanes.split_u32(gw0)
        gh2, gh3 = lanes.split_u32(gw1)
        n_valid = vl // 4
        return (_ep_region_rows(r_ep, n_valid, candidates),
                _ep_region_rows(g_ep, n_valid, candidates),
                r_ep, g_ep, rh1, rh2, rh3, gh1, gh2, gh3)

    (r_rows, g_rows, r_ep, g_ep, rh1, rh2, rh3, gh1, gh2, gh3) = jax.vmap(
        regions_fn)(flats, valid_lens)
    scores = (_scores_flat(r_rows, valid_lens // 2, offsets, allow_pallas, mesh)
              + _scores_flat(g_rows, valid_lens // 2, offsets, allow_pallas, mesh))
    best = jnp.argmin(scores, axis=1).astype(jnp.int32)
    return r_ep, g_ep, rh1, rh2, rh3, gh1, gh2, gh3, best


@partial(jax.jit, static_argnames=("candidates", "offsets", "allow_pallas"))
def bc4_auto_step_single(flat, valid_len=None,
                         candidates: Tuple[Tuple[bool], ...] = _BC4_CANDIDATES,
                         offsets: Tuple[int, ...] = DEFAULT_OFFSETS,
                         allow_pallas: bool = True):
    """Flat uint32[2N] word image -> (ep, h1, h2, h3, best)."""
    n = flat.shape[0] // 2
    if valid_len is None:
        valid_len = jnp.int32(4 * n)
    out = _bc4_batched_impl(flat[None], jnp.asarray(valid_len)[None], candidates,
                            offsets, allow_pallas)
    return tuple(o[0] for o in out)


@partial(jax.jit, static_argnames=("candidates", "offsets", "allow_pallas"))
def bc5_auto_step_single(flat, valid_len=None,
                         candidates: Tuple[Tuple[bool], ...] = _BC5_CANDIDATES,
                         offsets: Tuple[int, ...] = DEFAULT_OFFSETS,
                         allow_pallas: bool = True):
    """Flat uint32[4N] word image -> (r_ep, g_ep, R/G index lanes..., best)."""
    n = flat.shape[0] // 4
    if valid_len is None:
        valid_len = jnp.int32(4 * n)
    out = _bc5_batched_impl(flat[None], jnp.asarray(valid_len)[None], candidates,
                            offsets, allow_pallas)
    return tuple(o[0] for o in out)


# --- host-scored batched steps (zstd presets) ----------------------------------------
# The zstd estimator lives on the host (libzstd), so these steps return every
# candidate's estimation-region row plus the aux lane streams instead of running
# the argmin on device: the CLI scores the rows with the native pthread batch
# estimator (``dlt_zstd_estimate_batch``) overlapped with the next batch's device
# work, then serializes the winner DIRECTLY from its region row (a candidate's
# region bytes ARE its on-disk colour/alpha section -- ``ops/pallas/regions.py``).

def _bc1_batched_regions_impl(flats, valid_lens, candidates, allow_pallas: bool):
    from ..ops.pallas.regions import bc1_region_streams_tpu

    (_, indices), rows3, _, _ = _colour_rows_batched(
        flats, valid_lens, candidates, DEFAULT_OFFSETS, allow_pallas, None,
        False, 2, bc1_region_streams_tpu)
    return indices, rows3


def _bc2_batched_regions_impl(flats, valid_lens, candidates, allow_pallas: bool):
    from ..ops.pallas.regions import bc2_region_streams_tpu

    (a_lo, a_hi, _, idx), rows3, _, _ = _colour_rows_batched(
        flats, valid_lens, candidates, DEFAULT_OFFSETS, allow_pallas, None,
        False, 4, bc2_region_streams_tpu)
    return a_lo, a_hi, idx, rows3


def _bc3_batched_regions_impl(flats, valid_lens, candidates, allow_pallas: bool):
    B, W4 = flats.shape
    alpha_keys = tuple(dict.fromkeys(sa for _, sa, _ in candidates))
    colour_keys = tuple(dict.fromkeys((v, sc) for v, _, sc in candidates))
    use_words = (_batched_words_gate(W4, B, W4, 4, DEFAULT_OFFSETS,
                                     allow_pallas, None)
                 and _batched_words_gate(W4 // 2, B, W4, 4, DEFAULT_OFFSETS,
                                         allow_pallas, None))
    interp = _interp()
    if use_words:
        from ..ops.pallas.regions import bc3_region_streams_tpu

        w0, w1, _, cidx = _words_deinterleave(flats, 4, None, interp)
        _, h1 = lanes.split_u32(w0)
        h2, h3 = lanes.split_u32(w1)
        streams = _words_regions(
            flats, lambda f: bc3_region_streams_tpu(f, alpha_keys, colour_keys,
                                                    interpret=interp), None)
        a_rows, si = [], 0
        for sa in alpha_keys:
            if sa:
                a_rows.append(jax.vmap(_concat_words_at)(
                    streams[si], streams[si + 1], valid_lens // 4))
                si += 2
            else:
                a_rows.append(streams[si])
                si += 1
        c_rows, _ = _batched_rows_from_streams(streams[si:], colour_keys,
                                               valid_lens // 2)
        a_rows3 = jnp.stack(a_rows, axis=1)
        c_rows3 = jnp.stack(c_rows, axis=1)
    else:
        w0, w1, colors, cidx = jax.vmap(
            lambda f: lanes.deinterleave(f.astype(jnp.uint32), 4))(flats)
        ep, h1 = lanes.split_u32(w0)
        h2, h3 = lanes.split_u32(w1)

        def regions_fn(flat_colors, flat_ep, vl):
            n_valid = vl // 4
            dec = _decorrelated_pairs(flat_colors, [v for v, _ in colour_keys])
            alpha_interleaved = lanes.u16_to_byte_lanes(flat_ep).astype(jnp.uint8)
            alpha_split = _compact_pair((flat_ep & 0xFF).astype(jnp.uint8),
                                        (flat_ep >> 8).astype(jnp.uint8), n_valid)
            alpha_rows = jnp.stack([alpha_split if sa else alpha_interleaved
                                    for sa in alpha_keys])
            colour_rows = jnp.stack([_colour_region_row(dec[v], sc, n_valid)
                                     for v, sc in colour_keys])
            return alpha_rows, colour_rows

        a_rows3, c_rows3 = jax.vmap(regions_fn)(colors, ep, valid_lens)
    return h1, h2, h3, cidx, a_rows3, c_rows3


def _bc4_batched_regions_impl(flats, valid_lens, candidates, allow_pallas: bool):
    """BC4 host-scored regions: the endpoint stream per candidate (the index
    section is never transformed)."""
    def fn(flat, vl):
        w0, w1 = lanes.deinterleave(flat.astype(jnp.uint32), 2)
        ep, h1 = lanes.split_u32(w0)
        h2, h3 = lanes.split_u32(w1)
        return _ep_region_rows(ep, vl // 4, candidates), h1, h2, h3

    rows3, h1, h2, h3 = jax.vmap(fn)(flats, valid_lens)
    return h1, h2, h3, rows3


def _bc5_batched_regions_impl(flats, valid_lens, candidates, allow_pallas: bool):
    """BC5 host-scored regions: R and G endpoint rows (host sums the scores)."""
    def fn(flat, vl):
        rw0, rw1, gw0, gw1 = lanes.deinterleave(flat.astype(jnp.uint32), 4)
        r_ep, rh1 = lanes.split_u32(rw0)
        rh2, rh3 = lanes.split_u32(rw1)
        g_ep, gh1 = lanes.split_u32(gw0)
        gh2, gh3 = lanes.split_u32(gw1)
        n_valid = vl // 4
        return (_ep_region_rows(r_ep, n_valid, candidates),
                _ep_region_rows(g_ep, n_valid, candidates),
                rh1, rh2, rh3, gh1, gh2, gh3)

    r_rows, g_rows, rh1, rh2, rh3, gh1, gh2, gh3 = jax.vmap(fn)(flats, valid_lens)
    return rh1, rh2, rh3, gh1, gh2, gh3, r_rows, g_rows


_BATCHED_REGIONS_IMPLS = {"bc1": _bc1_batched_regions_impl,
                          "bc2": _bc2_batched_regions_impl,
                          "bc3": _bc3_batched_regions_impl,
                          "bc4": _bc4_batched_regions_impl,
                          "bc5": _bc5_batched_regions_impl}


def auto_step_batched_regions(fmt: str, candidates, mesh: Mesh = None):
    """Batched step for host-scored (zstd) searches: returns aux lane streams +
    per-candidate region rows, no device argmin. With a mesh the batch is
    GSPMD-partitioned ``P("files", "blocks")`` (region building is per-block
    lane math, so XLA shards it without collectives; only the host download
    gathers)."""
    impl = _BATCHED_REGIONS_IMPLS[fmt]

    def step(flats, valid_lens):
        return impl(flats, valid_lens, candidates, allow_pallas=True)

    if mesh is None:
        return jax.jit(step)
    return jax.jit(step, in_shardings=(NamedSharding(mesh, P("files", "blocks")),
                                       NamedSharding(mesh, P("files"))))


_BATCHED_IMPLS = {"bc1": _bc1_batched_impl, "bc2": _bc2_batched_impl,
                  "bc3": _bc3_batched_impl, "bc4": _bc4_batched_impl,
                  "bc5": _bc5_batched_impl}


def auto_step_batched(fmt: str, candidates, offsets=DEFAULT_OFFSETS,
                      full: bool = False):
    """Single-device batched step (no mesh): Mosaic scoring when shapes allow.

    ``full`` (static): caller guarantees valid_lens == the padded buffer size for
    every file, skipping the ragged-compaction machinery."""
    impl = _BATCHED_IMPLS[fmt]

    @jax.jit
    def step(flats, valid_lens):
        return impl(flats, valid_lens, candidates, offsets, allow_pallas=True,
                    full=full)

    return step


def _batched(mesh: Mesh, fmt: str, n_outputs: int, candidates, offsets,
             full: bool = False):
    files_blocks = NamedSharding(mesh, P("files", "blocks"))
    files_sh = NamedSharding(mesh, P("files"))
    impl = _BATCHED_IMPLS[fmt]

    def step(flat, valid_len):
        return impl(flat, valid_len, candidates, offsets, allow_pallas=True,
                    mesh=mesh, full=full)

    out_sh = (files_blocks,) * (n_outputs - 1) + (files_sh,)
    return jax.jit(step, in_shardings=(files_blocks, files_sh), out_shardings=out_sh)


def bc1_auto_step(mesh: Mesh, candidates=_BC1_CANDIDATES, offsets=DEFAULT_OFFSETS,
                  full: bool = False):
    """Batched+sharded BC1 step: (B, 2N) words -> 3 stream arrays + best (B,)."""
    return _batched(mesh, "bc1", 4, candidates, offsets, full=full)


def bc2_auto_step(mesh: Mesh, candidates=_BC2_CANDIDATES, offsets=DEFAULT_OFFSETS,
                  full: bool = False):
    """Batched+sharded BC2 step: (B, 4N) words -> 5 stream arrays + best (B,)."""
    return _batched(mesh, "bc2", 6, candidates, offsets, full=full)


def bc3_auto_step(mesh: Mesh, candidates=_BC3_CANDIDATES, offsets=DEFAULT_OFFSETS,
                  full: bool = False):
    """Batched+sharded BC3 step: (B, 4N) words -> 7 stream arrays + best (B,)."""
    return _batched(mesh, "bc3", 8, candidates, offsets, full=full)


def bc4_auto_step(mesh: Mesh, candidates=_BC4_CANDIDATES, offsets=DEFAULT_OFFSETS,
                  full: bool = False):
    """Batched+sharded BC4 step: (B, 2N) words -> 4 stream arrays + best (B,)."""
    return _batched(mesh, "bc4", 5, candidates, offsets, full=full)


def bc5_auto_step(mesh: Mesh, candidates=_BC5_CANDIDATES, offsets=DEFAULT_OFFSETS,
                  full: bool = False):
    """Batched+sharded BC5 step: (B, 4N) words -> 8 stream arrays + best (B,)."""
    return _batched(mesh, "bc5", 9, candidates, offsets, full=full)


# --- BC7 / BC6H mode-aware sharded steps --------------------------------------------------

@partial(jax.jit, static_argnames=("fmt",))
def modesort_step_single(flat, valid_len=None, fmt: str = "bc7"):
    """uint32[4*Np] flat block words -> ((16, Np) byte planes, packed mode stream).

    The chunk-local sort (4096-block chunks; ``ops/bc7.py``) makes the blocks axis
    embarrassingly shardable: each chunk sorts entirely within its shard, so the
    only cross-device traffic is the (tiny) mode-stream gather."""
    from ..ops.bc7 import _transform_xla

    if valid_len is None:
        valid_len = jnp.uint32(flat.shape[0] // 4)
    return _transform_xla.__wrapped__(flat, valid_len, True, True, fmt)


def modesort_transform_step(mesh: Mesh, fmt: str = "bc7"):
    """Batched+sharded BC7/BC6H step: (B, 4*Np) flat words -> (B, 16, Np) planes +
    (B, Np/2) mode streams. Np must be a multiple of 4096 x blocks-axis size."""
    files_sh = NamedSharding(mesh, P("files"))

    def step(flat, valid_len):
        return jax.vmap(partial(modesort_step_single.__wrapped__, fmt=fmt))(
            flat, valid_len)

    return jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, P("files", "blocks")), files_sh),
        out_shardings=(NamedSharding(mesh, P("files", None, "blocks")),
                       NamedSharding(mesh, P("files", "blocks"))))


# --- sharded untransform step (the load path, dp over files) -------------------------

def untransform_step(mesh: Mesh, fmt: str, settings):
    """Batched+sharded untransform step: per-stream (B, L_s) word arrays ->
    (B, W) flat word images, files data-parallel on the mesh.

    The load direction is a pure per-block inverse shuffle -- zero cross-shard
    traffic -- so the files axis is the scaling axis (the dp form of the
    reference's rayon-parallel restore loop, ``commands/untransform/mod.rs``).
    Settings come from each file's embedded header and are STATIC; one step
    serves every file that shares them (the grouping
    ``parallel.pipeline.UntransformBatchProcessor`` already performs).
    Runs the XLA kernel form (vmapped per file); the single-device Mosaic path
    stays with the batch processor's stacked flat call."""
    from ..ops import bc1 as ops_bc1, bc2 as ops_bc2, bc3 as ops_bc3, \
        bc45 as ops_bc45, hostwrap

    v = int(getattr(settings, "decorrelation_mode", 0))
    impl = {
        "bc1": lambda st: ops_bc1._untransform_xla.__wrapped__(
            st, v, settings.split_colour_endpoints),
        "bc2": lambda st: ops_bc2._untransform_xla.__wrapped__(
            st, v, settings.split_colour_endpoints),
        "bc3": lambda st: ops_bc3._untransform_xla.__wrapped__(
            st, v, settings.split_alpha_endpoints,
            settings.split_colour_endpoints),
        "bc4": lambda st: ops_bc45._bc4_untransform_xla.__wrapped__(
            st, settings.split_endpoints),
        "bc5": lambda st: ops_bc45._bc5_untransform_xla.__wrapped__(
            st, settings.split_endpoints),
    }[fmt]
    spec = {"bc1": hostwrap.bc1_stream_spec, "bc2": hostwrap.bc2_stream_spec,
            "bc3": hostwrap.bc3_stream_spec,
            "bc4": lambda s: ops_bc45._bc4_spec(s.split_endpoints),
            "bc5": lambda s: ops_bc45._bc5_spec(s.split_endpoints)}[fmt](
        settings)
    files = NamedSharding(mesh, P("files", None))

    def step(*streams):
        return jax.vmap(lambda *st: impl(tuple(st)))(*streams)

    return jax.jit(step, in_shardings=(files,) * len(spec),
                   out_shardings=files)
