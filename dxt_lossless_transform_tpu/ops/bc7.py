"""BC7 device ops: mode-aware transform plus the reference's MSB bit utilities.

The reference's BC7 crate is a stub carrying only MSB-order bit helpers ("BC7 has
unusual non-standard bit order"; ``bc7/src/lib.rs:8-13``, ``util/msb_extract_bits.rs:33``,
``util/msb_insert_bits.rs``) while the file-format layer reserves header space for a
real transform (``embed/mod.rs:97-103``). This build implements one -- see
:mod:`..oracle.bc7` for the byte-exact layout definition.

TPU mapping: a row-gather by the sort permutation runs at ~1.2 GB/s on v5e (random
16-byte HBM accesses), so the chunk-local mode-sort (see ``oracle/bc7.py``:
independent 4096-block chunks) is instead expressed as a BATCHED ``lax.sort`` over
(unique key, 4 u32 payload columns) reshaped to (chunks, 4096) rows -- ~12.6 GB/s
vs ~3.1 GB/s for one global sort:

- transform key: ``mode * C + within-chunk index`` packed in uint16 (stable order
  without is_stable, since keys are unique within each chunk);
- untransform: re-derive the permutation with a single-operand u16 key sort (the
  within-chunk index lives in the key's low bits, so ``sorted_key & (C-1)`` IS the
  permutation), then un-sort the payload with those indices as keys -- the payload
  moves through ``lax.sort`` exactly once per direction.

Mode extraction (ctz of byte 0 via popcount), nibble packing of the mode stream
(u8-pair bitcast to u16, no strided access), and the byte-plane relayout are all
u32-lane VPU work; the payload is never touched arithmetically, which keeps the
transform bit-exact by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oracle import bc7 as _oracle
from .. import runtime as _native
from ..errors import validation_error
from ..settings import Bc7TransformSettings
from . import lanes

BLOCK_SIZE = 16


# --- MSB-order bit utilities (reference parity) ----------------------------------------

def extract_msb_bits(byte, start: int, end: int):
    """Extract bits [start..end] of a byte in MSB (left-to-right) order, right-aligned.

    Position 0 is the leftmost/most-significant bit (``util/msb_extract_bits.rs:33``).
    Works elementwise on numpy or jax integer arrays.
    """
    assert 0 <= start <= end <= 7
    num_bits = end - start + 1
    mask = (1 << num_bits) - 1
    return (byte >> (7 - end)) & mask


def insert_msb_bits(byte, value, start: int, end: int):
    """Insert ``value`` into bits [start..end] (MSB order) of ``byte``."""
    assert 0 <= start <= end <= 7
    num_bits = end - start + 1
    shift = 7 - end
    mask = ((1 << num_bits) - 1) << shift
    return (byte & ~mask & 0xFF) | ((value << shift) & mask)


# --- device kernels ---------------------------------------------------------------------

def _modes_from_words(w0, n_valid, fmt: str = "bc7"):
    """Per-block mode id (u32 lanes) from byte 0; padding rows (index >= n_valid) get
    the format's pad sentinel (> any real id) so they stay last in the sort.

    bc7: ctz of byte 0 (0..7), 8 for the invalid byte0 == 0; pad = 8 (stable order
    keeps real invalid blocks ahead of padding). bc6h: the grouping-id map from
    :mod:`..oracle.bc6h` (0..14); pad = 15."""
    b0 = w0 & jnp.uint32(0xFF)
    if fmt == "bc7":
        lsb = b0 & (jnp.uint32(0) - b0)
        mode = jnp.minimum(jax.lax.population_count(lsb - jnp.uint32(1)),
                           jnp.uint32(8))
        pad = jnp.uint32(8)
    else:
        assert fmt == "bc6h"
        two = b0 & jnp.uint32(3)
        v = b0 & jnp.uint32(31)
        id5 = jnp.where(v & 1,
                        jnp.uint32(10) + jnp.minimum(v >> 2, jnp.uint32(4)),
                        jnp.uint32(2) + (v >> 2))
        mode = jnp.where(two < 2, two, id5)
        pad = jnp.uint32(15)
    idx = jnp.arange(w0.shape[0], dtype=jnp.uint32)
    return jnp.where(idx < n_valid, mode, pad)


def _pack_nibbles(modes, n_valid):
    """Packed 4-bit mode stream (low nibble first); entries past n_valid emit 0.

    Strided slicing (``m[0::2]``) is slow on TPU, so adjacent u8 pairs are bitcast
    to one u16 lane instead (little-endian: low index = low byte)."""
    idx = jnp.arange(modes.shape[0], dtype=jnp.uint32)
    m = jnp.where(idx < n_valid, modes, jnp.uint32(0)).astype(jnp.uint8)
    pairs = jax.lax.bitcast_convert_type(m.reshape(-1, 2), jnp.uint16)
    return ((pairs & 0xF) | ((pairs >> 8) << 4)).astype(jnp.uint8)


def _chunk_keys(modes_u32):
    """(chunks, C) uint16 sort keys: mode in the high bits, within-chunk index below.

    mode (4 bits) * C + index (<= 12 bits) fits u16 exactly at the 4096-block chunk
    size; u16 keys sort ~4% faster than u32 and halve the derivation sort's traffic.
    Chunk boundaries coincide with the oracle's: padded sizes are powers of two, so
    they are either < SORT_CHUNK_BLOCKS (one chunk, like the oracle's ragged tail) or
    an exact multiple of it."""
    n_pad = modes_u32.shape[0]
    c = min(_oracle.SORT_CHUNK_BLOCKS, n_pad)
    # key-packing invariants: the inverse permutation masks with ``& (c - 1)``
    # (power-of-two chunks only) and mode_max * c + (c - 1) must not wrap u16
    assert c & (c - 1) == 0, f"chunk size {c} must be a power of two"
    assert 15 * c + (c - 1) <= 0xFFFF, f"u16 keys overflow at chunk size {c}"
    return (modes_u32.reshape(-1, c).astype(jnp.uint16) * jnp.uint16(c)
            + jnp.arange(c, dtype=jnp.uint16)[None, :])


def _packed_stream_bytes(packed, n_valid):
    """Fused-kernel mode words (8 modes/u32) -> the uint8[N/2] nibble stream with
    modes of padding blocks (>= n_valid) zeroed."""
    widx = jnp.arange(packed.shape[0], dtype=jnp.int32)
    keep = jnp.clip(n_valid.astype(jnp.int32) - widx * 8, 0, 8)
    mask = jnp.where(keep >= 8, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << (4 * keep).astype(jnp.uint32))
                     - jnp.uint32(1))
    return jax.lax.bitcast_convert_type(packed & mask, jnp.uint8).reshape(-1)


def _planes_from_cols(cols):
    """uint32[4, N] word columns -> uint8[16, N] byte planes (LE within each word)."""
    return jnp.concatenate(
        [((cols[w] >> (8 * b)) & jnp.uint32(0xFF)).astype(jnp.uint8)[None]
         for w in range(4) for b in range(4)], axis=0)


def _cols_from_planes(planes):
    """Inverse of :func:`_planes_from_cols`."""
    p = planes.astype(jnp.uint32)
    return jnp.stack([p[4 * w] | (p[4 * w + 1] << 8) | (p[4 * w + 2] << 16)
                      | (p[4 * w + 3] << 24) for w in range(4)])


def _blocks_from_cols(cols):
    """uint32[4, N] -> uint8[N, 16] interleaved block bytes."""
    return jax.lax.bitcast_convert_type(cols.T, jnp.uint8).reshape(cols.shape[1], 16)


def _cols_from_blocks(blocks):
    """uint8[N, 16] -> uint32[4, N]."""
    return jax.lax.bitcast_convert_type(blocks.reshape(-1, 4, 4), jnp.uint32).T


@partial(jax.jit, static_argnames=("sort", "planes", "fmt", "use_pallas"))
def _transform_xla(flat, n_valid, sort: bool, planes: bool, fmt: str = "bc7",
                   use_pallas: bool = False):
    """uint32[4*Np] interleaved block words (+ valid count) -> (payload, mode stream).

    Padding blocks sort to the end; callers slice the first n columns/blocks.
    Device arrays stay flat or wide-minor throughout: (Np, 4)-shaped views pad
    their 4-lane minor dim to the 128-lane tile on TPU (8-32x write
    amplification, measured ~27 GB/s vs ~60 for the flat weave kernels).

    With ``use_pallas`` (single device, outside vmap) the planes payload comes
    back as a tuple of 16 plane-word streams (uint32[Np/4] each) straight from
    the Mosaic split kernel; the host serializes each stream like the BC1-BC5
    stream tuples. The blocks payload is the flat uint32[4*Np] word stream."""
    n_pad = flat.shape[0] // 4
    if sort:
        if use_pallas:
            # fused stage: columns + raw sort keys + packed mode stream in one
            # Mosaic pass (saves the separate mode/key/pack reads of column 0)
            from .pallas.planes import split_cols_modes_tpu

            c = _oracle.SORT_CHUNK_BLOCKS  # n_pad % (128*512) == 0 => multiple
            assert c & (c - 1) == 0 and 15 * c + (c - 1) <= 0xFFFF
            cols, rawkeys, packed = split_cols_modes_tpu(flat, fmt, c)
            idx = jnp.arange(n_pad, dtype=jnp.uint32)
            pad = jnp.uint32({"bc7": 8, "bc6h": 15}[fmt])
            key = jnp.where(idx < n_valid, rawkeys,
                            pad * jnp.uint32(c) + (idx & jnp.uint32(c - 1))
                            ).astype(jnp.uint16).reshape(-1, c)
            stream = _packed_stream_bytes(packed, n_valid)
        else:
            cols = tuple(flat.reshape(-1, 4).T)
            modes = _modes_from_words(cols[0], n_valid, fmt)
            stream = _pack_nibbles(modes, n_valid)
            key = _chunk_keys(modes)
        sorted_ = jax.lax.sort(
            (key, *(c_.reshape(key.shape) for c_ in cols)), num_keys=1,
            dimension=1)
        cols = tuple(c_.reshape(-1) for c_ in sorted_[1:])
    else:
        stream = jnp.zeros((n_pad // 2,), jnp.uint8)
        cols = None
    if planes and use_pallas:
        from .pallas.planes import split_planes_flat_tpu, split_planes_tpu

        if sort:
            return split_planes_tpu(cols), stream
        return split_planes_flat_tpu(flat), stream
    if cols is None:
        cols = tuple(flat.reshape(-1, 4).T)
    if planes:
        payload = _planes_from_cols(cols)
    elif sort and use_pallas:
        from .pallas.planes import weave_cols_tpu

        payload = weave_cols_tpu(cols)
    elif sort:
        payload = jnp.stack(cols).T.reshape(-1)
    else:
        payload = flat  # identity block layout
    return payload, stream


@partial(jax.jit, static_argnames=("sort", "planes", "use_pallas"))
def _untransform_xla(payload, modes, n_valid, sort: bool, planes: bool,
                     use_pallas: bool = False):
    """Transformed payload (+ original-order modes) -> uint32[4*Np] original words.

    ``payload``: (16, Np) uint8 planes / flat uint32[4*Np] blocks -- or, with
    ``use_pallas``, a tuple of 16 plane-word streams (uint32[Np/4]).
    ``modes`` must put padding entries at >= n_valid (any value; forced to the max
    id 15 here, which sorts after every real id in both formats)."""
    if planes and use_pallas and not sort:
        from .pallas.planes import merge_planes_flat_tpu

        return merge_planes_flat_tpu(tuple(payload))
    if planes and use_pallas:
        from .pallas.planes import merge_planes_tpu

        cols = tuple(merge_planes_tpu(tuple(payload)))
    elif planes:
        cols = tuple(_cols_from_planes(payload))
    else:
        if not sort:
            return payload  # identity block layout
        if use_pallas:
            from .pallas.planes import split_cols_tpu

            cols = split_cols_tpu(payload)
        else:
            cols = tuple(payload.reshape(-1, 4).T)
    if sort:
        idx = jnp.arange(cols[0].shape[0], dtype=jnp.uint32)
        m = jnp.where(idx < n_valid, modes.astype(jnp.uint32), jnp.uint32(15))
        key = _chunk_keys(m)
        # re-derive the permutation: order[c, p] = within-chunk index of the block at
        # sorted position p of chunk c. The index lives in the key's low bits, so a
        # single-operand sort + mask suffices (~1.5x the (key, iota) pair sort).
        order = (jax.lax.sort(key, dimension=1)
                 & jnp.uint16(key.shape[1] - 1))
        # un-sort each chunk: element p belongs at within-chunk position order[c, p]
        sorted_ = jax.lax.sort(
            (order, *(c.reshape(key.shape) for c in cols)), num_keys=1, dimension=1)
        cols = tuple(c.reshape(-1) for c in sorted_[1:])
    if use_pallas:
        from .pallas.planes import weave_cols_tpu

        return weave_cols_tpu(cols)
    return jnp.stack(cols).T.reshape(-1)


def _planes_pallas_ok(n_padded: int) -> bool:
    """Route plane relayout through the Mosaic kernels only for full-size tiles:
    skinny tiles (transposed lane dim < MAX_ROWS) compile pathologically slowly on
    the remote Mosaic compiler and small payloads gain nothing."""
    from .pallas.planes import W_IN
    from .pallas.shuffle import MAX_ROWS, pallas_available

    return pallas_available() and n_padded % (MAX_ROWS * W_IN) == 0


def transform_device(flat, n_valid, sort: bool, planes: bool, fmt: str = "bc7"):
    """Device entry: uint32[4*Np] little-endian block words, ``n_valid`` real blocks.

    Returns ``(payload, mode_stream)``: a 16-tuple of plane-word streams (Mosaic
    path) / (16, Np) uint8 planes (XLA fallback) / flat uint32[4*Np] block words,
    plus the packed uint8[Np/2] mode stream; callers slice off padding."""
    return _transform_xla(flat, jnp.uint32(n_valid), sort, planes, fmt,
                          use_pallas=_planes_pallas_ok(flat.shape[0] // 4))


def untransform_device(payload, modes, n_valid, sort: bool, planes: bool):
    """Inverse of :func:`transform_device` given the unpacked original-order modes;
    returns the flat uint32[4*Np] original block words.

    ``payload``: what :func:`transform_device` returned -- a tuple of 16
    plane-word streams (Mosaic path), (16, Np) uint8 planes, or flat uint32[4*Np]
    block words."""
    if isinstance(payload, (tuple, list)):
        payload = tuple(payload)
        n_padded = payload[0].shape[0] * 4
        use_pallas = _planes_pallas_ok(n_padded)
        assert use_pallas, "plane-word tuples require the Mosaic path"
    elif planes:
        n_padded = payload.shape[1]
        use_pallas = False
    else:
        n_padded = payload.shape[0] // 4
        use_pallas = _planes_pallas_ok(n_padded)
    return _untransform_xla(payload, modes, jnp.uint32(n_valid), sort, planes,
                            use_pallas=use_pallas)


# --- host wrappers (bytes -> bytes, bit-exact; shared by BC7 and BC6H) ------------------

def _is_identity(settings) -> bool:
    return not settings.sort_by_mode and not settings.split_byte_planes


def _transform_bytes(data, settings, fmt: str, oracle_mod, native_fn) -> bytes:
    if len(data) % BLOCK_SIZE:
        raise validation_error(fmt, len(data), BLOCK_SIZE)
    n = len(data) // BLOCK_SIZE
    if n == 0:
        return b""
    if len(data) < lanes.device_threshold_bytes() or _is_identity(settings):
        if native_fn is not None and _native.available():
            return native_fn(data, settings.sort_by_mode, settings.split_byte_planes)
        return oracle_mod.transform(data, settings)
    flat = np.frombuffer(data, "<u4")
    n_pad = lanes.bucket_size(n)
    out, stream = transform_device(lanes.pad_rows(flat, 4 * n_pad), n,
                                   settings.sort_by_mode,
                                   settings.split_byte_planes, fmt)
    prefix = b""
    if settings.sort_by_mode:
        prefix = np.asarray(stream).tobytes()[:oracle_mod.mode_stream_len(n)]
    if isinstance(out, tuple):  # Mosaic plane-word streams (planes layout)
        return prefix + b"".join(
            np.asarray(p).astype("<u4").tobytes()[:n] for p in out)
    out = np.asarray(out)
    if settings.split_byte_planes:  # (16, Np) uint8 planes (XLA fallback)
        return prefix + np.ascontiguousarray(out[:, :n]).tobytes()
    return prefix + out[:4 * n].astype("<u4").tobytes()  # flat block words


def _untransform_bytes(data, settings, fmt: str, oracle_mod, native_fn) -> bytes:
    if len(data) == 0:
        return b""
    n = oracle_mod.original_len(len(data), settings) // BLOCK_SIZE
    if n * BLOCK_SIZE < lanes.device_threshold_bytes() or _is_identity(settings):
        if native_fn is not None and _native.available():
            return native_fn(data, n * BLOCK_SIZE, settings.sort_by_mode,
                             settings.split_byte_planes)
        return oracle_mod.untransform(data, settings)
    msl = oracle_mod.mode_stream_len(n) if settings.sort_by_mode else 0
    payload = np.frombuffer(data, np.uint8, offset=msl, count=n * BLOCK_SIZE)
    n_pad = lanes.bucket_size(n)
    if settings.sort_by_mode:
        modes = lanes.pad_rows(oracle_mod.unpack_mode_stream(data[:msl], n), n_pad)
    else:
        modes = np.zeros(n_pad, np.uint8)
    if settings.split_byte_planes and _planes_pallas_ok(n_pad):
        # feed the Mosaic merge kernel plane-word streams directly
        by_plane = payload.reshape(BLOCK_SIZE, n)
        pl = tuple(lanes.pad_rows(by_plane[p], n_pad).view("<u4")
                   for p in range(BLOCK_SIZE))
    elif settings.split_byte_planes:
        pl = np.ascontiguousarray(
            lanes.pad_rows(payload.reshape(BLOCK_SIZE, n).T, n_pad).T)
    else:
        padded = np.zeros(BLOCK_SIZE * n_pad, np.uint8)
        padded[:BLOCK_SIZE * n] = payload
        pl = padded.view("<u4")  # flat block words
    out = np.asarray(untransform_device(pl, modes, n, settings.sort_by_mode,
                                        settings.split_byte_planes))
    return out[:4 * n].astype("<u4").tobytes()


def transform(data, settings: Bc7TransformSettings = Bc7TransformSettings()) -> bytes:
    return _transform_bytes(data, settings, "bc7", _oracle,
                            _native.bc7_transform)


def untransform(data, settings: Bc7TransformSettings = Bc7TransformSettings()) -> bytes:
    return _untransform_bytes(data, settings, "bc7", _oracle,
                              _native.bc7_untransform)


# --- auto-search ------------------------------------------------------------------------

def _assemble_stream_row(flat, n_valid, row_len: int, sort: bool, planes: bool,
                         fmt: str, use_pallas: bool):
    """One candidate's full on-disk byte stream as a uint8[row_len] device row.

    Forward-order dynamic updates at block-count offsets: each stream's write
    overwrites the previous stream's padding tail, so the first ``valid_len``
    bytes are exactly the on-disk stream (the row tail past it is scoring-masked).
    """
    payload, stream = _transform_xla.__wrapped__(flat, n_valid, sort, planes, fmt,
                                                 use_pallas)
    row = jnp.zeros((row_len,), jnp.uint8)
    pos = jnp.int32(0)
    if sort:
        row = jax.lax.dynamic_update_slice(row, stream, (pos,))
        pos = ((n_valid.astype(jnp.int32) + 1) // 2)
    if planes:
        for p, plane_words in enumerate(payload):
            plane_bytes = jax.lax.bitcast_convert_type(plane_words,
                                                       jnp.uint8).reshape(-1)
            row = jax.lax.dynamic_update_slice(
                row, plane_bytes, (pos + p * n_valid.astype(jnp.int32),))
    else:
        body = jax.lax.bitcast_convert_type(payload, jnp.uint8).reshape(-1)
        row = jax.lax.dynamic_update_slice(row, body, (pos,))
    valid_len = pos + 16 * n_valid.astype(jnp.int32)
    return row, valid_len


@partial(jax.jit, static_argnames=("candidates", "offsets", "row_len", "fmt",
                                   "use_pallas"))
def _auto_device(flat, n_valid, candidates, offsets, row_len: int, fmt: str,
                 use_pallas: bool):
    """All candidate streams + coverage scores in ONE device call; the host pulls
    only the argmin winner's row (4x less device->host traffic than transforming
    each candidate through the host wrapper)."""
    from ..estimate.ltu import _coverage_scores

    rows, valids = [], []
    for sort, planes in candidates:
        r, v = _assemble_stream_row(flat, n_valid, row_len, sort, planes, fmt,
                                    use_pallas and planes)
        rows.append(r)
        valids.append(v)
    regions = jnp.stack(rows)
    valid_arr = jnp.stack(valids)
    if use_pallas:
        from ..estimate.pallas_ltu import SPAN, coverage_scores_pallas

        if row_len % SPAN == 0 and max(offsets) <= SPAN:
            scores = coverage_scores_pallas(regions, valid_arr, offsets)
        else:
            scores = jax.vmap(lambda r, v: _coverage_scores(r[None], v, offsets)[0])(
                regions, valid_arr)
    else:
        scores = jax.vmap(lambda r, v: _coverage_scores(r[None], v, offsets)[0])(
            regions, valid_arr)
    best = jnp.argmin(scores)
    return regions[best], valid_arr[best], best


@partial(jax.jit, static_argnames=("candidates", "offsets", "row_len", "fmt"))
def auto_step_batched_modesort(flats, n_valids, candidates, offsets,
                               row_len: int, fmt: str):
    """Batched BC7/BC6H auto-search: (B, 4*Np) flat block words + per-file valid
    block counts -> (winner rows (B, row_len) u8, valid byte lengths (B,),
    best (B,)). Candidate streams are assembled with the vmappable XLA path and
    scored flat through the Mosaic coverage kernel when shapes allow -- the
    corpus-pipeline analog of :func:`_auto_device` (one device call per batch
    instead of per file)."""
    from ..estimate.ltu import _coverage_scores

    def single(flat, nv):
        rows, valids = [], []
        for sort, planes in candidates:
            r, v = _assemble_stream_row(flat, nv, row_len, sort, planes, fmt,
                                        False)
            rows.append(r)
            valids.append(v)
        return jnp.stack(rows), jnp.stack(valids)

    rows, valids = jax.vmap(single)(flats, n_valids.astype(jnp.uint32))
    B, C, L = rows.shape
    flat_rows = rows.reshape(B * C, L)
    flat_valids = valids.reshape(B * C)
    use_pk = jax.default_backend() == "tpu"
    if use_pk:
        from ..estimate.pallas_ltu import SPAN, coverage_scores_pallas

        use_pk = L % SPAN == 0 and max(offsets) <= SPAN
    if use_pk:
        scores = coverage_scores_pallas(flat_rows, flat_valids,
                                        offsets).reshape(B, C)
    else:
        scores = jax.vmap(
            lambda r, v: _coverage_scores(r[None], v, offsets)[0])(
                flat_rows, flat_valids).reshape(B, C)
    best = jnp.argmin(scores, axis=1).astype(jnp.int32)
    winner = jnp.take_along_axis(rows, best[:, None, None], axis=1)[:, 0]
    valid = jnp.take_along_axis(valids, best[:, None], axis=1)[:, 0]
    return winner, valid, best


def stream_row_len(n_pad: int) -> int:
    """SPAN-padded device-row length of a full transformed stream: mode-stream
    bytes + 16 B/block (shared by the per-file and batched auto searches)."""
    from ..estimate.pallas_ltu import SPAN

    return -(-(n_pad // 2 + 16 * n_pad) // SPAN) * SPAN


def _auto_device_ok(estimator, n: int) -> bool:
    from ..estimate.ltu import DEFAULT_OFFSETS, LtuEstimation

    return (isinstance(estimator, LtuEstimation)
            and estimator.offsets == DEFAULT_OFFSETS
            and 16 * n >= lanes.device_threshold_bytes()
            and _planes_pallas_ok(lanes.bucket_size(n)))


def ltu_identity_guard(data, out, settings, candidates):
    """Selection policy v5 for the mode-sort formats: a zstd-1 confirmation of
    the LTU winner against the untouched payload.

    The LTU coverage scorer ranks the transform LAYOUTS against each other
    well, but on realistic mode-mixed BC7/BC6H streams it overrates the
    absolute gain of mode sorting -- the corpus study measured the pure-LTU
    pick at -0.70% (BC7) / -1.05% (BC6H) vs zstd-16 on real-encoder
    containers (identity wins 56-59% of files there; the reference's own BC7
    asset gains 0%). Two native zstd-1 calls (winner + payload, batched
    through the pthread driver) flip such picks back to identity, lifting the
    shipped medium-preset result to +0.49% (BC7) / +0.00% (BC6H -- BC6H's
    mode-grouping win only materializes at high zstd levels NO cheap signal
    can see, so the guard degrades to never-lose there; the optimal preset's
    level-6 estimator recovers +1.02%, CORPUS_REPORT.md). Applied only when
    the candidate set contains the identity layout; zstd estimators rank
    identity directly and never need it."""
    return ltu_identity_guard_batch([data], [out], [settings], candidates)[0]


def ltu_identity_guard_batch(datas, outs, settings_list, candidates):
    """Batch form of :func:`ltu_identity_guard`: all (winner, payload) pairs
    needing confirmation go through ONE pthread ``estimate_batch`` call (the
    per-file form delegates here, so batched and per-file picks are identical
    by construction). Returns ``[(shipped bytes, shipped settings), ...]``."""
    ident = next((s for s in candidates
                  if not s.sort_by_mode and not s.split_byte_planes), None)
    results = [(o, s) for o, s in zip(outs, settings_list)]
    if ident is None:
        return results
    need = [i for i, (o, s) in enumerate(results) if s != ident and len(o)]
    if not need:
        return results
    from ..estimate.zstd import ZstdEstimation

    bufs = []
    for i in need:
        bufs += [outs[i], datas[i]]
    sizes = ZstdEstimation(1).estimate_batch(bufs)
    for j, i in enumerate(need):
        if not (sizes[2 * j] < sizes[2 * j + 1]):
            results[i] = (datas[i], ident)
    return results


def _transform_auto(data, estimator, candidates, fmt: str, transform_fn):
    """Shared BC7/BC6H auto-search driver."""
    from ..estimate.ltu import LtuEstimation

    cand = tuple(candidates)
    if len(data) == 0:
        return b"", cand[-1]
    guard = (ltu_identity_guard if isinstance(estimator, LtuEstimation)
             else (lambda d, o, s, c: (o, s)))
    n = len(data) // BLOCK_SIZE
    if _auto_device_ok(estimator, n):
        from ..estimate.ltu import DEFAULT_OFFSETS
        from ..estimate.pallas_ltu import SPAN

        n_pad = lanes.bucket_size(n)
        flat = lanes.pad_rows(np.frombuffer(data, "<u4"), 4 * n_pad)
        row_len = stream_row_len(n_pad)
        key = tuple((s.sort_by_mode, s.split_byte_planes) for s in cand)
        row, valid, best = _auto_device(flat, jnp.uint32(n), key,
                                        DEFAULT_OFFSETS, row_len, fmt, True)
        out, settings = (np.asarray(row).tobytes()[:int(valid)],
                         cand[int(best)])
        return guard(data, out, settings, cand)
    rows = [transform_fn(data, s) for s in cand]
    best = int(np.argmin(estimator.estimate_batch(rows)))
    return guard(data, rows[best], cand[best], cand)


def transform_bc7_auto(data, estimator, use_all_decorrelation_modes: bool = False,
                       candidates=None):
    """Pick the mode-layout whose full transformed stream the estimator ranks smallest.

    Unlike BC1-BC3 there is no cheap "endpoints only" estimation region (the mode-
    dependent field layout spans the whole block), so candidates are scored on their
    complete streams. The identity candidate is always in the set, so the chosen
    layout never loses to "no transform" under the estimator's ordering.

    Large payloads with the (default-offsets) LTU estimator run the whole search on
    device: one upload, all candidate streams + scores computed in one jit, and only
    the winning stream is pulled back.
    """
    from ..settings import BC7_FAST_CANDIDATES

    cand = tuple(candidates) if candidates is not None else BC7_FAST_CANDIDATES
    return _transform_auto(data, estimator, cand, "bc7", transform)
