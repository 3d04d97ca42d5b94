"""Pallas coverage kernel vs the XLA twin (interpret mode on CPU; real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dxt_lossless_transform_tpu.estimate.ltu import DEFAULT_OFFSETS, _coverage_scores


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic kernel requires TPU; CPU runs the XLA twin")
def test_pallas_coverage_bit_identical():
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import (
        SPAN, coverage_scores_pallas,
    )

    rng = np.random.default_rng(3)
    regions = jnp.asarray(rng.integers(0, 8, (3, 2 * SPAN), np.uint8))
    for valid in (2 * SPAN, 2 * SPAN - 999):
        a = np.asarray(_coverage_scores(regions, jnp.int32(valid), DEFAULT_OFFSETS))
        b = np.asarray(coverage_scores_pallas(regions, jnp.int32(valid), DEFAULT_OFFSETS))
        np.testing.assert_array_equal(a, b)


def test_packed_words_scorer_bit_identical_interpret():
    """The u32-packed scorer input form equals the u8 form (interpret mode)."""
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import SPAN, _counts_call

    rng = np.random.default_rng(4)
    nbytes = 2 * SPAN
    rows8 = rng.integers(0, 8, (3, nbytes), np.uint8)  # low entropy -> real matches
    rows32 = np.stack([r.view("<u4") for r in rows8])
    valid = jnp.asarray(np.int32([nbytes, nbytes - 999, nbytes - 3]))
    a = np.asarray(_counts_call(jnp.asarray(rows8), valid, jnp.int32(0),
                                DEFAULT_OFFSETS, 0, nbytes, interpret=True))
    b = np.asarray(_counts_call(jnp.asarray(rows32), valid, jnp.int32(0),
                                DEFAULT_OFFSETS, 0, nbytes, interpret=True))
    assert a.sum() > 0
    np.testing.assert_array_equal(a, b)


def test_region_stream_kernels_match_byte_rows_interpret():
    """Mosaic region builders (u32 streams) carry exactly the byte rows the XLA
    path builds, for BC1/BC2/BC3 candidate sets (interpret mode)."""
    from dxt_lossless_transform_tpu.ops import lanes
    from dxt_lossless_transform_tpu.ops.auto import (
        _colour_region_row, _decorrelated_pairs,
    )
    from dxt_lossless_transform_tpu.ops.pallas.regions import (
        bc1_region_streams_tpu, bc2_region_streams_tpu, bc3_region_streams_tpu,
    )
    from dxt_lossless_transform_tpu.parallel.sharded import (
        _BC1_CANDIDATES, _BC2_CANDIDATES, _BC3_CANDIDATES, _rows_from_streams,
    )

    rng = np.random.default_rng(5)
    n = 4096  # blocks

    def rows_bytes(streams_rows):
        return [np.asarray(r).astype("<u4").view(np.uint8) for r in streams_rows]

    # BC1: colors at word phase 0 of 2
    flat1 = jnp.asarray(rng.integers(0, 2**32, 2 * n, dtype=np.uint32))
    colors, _ = lanes.deinterleave(flat1.astype(jnp.uint32), 2)
    dec = _decorrelated_pairs(colors, [v for v, _ in _BC1_CANDIDATES])
    got, _ = _rows_from_streams(
        bc1_region_streams_tpu(flat1, _BC1_CANDIDATES, interpret=True),
        _BC1_CANDIDATES)
    for row, (v, sp) in zip(rows_bytes(got), _BC1_CANDIDATES):
        want = np.asarray(_colour_region_row(dec[v], sp, jnp.int32(n)))
        np.testing.assert_array_equal(row, want.astype(np.uint8)), (v, sp)

    # BC2: colors at word phase 2 of 4
    flat2 = jnp.asarray(rng.integers(0, 2**32, 4 * n, dtype=np.uint32))
    _, _, colors2, _ = lanes.deinterleave(flat2.astype(jnp.uint32), 4)
    dec2 = _decorrelated_pairs(colors2, [v for v, _ in _BC2_CANDIDATES])
    got2, _ = _rows_from_streams(
        bc2_region_streams_tpu(flat2, _BC2_CANDIDATES, interpret=True),
        _BC2_CANDIDATES)
    for row, (v, sp) in zip(rows_bytes(got2), _BC2_CANDIDATES):
        want = np.asarray(_colour_region_row(dec2[v], sp, jnp.int32(n)))
        np.testing.assert_array_equal(row, want.astype(np.uint8)), (v, sp)

    # BC3: alpha endpoints (lo16 of word 0) + colors (word 2)
    from dxt_lossless_transform_tpu.ops.auto import _compact_pair

    alpha_keys = tuple(dict.fromkeys(sa for _, sa, _ in _BC3_CANDIDATES))
    colour_keys = tuple(dict.fromkeys((v, sc) for v, _, sc in _BC3_CANDIDATES))
    w0, _, colors3, _ = lanes.deinterleave(flat2.astype(jnp.uint32), 4)
    ep, _ = lanes.split_u32(w0)
    dec3 = _decorrelated_pairs(colors3, [v for v, _ in colour_keys])
    streams = bc3_region_streams_tpu(flat2, alpha_keys, colour_keys, interpret=True)
    si = 0
    for sa in alpha_keys:
        if sa:
            row32 = np.concatenate([np.asarray(streams[si]), np.asarray(streams[si + 1])])
            si += 2
            want = np.asarray(_compact_pair((ep & 0xFF).astype(jnp.uint8),
                                            (ep >> 8).astype(jnp.uint8), jnp.int32(n)))
        else:
            row32 = np.asarray(streams[si]); si += 1
            want = np.asarray(lanes.u16_to_byte_lanes(ep).astype(jnp.uint8))
        np.testing.assert_array_equal(row32.astype("<u4").view(np.uint8),
                                      want.astype(np.uint8)), sa
    got3, _ = _rows_from_streams(streams[si:], colour_keys)
    for row, (v, sc) in zip(rows_bytes(got3), colour_keys):
        want = np.asarray(_colour_region_row(dec3[v], sc, jnp.int32(n)))
        np.testing.assert_array_equal(row, want.astype(np.uint8)), (v, sc)


def test_concat_words_at_matches_compact_pair():
    """The word-lane compaction (ragged split regions in the batched fast path)
    is byte-identical to _compact_pair for every byte_pos % 4 alignment."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops.auto import _compact_pair
    from dxt_lossless_transform_tpu.parallel.sharded import _concat_words_at

    rng = np.random.default_rng(6)
    n = 256  # words per stream
    c0 = rng.integers(0, 2**32, n, dtype=np.uint32)
    c1 = rng.integers(0, 2**32, n, dtype=np.uint32)
    for byte_pos in (0, 1, 2, 3, 5, 128, 4 * n - 3, 4 * n):
        got = np.asarray(_concat_words_at(jnp.asarray(c0), jnp.asarray(c1),
                                          jnp.int32(byte_pos)))
        want = np.asarray(_compact_pair(jnp.asarray(c0.view(np.uint8)),
                                        jnp.asarray(c1.view(np.uint8)),
                                        jnp.int32(byte_pos)))
        span = byte_pos + 4 * n  # bytes live in both forms; tails differ by design
        np.testing.assert_array_equal(
            got.astype("<u4").view(np.uint8)[:span], want[:span]), byte_pos


def test_deinterleave_words_kernel_matches_lanes():
    """Mosaic deinterleave (interpret) == lanes.deinterleave for k in {2, 4}."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops import lanes
    from dxt_lossless_transform_tpu.ops.pallas.planes import deinterleave_words_tpu

    rng = np.random.default_rng(7)
    flat = jnp.asarray(rng.integers(0, 2**32, 3 * 2048, dtype=np.uint32))
    for k in (2, 4):
        got = deinterleave_words_tpu(flat, k, interpret=True)
        want = lanes.deinterleave(flat, k)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_xla_scorer_no_int32_wrap_large_region():
    """The weighted score reaches 24*len; a 128 MiB-class region must not wrap
    int32 (regression: ranking silently corrupted above ~89 MiB)."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.estimate.ltu import (
        DEFAULT_OFFSETS, WEIGHT_SCALE, _coverage_scores,
    )

    n = 96 * 1024 * 1024  # 96 MiB of a single byte: fully covered at offset 1
    region = jnp.zeros((1, n), jnp.uint8)
    score = float(_coverage_scores(region, jnp.int32(n), DEFAULT_OFFSETS)[0])
    # nearly everything matches at offset 1 (weight 24): score ~ 0, never huge
    assert 0 <= score < WEIGHT_SCALE * 1e4, score
