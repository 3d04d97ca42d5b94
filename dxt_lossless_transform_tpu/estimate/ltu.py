"""Device LZ-match size estimation (the fast on-TPU estimator).

Role analog: the reference's LTU estimator
(``dxt-lossless-transform-ltu/src/lib.rs:48-117``) scores a candidate as
``len - estimate_num_lz_matches_fast(data)``; only relative ordering matters.
Its hash-table match counter is inherently sequential, so this build replaces it with
a TPU-native *sampled-offset match model*: a position is covered if its 4-byte gram
equals the gram at any of a fixed ladder of backward offsets (dense short range +
geometric long range, mirroring where matches actually occur in block-stream data --
stream element strides and texture row strides), and a covered position is worth
more the NEARER its closest match (zstd spends fewer bits on small offsets). With
W(k) = 24 - round(log2 k) the score is

    score = 24 * valid_len - sum_i W( min k : gram4[i] == gram4[i - k] )

which is pure shift/compare/select/reduce -- one fused, HBM-bandwidth-bound XLA
kernel, batched over all candidate layouts at once (the whole auto-search estimates
in a single device call, vs the reference's per-candidate sequential loop).
Round-4 retune (scripts/ltu_tune.py, realistic corpus v2): 3-gram unweighted ->
4-gram offset-weighted lifts BC1 exact-pick 46 -> 57% and selection efficiency
99.03 -> 99.70% (BC3: 45 -> 55%, 99.15 -> 99.76%). Round-5 (scorer v4): a
sampled-prefix entropy term (see below) lifts exact-pick to zstd-1 parity --
BC1 59%, BC3 58% (beating zstd-1's 57.3 there) at 99.72/99.79% efficiency.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .base import SizeEstimation

# Backward offsets probed for gram matches: dense short range catches
# RLE/neighbor-block redundancy; the geometric tail catches periodic structure
# (stream strides, mip rows). Densified in round 2 after a corpus rank-quality
# study (scripts/ltu_tune.py): selection efficiency 99.3 -> 99.6% (BC1) /
# 99.5 -> 99.7% (BC3), exact-pick 33 -> 47% / 32 -> 53%.
DEFAULT_OFFSETS = (1, 2, 3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 256,
                   512, 1024, 2048, 4096)

WEIGHT_SCALE = 24

# --- scorer v4 (round 5): sampled-prefix entropy term ---------------------------------
# Coverage alone under-penalizes high-entropy regions with few matches; adding
# 3/8 x (bits of a byte-entropy model over the region's FIRST 64 KiB) lifts
# exact-pick to zstd-1 parity (BC1 57->59%, BC3 55->58%; ltu_tune_v6.log +
# scripts/ltu_tune.py round-5 sweep) at ~zero cost -- the prefix histogram is
# one pass over at most 64 KiB per candidate. Kept exact-integer so all four
# twins (numpy / XLA / Mosaic wrapper / C++) agree bit-for-bit:
#
#     N    = min(valid_len, 65536)
#     G[n] = floor(n * log2(n) + 0.5)           (G[0] = G[1] = 0)
#     ENT  = 3 * max(0, G[N] - sum_c G[hist_c]) // 8
#     score_v4 = WEIGHT_SCALE * valid_len - weighted_coverage + ENT
#
# (G[N] - sum G[hist_c] ~= 8 * entropy_bytes by the log-sum identity; the
# per-term rounding must match everywhere, hence the shared table.)
from .gtable import ENTROPY_CAP, G_TABLE, _make_g_table  # noqa: F401 -- the
# table lives in a jax-free module so the native loader can install it without
# importing this (jax-importing) module; re-exported here for the twins/tests


def _entropy_term_np(data: np.ndarray, valid_len: int = None) -> int:
    """Exact-integer sampled-prefix entropy term (numpy twin)."""
    n = int(data.size if valid_len is None else valid_len)
    n = min(n, ENTROPY_CAP)
    if n <= 1:
        return 0
    hist = np.bincount(np.ascontiguousarray(data[:n], np.uint8), minlength=256)
    raw = int(G_TABLE[n]) - int(G_TABLE[hist].sum())
    return (3 * max(0, raw)) // 8


def _entropy_terms_jax(regions, valid_len):
    """(C, L) uint8 lanes OR (C, L/4) uint32 word rows -> (C,) int32 terms.

    ``valid_len``: scalar or (C,) byte counts. Padded bytes beyond valid are
    masked out of the histogram (they would otherwise skew bin 0)."""
    n_rows = regions.shape[0]
    if regions.dtype == jnp.uint32:
        cap_w = min(regions.shape[1], ENTROPY_CAP // 4)
        w = regions[:, :cap_w].astype(jnp.uint32)
        b = jnp.stack([(w >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)
                       for k in range(4)], axis=-1).reshape(n_rows, 4 * cap_w)
        b = b.astype(jnp.int32)
    else:
        b = regions[:, :min(regions.shape[1], ENTROPY_CAP)].astype(jnp.int32)
    length = b.shape[1]
    valid_rows = jnp.broadcast_to(
        jnp.asarray(valid_len, jnp.int32).reshape(-1), (n_rows,))
    sample_n = jnp.minimum(valid_rows, min(length, ENTROPY_CAP))
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_rows, length), 1)
    mask = pos < sample_n[:, None]
    # histogram as 256 fused equality-reductions: scatter-add lowers terribly
    # on TPU (measured -12% on the whole auto step); the reduction form costs
    # ~1%. Reshaped so the bin axis broadcasts once per 256-wide block.
    masked = jnp.where(mask, b, jnp.int32(-1))
    bins = jnp.arange(256, dtype=jnp.int32)
    hist = (masked[:, :, None] == bins[None, None, :]).astype(jnp.int32) \
        .sum(axis=1) if length <= 4096 else jnp.stack(
        [(masked == c).astype(jnp.int32).sum(axis=1) for c in range(256)],
        axis=1)
    g = jnp.asarray(G_TABLE, jnp.int32)
    raw = jnp.take(g, sample_n) - jnp.take(g, hist).sum(axis=1)
    return (3 * jnp.maximum(raw, 0)) // 8


def offset_weight(k: int) -> int:
    """Integer match-value of a position whose nearest match is at offset k:
    WEIGHT_SCALE - round(log2 k) (nearer matches cost zstd fewer offset bits)."""
    import math

    return WEIGHT_SCALE - (int(round(math.log2(k))) if k > 1 else 0)


@partial(jax.jit, static_argnames=("offsets",))
def _coverage_scores(regions, valid_len, offsets: tuple):
    """(C, L) uint8 candidate regions -> (C,) float32 scores (lower = compresses better).

    A position i is covered if its 4-byte gram equals the gram at i-k for some
    offset k; its value is offset_weight(smallest such k). Gram equality is the
    AND of four shifted byte equalities and the weight select keeps a 1-byte lane
    (HBM bandwidth matters: this loop dominates the on-device auto-search).
    Offsets are processed descending so the nearest match's weight lands last.
    """
    b = regions.astype(jnp.uint8)
    length = b.shape[1]
    w = jnp.zeros((b.shape[0], length - 3), dtype=jnp.uint8)
    for k in sorted(offsets, reverse=True):
        if k + 3 >= length:
            continue
        eq = b[:, k:] == b[:, :-k]                  # byte equality at backshift k
        gram_eq = eq[:, :-3] & eq[:, 1:-2] & eq[:, 2:-1] & eq[:, 3:]
        w = jnp.concatenate(
            [w[:, :k],
             jnp.where(gram_eq, jnp.uint8(offset_weight(k)), w[:, k:])], axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, length - 3), 1)
    valid = pos < (valid_len - 3)
    # float32 accumulation: the weighted total reaches 24 * len (3.2e9 for a
    # 128 MiB region), which wraps int32; f32 cannot wrap and stays exact below
    # 2**24 (where the twin-equality tests live). Above that the score is within
    # a few hundred of the exact integer -- ranking-benign (near-ties are coin
    # flips for any approximate estimator; see CORPUS_REPORT.md).
    matches = jnp.sum(jnp.where(valid, w, jnp.uint8(0)).astype(jnp.float32),
                      axis=1)
    ent = _entropy_terms_jax(regions, valid_len)  # scorer v4 prefix term
    return (WEIGHT_SCALE * jnp.asarray(valid_len, jnp.float32) - matches
            + ent.astype(jnp.float32))


def _coverage_score_np(data: np.ndarray, offsets) -> int:
    """Numpy twin of :func:`_coverage_scores` for one buffer (host fast path)."""
    b = np.ascontiguousarray(data, np.int64)
    if b.size < 4:
        return WEIGHT_SCALE * int(b.size) + _entropy_term_np(data)
    g = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    w = np.zeros(g.size, np.int32)
    for k in sorted(offsets, reverse=True):
        if k >= g.size:
            continue
        eq = g[k:] == g[:-k]
        w[k:][eq] = offset_weight(k)
    return WEIGHT_SCALE * int(b.size) - int(w.sum()) + _entropy_term_np(data)


# Buffers below this size are scored on the host (device dispatch latency through the
# relay exceeds the numpy cost by orders of magnitude there).
HOST_THRESHOLD = 4 << 20


class LtuEstimation(SizeEstimation):
    """Fast estimator: length minus sampled-offset gram-match coverage.

    Batched device scoring for the on-device auto-search; exact-integer numpy
    scoring for small host-side buffers. Device and host scores are bit-identical
    while the weighted total stays below 2**24 (regions up to ~700 KiB -- every
    host-threshold buffer qualifies); above that the device's f32 accumulation
    may drift a few ULPs from the integer twins (ranking-benign; see
    ``_coverage_scores``).
    """

    on_device = True

    def __init__(self, offsets=DEFAULT_OFFSETS):
        self.offsets = tuple(offsets)

    def max_compressed_size(self, len_bytes: int) -> int:
        return 0  # no compression buffer needed (ltu/lib.rs:92-95)

    def estimate(self, data) -> int:
        if isinstance(data, (bytes, bytearray, memoryview)):
            data = np.frombuffer(data, np.uint8)
        if data.size == 0:
            return 0
        if data.size < HOST_THRESHOLD:
            if self.offsets == DEFAULT_OFFSETS:
                from .. import runtime

                if runtime.available():
                    return runtime.ltu_estimate(data.tobytes())
            return _coverage_score_np(data, self.offsets)
        arr = jnp.asarray(np.ascontiguousarray(data, np.uint8))[None, :]
        score = _coverage_scores(arr, jnp.int32(arr.shape[1]), self.offsets)
        return int(score[0])

    def estimate_batch_device(self, regions, valid_len):
        if jax.default_backend() == "tpu":
            from .pallas_ltu import SPAN, coverage_scores_pallas

            if regions.shape[1] % SPAN == 0 and max(self.offsets) <= SPAN:
                return coverage_scores_pallas(
                    regions, jnp.asarray(valid_len, jnp.int32), self.offsets)
        return _coverage_scores(regions, jnp.asarray(valid_len, jnp.int32), self.offsets)
