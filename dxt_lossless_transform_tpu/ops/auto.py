"""Batched auto-search for the best transform settings.

The reference brute-forces candidates *sequentially*, transforming the full buffer per
candidate and estimating the compressible regions
(``bc1/src/transform/transform_auto.rs:200-270``, ``bc3 .. :230-300``). On TPU we do it
the data-parallel way: one jitted call materializes the estimation regions of ALL
candidates as a stacked ``(C, L)`` uint8 array (shared decorrelation work is CSE'd by
XLA), the estimator scores every candidate in a single device call, and only the
argmin winner is transformed for real.

Estimation regions follow the reference exactly:
- BC1: the colors half only (first len/2 bytes) -- indices have ~7.0 bits/byte entropy
  and no LZ matches (``transform_auto.rs:248-256``).
- BC2: the 4-byte color endpoints only (at len/2, size len/4) (``bc2 ..:252-254``).
- BC3: alpha endpoints (2B/block) + color endpoints (4B/block), estimated separately
  and summed (``bc3 ..:253-280``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import AutoTransformError
from ..estimate.base import SizeEstimation
from ..settings import (
    BC1_COMPREHENSIVE_CANDIDATES, BC1_FAST_CANDIDATES,
    BC2_COMPREHENSIVE_CANDIDATES, BC2_FAST_CANDIDATES,
    BC3_COMPREHENSIVE_CANDIDATES, BC3_FAST_CANDIDATES,
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
)
from . import bc1 as ops_bc1, bc2 as ops_bc2, bc3 as ops_bc3, lanes, ycocg


def _decorrelated_pairs(colors_u32, variants):
    """Decorrelate the (c0, c1) lanes once per distinct variant (static unroll)."""
    c0, c1 = lanes.split_u32(colors_u32)
    fns = {0: lambda x: x, 1: ycocg.decorrelate_var1,
           2: ycocg.decorrelate_var2, 3: ycocg.decorrelate_var3}
    return {v: (fns[v](c0), fns[v](c1)) for v in sorted(set(variants))}


def _compact_pair(first, second, first_valid):
    """[first | second] with ``second`` moved up to the end of first's valid prefix,
    so zero padding never sits between the two streams (scores would otherwise count
    padding as matches and misrank split layouts)."""
    row = jnp.concatenate([first, second])
    return jax.lax.dynamic_update_slice(row, second, (first_valid,))


def _colour_region_row(d, split: bool, n_blocks):
    """One candidate's colour-region byte lanes (uint8):
    split -> [c0 stream][c1 stream] (compacted to the valid prefix), else
    interleaved c0c1 pairs."""
    if split:
        row = _compact_pair(lanes.u16_to_byte_lanes(d[0]).astype(jnp.uint8),
                            lanes.u16_to_byte_lanes(d[1]).astype(jnp.uint8),
                            2 * n_blocks)
    else:
        row = lanes.u32_to_byte_lanes(lanes.join_u32(d[0], d[1])).astype(jnp.uint8)
    return row


@partial(jax.jit, static_argnames=("candidates",))
def bc1_candidate_regions(flat, n_blocks, candidates: Tuple[Tuple[int, bool], ...]):
    """Flat uint32[2N] word image -> uint8[C, 4N] byte-lane colour regions."""
    colors, _ = lanes.deinterleave(flat.astype(jnp.uint32), 2)
    dec = _decorrelated_pairs(colors, [v for v, _ in candidates])
    return jnp.stack([_colour_region_row(dec[v], split, n_blocks)
                      for v, split in candidates])


@partial(jax.jit, static_argnames=("candidates",))
def bc2_candidate_regions(flat, n_blocks, candidates: Tuple[Tuple[int, bool], ...]):
    """Flat uint32[4N] word image -> uint8[C, 4N] colour regions (alpha/indices excluded)."""
    _, _, colors, _ = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    dec = _decorrelated_pairs(colors, [v for v, _ in candidates])
    return jnp.stack([_colour_region_row(dec[v], split, n_blocks)
                      for v, split in candidates])


@partial(jax.jit, static_argnames=("candidates",))
def bc3_candidate_regions(flat, n_blocks, candidates: Tuple[Tuple[int, bool, bool], ...]):
    """Flat uint32[4N] word image -> (uint8[C, 2N] alpha, uint8[C, 4N] colour) regions."""
    w0, _, colors, _ = lanes.deinterleave(flat.astype(jnp.uint32), 4)
    ep, _ = lanes.split_u32(w0)
    dec = _decorrelated_pairs(colors, [v for v, _, _ in candidates])
    alpha_interleaved = lanes.u16_to_byte_lanes(ep).astype(jnp.uint8)
    alpha_split = _compact_pair((ep & 0xFF).astype(jnp.uint8),
                                (ep >> 8).astype(jnp.uint8), n_blocks)
    alpha_rows = jnp.stack([alpha_split if sa else alpha_interleaved
                            for _, sa, _ in candidates])
    colour_rows = jnp.stack([_colour_region_row(dec[v], sc, n_blocks)
                             for v, _, sc in candidates])
    return alpha_rows, colour_rows


# --- host-side drivers ----------------------------------------------------------------

def _host_colour_regions(colors_u32: np.ndarray, candidates) -> list:
    """Per-candidate colour-region bytes computed with the numpy oracle."""
    from ..oracle.bc1 import decorrelate_colors

    dec_cache = {}
    rows = []
    for variant, split in candidates:
        if variant not in dec_cache:
            dec_cache[variant] = decorrelate_colors(colors_u32, variant).astype(np.int64)
        d = dec_cache[variant]
        if split:
            rows.append((d & 0xFFFF).astype("<u2").tobytes()
                        + ((d >> 16) & 0xFFFF).astype("<u2").tobytes())
        else:
            rows.append(d.astype("<u4").tobytes())
    return rows


def _score_regions(estimator: SizeEstimation, regions, valid_len: int) -> np.ndarray:
    """Score a (C, Lpad) byte-lane device array with ``valid_len`` real bytes per row."""
    scores = estimator.estimate_batch_device(regions, valid_len)
    if scores is not None:
        return np.asarray(jax.device_get(scores))
    rows = np.asarray(jax.device_get(regions[:, :valid_len])).astype(np.uint8)
    return np.asarray(estimator.estimate_batch(list(rows)), np.float64)


def _score_host(fmt: str, estimator: SizeEstimation, rows) -> np.ndarray:
    """Host-side batch scoring with estimator failures wrapped in the per-format
    auto-transform error (``DetermineBestTransformError`` analog,
    ``bc1/src/transform/transform_auto.rs:15-23``)."""
    try:
        return np.asarray(estimator.estimate_batch(rows), np.float64)
    except AutoTransformError:
        raise
    except Exception as exc:
        raise AutoTransformError(fmt, f"estimator raised {exc!r}") from exc



def _native_zstd_auto(fmt: str, data, estimator, use_all: bool):
    """Full C++ auto-search for the built-in estimators (region-only builders +
    the task-parallel pthread loop); returns (transformed, settings) or None if
    the native runtime is unavailable. zstd estimates use the same libzstd
    engine as ``ZstdEstimation`` and the LTU scorer is the exact-integer C++
    twin of the host scorer, so scores -- and argmin ties -- agree exactly with
    the host paths. (Device LTU scores agree bit-for-bit only while the weighted
    total stays below 2**24, i.e. regions up to ~700 KiB; above that the f32
    device accumulation can drift a few ULPs from the integer twins, so device
    picks may differ from host picks on near-ties -- see estimate/ltu.py.)"""
    from ..estimate.ltu import DEFAULT_OFFSETS, LtuEstimation
    from ..estimate.zstd import ZstdEstimation
    from .. import runtime

    if not runtime.available():
        return None
    if isinstance(estimator, ZstdEstimation):
        kind, level = "zstd", estimator.level
    elif (isinstance(estimator, LtuEstimation)
          and estimator.offsets == DEFAULT_OFFSETS
          and len(data) < lanes.device_threshold_bytes()):
        # small payloads only: above the threshold the batched device search
        # (regions + packed scorer in one jit) beats the host C++ loop
        kind, level = "ltu", 0
    else:
        return None
    from ..settings import YCoCgVariant

    est = runtime.builtin_estimator(kind, level)
    if fmt == "bc1":
        out, v, sp = runtime.bc1_transform_auto(data, est, use_all)
        return out, Bc1TransformSettings(YCoCgVariant(v), sp)
    if fmt == "bc2":
        out, v, sp = runtime.bc2_transform_auto(data, est, use_all)
        return out, Bc2TransformSettings(YCoCgVariant(v), sp)
    out, v, sa, sc = runtime.bc3_transform_auto(data, est, use_all)
    return out, Bc3TransformSettings(YCoCgVariant(v), sa, sc)


def transform_bc1_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc1TransformSettings]] = None):
    """Pick the best BC1 settings by batched search; returns (transformed, settings)."""
    cand = tuple(candidates if candidates is not None else
                 (BC1_COMPREHENSIVE_CANDIDATES if use_all_decorrelation_modes
                  else BC1_FAST_CANDIDATES))
    n = len(data) // ops_bc1.BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    if candidates is None:
        native = _native_zstd_auto("bc1", data, estimator,
                                   use_all_decorrelation_modes)
        if native is not None:
            return native
    key = tuple((int(c.decorrelation_mode), c.split_colour_endpoints) for c in cand)
    if (len(data) < lanes.device_threshold_bytes()
            or not getattr(estimator, "on_device", False)):
        # Host path: small buffers (dispatch latency) AND host-only estimators
        # (zstd) -- the numpy byte-shuffle is far cheaper than shipping (C, L)
        # region stacks back through the device->host relay.
        colors = np.frombuffer(data, "<u4").reshape(-1, 2)[:, 0].copy()
        scores = _score_host("BC1", estimator, _host_colour_regions(colors, key))
    else:
        flat = lanes.pad_rows(np.frombuffer(data, "<u4"), 2 * lanes.bucket_size(n))
        regions = bc1_candidate_regions(flat, jnp.int32(n), key)
        scores = _score_regions(estimator, regions, 4 * n)
    best = cand[int(np.argmin(scores))]
    return ops_bc1.transform(data, best), best


def transform_bc2_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc2TransformSettings]] = None):
    cand = tuple(candidates if candidates is not None else
                 (BC2_COMPREHENSIVE_CANDIDATES if use_all_decorrelation_modes
                  else BC2_FAST_CANDIDATES))
    n = len(data) // ops_bc2.BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    if candidates is None:
        native = _native_zstd_auto("bc2", data, estimator,
                                   use_all_decorrelation_modes)
        if native is not None:
            return native
    key = tuple((int(c.decorrelation_mode), c.split_colour_endpoints) for c in cand)
    if (len(data) < lanes.device_threshold_bytes()
            or not getattr(estimator, "on_device", False)):
        colors = np.frombuffer(data, "<u4").reshape(-1, 4)[:, 2].copy()
        scores = _score_host("BC2", estimator, _host_colour_regions(colors, key))
    else:
        flat = lanes.pad_rows(np.frombuffer(data, "<u4"), 4 * lanes.bucket_size(n))
        regions = bc2_candidate_regions(flat, jnp.int32(n), key)
        scores = _score_regions(estimator, regions, 4 * n)
    best = cand[int(np.argmin(scores))]
    return ops_bc2.transform(data, best), best


def transform_bc3_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc3TransformSettings]] = None):
    cand = tuple(candidates if candidates is not None else
                 (BC3_COMPREHENSIVE_CANDIDATES if use_all_decorrelation_modes
                  else BC3_FAST_CANDIDATES))
    n = len(data) // ops_bc3.BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    if candidates is None:
        native = _native_zstd_auto("bc3", data, estimator,
                                   use_all_decorrelation_modes)
        if native is not None:
            return native
    key = tuple((int(c.decorrelation_mode), c.split_alpha_endpoints,
                 c.split_colour_endpoints) for c in cand)
    if (len(data) < lanes.device_threshold_bytes()
            or not getattr(estimator, "on_device", False)):
        words = np.frombuffer(data, "<u4").reshape(-1, 4)
        colors = words[:, 2].copy()
        ep = (words[:, 0] & 0xFFFF).astype(np.int64)
        colour_rows = _host_colour_regions(colors, [(v, sc) for v, _, sc in key])
        a_interleaved = ep.astype("<u2").tobytes()
        a_split = ((ep & 0xFF).astype(np.uint8).tobytes()
                   + (ep >> 8).astype(np.uint8).tobytes())
        alpha_rows = [a_split if sa else a_interleaved for _, sa, _ in key]
        scores = (_score_host("BC3", estimator, alpha_rows)
                  + _score_host("BC3", estimator, colour_rows))
    else:
        flat = lanes.pad_rows(np.frombuffer(data, "<u4"), 4 * lanes.bucket_size(n))
        alpha_rows, colour_rows = bc3_candidate_regions(flat, jnp.int32(n), key)
        scores = (_score_regions(estimator, alpha_rows, 2 * n)
                  + _score_regions(estimator, colour_rows, 4 * n))
    best = cand[int(np.argmin(scores))]
    return ops_bc3.transform(data, best), best
