"""Corpus batch pipeline: many textures per device step (BC1/BC2/BC3).

The CLI analog of the reference's rayon work-stealing loop
(``commands/transform/mod.rs:166-187``) rebuilt for accelerators: per-file dispatch
latency dominates small-texture processing, so files are *packed* into fixed-shape
batches -- grouped by padded block-count bucket, stacked on a leading batch axis,
auto-searched + transformed in one jitted (optionally mesh-sharded) call, and
emitted in submission order (the ordered-gather contract from BASELINE.json).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import (
    BC1_FAST_CANDIDATES, BC2_FAST_CANDIDATES, BC3_FAST_CANDIDATES,
    Bc4TransformSettings, Bc5TransformSettings,
)
from ..ops import lanes
from . import sharded


def _host_map(fn, indices) -> None:
    """Run ``fn(i)`` per index on a host thread pool (the rayon analog,
    ``commands/transform/mod.rs:166-187``); callees release the GIL in
    native/numpy code. Shared by every sub-threshold host path."""
    workers = min(len(indices), os.cpu_count() or 2)
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(fn, indices))
    else:
        for i in indices:
            fn(i)


@dataclass
class BatchResult:
    """One file's outcome, in submission order."""

    index: int
    transformed: bytes
    settings: object


def _u16s(arr, n) -> bytes:
    return arr[:n].astype("<u2").tobytes()


def _u32s(arr, n) -> bytes:
    return arr[:n].astype("<u4").tobytes()


def _pair_u16(a, b, n) -> bytes:
    out = np.empty((n, 2), "<u2")
    out[:, 0] = a[:n]
    out[:, 1] = b[:n]
    return out.tobytes()


def _serialize_bc1(streams, n, s) -> bytes:
    d0, d1, idx = streams
    colours = (_u16s(d0, n) + _u16s(d1, n)) if s.split_colour_endpoints \
        else _pair_u16(d0, d1, n)
    return colours + _u32s(idx, n)


def _serialize_bc2(streams, n, s) -> bytes:
    a_lo, a_hi, d0, d1, idx = streams
    alpha = np.empty((n, 2), "<u4")
    alpha[:, 0] = a_lo[:n]
    alpha[:, 1] = a_hi[:n]
    colours = (_u16s(d0, n) + _u16s(d1, n)) if s.split_colour_endpoints \
        else _pair_u16(d0, d1, n)
    return alpha.tobytes() + colours + _u32s(idx, n)


def _serialize_bc3(streams, n, s) -> bytes:
    ep, h1, h2, h3, d0, d1, cidx = streams
    if s.split_alpha_endpoints:
        alpha = ((ep[:n] & 0xFF).astype(np.uint8).tobytes()
                 + (ep[:n] >> 8).astype(np.uint8).tobytes())
    else:
        alpha = _u16s(ep, n)
    aidx = np.empty((n, 3), "<u2")
    aidx[:, 0], aidx[:, 1], aidx[:, 2] = h1[:n], h2[:n], h3[:n]
    colours = (_u16s(d0, n) + _u16s(d1, n)) if s.split_colour_endpoints \
        else _pair_u16(d0, d1, n)
    return alpha + aidx.tobytes() + colours + _u32s(cidx, n)


def _idx_u16s(h1, h2, h3, n) -> bytes:
    """Three u16 index lanes -> the interleaved per-block 6-byte index stream."""
    idx = np.empty((n, 3), "<u2")
    idx[:, 0], idx[:, 1], idx[:, 2] = h1[:n], h2[:n], h3[:n]
    return idx.tobytes()


def _ep_bytes(ep, n, split: bool) -> bytes:
    if split:
        return ((ep[:n] & 0xFF).astype(np.uint8).tobytes()
                + ((ep[:n] >> 8) & 0xFF).astype(np.uint8).tobytes())
    return _u16s(ep, n)


def _serialize_bc4(streams, n, s) -> bytes:
    ep, h1, h2, h3 = streams
    return _ep_bytes(ep, n, s.split_endpoints) + _idx_u16s(h1, h2, h3, n)


def _serialize_bc5(streams, n, s) -> bytes:
    r_ep, g_ep, rh1, rh2, rh3, gh1, gh2, gh3 = streams
    return (_ep_bytes(r_ep, n, s.split_endpoints)
            + _ep_bytes(g_ep, n, s.split_endpoints)
            + _idx_u16s(rh1, rh2, rh3, n) + _idx_u16s(gh1, gh2, gh3, n))


_FORMATS = {
    "bc1": dict(block_size=8, words=2, candidates=BC1_FAST_CANDIDATES,
                single=sharded.bc1_auto_step_single, step=sharded.bc1_auto_step,
                serialize=_serialize_bc1,
                key=lambda c: (int(c.decorrelation_mode), c.split_colour_endpoints)),
    "bc2": dict(block_size=16, words=4, candidates=BC2_FAST_CANDIDATES,
                single=sharded.bc2_auto_step_single, step=sharded.bc2_auto_step,
                serialize=_serialize_bc2,
                key=lambda c: (int(c.decorrelation_mode), c.split_colour_endpoints)),
    "bc3": dict(block_size=16, words=4, candidates=BC3_FAST_CANDIDATES,
                single=sharded.bc3_auto_step_single, step=sharded.bc3_auto_step,
                serialize=_serialize_bc3,
                key=lambda c: (int(c.decorrelation_mode), c.split_alpha_endpoints,
                               c.split_colour_endpoints)),
    "bc4": dict(block_size=8, words=2,
                candidates=tuple(Bc4TransformSettings.all_combinations()),
                single=sharded.bc4_auto_step_single, step=sharded.bc4_auto_step,
                serialize=_serialize_bc4,
                key=lambda c: (c.split_endpoints,)),
    "bc5": dict(block_size=16, words=4,
                candidates=tuple(Bc5TransformSettings.all_combinations()),
                single=sharded.bc5_auto_step_single, step=sharded.bc5_auto_step,
                serialize=_serialize_bc5,
                key=lambda c: (c.split_endpoints,)),
}


def _pad_batch_for_tiles(padded_batch: int, words_per_file: int,
                         files_axis: int, blocks_axis: int = 1) -> int:
    """Round the batch up so the flattened word stream fits the Mosaic kernels'
    128-row tile grid (``shuffle.grid_rows_ok``): a total tile-row count above
    128 must divide evenly. Padding rows duplicate the last file -- cheaper than
    falling back to the ~3x-slower XLA byte path on fragment batches.

    Under a mesh the words fast path is gated per-shard
    (``sharded._mesh_words_gate`` checks ``(B//nf) * (W//nb)``), so the padding
    target is the LOCAL shard's row count, scaled back by the files axis."""
    import math

    from ..ops.pallas.shuffle import MAX_ROWS, WIDTH

    if words_per_file % blocks_axis:
        return padded_batch  # mesh gate falls back regardless
    w_local = words_per_file // blocks_axis
    rpf = w_local // WIDTH
    if rpf == 0 or w_local % WIDTH or rpf >= MAX_ROWS:
        return padded_batch  # per-shard rows already divide (or gate falls back)
    local_b = padded_batch // files_axis  # padded_batch is a files_axis multiple
    if local_b * rpf > MAX_ROWS:
        step = MAX_ROWS // math.gcd(rpf, MAX_ROWS)
        local_b = -(-local_b // step) * step
    return local_b * files_axis


class BatchProcessor:
    """Pack payloads of one texture format into fixed-shape batches and
    auto-transform them on device.

    ``mesh=None`` runs single-device (vmap over the batch); with a mesh the batch is
    sharded ``P("files", "blocks")``.
    """

    def __init__(self, fmt: str, mesh=None, candidates=None, max_batch: int = 64,
                 estimator=None):
        cfg = _FORMATS[fmt]
        self.cfg = cfg
        self.fmt = fmt
        self.mesh = mesh
        self.candidates = tuple(candidates if candidates is not None
                                else cfg["candidates"])
        self._cand_key = tuple(cfg["key"](c) for c in self.candidates)
        self.max_batch = max_batch
        self.estimator = estimator
        if estimator is not None:
            # Host-scored mode (the CLI's zstd presets): the device builds every
            # candidate's estimation region; the host estimator ranks them.
            self._step = sharded.auto_step_batched_regions(fmt, self._cand_key,
                                                           mesh=mesh)
        else:
            # With a mesh: sharded step (per-shard Mosaic kernels when local
            # shapes allow, GSPMD-partitioned XLA otherwise). Without: the
            # single-device batched step whose scoring runs through the Mosaic
            # coverage kernel on the flattened (batch x candidates) grid.
            # Steps are built per ``full`` flag (exactly-bucket-sized batches
            # skip the ragged-compaction machinery; sharded.py).
            self._steps = {}

    def _get_step(self, full: bool):
        if self.estimator is not None:
            return self._step
        if full not in self._steps:
            if self.mesh is not None:
                self._steps[full] = self.cfg["step"](self.mesh, self._cand_key,
                                                     full=full)
            else:
                self._steps[full] = sharded.auto_step_batched(
                    self.fmt, self._cand_key, full=full)
        return self._steps[full]

    def _run_batch(self, flats: np.ndarray, valid: np.ndarray):
        full = bool((valid * self.cfg["words"]
                     == 4 * flats.shape[1]).all()) and self.estimator is None
        return self._get_step(full)(jnp.asarray(flats), jnp.asarray(valid))

    def _prepare_batches(self, payloads: Sequence[bytes], order):
        """Bucket payloads into fixed-shape (chunk, flats, valid) batches."""
        bs, wpb = self.cfg["block_size"], self.cfg["words"]
        by_bucket: dict = {}
        for i, data in enumerate(payloads):
            if order[i] is not None:
                continue  # already resolved (small-file native path)
            if len(data) % bs:
                raise ValueError(f"payload {i}: length {len(data)} not divisible by {bs}")
            n = len(data) // bs
            if n == 0:
                order[i] = BatchResult(i, b"", self.candidates[-1])
                continue
            by_bucket.setdefault(lanes.bucket_size(n), []).append(i)

        files_axis = self.mesh.shape["files"] if self.mesh is not None else 1
        blocks_axis = self.mesh.shape["blocks"] if self.mesh is not None else 1
        for bucket, indices in sorted(by_bucket.items()):
            for start in range(0, len(indices), self.max_batch):
                chunk = indices[start:start + self.max_batch]
                batch = len(chunk)
                padded_batch = -(-batch // files_axis) * files_axis
                padded_batch = _pad_batch_for_tiles(padded_batch, wpb * bucket,
                                                    files_axis, blocks_axis)
                flats = np.zeros((padded_batch, wpb * bucket), np.uint32)
                valid = np.zeros(padded_batch, np.int32)
                for row, idx in enumerate(chunk):
                    w = np.frombuffer(payloads[idx], "<u4")
                    flats[row, :len(w)] = w
                    valid[row] = 4 * (len(w) // wpb)
                for row in range(batch, padded_batch):
                    flats[row] = flats[batch - 1]
                    valid[row] = valid[batch - 1]
                yield chunk, flats, valid

    def process(self, payloads: Sequence[bytes]) -> List[BatchResult]:
        """Transform every payload; results returned in submission order."""
        order: List[Optional[BatchResult]] = [None] * len(payloads)
        if self.estimator is not None:
            self._process_host_scored(payloads, order)
            return [r for r in order if r is not None]
        self._route_small_native(payloads, order)
        bs = self.cfg["block_size"]
        for chunk, flats, valid in self._prepare_batches(payloads, order):
            out = jax.device_get(self._run_batch(flats, valid))
            streams, best = out[:-1], out[-1]
            for row, file_idx in enumerate(chunk):
                n = len(payloads[file_idx]) // bs
                settings = self.candidates[int(best[row])]
                row_streams = [s[row] for s in streams]
                order[file_idx] = BatchResult(
                    file_idx, self.cfg["serialize"](row_streams, n, settings),
                    settings)
        return [r for r in order if r is not None]

    def _route_small_native(self, payloads, order):
        """Device-scored (medium/LTU) mode with ``DLT_MEDIUM_BATCH_NATIVE=1``:
        run sub-threshold payloads through the per-file native/host LTU auto on
        a thread pool instead of the device batch. OPT-IN, not the default --
        on real TPU hardware the batched device search beats the native path
        even for small files (round-4 bench: +21%); the knob exists for
        device-free environments (e.g. the corpus-scale bench child, which must
        not touch the single-process relay chip). The native LTU scorer is the
        exact-integer twin of the device scorer, so picks agree in this size
        regime (see estimate/ltu.py) and outputs stay byte-identical."""
        from ..estimate.ltu import LtuEstimation
        from ..ops import auto as ops_auto, bc45 as ops_bc45

        if os.environ.get("DLT_MEDIUM_BATCH_NATIVE", "0") != "1":
            return
        if self.mesh is not None or self.candidates != tuple(self.cfg["candidates"]):
            return  # explicit mesh / custom candidates keep the device path
        thresh = lanes.device_threshold_bytes()
        small = [i for i, p in enumerate(payloads)
                 if order[i] is None and 0 < len(p) < thresh]
        if not small:
            return
        auto_fn = {"bc1": ops_auto.transform_bc1_auto,
                   "bc2": ops_auto.transform_bc2_auto,
                   "bc3": ops_auto.transform_bc3_auto,
                   "bc4": ops_bc45.transform_bc4_auto,
                   "bc5": ops_bc45.transform_bc5_auto}[self.fmt]
        est = LtuEstimation()

        def run(i):
            out, settings = auto_fn(payloads[i], est)
            order[i] = BatchResult(i, out, settings)

        _host_map(run, small)

    # --- host-scored (zstd-preset) mode -------------------------------------------

    def _process_host_scored(self, payloads, order):
        """Device region building overlapped with host estimation: batch k+1's
        device step is dispatched (async) before batch k's rows are scored, the
        analog of the reference parallelizing its zstd presets
        (``commands/transform/mod.rs:166-187``). Sub-threshold payloads skip the
        device entirely (region round-trips through the host link cost more than
        they save there) and run the all-native C++ auto instead."""
        from collections import deque

        from ..ops import auto as ops_auto, lanes

        thresh = lanes.device_threshold_bytes()
        small = [i for i, p in enumerate(payloads)
                 if order[i] is None and len(p) < thresh]
        if small:
            from ..settings import (
                BC1_COMPREHENSIVE_CANDIDATES, BC2_COMPREHENSIVE_CANDIDATES,
                BC3_COMPREHENSIVE_CANDIDATES,
            )

            from ..ops import bc45 as ops_bc45

            native_auto = {
                "bc1": ops_auto.transform_bc1_auto,
                "bc2": ops_auto.transform_bc2_auto,
                "bc3": ops_auto.transform_bc3_auto,
                "bc4": ops_bc45.transform_bc4_auto,
                "bc5": ops_bc45.transform_bc5_auto}[self.fmt]
            comprehensive = {"bc1": BC1_COMPREHENSIVE_CANDIDATES,
                             "bc2": BC2_COMPREHENSIVE_CANDIDATES,
                             "bc3": BC3_COMPREHENSIVE_CANDIDATES,
                             "bc4": (), "bc5": ()}[self.fmt]
            if self.candidates == tuple(comprehensive):
                kw = dict(use_all_decorrelation_modes=True)
            elif self.candidates == tuple(self.cfg["candidates"]):
                kw = dict()
            else:  # custom candidate set: no all-native fast path
                kw = dict(candidates=self.candidates)

            def run_native(i):
                out, settings = native_auto(payloads[i], self.estimator, **kw)
                order[i] = BatchResult(i, out, settings)

            _host_map(run_native, small)  # the native auto releases the GIL

        pending = deque()
        for chunk, flats, valid in self._prepare_batches(payloads, order):
            pending.append((chunk, self._run_batch(flats, valid)))
            if len(pending) >= 2:
                self._score_and_serialize(payloads, order, *pending.popleft())
        while pending:
            self._score_and_serialize(payloads, order, *pending.popleft())

    @staticmethod
    def _row_bytes(row: np.ndarray, nbytes: int) -> bytes:
        """A region row's first ``nbytes`` bytes (u32 word rows carry LE bytes)."""
        if row.dtype == np.uint32:
            return row[:(nbytes + 3) // 4].astype("<u4").tobytes()[:nbytes]
        return row[:nbytes].tobytes()

    def _score_and_serialize(self, payloads, order, chunk, outs):
        bs = self.cfg["block_size"]
        outs = jax.device_get(outs)
        ns = [len(payloads[i]) // bs for i in chunk]
        if self.fmt == "bc3":
            h1, h2, h3, cidx, a_rows, c_rows = outs
            alpha_keys = tuple(dict.fromkeys(sa for _, sa, _ in self._cand_key))
            colour_keys = tuple(dict.fromkeys((v, sc)
                                              for v, _, sc in self._cand_key))
            a_ix = {k: i for i, k in enumerate(alpha_keys)}
            c_ix = {k: i for i, k in enumerate(colour_keys)}
            bufs = []
            for row, n in enumerate(ns):
                bufs += [self._row_bytes(a_rows[row, a], 2 * n)
                         for a in range(len(alpha_keys))]
                bufs += [self._row_bytes(c_rows[row, c], 4 * n)
                         for c in range(len(colour_keys))]
            sizes = self.estimator.estimate_batch(bufs)
            stride = len(alpha_keys) + len(colour_keys)
            for row, (file_idx, n) in enumerate(zip(chunk, ns)):
                base = row * stride
                a_sizes = sizes[base:base + len(alpha_keys)]
                c_sizes = sizes[base + len(alpha_keys):base + stride]
                scores = [a_sizes[a_ix[sa]] + c_sizes[c_ix[(v, sc)]]
                          for v, sa, sc in self._cand_key]
                best = int(np.argmin(scores))
                settings = self.candidates[best]
                v, sa, sc = self._cand_key[best]
                alpha = self._row_bytes(a_rows[row, a_ix[sa]], 2 * n)
                colours = self._row_bytes(c_rows[row, c_ix[(v, sc)]], 4 * n)
                out = (alpha + _idx_u16s(h1[row], h2[row], h3[row], n)
                       + colours + _u32s(cidx[row], n))
                order[file_idx] = BatchResult(file_idx, out, settings)
            return
        C = len(self._cand_key)
        if self.fmt == "bc4":
            h1, h2, h3, rows = outs
            bufs = [self._row_bytes(rows[row, c], 2 * n)
                    for row, n in enumerate(ns) for c in range(C)]
            sizes = np.asarray(self.estimator.estimate_batch(bufs)).reshape(
                len(ns), C)
            for row, (file_idx, n) in enumerate(zip(chunk, ns)):
                best = int(np.argmin(sizes[row]))
                out = (self._row_bytes(rows[row, best], 2 * n)
                       + _idx_u16s(h1[row], h2[row], h3[row], n))
                order[file_idx] = BatchResult(file_idx, out, self.candidates[best])
            return
        if self.fmt == "bc5":
            rh1, rh2, rh3, gh1, gh2, gh3, r_rows, g_rows = outs
            # per-file auto scores the CONCATENATED r+g endpoint streams
            bufs = [self._row_bytes(r_rows[row, c], 2 * n)
                    + self._row_bytes(g_rows[row, c], 2 * n)
                    for row, n in enumerate(ns) for c in range(C)]
            sizes = np.asarray(self.estimator.estimate_batch(bufs)).reshape(
                len(ns), C)
            for row, (file_idx, n) in enumerate(zip(chunk, ns)):
                best = int(np.argmin(sizes[row]))
                out = (self._row_bytes(r_rows[row, best], 2 * n)
                       + self._row_bytes(g_rows[row, best], 2 * n)
                       + _idx_u16s(rh1[row], rh2[row], rh3[row], n)
                       + _idx_u16s(gh1[row], gh2[row], gh3[row], n))
                order[file_idx] = BatchResult(file_idx, out, self.candidates[best])
            return
        if self.fmt == "bc1":
            idx, rows = outs
        else:  # bc2
            a_lo, a_hi, idx, rows = outs
        bufs = [self._row_bytes(rows[row, c], 4 * n)
                for row, n in enumerate(ns) for c in range(C)]
        sizes = np.asarray(self.estimator.estimate_batch(bufs)).reshape(len(ns), C)
        for row, (file_idx, n) in enumerate(zip(chunk, ns)):
            best = int(np.argmin(sizes[row]))
            settings = self.candidates[best]
            colours = self._row_bytes(rows[row, best], 4 * n)
            if self.fmt == "bc1":
                out = colours + _u32s(idx[row], n)
            else:
                alpha = np.empty((n, 2), "<u4")
                alpha[:, 0] = a_lo[row][:n]
                alpha[:, 1] = a_hi[row][:n]
                out = alpha.tobytes() + colours + _u32s(idx[row], n)
            order[file_idx] = BatchResult(file_idx, out, settings)


class Bc1BatchProcessor(BatchProcessor):
    def __init__(self, mesh=None, candidates=None, max_batch: int = 64):
        super().__init__("bc1", mesh, candidates, max_batch)


class Bc2BatchProcessor(BatchProcessor):
    def __init__(self, mesh=None, candidates=None, max_batch: int = 64):
        super().__init__("bc2", mesh, candidates, max_batch)


class Bc3BatchProcessor(BatchProcessor):
    def __init__(self, mesh=None, candidates=None, max_batch: int = 64):
        super().__init__("bc3", mesh, candidates, max_batch)


class Bc4BatchProcessor(BatchProcessor):
    def __init__(self, mesh=None, candidates=None, max_batch: int = 64):
        super().__init__("bc4", mesh, candidates, max_batch)


class Bc5BatchProcessor(BatchProcessor):
    def __init__(self, mesh=None, candidates=None, max_batch: int = 64):
        super().__init__("bc5", mesh, candidates, max_batch)


def transform_corpus_bc1(payloads: Sequence[bytes], mesh=None,
                         candidates=BC1_FAST_CANDIDATES) -> List[BatchResult]:
    """One-shot convenience wrapper over :class:`Bc1BatchProcessor`."""
    return Bc1BatchProcessor(mesh, candidates).process(payloads)


def _pad_batch_for_family(batch: int, words_per_file: int, fmt: str) -> int:
    """Round a stacked untransform batch up so the concatenated flat stream fits
    the fused kernels' per-family tile grid (``shuffle._grid_rows`` with
    ``FAMILY_ROWS[fmt]``). All quantities are powers of two (bucket, words per
    block, WIDTH), so the padded count is exact, never a fallback."""
    import math

    from ..ops.pallas.shuffle import FAMILY_ROWS, WIDTH

    cap = FAMILY_ROWS[fmt]
    if words_per_file % WIDTH:
        return batch
    rpf = words_per_file // WIDTH
    if rpf == 0 or batch * rpf <= cap:
        return batch
    step = cap // math.gcd(rpf, cap)
    return -(-batch // step) * step


def _untransform_cfgs():
    from ..ops import bc1, bc2, bc3, bc45, bc6h, bc7, hostwrap, rgb

    cfgs = {
        "bc1": dict(block_size=8, wpb=2, spec=hostwrap.bc1_stream_spec,
                    device=lambda st, s: bc1.untransform_device(
                        st, int(s.decorrelation_mode), s.split_colour_endpoints),
                    host=bc1.untransform),
        "bc2": dict(block_size=16, wpb=4, spec=hostwrap.bc2_stream_spec,
                    device=lambda st, s: bc2.untransform_device(
                        st, int(s.decorrelation_mode), s.split_colour_endpoints),
                    host=bc2.untransform),
        "bc3": dict(block_size=16, wpb=4, spec=hostwrap.bc3_stream_spec,
                    device=lambda st, s: bc3.untransform_device(
                        st, int(s.decorrelation_mode), s.split_alpha_endpoints,
                        s.split_colour_endpoints),
                    host=bc3.untransform),
        "bc4": dict(block_size=8, wpb=2,
                    spec=lambda s: bc45._bc4_spec(s.split_endpoints),
                    device=lambda st, s: bc45.bc4_untransform_device(
                        st, s.split_endpoints),
                    host=bc45.untransform_bc4),
        "bc5": dict(block_size=16, wpb=4,
                    spec=lambda s: bc45._bc5_spec(s.split_endpoints),
                    device=lambda st, s: bc45.bc5_untransform_device(
                        st, s.split_endpoints),
                    host=bc45.untransform_bc5),
        # Host-pool-only formats: BC7/BC6H untransform needs the per-file mode
        # stream (its own device path above the threshold); RGB untransform is a
        # flat byte shuffle that never beats memcpy speed on device.
        "bc7": dict(device=None, host=bc7.untransform),
        "bc6h": dict(device=None, host=bc6h.untransform),
    }
    for layout in ("rgba8888", "bgra8888", "bgr888"):
        cfgs[layout] = dict(device=None,
                            host=(lambda p, s, _l=layout:
                                  rgb.untransform(p, _l, s)))
    return cfgs


class UntransformBatchProcessor:
    """Batch untransform twin of :class:`BatchProcessor` -- the LOAD path.

    The reference's headline load-path number is untransform at tens of GiB/s
    (``bc1-api/README.MD:286-313``); per-file dispatch overhead buries that on
    small textures. Transformed payloads are therefore grouped by (settings,
    size bucket) -- settings come out of each file's embedded header and are
    STATIC kernel arguments, so grouping keeps every device call shape- and
    specialization-stable -- each file's stream sections are scattered into
    bucket-padded per-stream buffers, stacked across files, and inverted in ONE
    fused device call per batch. The fused untransform kernels are linear in
    the block index (output block ``i`` reads only element ``i`` of each
    stream), so ``B`` bucket-padded files concatenate into one valid flat
    batch; pad rows invert zeros and are sliced off on download.

    Sub-threshold payloads run the per-file native C++ / numpy-oracle
    untransform on a host thread pool instead (the GIL-releasing rayon analog,
    ``commands/untransform/mod.rs:71-76``), as do the formats with no stacked
    device path (BC7/BC6H mode streams, flat RGB shuffles).
    """

    def __init__(self, fmt: str, max_batch: int = 64):
        self.fmt = fmt
        self.cfg = _untransform_cfgs()[fmt]
        self.max_batch = max_batch

    def process(self, entries: Sequence[tuple]) -> List[bytes]:
        """``entries`` = [(transformed payload bytes, settings), ...];
        returns the restored payloads in submission order."""
        out: List[Optional[bytes]] = [None] * len(entries)
        thresh = lanes.device_threshold_bytes()
        host_idx, by_group = [], {}
        bs = self.cfg.get("block_size")
        for i, (payload, settings) in enumerate(entries):
            if len(payload) == 0:
                out[i] = b""
            elif self.cfg["device"] is None or len(payload) < thresh:
                host_idx.append(i)
            elif len(payload) % bs:
                raise ValueError(
                    f"payload {i}: length {len(payload)} not divisible by {bs}")
            else:
                n = len(payload) // bs
                by_group.setdefault((settings, lanes.bucket_size(n)),
                                    []).append(i)

        if host_idx:
            self._process_host(entries, out, host_idx)

        from collections import deque

        pending = deque()
        for (settings, bucket), indices in sorted(
                by_group.items(), key=lambda kv: (repr(kv[0][0]), kv[0][1])):
            # HBM-budget-aware batch scaling (same discipline as the mode-sort
            # processor): a batch holds input streams + the flat output
            # (~2x payload) on device, so large buckets shrink the batch.
            per_file = self.cfg["block_size"] * bucket
            budget = int(os.environ.get("DLT_UNTRANSFORM_HBM_BUDGET",
                                        str(2 << 30)))
            eff_batch = max(1, min(self.max_batch, budget // (2 * per_file)))
            for start in range(0, len(indices), eff_batch):
                chunk = indices[start:start + eff_batch]
                pending.append((chunk,
                                self._run_batch(entries, chunk, settings,
                                                bucket)))
                if len(pending) >= 2:  # overlap assembly with device compute
                    self._drain(entries, out, *pending.popleft())
        while pending:
            self._drain(entries, out, *pending.popleft())
        return [r for r in out if r is not None]

    def _process_host(self, entries, out, host_idx):
        from .. import runtime

        # Whole-window native batch: ONE C call (pthread pool, GIL released
        # once) instead of one ctypes call per file -- the per-file Python
        # overhead was what bounded small-file restore throughput.
        if self.fmt in ("bc1", "bc2", "bc3") and runtime.available():
            try:
                results = runtime.batch_untransform(
                    self.fmt, [entries[i][0] for i in host_idx],
                    [entries[i][1] for i in host_idx])
                for i, r in zip(host_idx, results):
                    out[i] = r
                return
            except Exception:
                pass  # invalid payloads etc.: per-file path raises typed errors

        host = self.cfg["host"]

        def run(i):
            payload, settings = entries[i]
            out[i] = host(payload, settings)

        _host_map(run, host_idx)

    def _run_batch(self, entries, chunk, settings, bucket):
        """Scatter each file's stream sections into bucket-padded stream buffers
        and dispatch the fused untransform (async)."""
        import jax.numpy as jnp

        bs, wpb = self.cfg["block_size"], self.cfg["wpb"]
        spec = self.cfg["spec"](settings)
        b_pad = _pad_batch_for_family(len(chunk), wpb * bucket, self.fmt)
        bufs = [np.zeros((b_pad, bpb * bucket), np.uint8) for bpb in spec]
        for row, idx in enumerate(chunk):
            payload = entries[idx][0]
            arr = np.frombuffer(payload, np.uint8)
            n, pos = len(payload) // bs, 0
            for buf, bpb in zip(bufs, spec):
                buf[row, :bpb * n] = arr[pos:pos + bpb * n]
                pos += bpb * n
        streams = tuple(jnp.asarray(b.reshape(-1).view("<u4")) for b in bufs)
        return self.cfg["device"](streams, settings)

    def _drain(self, entries, out, chunk, flat):
        import jax

        bs, wpb = self.cfg["block_size"], self.cfg["wpb"]
        flat = np.asarray(jax.device_get(flat))
        n0 = len(entries[chunk[0]][0]) // bs  # all chunk files share the bucket
        rows = flat.reshape(-1, wpb * lanes.bucket_size(n0))
        for row, idx in enumerate(chunk):
            n = len(entries[idx][0]) // bs
            out[idx] = rows[row, :wpb * n].astype("<u4").tobytes()


class ModeSortBatchProcessor:
    """BC7/BC6H corpus batching: every candidate's full stream assembled + scored
    on device per fixed-shape batch (``ops/bc7.py:auto_step_batched_modesort``),
    only the winner rows downloaded. The mode-sort formats have no cheap
    estimation region (the whole stream is scored), so this replaces the
    BC1-BC5 processors' stream/region machinery with one row per file."""

    BLOCK_SIZE = 16

    def __init__(self, fmt: str = "bc7", max_batch: int = 64, candidates=None):
        from ..settings import BC6H_FAST_CANDIDATES, BC7_FAST_CANDIDATES

        if fmt not in ("bc7", "bc6h"):
            raise ValueError(f"mode-sort batching is for bc7/bc6h, not {fmt}")
        self.fmt = fmt
        self.settings = tuple(candidates if candidates is not None else
                              (BC7_FAST_CANDIDATES if fmt == "bc7"
                               else BC6H_FAST_CANDIDATES))
        self._cand_key = tuple((s.sort_by_mode, s.split_byte_planes)
                               for s in self.settings)
        self.max_batch = max_batch
        self._steps = {}

    def _step(self, bucket: int):
        if bucket not in self._steps:
            from functools import partial as _partial

            from ..estimate.ltu import DEFAULT_OFFSETS
            from ..ops.bc7 import auto_step_batched_modesort, stream_row_len

            self._steps[bucket] = _partial(
                auto_step_batched_modesort, candidates=self._cand_key,
                offsets=DEFAULT_OFFSETS, row_len=stream_row_len(bucket),
                fmt=self.fmt)
        return self._steps[bucket]

    def process(self, payloads: Sequence[bytes]) -> List[BatchResult]:
        from ..ops.bc7 import ltu_identity_guard_batch

        order: List[Optional[BatchResult]] = [None] * len(payloads)
        by_bucket: dict = {}
        for i, data in enumerate(payloads):
            if len(data) % self.BLOCK_SIZE:
                raise ValueError(
                    f"payload {i}: length {len(data)} not divisible by 16")
            n = len(data) // self.BLOCK_SIZE
            if n == 0:
                order[i] = BatchResult(i, b"", self.settings[-1])
                continue
            by_bucket.setdefault(lanes.bucket_size(n), []).append(i)

        for bucket, indices in sorted(by_bucket.items()):
            # HBM-budget-aware batch scaling: each file holds C candidates' full
            # SPAN-padded stream rows on device at once (plus sort temporaries),
            # so large buckets shrink the effective batch instead of OOMing a
            # 16 GB part on a directory of uniformly large files.
            from ..ops.bc7 import stream_row_len

            per_file = len(self._cand_key) * stream_row_len(bucket)
            budget = int(os.environ.get("DLT_MODESORT_HBM_BUDGET",
                                        str(1 << 30)))
            eff_batch = max(1, min(self.max_batch, budget // per_file))
            for start in range(0, len(indices), eff_batch):
                chunk = indices[start:start + eff_batch]
                flats = np.zeros((len(chunk), 4 * bucket), np.uint32)
                n_valids = np.zeros(len(chunk), np.uint32)
                for row, idx in enumerate(chunk):
                    w = np.frombuffer(payloads[idx], "<u4")
                    flats[row, :len(w)] = w
                    n_valids[row] = len(w) // 4
                winner, valid, best = jax.device_get(self._step(bucket)(
                    jnp.asarray(flats), jnp.asarray(n_valids)))
                # same zstd-1 identity confirmation as the per-file auto, ONE
                # pthread estimate_batch call for the whole chunk (batched and
                # per-file picks identical: the per-file guard delegates to
                # this batch form)
                shipped = ltu_identity_guard_batch(
                    [payloads[i] for i in chunk],
                    [winner[row].tobytes()[:int(valid[row])]
                     for row in range(len(chunk))],
                    [self.settings[int(best[row])]
                     for row in range(len(chunk))],
                    self.settings)
                for row, idx in enumerate(chunk):
                    order[idx] = BatchResult(idx, *shipped[row])
        return [r for r in order if r is not None]


class RgbBatchProcessor:
    """Uncompressed RGB(A) corpus batching: candidate streams are cheap byte
    shuffles (host/numpy or device above the threshold), so the batch win is
    scoring ALL files' candidates through one pthread ``estimate_batch`` call
    instead of 4-buffer calls per file, plus host-thread-parallel transforms."""

    def __init__(self, layout: str, estimator, max_batch: int = 64,
                 candidates=None):
        from ..settings import RGB_FAST_CANDIDATES

        self.layout = layout
        self.estimator = estimator
        self.settings = tuple(candidates if candidates is not None
                              else RGB_FAST_CANDIDATES)
        self.max_batch = max_batch

    def process(self, payloads: Sequence[bytes]) -> List[BatchResult]:
        from ..ops import rgb as ops_rgb

        order: List[Optional[BatchResult]] = [None] * len(payloads)
        live = [i for i, p in enumerate(payloads) if len(p)]
        for i, p in enumerate(payloads):
            if not len(p):
                order[i] = BatchResult(i, b"", self.settings[-1])
        C = len(self.settings)
        for start in range(0, len(live), self.max_batch):
            chunk = live[start:start + self.max_batch]
            rows: List[Optional[bytes]] = [None] * (len(chunk) * C)

            def build(job):
                row, c = divmod(job, C)
                rows[job] = ops_rgb.transform(payloads[chunk[row]], self.layout,
                                              self.settings[c])

            _host_map(build, range(len(chunk) * C))
            sizes = np.asarray(self.estimator.estimate_batch(rows)).reshape(
                len(chunk), C)
            for row, idx in enumerate(chunk):
                best = int(np.argmin(sizes[row]))
                order[idx] = BatchResult(idx, rows[row * C + best],
                                         self.settings[best])
        return [r for r in order if r is not None]
