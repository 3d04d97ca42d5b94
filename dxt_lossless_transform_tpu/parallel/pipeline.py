"""Corpus batch pipeline: many textures per device step.

The CLI analog of the reference's rayon work-stealing loop
(``commands/transform/mod.rs:166-187``) rebuilt for accelerators: per-file dispatch
latency dominates small-texture processing, so files are *packed* into fixed-shape
batches -- grouped by padded block-count bucket, stacked on a leading batch axis,
auto-searched + transformed in one jitted (optionally mesh-sharded) call, and
emitted in submission order (the ordered-gather contract from BASELINE.json).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..settings import BC1_FAST_CANDIDATES, Bc1TransformSettings
from ..ops import lanes
from .sharded import bc1_auto_step, bc1_auto_step_single
from .mesh import make_mesh


@dataclass
class BatchResult:
    """One file's outcome, in submission order."""

    index: int
    transformed: bytes
    settings: Bc1TransformSettings


class Bc1BatchProcessor:
    """Pack BC1 payloads into fixed-shape batches and auto-transform them on device.

    ``mesh=None`` runs single-device (vmap over the batch); with a mesh the batch is
    sharded ``P("files", "blocks")``.
    """

    def __init__(self, mesh=None, candidates: Sequence[Bc1TransformSettings] = BC1_FAST_CANDIDATES,
                 max_batch: int = 64):
        self.mesh = mesh
        self.candidates = tuple(candidates)
        self._cand_key = tuple(
            (int(c.decorrelation_mode), c.split_colour_endpoints) for c in self.candidates)
        self.max_batch = max_batch
        self._step = (bc1_auto_step(mesh, self._cand_key) if mesh is not None else None)

    def _run_batch(self, flats: np.ndarray, valid: np.ndarray):
        if self._step is not None:
            return self._step(jnp.asarray(flats), jnp.asarray(valid))
        single = lambda f, v: bc1_auto_step_single(f, v, candidates=self._cand_key)
        return jax.vmap(single)(jnp.asarray(flats), jnp.asarray(valid))

    def process(self, payloads: Sequence[bytes]) -> List[BatchResult]:
        """Transform every payload; results returned in submission order."""
        order: List[Optional[BatchResult]] = [None] * len(payloads)
        by_bucket: dict = {}
        for i, data in enumerate(payloads):
            if len(data) % 8:
                raise ValueError(f"payload {i}: length {len(data)} not divisible by 8")
            n = len(data) // 8
            if n == 0:
                order[i] = BatchResult(i, b"", self.candidates[-1])
                continue
            by_bucket.setdefault(lanes.bucket_size(n), []).append(i)

        files_axis = self.mesh.shape["files"] if self.mesh is not None else 1
        for bucket, indices in sorted(by_bucket.items()):
            for start in range(0, len(indices), self.max_batch):
                chunk = indices[start:start + self.max_batch]
                batch = len(chunk)
                # pad the batch to a multiple of the files axis (replicate last file)
                padded_batch = -(-batch // files_axis) * files_axis
                flats = np.zeros((padded_batch, 2 * bucket), np.uint32)
                valid = np.zeros(padded_batch, np.int32)
                for row, idx in enumerate(chunk):
                    w = np.frombuffer(payloads[idx], "<u4")
                    flats[row, :len(w)] = w
                    valid[row] = 4 * (len(w) // 2)
                for row in range(batch, padded_batch):
                    flats[row] = flats[batch - 1]
                    valid[row] = valid[batch - 1]

                c0, c1, idx_s, best = jax.device_get(self._run_batch(flats, valid))
                for row, file_idx in enumerate(chunk):
                    n = len(payloads[file_idx]) // 8
                    settings = self.candidates[int(best[row])]
                    order[file_idx] = BatchResult(
                        file_idx,
                        _serialize_bc1(c0[row], c1[row], idx_s[row], n, settings),
                        settings)
        return [r for r in order if r is not None]


def _serialize_bc1(d0: np.ndarray, d1: np.ndarray, idx: np.ndarray, n: int,
                   settings: Bc1TransformSettings) -> bytes:
    """Assemble a file's byte image from the step's split-form streams.

    The step always returns decorrelated split streams; the non-split layout is the
    same bytes interleaved, so both layouts serialize without re-running anything.
    """
    if settings.split_colour_endpoints:
        return (d0[:n].astype("<u2").tobytes() + d1[:n].astype("<u2").tobytes()
                + idx[:n].astype("<u4").tobytes())
    colors = np.empty((n, 2), "<u2")
    colors[:, 0] = d0[:n]
    colors[:, 1] = d1[:n]
    return colors.tobytes() + idx[:n].astype("<u4").tobytes()


def transform_corpus_bc1(payloads: Sequence[bytes], mesh=None,
                         candidates=BC1_FAST_CANDIDATES) -> List[BatchResult]:
    """One-shot convenience wrapper over :class:`Bc1BatchProcessor`."""
    return Bc1BatchProcessor(mesh, candidates).process(payloads)
