"""Host zstd size estimation.

Behavioral reference: ``dxt-lossless-transform-zstd/src/lib.rs:53-199`` -- real zstd
compression with the magicless format and no content-size/checksum/dict-id headers,
so the estimate is pure payload size. Levels 1-22; level 1 is the reference's
"Optimal" preset estimator.

Uses the ``zstandard`` module (releases the GIL during compression); the native C++
runtime provides a thread-pooled batch path for corpus processing.
"""

from __future__ import annotations

import numpy as np
import zstandard

from .base import SizeEstimation


def _magicless_params(level: int) -> "zstandard.ZstdCompressionParameters":
    return zstandard.ZstdCompressionParameters.from_level(
        level,
        format=zstandard.FORMAT_ZSTD1_MAGICLESS,
        write_content_size=False,
        write_checksum=False,
        write_dict_id=False,
    )


class ZstdEstimation(SizeEstimation):
    """Estimate compressed size by actually compressing with magicless zstd.

    Compressor contexts are per-thread (zstandard compressors are not thread-safe;
    the CLI runs estimators from a worker pool), and batches go through the native
    runtime's GIL-free pthread driver when available.
    """

    def __init__(self, level: int = 1):
        if not (1 <= level <= 22):
            raise ValueError(f"zstd level {level} out of range 1..22")
        self.level = level
        import threading

        self._local = threading.local()

    @property
    def _cctx(self) -> "zstandard.ZstdCompressor":
        cctx = getattr(self._local, "cctx", None)
        if cctx is None:
            cctx = zstandard.ZstdCompressor(compression_params=_magicless_params(self.level))
            self._local.cctx = cctx
        return cctx

    def max_compressed_size(self, len_bytes: int) -> int:
        # ZSTD_compressBound upper bound
        return len_bytes + (len_bytes >> 8) + 512

    def estimate(self, data) -> int:
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        if len(data) == 0:
            return 0
        # Prefer the native engine so single and batch estimates agree exactly
        # (python-zstandard bundles a different libzstd; sizes can differ by a few
        # bytes between engines, which would make argmin decisions inconsistent).
        from .. import runtime

        if runtime.available():
            return runtime.zstd_estimate(data, self.level)
        return len(self._cctx.compress(data))

    def estimate_batch(self, regions) -> list:
        from .. import runtime

        if runtime.available() and len(regions) > 1:
            bufs = [r.tobytes() if isinstance(r, np.ndarray) else r for r in regions]
            return runtime.zstd_estimate_batch(bufs, self.level)
        return [self.estimate(r) for r in regions]

    def compress(self, data) -> bytes:
        """Full compression (for the CLI's final-output path and ratio benches)."""
        if isinstance(data, np.ndarray):
            data = data.tobytes()
        return self._cctx.compress(data)

    def decompress(self, data: bytes, expected_len: int) -> bytes:
        dctx = zstandard.ZstdDecompressor(format=zstandard.FORMAT_ZSTD1_MAGICLESS)
        return dctx.decompress(data, max_output_size=expected_len)
