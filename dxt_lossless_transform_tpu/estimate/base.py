"""Size-estimation protocol.

Contract (mirrors ``api-common/src/estimate/mod.rs:18-65``): estimates are *relative*
-- the auto-search keeps the candidate with the smallest estimate; absolute values
need not correspond to real compressed sizes.

Device estimators additionally implement :meth:`SizeEstimation.estimate_batch_device`,
taking a stacked ``(C, L)`` uint8 array of candidate regions already resident on
device, so the whole candidate search runs without a host round-trip per candidate.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class SizeEstimation:
    """Base protocol for size estimators."""

    #: True when :meth:`estimate_batch_device` scores on-device. The auto-search
    #: uses this to choose where candidate regions are *built*: device estimators
    #: score device-resident regions with zero host traffic; host-only estimators
    #: (zstd) get their regions built host-side with numpy, since shipping (C, L)
    #: region stacks back through the device->host relay costs far more than the
    #: byte-shuffle it saves.
    on_device: bool = False

    def max_compressed_size(self, len_bytes: int) -> int:
        """Upper bound on the size of a compressed buffer (for preallocation)."""
        raise NotImplementedError

    def estimate(self, data) -> int:
        """Estimate the compressed size of ``data`` (bytes / uint8 array). Lower = better."""
        raise NotImplementedError

    def estimate_batch(self, regions: Sequence) -> list:
        """Estimate several independent buffers; default is a loop over :meth:`estimate`."""
        return [self.estimate(r) for r in regions]

    def estimate_batch_device(self, regions, valid_len) -> Optional["np.ndarray"]:
        """Estimate a device-resident (C, L) uint8 batch with ``valid_len`` real bytes
        per row. Returns per-candidate scores (device array) or None if this estimator
        is host-only."""
        return None


class NoEstimation(SizeEstimation):
    """Always returns 0 -- used when settings are chosen manually
    (``estimate/mod.rs:102-121``)."""

    def max_compressed_size(self, len_bytes: int) -> int:
        return 0

    def estimate(self, data) -> int:
        return 0
