"""Pluggable compressed-size estimation.

Analog of the reference's ``SizeEstimationOperations`` trait
(``api-common/src/estimate/mod.rs:24-65``): only *relative ordering* between
estimates of candidate transforms matters. Three implementations:

- :class:`NoEstimation`   -- returns 0 for everything (manual-settings paths).
- :class:`ZstdEstimation` -- real magicless zstd compression on the host (the
  high-accuracy option; also the final compressor).
- :class:`LtuEstimation`  -- device-friendly LZ-match counting on TPU (the fast
  option; JAX histogram kernel, batched over all candidates at once).
"""

from .base import SizeEstimation, NoEstimation  # noqa: F401
from .zstd import ZstdEstimation  # noqa: F401
from .ltu import LtuEstimation  # noqa: F401
