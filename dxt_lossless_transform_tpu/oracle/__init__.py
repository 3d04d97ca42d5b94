"""Bit-exact numpy reference implementations (the test oracle).

These are deliberately simple, vectorized numpy implementations of every transform,
defined directly from the on-disk format semantics (little-endian byte streams).
The JAX/Pallas device ops in ``..ops`` are differentially tested against this module,
mirroring the reference's SIMD-vs-portable differential-testing strategy
(reference ``bc1/src/test_prelude.rs:65-78``).

They also serve as the host fallback path for inputs too small to be worth device
dispatch.
"""

from . import color565, ycocg, bc1, bc2, bc3, decode  # noqa: F401
