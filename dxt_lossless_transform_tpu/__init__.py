"""dxt-lossless-transform-tpu: TPU-native lossless transforms for GPU block-compressed textures.

A brand-new JAX/XLA/Pallas framework with the capabilities of the Rust reference
``Sewer56/dxt-lossless-transform``: fast, bit-exact-reversible transforms for BC1/BC2/BC3
(BC7 reserved) texture data inside DDS files that make them compress ~15% smaller under
generic LZ compressors (zstd etc.) and load faster.

Layer map (TPU-first, not a crate-graph translation):

- ``oracle``   -- numpy bit-exact reference implementations (the test oracle; also the
                  host fallback path for tiny files where device dispatch isn't worth it).
- ``ops``      -- the device compute path: vectorized integer-lane transforms under ``jax.jit``
                  plus Pallas TPU kernels for the hot loops.
- ``estimate`` -- pluggable compressed-size estimation (host zstd, device LZ-match counting).
- ``formats``  -- file-format layer: DDS parsing, 4-byte transform-header embedding,
                  handler protocol, transform bundles, mmap file I/O.
- ``parallel`` -- device-mesh sharding of block streams and texture batches.
- ``runtime``  -- native C++ host runtime (batch file loader, threaded zstd estimation).
- ``cli``      -- command-line tool (transform / untransform / debug-*).
"""

__version__ = "0.1.0"

from .settings import (  # noqa: F401
    YCoCgVariant,
    Bc1TransformSettings,
    Bc2TransformSettings,
    Bc3TransformSettings,
)
