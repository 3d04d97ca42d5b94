"""Multi-device scale-out: mesh construction and sharded transform steps.

The reference is a single-node shared-memory library (rayon per file,
``cli/commands/transform/mod.rs:166-187``); this layer is the TPU-native scale-out it
never had: texture batches data-parallel over a ``files`` mesh axis (DCN across
hosts), block streams sharded over a ``blocks`` axis (ICI within a slice). Transforms
are per-block pure functions, so the forward pass needs zero communication; the
estimator's reductions ride ``psum`` over the blocks axis, and result collection is an
ordered device_get of the sharded output (submission order preserved by construction).
"""

from .mesh import make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    bc1_auto_step, bc1_auto_step_single, bc2_auto_step, bc2_auto_step_single,
    bc3_auto_step, bc3_auto_step_single, bc4_auto_step, bc4_auto_step_single,
    bc5_auto_step, bc5_auto_step_single, modesort_step_single,
    modesort_transform_step, untransform_step,
)
from .pipeline import (  # noqa: F401
    BatchProcessor, Bc1BatchProcessor, Bc2BatchProcessor, Bc3BatchProcessor,
    Bc4BatchProcessor, Bc5BatchProcessor, UntransformBatchProcessor,
    transform_corpus_bc1,
)
from .distributed import initialize, is_primary  # noqa: F401
