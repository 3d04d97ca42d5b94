"""Device compute path: vectorized integer-lane transforms under ``jax.jit``.

Everything here is pure, statically-shaped, and expressible as elementwise VPU ops +
reshapes, so XLA fuses each transform into a single HBM-bandwidth-bound kernel. The
settings knob that changes *math* (YCoCg variant) is a traced scalar dispatched with
``lax.switch`` — one compiled executable per (shape, layout family). The knobs that
change *layout* (split flags) are static arguments.

Byte-view semantics: the on-disk format is little-endian; host wrappers pin this by
constructing lanes with ``np.frombuffer(data, '<u4')`` etc. On device everything is an
integer lane; no byte order exists until serialization back on the host (the analog of
the reference's endian-gated lane helpers, ``bc3/src/utils.rs:7-40``).
"""

from . import ycocg, bc1, bc2, bc3  # noqa: F401
