"""Pallas TPU kernels for the hot transform paths.

XLA handles the elementwise lane math well, but the AoS<->SoA shuffles at the heart
of these transforms lower poorly (strided ``.at[].set`` interleaves cap at ~55 GB/s
r+w on v5e). These kernels fuse the whole transform into a single read->shuffle->write
pass using the *transpose sandwich*: lane-granularity interleaves become sublane
reshapes between two in-VMEM transposes (measured ~122 GB/s r+w vs ~146 GB/s memcpy).
"""

from .shuffle import (  # noqa: F401
    bc1_transform_tpu,
    bc1_untransform_tpu,
    pallas_available,
)
