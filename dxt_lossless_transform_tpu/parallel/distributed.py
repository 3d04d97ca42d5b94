"""Multi-host initialization helpers.

The reference is single-node (rayon threads); this build scales across hosts with
``jax.distributed``: per-file data parallelism over the ``files`` mesh axis rides DCN
across hosts, block-stream sharding over ``blocks`` rides ICI within a slice.

On a TPU pod slice, ``initialize()`` picks up the cluster environment automatically;
on CPU/GPU fleets pass coordinator_address/num_processes/process_id explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` if running multi-process; no-op otherwise.

    Returns True if distributed mode is active after the call.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # Single-process environment (no cluster env detected): stay local.
        return False
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should write outputs / print reports."""
    return jax.process_index() == 0
