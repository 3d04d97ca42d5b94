"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("files", "blocks"),
              devices=None) -> Mesh:
    """Build a 2-D ``(files, blocks)`` mesh over the first ``n_devices`` devices.

    The files axis is the data-parallel (cross-host / DCN) dimension; the blocks axis
    shards each texture's block stream (intra-slice / ICI). The blocks dimension is
    made as large as possible (it bounds the largest single texture we can hold),
    with the files axis absorbing the rest.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    blocks = 1
    while blocks * 2 <= n and n % (blocks * 2) == 0:
        blocks *= 2
    files = n // blocks
    grid = np.asarray(devices).reshape(files, blocks)
    return Mesh(grid, tuple(axis_names))
