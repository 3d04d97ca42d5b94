"""Shared integer entropy table G[n] = floor(n * log2(n) + 0.5), n <= 65536.

numpy-only on purpose: the native runtime loader installs this table into the
C++ scorer at load time (host-authoritative twin equality; see
``runtime/__init__.py``) and must not drag the jax stack in -- the loader's
contract is to degrade gracefully in minimal native-only environments. The
scorer itself documents the term in :mod:`.ltu`, which re-exports these names.
"""

from __future__ import annotations

import numpy as np

ENTROPY_CAP = 65536


def _make_g_table() -> np.ndarray:
    g = np.zeros(ENTROPY_CAP + 1, np.int64)
    n = np.arange(2, ENTROPY_CAP + 1, dtype=np.float64)
    g[2:] = np.floor(n * np.log2(n) + 0.5).astype(np.int64)
    return g


G_TABLE = _make_g_table()
