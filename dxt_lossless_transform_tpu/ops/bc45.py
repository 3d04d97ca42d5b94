"""BC4/BC5 transform API (framework extension; see :mod:`..oracle.bc4`).

These transforms are pure stream permutations with no lane arithmetic, so the
vectorized numpy implementation already runs at memory speed; the device path is
reserved for a future Pallas kernel if profiling ever warrants it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..estimate.base import SizeEstimation
from ..oracle import bc4 as _oracle
from ..settings import Bc4TransformSettings, Bc5TransformSettings

BC4_BLOCK_SIZE = _oracle.BC4_BLOCK_SIZE
BC5_BLOCK_SIZE = _oracle.BC5_BLOCK_SIZE

transform_bc4 = _oracle.transform_bc4
untransform_bc4 = _oracle.untransform_bc4
transform_bc5 = _oracle.transform_bc5
untransform_bc5 = _oracle.untransform_bc5


def transform_bc4_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc4TransformSettings]] = None
                       ) -> Tuple[bytes, Bc4TransformSettings]:
    """Pick the endpoint layout whose stream the estimator ranks smallest."""
    cand = tuple(candidates if candidates is not None
                 else Bc4TransformSettings.all_combinations())
    n = len(data) // BC4_BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    ep = np.frombuffer(data, "<u2").reshape(-1, 4)[:, 0].copy()
    rows = [_oracle._ep_streams(ep, c.split_endpoints) for c in cand]
    best = cand[int(np.argmin(estimator.estimate_batch(rows)))]
    return transform_bc4(data, best), best


def transform_bc5_auto(data, estimator: SizeEstimation,
                       use_all_decorrelation_modes: bool = False,
                       candidates: Optional[Sequence[Bc5TransformSettings]] = None
                       ) -> Tuple[bytes, Bc5TransformSettings]:
    cand = tuple(candidates if candidates is not None
                 else Bc5TransformSettings.all_combinations())
    n = len(data) // BC5_BLOCK_SIZE
    if n == 0:
        return b"", cand[-1]
    halves = np.frombuffer(data, "<u2").reshape(-1, 8)
    r_ep, g_ep = halves[:, 0].copy(), halves[:, 4].copy()
    rows = [_oracle._ep_streams(r_ep, c.split_endpoints)
            + _oracle._ep_streams(g_ep, c.split_endpoints) for c in cand]
    best = cand[int(np.argmin(estimator.estimate_batch(rows)))]
    return transform_bc5(data, best), best
