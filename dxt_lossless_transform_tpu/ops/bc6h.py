"""BC6H device ops: the mode-aware transform machinery of :mod:`.bc7` with BC6H's
byte0 -> grouping-id map (see :mod:`..oracle.bc6h`).

Framework extension: the reference reserves 80 header bytes for BC6H
(``embed/mod.rs:97-103``) and implements nothing.
"""

from __future__ import annotations

import numpy as np

from ..oracle import bc6h as _oracle
from .. import runtime as _native
from ..settings import Bc6hTransformSettings
from . import bc7 as _machinery

BLOCK_SIZE = 16


def transform(data, settings: Bc6hTransformSettings = Bc6hTransformSettings()) -> bytes:
    return _machinery._transform_bytes(
        data, settings, "bc6h", _oracle,
        _native.bc6h_transform if hasattr(_native, "bc6h_transform") else None)


def untransform(data,
                settings: Bc6hTransformSettings = Bc6hTransformSettings()) -> bytes:
    return _machinery._untransform_bytes(
        data, settings, "bc6h", _oracle,
        _native.bc6h_untransform if hasattr(_native, "bc6h_untransform") else None)


def transform_bc6h_auto(data, estimator, use_all_decorrelation_modes: bool = False,
                        candidates=None):
    """Pick the mode-layout whose full transformed stream the estimator ranks
    smallest; identity is always a candidate. Large payloads with the LTU
    estimator run the whole search on device (see ``bc7._transform_auto``)."""
    from ..settings import BC6H_FAST_CANDIDATES

    cand = tuple(candidates) if candidates is not None else BC6H_FAST_CANDIDATES
    return _machinery._transform_auto(data, estimator, cand, "bc6h", transform)
