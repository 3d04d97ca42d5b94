"""Normalization-aware transforms and the maximal (settings x norm-modes) search.

Behavioral reference: ``bc1/src/experimental/normalize_blocks/transform.rs``
(``transform_bc1_with_normalize_blocks`` :65, ``transform_bc1_auto_with_normalization``
:222-280). Normalization is one-way preprocessing (visually lossless); untransform of
the result reproduces the *normalized* file byte-for-byte.

The reference allocates one buffer per ColorNormalizationMode (``FixedRawAllocArray``)
and loops settings x modes sequentially; here each normalized copy goes through the
same batched candidate search as the plain auto path, and the overall argmin wins.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ..estimate.base import SizeEstimation
from ..oracle import normalize as onorm
from ..settings import Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings
from . import auto as ops_auto, bc1 as ops_bc1, bc2 as ops_bc2, bc3 as ops_bc3

AlphaNormalizationMode = onorm.AlphaNormalizationMode
ColorNormalizationMode = onorm.ColorNormalizationMode


def transform_bc1_with_normalize_blocks(data, settings: Bc1TransformSettings,
                                        color_mode) -> bytes:
    """Normalize solid/transparent blocks, then transform."""
    return ops_bc1.transform(onorm.normalize_blocks_bc1(data, color_mode), settings)


def transform_bc2_with_normalize_blocks(data, settings: Bc2TransformSettings,
                                        color_mode) -> bytes:
    return ops_bc2.transform(onorm.normalize_blocks_bc2(data, color_mode), settings)


def transform_bc3_with_normalize_blocks(data, settings: Bc3TransformSettings,
                                        alpha_mode, color_mode) -> bytes:
    return ops_bc3.transform(
        onorm.normalize_blocks_bc3(data, alpha_mode, color_mode), settings)


def transform_bc1_auto_with_normalization(
        data, estimator: SizeEstimation, use_all_decorrelation_modes: bool = False,
        color_modes: Optional[Sequence] = None,
) -> Tuple[bytes, Bc1TransformSettings, "ColorNormalizationMode"]:
    """Search settings x normalization modes; returns (output, settings, mode).

    The untransform recipe is ``settings`` alone -- normalization needs no reversal
    (reference ``transform/settings.rs:14``).
    """
    modes = tuple(color_modes if color_modes is not None
                  else ColorNormalizationMode.all_values())
    best = None
    for mode in modes:
        normalized = onorm.normalize_blocks_bc1(data, mode)
        out, settings, score = _scored_auto(
            ops_auto.transform_bc1_auto, normalized, estimator,
            use_all_decorrelation_modes)
        if best is None or score < best[3]:
            best = (out, settings, mode, score)
    return best[0], best[1], best[2]


def transform_bc2_auto_with_normalization(
        data, estimator: SizeEstimation, use_all_decorrelation_modes: bool = False,
        color_modes: Optional[Sequence] = None,
) -> Tuple[bytes, Bc2TransformSettings, "ColorNormalizationMode"]:
    """BC2 search over settings x color normalization modes (bc2 analog of
    ``transform_bc1_auto_with_normalization``, bc2 experimental transform.rs)."""
    modes = tuple(color_modes if color_modes is not None
                  else ColorNormalizationMode.all_values())
    best = None
    for mode in modes:
        normalized = onorm.normalize_blocks_bc2(data, mode)
        out, settings, score = _scored_auto(
            ops_auto.transform_bc2_auto, normalized, estimator,
            use_all_decorrelation_modes, fmt="bc2")
        if best is None or score < best[3]:
            best = (out, settings, mode, score)
    return best[0], best[1], best[2]


def transform_bc3_auto_with_normalization(
        data, estimator: SizeEstimation, use_all_decorrelation_modes: bool = False,
        alpha_modes: Optional[Sequence] = None,
        color_modes: Optional[Sequence] = None,
):
    """BC3 maximal search over settings x alpha modes x color modes."""
    amodes = tuple(alpha_modes if alpha_modes is not None
                   else AlphaNormalizationMode.all_values())
    cmodes = tuple(color_modes if color_modes is not None
                   else ColorNormalizationMode.all_values())
    best = None
    for am in amodes:
        for cm in cmodes:
            normalized = onorm.normalize_blocks_bc3(data, am, cm)
            out, settings, score = _scored_auto(
                ops_auto.transform_bc3_auto, normalized, estimator,
                use_all_decorrelation_modes, fmt="bc3")
            if best is None or score < best[4]:
                best = (out, settings, am, cm, score)
    return best[0], best[1], best[2], best[3]


def _scored_auto(auto_fn, normalized: bytes, estimator, use_all, fmt: str = "bc1"):
    """Run the candidate search and score the winner's output for cross-mode
    comparison (different normalized inputs need a common yardstick: the estimator
    on the same regions the per-format search uses)."""
    out, settings = auto_fn(normalized, estimator, use_all)
    n = len(normalized)
    if fmt == "bc3":
        # alpha endpoints [0, 2B) + colours [8B, 12B) for B blocks (16 bytes each)
        blocks = n // 16
        score = (estimator.estimate(out[: 2 * blocks])
                 + estimator.estimate(out[8 * blocks:12 * blocks]))
    elif fmt == "bc2":
        # colours are 4B of 16B blocks, at offset n/2 in every BC2 layout
        score = estimator.estimate(out[n // 2: n // 2 + n // 4])
    else:
        score = estimator.estimate(out[: n // 2])  # colours half (BC1 layout)
    return out, settings, score
