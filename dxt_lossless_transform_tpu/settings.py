"""Transform settings types shared across the whole stack.

Mirrors the behavior of the reference's settings structs
(``dxt-lossless-transform-bc1/src/transform/settings.rs:16-98``,
``bc2/src/transform/settings.rs:17-28``, ``bc3/src/transform/settings.rs:16-48``)
with the same candidate test orders and defaults, re-expressed as plain Python
dataclasses usable both on the host and as static arguments to jitted device ops.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Iterator, Tuple


class YCoCgVariant(enum.IntEnum):
    """YCoCg-R decorrelation variant.

    The three variants differ only in where the transformed 5-bit fields and the
    preserved green low bit are placed within the 16-bit lane; compression differences
    between them are negligible on real files (reference:
    ``common/src/color_565/decorrelate.rs:74-84``). Values match the reference enum.
    """

    NONE = 0
    VARIANT1 = 1
    VARIANT2 = 2
    VARIANT3 = 3

    @property
    def is_none(self) -> bool:
        return self is YCoCgVariant.NONE


@dataclass(frozen=True)
class Bc1TransformSettings:
    """Settings for the BC1 transform.

    Reference: ``bc1/src/transform/settings.rs`` -- two knobs:
    decorrelation variant and whether the colour endpoints are split into two
    separate c0/c1 streams. Default (YCoCg1 + split) is the most common optimum
    (71.1% of a 2,130-file corpus; ``transform_auto.rs:108-116``).
    """

    decorrelation_mode: YCoCgVariant = YCoCgVariant.VARIANT1
    split_colour_endpoints: bool = True

    @staticmethod
    def all_combinations() -> Iterator["Bc1TransformSettings"]:
        for mode in YCoCgVariant:
            for split in (True, False):
                yield Bc1TransformSettings(mode, split)


@dataclass(frozen=True)
class Bc2TransformSettings:
    """Settings for the BC2 transform (same shape as BC1; alpha bytes are moved to
    their own stream but never themselves transformed).

    Reference: ``bc2/src/transform/settings.rs:17-28``.
    """

    decorrelation_mode: YCoCgVariant = YCoCgVariant.VARIANT1
    split_colour_endpoints: bool = True

    @staticmethod
    def all_combinations() -> Iterator["Bc2TransformSettings"]:
        for mode in YCoCgVariant:
            for split in (True, False):
                yield Bc2TransformSettings(mode, split)


@dataclass(frozen=True)
class Bc3TransformSettings:
    """Settings for the BC3 transform: three knobs -> 8 stream-layout families.

    Reference: ``bc3/src/transform/settings.rs:16-48``.
    """

    decorrelation_mode: YCoCgVariant = YCoCgVariant.VARIANT1
    split_alpha_endpoints: bool = False
    split_colour_endpoints: bool = False

    @staticmethod
    def all_combinations() -> Iterator["Bc3TransformSettings"]:
        for mode in YCoCgVariant:
            for split_a in (True, False):
                for split_c in (True, False):
                    yield Bc3TransformSettings(mode, split_a, split_c)


@dataclass(frozen=True)
class Bc4TransformSettings:
    """Settings for the BC4 transform (this framework's extension; the reference only
    reserves the format tag). One knob: split the u8 endpoint pair into two streams."""

    split_endpoints: bool = True

    @staticmethod
    def all_combinations() -> Iterator["Bc4TransformSettings"]:
        for split in (True, False):
            yield Bc4TransformSettings(split)


@dataclass(frozen=True)
class Bc5TransformSettings:
    """Settings for the BC5 transform (framework extension; two BC4 channels)."""

    split_endpoints: bool = True

    @staticmethod
    def all_combinations() -> Iterator["Bc5TransformSettings"]:
        for split in (True, False):
            yield Bc5TransformSettings(split)


@dataclass(frozen=True)
class Bc7TransformSettings:
    """Settings for the BC7 mode-aware transform (this framework's extension).

    The reference stubs BC7 (``bc7/src/lib.rs:8-13`` carries only MSB bit helpers) but
    reserves header space for a real transform (``embed/mod.rs:97-103``). This build
    implements one, TPU-first: BC7 blocks are 16 bytes whose field layout depends
    entirely on the block *mode* (unary prefix in the low bits of byte 0), so:

    - ``sort_by_mode``: stable-sort the blocks by mode id (XLA argsort + gather) so
      same-layout blocks become contiguous; a packed 4-bit mode stream is prepended so
      the inverse can rebuild the permutation. Expands the payload by
      ``ceil(N/2)`` bytes (which the downstream LZ wins back on mixed-mode files).
    - ``split_byte_planes``: transpose the (N, 16) block bytes to byte-plane-major
      (16, N) so each output run holds the *same field byte* of many blocks.

    Both knobs compose; (False, False) is the identity transform.
    """

    sort_by_mode: bool = True
    split_byte_planes: bool = True

    @staticmethod
    def all_combinations() -> Iterator["Bc7TransformSettings"]:
        for sort in (True, False):
            for planes in (True, False):
                yield Bc7TransformSettings(sort, planes)


# Candidate test orders for the auto-search, matching the reference's measured
# probability orderings (most likely LAST -- the reference keeps this ordering to avoid
# a redundant final CPU re-transform; our batched device search evaluates all candidates
# at once and only materializes the winner, but we keep the same candidate *sets*).
# Reference: bc1 settings.rs:81-98, bc3 settings.rs:91-121.

BC1_FAST_CANDIDATES: Tuple[Bc1TransformSettings, ...] = (
    Bc1TransformSettings(YCoCgVariant.NONE, False),
    Bc1TransformSettings(YCoCgVariant.NONE, True),
    Bc1TransformSettings(YCoCgVariant.VARIANT1, False),
    Bc1TransformSettings(YCoCgVariant.VARIANT1, True),
)

BC1_COMPREHENSIVE_CANDIDATES: Tuple[Bc1TransformSettings, ...] = (
    Bc1TransformSettings(YCoCgVariant.VARIANT2, False),
    Bc1TransformSettings(YCoCgVariant.NONE, False),
    Bc1TransformSettings(YCoCgVariant.NONE, True),
    Bc1TransformSettings(YCoCgVariant.VARIANT3, False),
    Bc1TransformSettings(YCoCgVariant.VARIANT3, True),
    Bc1TransformSettings(YCoCgVariant.VARIANT2, True),
    Bc1TransformSettings(YCoCgVariant.VARIANT1, False),
    Bc1TransformSettings(YCoCgVariant.VARIANT1, True),
)

BC2_FAST_CANDIDATES: Tuple[Bc2TransformSettings, ...] = (
    Bc2TransformSettings(YCoCgVariant.NONE, False),
    Bc2TransformSettings(YCoCgVariant.NONE, True),
    Bc2TransformSettings(YCoCgVariant.VARIANT1, False),
    Bc2TransformSettings(YCoCgVariant.VARIANT1, True),
)

BC2_COMPREHENSIVE_CANDIDATES: Tuple[Bc2TransformSettings, ...] = (
    Bc2TransformSettings(YCoCgVariant.VARIANT2, False),
    Bc2TransformSettings(YCoCgVariant.NONE, False),
    Bc2TransformSettings(YCoCgVariant.NONE, True),
    Bc2TransformSettings(YCoCgVariant.VARIANT3, False),
    Bc2TransformSettings(YCoCgVariant.VARIANT3, True),
    Bc2TransformSettings(YCoCgVariant.VARIANT2, True),
    Bc2TransformSettings(YCoCgVariant.VARIANT1, False),
    Bc2TransformSettings(YCoCgVariant.VARIANT1, True),
)

# (variant, split_alpha_endpoints, split_colour_endpoints); reference bc3 settings.rs:91-121
BC3_FAST_CANDIDATES: Tuple[Bc3TransformSettings, ...] = tuple(
    Bc3TransformSettings(m, sa, sc)
    for (m, sa, sc) in (
        (YCoCgVariant.VARIANT1, True, False),
        (YCoCgVariant.VARIANT1, True, True),
        (YCoCgVariant.NONE, True, False),
        (YCoCgVariant.NONE, False, True),
        (YCoCgVariant.NONE, True, True),
        (YCoCgVariant.VARIANT1, False, True),
        (YCoCgVariant.NONE, False, False),
        (YCoCgVariant.VARIANT1, False, False),
    )
)

BC3_COMPREHENSIVE_CANDIDATES: Tuple[Bc3TransformSettings, ...] = tuple(
    Bc3TransformSettings(m, sa, sc)
    for (m, sa, sc) in (
        (YCoCgVariant.VARIANT2, True, False),
        (YCoCgVariant.VARIANT2, True, True),
        (YCoCgVariant.VARIANT3, True, True),
        (YCoCgVariant.VARIANT3, True, False),
        (YCoCgVariant.VARIANT1, True, False),
        (YCoCgVariant.VARIANT3, False, True),
        (YCoCgVariant.VARIANT1, True, True),
        (YCoCgVariant.VARIANT2, False, True),
        (YCoCgVariant.VARIANT2, False, False),
        (YCoCgVariant.VARIANT3, False, False),
        (YCoCgVariant.NONE, True, False),
        (YCoCgVariant.NONE, False, True),
        (YCoCgVariant.NONE, True, True),
        (YCoCgVariant.VARIANT1, False, True),
        (YCoCgVariant.NONE, False, False),
        (YCoCgVariant.VARIANT1, False, False),
    )
)

# BC7 candidates (framework extension; the reference has no BC7 transform to order
# by measured frequency). Identity first, the full mode-aware layout last -- the most
# likely winner on real encoder output, where modes run in streaks.
BC7_FAST_CANDIDATES: Tuple[Bc7TransformSettings, ...] = (
    Bc7TransformSettings(False, False),
    Bc7TransformSettings(True, False),
    Bc7TransformSettings(False, True),
    Bc7TransformSettings(True, True),
)

BC7_COMPREHENSIVE_CANDIDATES: Tuple[Bc7TransformSettings, ...] = BC7_FAST_CANDIDATES


@dataclass(frozen=True)
class RgbTransformSettings:
    """Settings for uncompressed RGBA8888 / BGRA8888 / BGR888 transforms (framework
    extension; the reference reserves a decorrelation header flag for these formats
    -- ``embed/formats/rgba8888.rs`` -- but ships no transform).

    - ``decorrelate``: reversible r' = r - g, b' = b - g (mod 256) lifting transform.
    - ``split_channels``: de-interleave pixels into per-channel planes.
    """

    decorrelate: bool = True
    split_channels: bool = True

    @staticmethod
    def all_combinations() -> Iterator["RgbTransformSettings"]:
        for dec in (True, False):
            for split in (True, False):
                yield RgbTransformSettings(dec, split)


# RGB candidates: identity first, the full planar+decorrelated layout last.
RGB_FAST_CANDIDATES: Tuple[RgbTransformSettings, ...] = (
    RgbTransformSettings(False, False),
    RgbTransformSettings(True, False),
    RgbTransformSettings(False, True),
    RgbTransformSettings(True, True),
)


@dataclass(frozen=True)
class Bc6hTransformSettings:
    """Settings for the BC6H mode-aware transform (framework extension; the reference
    reserves 80 header bytes for BC6H -- ``embed/mod.rs:97-103`` -- and ships
    nothing). Same two knobs as :class:`Bc7TransformSettings`; the mode-id map
    differs (see ``oracle/bc6h.py``)."""

    sort_by_mode: bool = True
    split_byte_planes: bool = True

    @staticmethod
    def all_combinations() -> Iterator["Bc6hTransformSettings"]:
        for sort in (True, False):
            for planes in (True, False):
                yield Bc6hTransformSettings(sort, planes)


BC6H_FAST_CANDIDATES: Tuple[Bc6hTransformSettings, ...] = (
    Bc6hTransformSettings(False, False),
    Bc6hTransformSettings(True, False),
    Bc6hTransformSettings(False, True),
    Bc6hTransformSettings(True, True),
)
