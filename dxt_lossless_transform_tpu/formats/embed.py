"""4-byte transform-header embedding.

On-disk format (behavioral reference ``file-formats-api/src/embed/mod.rs:37-122``):
a u32 little-endian word written over the container magic --

    bits 0-3:  transform format tag (u4; ids per ``embed/transform_format.rs:10-31``)
    bits 4-31: format-specific data (u28), fields packed from the low bits up

There is deliberately no magic: context must say "this buffer is transformed".

Per-format bitfields (within the 28-bit data field):

  BC1 / BC2 (``embed/formats/bc1.rs:34-56``, ``bc2.rs:30-51``):
    bits 0-1: header version (0 = initial)
    bit 2:    split colour endpoints
    bits 3-4: decorrelation variant (0=Variant1, 1=Variant2, 2=Variant3, 3=None)
    rest:     reserved (must be zero)

  BC3: the reference reserves a version-only header and leaves BC3 unwired through
  the file-format layer (``embed/formats/bc3.rs``, ``handlers/dispatch.rs:119-140``).
  This build wires BC3 fully; its version-0 bitfield extends the BC1 layout with a
  split-alpha bit:
    bits 0-1: header version (0)
    bit 2:    split colour endpoints
    bits 3-4: decorrelation variant (same encoding)
    bit 5:    split alpha endpoints
    rest:     reserved

  BC7 / BC6H (framework extensions; the reference reserves header space -- 48 and
  80 extra bytes, ``embed/mod.rs:97-103`` -- but ships no transform):
    bits 0-1: header version (0)
    bit 2:    sort blocks by mode (adds a packed mode stream before the payload)
    bit 3:    split byte planes
    rest:     reserved

  RGBA8888 / BGRA8888 / BGR888 (framework extension; the reference reserves the
  decorrelation flag at bit 2 -- ``embed/formats/rgba8888.rs`` bitfield -- but ships
  no transform; bit 3 takes the channel-split knob from the reserved space):
    bits 0-1: header version (0)
    bit 2:    decorrelate (r' = r - g, b' = b - g mod 256)
    bit 3:    split channels into planes
    rest:     reserved
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from .. import endian
from ..settings import (
    Bc1TransformSettings,
    Bc2TransformSettings,
    Bc3TransformSettings,
    Bc4TransformSettings,
    Bc5TransformSettings,
    Bc6hTransformSettings,
    Bc7TransformSettings,
    RgbTransformSettings,
    YCoCgVariant,
)
from .errors import CorruptedEmbeddedData, UnknownTransformFormat

TRANSFORM_HEADER_SIZE = 4
BC7_ADDITIONAL_SPACE = 48
BC6H_ADDITIONAL_SPACE = 80


class TransformFormat(enum.IntEnum):
    """u4 format tags (``embed/transform_format.rs:10-31``)."""

    BC1 = 0x00
    BC2 = 0x01
    BC3 = 0x02
    BC7 = 0x03
    BC6H = 0x04
    RGBA8888 = 0x05
    BGRA8888 = 0x06
    BGR888 = 0x07
    BC4 = 0x08
    BC5 = 0x09


# YCoCgVariant <-> packed 2-bit representation (bc1.rs:59-80; NOT the enum values)
_VARIANT_TO_BITS = {
    YCoCgVariant.VARIANT1: 0,
    YCoCgVariant.VARIANT2: 1,
    YCoCgVariant.VARIANT3: 2,
    YCoCgVariant.NONE: 3,
}
_BITS_TO_VARIANT = {v: k for k, v in _VARIANT_TO_BITS.items()}


def _pack_bc1_like(settings) -> int:
    return ((0)  # version
            | (int(settings.split_colour_endpoints) << 2)
            | (_VARIANT_TO_BITS[YCoCgVariant(settings.decorrelation_mode)] << 3))


def _unpack_bc1_like(data: int):
    if data & 0x3:
        raise CorruptedEmbeddedData(f"unsupported header version {data & 0x3}")
    variant = _BITS_TO_VARIANT[(data >> 3) & 0x3]
    return variant, bool((data >> 2) & 1)


@dataclass(frozen=True)
class TransformHeader:
    """A parsed 4-byte transform header."""

    format: TransformFormat
    data: int  # 28-bit format-specific field

    def to_bytes(self) -> bytes:
        # LE pin point (embed/mod.rs:159): routed through the endian layer so the
        # debug-endian harness executes the BE-host form of this exact write.
        return endian.pack_u32((int(self.format) & 0xF)
                               | ((self.data & 0x0FFFFFFF) << 4))

    @staticmethod
    def from_bytes(raw: bytes) -> "TransformHeader":
        if len(raw) < TRANSFORM_HEADER_SIZE:
            raise UnknownTransformFormat(raw)
        word = endian.unpack_u32(raw)  # LE pin point (embed/mod.rs:147)
        tag = word & 0xF
        try:
            fmt = TransformFormat(tag)
        except ValueError:
            raise UnknownTransformFormat(tag) from None
        return TransformHeader(fmt, word >> 4)

    # --- per-format constructors / accessors -----------------------------------------

    @staticmethod
    def for_bc1(settings: Bc1TransformSettings) -> "TransformHeader":
        return TransformHeader(TransformFormat.BC1, _pack_bc1_like(settings))

    @staticmethod
    def for_bc2(settings: Bc2TransformSettings) -> "TransformHeader":
        return TransformHeader(TransformFormat.BC2, _pack_bc1_like(settings))

    @staticmethod
    def for_bc3(settings: Bc3TransformSettings) -> "TransformHeader":
        data = _pack_bc1_like(settings) | (int(settings.split_alpha_endpoints) << 5)
        return TransformHeader(TransformFormat.BC3, data)

    def bc1_settings(self) -> Bc1TransformSettings:
        variant, split = _unpack_bc1_like(self.data)
        return Bc1TransformSettings(variant, split)

    def bc2_settings(self) -> Bc2TransformSettings:
        variant, split = _unpack_bc1_like(self.data)
        return Bc2TransformSettings(variant, split)

    def bc3_settings(self) -> Bc3TransformSettings:
        variant, split_colour = _unpack_bc1_like(self.data)
        return Bc3TransformSettings(variant, bool((self.data >> 5) & 1), split_colour)

    # BC4/BC5 (framework extension; version 2 bits + split-endpoints bit 2)

    @staticmethod
    def for_bc4(settings: Bc4TransformSettings) -> "TransformHeader":
        return TransformHeader(TransformFormat.BC4, int(settings.split_endpoints) << 2)

    @staticmethod
    def for_bc5(settings: Bc5TransformSettings) -> "TransformHeader":
        return TransformHeader(TransformFormat.BC5, int(settings.split_endpoints) << 2)

    def bc4_settings(self) -> Bc4TransformSettings:
        if self.data & 0x3:
            raise CorruptedEmbeddedData(f"unsupported BC4 header version {self.data & 0x3}")
        return Bc4TransformSettings(bool((self.data >> 2) & 1))

    def bc5_settings(self) -> Bc5TransformSettings:
        if self.data & 0x3:
            raise CorruptedEmbeddedData(f"unsupported BC5 header version {self.data & 0x3}")
        return Bc5TransformSettings(bool((self.data >> 2) & 1))

    # BC7 (framework extension; version 2 bits + sort-by-mode bit 2 + plane-split bit 3)

    @staticmethod
    def for_bc7(settings: Bc7TransformSettings) -> "TransformHeader":
        data = (int(settings.sort_by_mode) << 2) | (int(settings.split_byte_planes) << 3)
        return TransformHeader(TransformFormat.BC7, data)

    def bc7_settings(self) -> Bc7TransformSettings:
        if self.data & 0x3:
            raise CorruptedEmbeddedData(f"unsupported BC7 header version {self.data & 0x3}")
        return Bc7TransformSettings(bool((self.data >> 2) & 1), bool((self.data >> 3) & 1))

    @staticmethod
    def for_bc6h(settings: Bc6hTransformSettings) -> "TransformHeader":
        data = (int(settings.sort_by_mode) << 2) | (int(settings.split_byte_planes) << 3)
        return TransformHeader(TransformFormat.BC6H, data)

    def bc6h_settings(self) -> Bc6hTransformSettings:
        if self.data & 0x3:
            raise CorruptedEmbeddedData(
                f"unsupported BC6H header version {self.data & 0x3}")
        return Bc6hTransformSettings(bool((self.data >> 2) & 1),
                                     bool((self.data >> 3) & 1))

    # Uncompressed RGB(A) formats (framework extension; the reference reserves the
    # decorrelation bit -- rgba8888.rs -- without implementing the transform)

    @staticmethod
    def for_rgb(fmt: "TransformFormat", settings: RgbTransformSettings) -> "TransformHeader":
        if fmt not in (TransformFormat.RGBA8888, TransformFormat.BGRA8888,
                       TransformFormat.BGR888):
            raise UnknownTransformFormat(fmt)
        data = (int(settings.decorrelate) << 2) | (int(settings.split_channels) << 3)
        return TransformHeader(fmt, data)

    def rgb_settings(self) -> RgbTransformSettings:
        if self.data & 0x3:
            raise CorruptedEmbeddedData(
                f"unsupported RGB header version {self.data & 0x3}")
        return RgbTransformSettings(bool((self.data >> 2) & 1), bool((self.data >> 3) & 1))
