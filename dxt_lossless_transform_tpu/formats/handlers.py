"""File-format handler protocol, transform dispatch, and the DDS handler.

Behavioral references:
- handler traits: ``file-formats-api/src/handlers/file_format_handler.rs:326-391``
- untransform dispatch + alignment validation: ``handlers/dispatch.rs:39-141``
- DDS handler flow: ``dxt-lossless-transform-dds/src/handler/file_format_handler.rs:15-135``
"""

from __future__ import annotations

from typing import Optional, Protocol, runtime_checkable

from ..ops import bc1 as ops_bc1, bc2 as ops_bc2, bc3 as ops_bc3, bc45 as ops_bc45, \
    bc6h as ops_bc6h, bc7 as ops_bc7, rgb as ops_rgb
from ..oracle import bc7 as oracle_bc7
from .bundle import TransformBundle
from .dds import DDS_MAGIC, DdsFormat, likely_dds, parse_dds, parse_dds_ignore_magic
from .embed import TRANSFORM_HEADER_SIZE, TransformFormat, TransformHeader
from .errors import (
    InputTooShort,
    InputTooShortForStatedTextureSize,
    InvalidDataAlignment,
    InvalidInputFileHeader,
    InvalidRestoredFileHeader,
    OutputSizeMismatch,
    UnsupportedTransformFormat,
)

_ALIGNMENT = {TransformFormat.BC1: 8, TransformFormat.BC2: 16, TransformFormat.BC3: 16,
              TransformFormat.BC4: 8, TransformFormat.BC5: 16, TransformFormat.BC7: 16,
              TransformFormat.BC6H: 16,
              TransformFormat.RGBA8888: 4, TransformFormat.BGRA8888: 4,
              TransformFormat.BGR888: 3}

_RGB_LAYOUT = {TransformFormat.RGBA8888: "rgba8888",
               TransformFormat.BGRA8888: "bgra8888",
               TransformFormat.BGR888: "bgr888"}


def dispatch_transform(fmt: TransformFormat, payload: bytes, bundle: TransformBundle):
    """Validate alignment and run the bundle's builder; returns (payload', header)."""
    div = _ALIGNMENT.get(fmt)
    if div is not None and len(payload) % div:
        raise InvalidDataAlignment(len(payload), div)
    return bundle.dispatch_transform(fmt, payload)


def transformed_payload_len(header: TransformHeader, original_len: int) -> int:
    """Transformed-payload size for an ``original_len``-byte texture.

    Every transform except BC7-with-mode-sort is size-preserving; BC7 prepends a
    packed 4-bit mode stream (see :mod:`..oracle.bc7`)."""
    if header.format == TransformFormat.BC7:
        return oracle_bc7.transformed_len(original_len, header.bc7_settings())
    if header.format == TransformFormat.BC6H:
        return oracle_bc7.transformed_len(original_len, header.bc6h_settings())
    return original_len


def dispatch_untransform(header: TransformHeader, payload: bytes) -> bytes:
    """Decode settings from the header and run the core untransform
    (``handlers/dispatch.rs:39-141``)."""
    if header.format in (TransformFormat.BC7, TransformFormat.BC6H):
        is_bc7 = header.format == TransformFormat.BC7
        settings = header.bc7_settings() if is_bc7 else header.bc6h_settings()
        try:
            oracle_bc7.original_len(len(payload), settings)
        except ValueError:
            raise InvalidDataAlignment(len(payload), _ALIGNMENT[header.format]) \
                from None
        return (ops_bc7 if is_bc7 else ops_bc6h).untransform(payload, settings)
    div = _ALIGNMENT.get(header.format)
    if div is not None and len(payload) % div:
        raise InvalidDataAlignment(len(payload), div)
    if header.format == TransformFormat.BC1:
        return ops_bc1.untransform(payload, header.bc1_settings())
    if header.format == TransformFormat.BC2:
        return ops_bc2.untransform(payload, header.bc2_settings())
    if header.format == TransformFormat.BC3:
        return ops_bc3.untransform(payload, header.bc3_settings())
    if header.format == TransformFormat.BC4:
        return ops_bc45.untransform_bc4(payload, header.bc4_settings())
    if header.format == TransformFormat.BC5:
        return ops_bc45.untransform_bc5(payload, header.bc5_settings())
    if header.format in _RGB_LAYOUT:
        return ops_rgb.untransform(payload, _RGB_LAYOUT[header.format],
                                   header.rgb_settings())
    raise UnsupportedTransformFormat(header.format)


@runtime_checkable
class FileFormatHandler(Protocol):
    """A container-format handler: carve out the payload, transform/untransform it,
    and embed/read the 4-byte recipe header."""

    def transform_bundle(self, data: bytes, bundle: TransformBundle) -> bytes: ...
    def untransform(self, data: bytes) -> bytes: ...


class FileFormatDetection(Protocol):
    def can_handle(self, data: bytes, file_extension: Optional[str] = None) -> bool: ...


class FileFormatUntransformDetection(Protocol):
    def can_handle_untransform(self, data: bytes,
                               file_extension: Optional[str] = None) -> bool: ...


_DDS_TO_TRANSFORM = {
    DdsFormat.BC1: TransformFormat.BC1,
    DdsFormat.BC2: TransformFormat.BC2,
    DdsFormat.BC3: TransformFormat.BC3,
    DdsFormat.BC7: TransformFormat.BC7,
    DdsFormat.BC6H: TransformFormat.BC6H,
    DdsFormat.BC4: TransformFormat.BC4,
    DdsFormat.BC5: TransformFormat.BC5,
    DdsFormat.RGBA8888: TransformFormat.RGBA8888,
    DdsFormat.BGRA8888: TransformFormat.BGRA8888,
    DdsFormat.BGR888: TransformFormat.BGR888,
}


class DdsHandler:
    """DDS container handler.

    Transform: copy headers verbatim, transform only the texture payload (all mips in
    one call), copy trailing bytes verbatim, then write the transform header OVER the
    DDS magic. Untransform: read the header from the first 4 bytes, re-parse ignoring
    the magic, restore ``DDS ``, and invert the payload.
    """

    def transform_bundle(self, data: bytes, bundle: TransformBundle) -> bytes:
        info = parse_dds(data)
        if info is None:
            raise InvalidInputFileHeader("not a parseable DDS file")
        fmt = _DDS_TO_TRANSFORM.get(info.format)
        if fmt is None:
            raise InvalidInputFileHeader(f"unsupported DDS format {info.format}")
        start, end = info.data_offset, info.data_offset + info.data_length
        if len(data) < end:
            raise InputTooShortForStatedTextureSize(end, len(data))
        payload, header = dispatch_transform(fmt, data[start:end], bundle)
        out = header.to_bytes() + data[TRANSFORM_HEADER_SIZE:start] + payload + data[end:]
        # Size-preserving except BC7's mode stream (transformed_payload_len).
        expected = (len(data) + transformed_payload_len(header, end - start)
                    - (end - start))
        if len(out) != expected:
            raise OutputSizeMismatch(expected, len(out))
        return out

    def untransform(self, data: bytes) -> bytes:
        if len(data) < TRANSFORM_HEADER_SIZE:
            raise InputTooShort(TRANSFORM_HEADER_SIZE, len(data))
        header = TransformHeader.from_bytes(data)
        info = parse_dds_ignore_magic(data)
        if info is None:
            raise InvalidRestoredFileHeader("not a parseable (transformed) DDS file")
        start = info.data_offset
        end = start + transformed_payload_len(header, info.data_length)
        if len(data) < end:
            raise InputTooShortForStatedTextureSize(end, len(data))
        payload = dispatch_untransform(header, data[start:end])
        magic = DDS_MAGIC.to_bytes(4, "little")
        return magic + data[4:start] + payload + data[end:]

    # Detection (``handler/file_format_detection.rs:7-17``,
    # ``file_format_untransform_detection.rs:7-21``)

    def can_handle(self, data: bytes, file_extension: Optional[str] = None) -> bool:
        return likely_dds(data)

    def can_handle_untransform(self, data: bytes,
                               file_extension: Optional[str] = None) -> bool:
        if len(data) < TRANSFORM_HEADER_SIZE:
            return False
        try:
            TransformHeader.from_bytes(data)
        except Exception:
            return False
        return parse_dds_ignore_magic(data) is not None
