"""Convenience slice API + multi-handler dispatch.

Analog of ``file-formats-api/src/api.rs:38-223``: single-handler transform/untransform
over in-memory buffers, plus multi-handler variants that try handlers in order via
their detection hooks.
"""

from __future__ import annotations

from typing import Iterable, Optional

from .bundle import TransformBundle
from .errors import NoSupportedHandler
from .handlers import FileFormatHandler


def transform_slice_with_bundle(handler: FileFormatHandler, data: bytes,
                                bundle: TransformBundle) -> bytes:
    return handler.transform_bundle(data, bundle)


def untransform_slice(handler: FileFormatHandler, data: bytes) -> bytes:
    return handler.untransform(data)


def transform_slice_with_multiple_handlers(
        handlers: Iterable[FileFormatHandler], data: bytes, bundle: TransformBundle,
        file_extension: Optional[str] = None) -> bytes:
    """Try each handler's ``can_handle`` in order (``api.rs:120-171``)."""
    for h in handlers:
        can = getattr(h, "can_handle", None)
        if can is None or can(data, file_extension):
            return h.transform_bundle(data, bundle)
    raise NoSupportedHandler()


def untransform_slice_with_multiple_handlers(
        handlers: Iterable[FileFormatHandler], data: bytes,
        file_extension: Optional[str] = None) -> bytes:
    for h in handlers:
        can = getattr(h, "can_handle_untransform", None)
        if can is None or can(data, file_extension):
            return h.untransform(data)
    raise NoSupportedHandler()
