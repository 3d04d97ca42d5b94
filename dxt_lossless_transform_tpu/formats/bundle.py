"""TransformBundle: per-format builders for the file-format layer.

Analog of the reference's ``TransformBundle<T>`` (``file-formats-api/src/bundle/mod.rs:37-188``):
holds an optional builder per texture format; ``default_all`` fills every slot with
manual-default builders. Where the reference carries BC3/BC7 as ``PhantomData``
placeholders, this build wires both for real (BC7 via the mode-aware transform).
"""

from __future__ import annotations

from typing import Optional, Union

from ..api import (
    Bc1AutoTransformBuilder, Bc1ManualTransformBuilder,
    Bc2AutoTransformBuilder, Bc2ManualTransformBuilder,
    Bc3AutoTransformBuilder, Bc3ManualTransformBuilder,
    Bc4AutoTransformBuilder, Bc4ManualTransformBuilder,
    Bc5AutoTransformBuilder, Bc5ManualTransformBuilder,
    Bc6hAutoTransformBuilder, Bc6hManualTransformBuilder,
    Bc7AutoTransformBuilder, Bc7ManualTransformBuilder,
    RgbManualTransformBuilder,
)
from .embed import TransformFormat, TransformHeader
from .errors import NoBuilderForFormat, UnsupportedTransformFormat

Bc1Builder = Union[Bc1AutoTransformBuilder, Bc1ManualTransformBuilder]
Bc2Builder = Union[Bc2AutoTransformBuilder, Bc2ManualTransformBuilder]
Bc3Builder = Union[Bc3AutoTransformBuilder, Bc3ManualTransformBuilder]


class TransformBundle:
    """Optional per-format builders; formats without a builder raise
    :class:`NoBuilderForFormat` on dispatch (``bundle/mod.rs:125-188``)."""

    def __init__(self, bc1: Optional[Bc1Builder] = None, bc2: Optional[Bc2Builder] = None,
                 bc3: Optional[Bc3Builder] = None, bc4=None, bc5=None, bc7=None,
                 bc6h=None, rgba8888=None, bgra8888=None, bgr888=None):
        self.bc1, self.bc2, self.bc3 = bc1, bc2, bc3
        self.bc4, self.bc5, self.bc7, self.bc6h = bc4, bc5, bc7, bc6h
        self.rgba8888, self.bgra8888, self.bgr888 = rgba8888, bgra8888, bgr888

    @staticmethod
    def default_all() -> "TransformBundle":
        """Manual default settings for every supported format (``bundle/mod.rs:180-187``)."""
        return TransformBundle(
            bc1=Bc1ManualTransformBuilder(),
            bc2=Bc2ManualTransformBuilder(),
            bc3=Bc3ManualTransformBuilder(),
            bc4=Bc4ManualTransformBuilder(),
            bc5=Bc5ManualTransformBuilder(),
            bc7=Bc7ManualTransformBuilder(),
            bc6h=Bc6hManualTransformBuilder(),
            rgba8888=RgbManualTransformBuilder("rgba8888"),
            bgra8888=RgbManualTransformBuilder("bgra8888"),
            bgr888=RgbManualTransformBuilder("bgr888"),
        )

    def dispatch_transform(self, fmt: TransformFormat, payload: bytes):
        """Transform ``payload`` with the format's builder.

        Returns ``(transformed_payload, TransformHeader)`` recording the recipe.
        """
        if fmt == TransformFormat.BC1:
            out, settings = self._run(self.bc1, fmt, payload)
            return out, TransformHeader.for_bc1(settings)
        if fmt == TransformFormat.BC2:
            out, settings = self._run(self.bc2, fmt, payload)
            return out, TransformHeader.for_bc2(settings)
        if fmt == TransformFormat.BC3:
            out, settings = self._run(self.bc3, fmt, payload)
            return out, TransformHeader.for_bc3(settings)
        if fmt == TransformFormat.BC4:
            out, settings = self._run(self.bc4, fmt, payload)
            return out, TransformHeader.for_bc4(settings)
        if fmt == TransformFormat.BC5:
            out, settings = self._run(self.bc5, fmt, payload)
            return out, TransformHeader.for_bc5(settings)
        if fmt == TransformFormat.BC7:
            out, settings = self._run(self.bc7, fmt, payload)
            return out, TransformHeader.for_bc7(settings)
        if fmt == TransformFormat.BC6H:
            out, settings = self._run(self.bc6h, fmt, payload)
            return out, TransformHeader.for_bc6h(settings)
        if fmt in (TransformFormat.RGBA8888, TransformFormat.BGRA8888,
                   TransformFormat.BGR888):
            builder = {TransformFormat.RGBA8888: self.rgba8888,
                       TransformFormat.BGRA8888: self.bgra8888,
                       TransformFormat.BGR888: self.bgr888}[fmt]
            out, settings = self._run(builder, fmt, payload)
            return out, TransformHeader.for_rgb(fmt, settings)
        raise UnsupportedTransformFormat(fmt)

    @staticmethod
    def _run(builder, fmt, payload):
        if builder is None:
            raise NoBuilderForFormat(fmt)
        if hasattr(builder, "get_settings"):  # manual builder
            return builder.transform(payload), builder.get_settings()
        out, manual = builder.transform(payload)  # auto builder
        return out, manual.get_settings()
