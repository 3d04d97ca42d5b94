"""Stable per-format builder API.

Analog of the reference's L2 API crates (``bc1-api/src/transform/auto_transform_builder.rs:36-141``,
``manual_transform_builder.rs:18-144``): an auto builder that searches for the best
settings with a pluggable estimator and hands back the untransform recipe as a manual
builder, plus manual builders for explicit settings. Unlike the reference (whose
bc3-api/bc7-api crates are empty stubs), BC3 gets the full builder surface here.
"""

from __future__ import annotations

from typing import Generic, Optional, TypeVar

from .estimate.base import NoEstimation, SizeEstimation
from .ops import auto as ops_auto, bc1 as ops_bc1, bc2 as ops_bc2, bc3 as ops_bc3, bc45 as ops_bc45
from .settings import (
    Bc1TransformSettings,
    Bc2TransformSettings,
    Bc3TransformSettings,
    YCoCgVariant,
)

E = TypeVar("E", bound=SizeEstimation)


class _AutoBuilderBase(Generic[E]):
    _auto_fn = None
    _manual_cls = None

    def __init__(self, estimator: Optional[SizeEstimation] = None):
        self._estimator = estimator if estimator is not None else NoEstimation()
        self._use_all = False

    @classmethod
    def new_ultra(cls, estimator: SizeEstimation):
        """Like the reference's ``new_ultra``: brute-force every decorrelation mode
        (<0.1% size gain over fast mode; ``transform_auto.rs:60-62``)."""
        b = cls(estimator)
        b._use_all = True
        return b

    def use_all_decorrelation_modes(self, flag: bool):
        self._use_all = bool(flag)
        return self

    def transform(self, data: bytes):
        """Search, transform, and return ``(transformed, manual_builder)`` where the
        manual builder is the untransform recipe."""
        out, settings = type(self)._auto_fn(data, self._estimator, self._use_all)
        return out, type(self)._manual_cls(settings)


class _ManualBuilderBase:
    _settings_cls = None
    _transform = None
    _untransform = None

    def __init__(self, settings=None):
        self._settings = settings if settings is not None else type(self)._settings_cls()

    def decorrelation_mode(self, variant: YCoCgVariant):
        self._settings = type(self._settings)(**{**self._settings.__dict__,
                                                 "decorrelation_mode": YCoCgVariant(variant)})
        return self

    def split_colour_endpoints(self, flag: bool):
        self._settings = type(self._settings)(**{**self._settings.__dict__,
                                                 "split_colour_endpoints": bool(flag)})
        return self

    def get_settings(self):
        return self._settings

    def transform(self, data: bytes) -> bytes:
        return type(self)._transform(data, self._settings)

    def untransform(self, data: bytes) -> bytes:
        return type(self)._untransform(data, self._settings)


class Bc1ManualTransformBuilder(_ManualBuilderBase):
    _settings_cls = Bc1TransformSettings
    _transform = staticmethod(ops_bc1.transform)
    _untransform = staticmethod(ops_bc1.untransform)


class Bc1AutoTransformBuilder(_AutoBuilderBase):
    _auto_fn = staticmethod(ops_auto.transform_bc1_auto)
    _manual_cls = Bc1ManualTransformBuilder


class Bc2ManualTransformBuilder(_ManualBuilderBase):
    _settings_cls = Bc2TransformSettings
    _transform = staticmethod(ops_bc2.transform)
    _untransform = staticmethod(ops_bc2.untransform)


class Bc2AutoTransformBuilder(_AutoBuilderBase):
    _auto_fn = staticmethod(ops_auto.transform_bc2_auto)
    _manual_cls = Bc2ManualTransformBuilder


class Bc3ManualTransformBuilder(_ManualBuilderBase):
    _settings_cls = Bc3TransformSettings
    _transform = staticmethod(ops_bc3.transform)
    _untransform = staticmethod(ops_bc3.untransform)

    def split_alpha_endpoints(self, flag: bool):
        self._settings = Bc3TransformSettings(
            self._settings.decorrelation_mode, bool(flag),
            self._settings.split_colour_endpoints)
        return self


class Bc3AutoTransformBuilder(_AutoBuilderBase):
    _auto_fn = staticmethod(ops_auto.transform_bc3_auto)
    _manual_cls = Bc3ManualTransformBuilder


class Bc4ManualTransformBuilder:
    """Manual BC4 builder (framework extension; no reference analog)."""

    def __init__(self, settings=None):
        from .settings import Bc4TransformSettings

        self._settings = settings if settings is not None else Bc4TransformSettings()

    def split_endpoints(self, flag: bool):
        from .settings import Bc4TransformSettings

        self._settings = Bc4TransformSettings(bool(flag))
        return self

    def get_settings(self):
        return self._settings

    def transform(self, data: bytes) -> bytes:
        return ops_bc45.transform_bc4(data, self._settings)

    def untransform(self, data: bytes) -> bytes:
        return ops_bc45.untransform_bc4(data, self._settings)


class Bc4AutoTransformBuilder(_AutoBuilderBase):
    _auto_fn = staticmethod(ops_bc45.transform_bc4_auto)
    _manual_cls = Bc4ManualTransformBuilder


class Bc5ManualTransformBuilder:
    """Manual BC5 builder (framework extension)."""

    def __init__(self, settings=None):
        from .settings import Bc5TransformSettings

        self._settings = settings if settings is not None else Bc5TransformSettings()

    def split_endpoints(self, flag: bool):
        from .settings import Bc5TransformSettings

        self._settings = Bc5TransformSettings(bool(flag))
        return self

    def get_settings(self):
        return self._settings

    def transform(self, data: bytes) -> bytes:
        return ops_bc45.transform_bc5(data, self._settings)

    def untransform(self, data: bytes) -> bytes:
        return ops_bc45.untransform_bc5(data, self._settings)


class Bc5AutoTransformBuilder(_AutoBuilderBase):
    _auto_fn = staticmethod(ops_bc45.transform_bc5_auto)
    _manual_cls = Bc5ManualTransformBuilder


class Bc7ManualTransformBuilder:
    """Manual BC7 builder (framework extension; the reference's bc7-api crate is an
    empty stub)."""

    def __init__(self, settings=None):
        from .settings import Bc7TransformSettings

        self._settings = settings if settings is not None else Bc7TransformSettings()

    def sort_by_mode(self, flag: bool):
        from .settings import Bc7TransformSettings

        self._settings = Bc7TransformSettings(bool(flag), self._settings.split_byte_planes)
        return self

    def split_byte_planes(self, flag: bool):
        from .settings import Bc7TransformSettings

        self._settings = Bc7TransformSettings(self._settings.sort_by_mode, bool(flag))
        return self

    def get_settings(self):
        return self._settings

    def transform(self, data: bytes) -> bytes:
        from .ops import bc7 as ops_bc7

        return ops_bc7.transform(data, self._settings)

    def untransform(self, data: bytes) -> bytes:
        from .ops import bc7 as ops_bc7

        return ops_bc7.untransform(data, self._settings)


class Bc7AutoTransformBuilder(_AutoBuilderBase):
    _manual_cls = Bc7ManualTransformBuilder

    @staticmethod
    def _auto_fn(data, estimator, use_all):
        from .ops import bc7 as ops_bc7

        return ops_bc7.transform_bc7_auto(data, estimator, use_all)


class RgbManualTransformBuilder:
    """Manual builder for uncompressed RGBA8888 / BGRA8888 / BGR888 pixel formats
    (framework extension; the reference reserves the header flag without a transform).

    ``layout`` is one of ``"rgba8888"``, ``"bgra8888"``, ``"bgr888"``.
    """

    def __init__(self, layout: str, settings=None):
        from .oracle.rgb import _LAYOUTS
        from .settings import RgbTransformSettings

        if layout not in _LAYOUTS:
            raise ValueError(f"unknown pixel layout {layout!r}")
        self.layout = layout
        self._settings = settings if settings is not None else RgbTransformSettings()

    def decorrelate(self, flag: bool):
        from .settings import RgbTransformSettings

        self._settings = RgbTransformSettings(bool(flag), self._settings.split_channels)
        return self

    def split_channels(self, flag: bool):
        from .settings import RgbTransformSettings

        self._settings = RgbTransformSettings(self._settings.decorrelate, bool(flag))
        return self

    def get_settings(self):
        return self._settings

    def transform(self, data: bytes) -> bytes:
        from .ops import rgb as ops_rgb

        return ops_rgb.transform(data, self.layout, self._settings)

    def untransform(self, data: bytes) -> bytes:
        from .ops import rgb as ops_rgb

        return ops_rgb.untransform(data, self.layout, self._settings)


class RgbAutoTransformBuilder(_AutoBuilderBase):
    """Auto builder for uncompressed pixel formats; estimator picks the layout."""

    def __init__(self, layout: str, estimator: Optional[SizeEstimation] = None):
        super().__init__(estimator)
        from .oracle.rgb import _LAYOUTS

        if layout not in _LAYOUTS:
            raise ValueError(f"unknown pixel layout {layout!r}")
        self.layout = layout

    @classmethod
    def new_ultra(cls, layout: str, estimator: SizeEstimation):
        b = cls(layout, estimator)
        b._use_all = True
        return b

    def transform(self, data: bytes):
        from .ops import rgb as ops_rgb

        out, settings = ops_rgb.transform_rgb_auto(data, self.layout, self._estimator,
                                                   self._use_all)
        return out, RgbManualTransformBuilder(self.layout, settings)


class Bc6hManualTransformBuilder:
    """Manual BC6H builder (framework extension; the reference only reserves header
    space for BC6H)."""

    def __init__(self, settings=None):
        from .settings import Bc6hTransformSettings

        self._settings = settings if settings is not None else Bc6hTransformSettings()

    def sort_by_mode(self, flag: bool):
        from .settings import Bc6hTransformSettings

        self._settings = Bc6hTransformSettings(bool(flag),
                                               self._settings.split_byte_planes)
        return self

    def split_byte_planes(self, flag: bool):
        from .settings import Bc6hTransformSettings

        self._settings = Bc6hTransformSettings(self._settings.sort_by_mode, bool(flag))
        return self

    def get_settings(self):
        return self._settings

    def transform(self, data: bytes) -> bytes:
        from .ops import bc6h as ops_bc6h

        return ops_bc6h.transform(data, self._settings)

    def untransform(self, data: bytes) -> bytes:
        from .ops import bc6h as ops_bc6h

        return ops_bc6h.untransform(data, self._settings)


class Bc6hAutoTransformBuilder(_AutoBuilderBase):
    _manual_cls = Bc6hManualTransformBuilder

    @staticmethod
    def _auto_fn(data, estimator, use_all):
        from .ops import bc6h as ops_bc6h

        return ops_bc6h.transform_bc6h_auto(data, estimator, use_all)
