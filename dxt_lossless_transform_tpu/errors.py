"""Typed ops-layer error taxonomy.

Mirrors the reference's per-format safe-wrapper errors
(``bc1/src/transform/safe/mod.rs:15-23``: ``Bc1ValidationError`` /
``Bc1AutoTransformError``; ``bc1/src/transform/transform_auto.rs:15-23``:
``DetermineBestTransformError``) and the C-API error-code surface.

All validation errors subclass :class:`ValueError` and all auto-transform errors
subclass :class:`RuntimeError`, so pre-existing ``except ValueError`` callers keep
working; the formats layer keeps its own container-level taxonomy in
:mod:`.formats.errors`.
"""

from __future__ import annotations


class DltError(Exception):
    """Base class of every typed error this package raises."""


class ValidationError(DltError, ValueError):
    """Input failed a length/alignment precondition (``Bc1ValidationError`` analog).

    Attributes: ``fmt`` (format name), ``length`` (offending byte length),
    ``divisor`` (required block-size divisor; 0 when not a divisibility issue).
    """

    def __init__(self, fmt: str, length: int, divisor: int = 0, message: str = ""):
        self.fmt = fmt
        self.length = length
        self.divisor = divisor
        if not message:
            message = (f"{fmt} data length {length} not divisible by {divisor}"
                       if divisor else f"{fmt}: invalid input of length {length}")
        super().__init__(message)


class Bc1ValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 8, message: str = ""):
        super().__init__("BC1", length, divisor, message)


class Bc2ValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 16, message: str = ""):
        super().__init__("BC2", length, divisor, message)


class Bc3ValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 16, message: str = ""):
        super().__init__("BC3", length, divisor, message)


class Bc4ValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 8, message: str = ""):
        super().__init__("BC4", length, divisor, message)


class Bc5ValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 16, message: str = ""):
        super().__init__("BC5", length, divisor, message)


class Bc7ValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 16, message: str = ""):
        super().__init__("BC7", length, divisor, message)


class Bc6hValidationError(ValidationError):
    def __init__(self, length: int, divisor: int = 16, message: str = ""):
        super().__init__("BC6H", length, divisor, message)


class RgbValidationError(ValidationError):
    def __init__(self, layout: str, length: int, divisor: int, message: str = ""):
        super().__init__(layout, length, divisor, message)


class AutoTransformError(DltError, RuntimeError):
    """The candidate search failed (``DetermineBestTransformError`` analog) --
    typically the pluggable estimator raised or the native search returned an
    error code."""

    def __init__(self, fmt: str, message: str):
        self.fmt = fmt
        super().__init__(f"{fmt} auto-transform failed: {message}")


class NativeError(DltError, ValueError):
    """A native-runtime call returned a nonzero error code."""

    def __init__(self, operation: str, rc: int, message: str = ""):
        self.operation = operation
        self.rc = rc
        super().__init__(message or f"native {operation} failed (rc={rc})")


_VALIDATION_BY_FMT = {
    "BC1": Bc1ValidationError, "BC2": Bc2ValidationError, "BC3": Bc3ValidationError,
    "BC4": Bc4ValidationError, "BC5": Bc5ValidationError, "BC7": Bc7ValidationError,
    "BC6H": Bc6hValidationError,
}


def validation_error(fmt: str, length: int, divisor: int) -> ValidationError:
    """Per-format validation error by format name (rgb layouts fall back to the
    generic class)."""
    cls = _VALIDATION_BY_FMT.get(fmt.upper())
    if cls is not None:
        return cls(length, divisor)
    return RgbValidationError(fmt, length, divisor)
