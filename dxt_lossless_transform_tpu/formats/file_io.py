"""Memory-mapped file transform/untransform.

Analog of the reference's lightweight-mmap file I/O layer
(``file-formats-api/src/file_io/lightweight_mmap/file.rs:28-212``): the input file is
mapped read-only; the output is written in one shot. File-to-slice and slice-to-file
variants included.
"""

from __future__ import annotations

import mmap
import os
from typing import Iterable, Optional

from .api import (
    transform_slice_with_multiple_handlers,
    untransform_slice_with_multiple_handlers,
)
from .bundle import TransformBundle
from .handlers import FileFormatHandler


def _read_mmap(path) -> bytes:
    with open(path, "rb") as f:
        size = os.fstat(f.fileno()).st_size
        if size == 0:
            return b""
        with mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ) as m:
            return bytes(m)


def transform_file_with_handler(handler: FileFormatHandler, bundle: TransformBundle,
                                input_path, output_path) -> int:
    """Transform a file; returns the number of bytes written."""
    out = handler.transform_bundle(_read_mmap(input_path), bundle)
    with open(output_path, "wb") as f:
        f.write(out)
    return len(out)


def untransform_file_with_handler(handler: FileFormatHandler,
                                  input_path, output_path) -> int:
    out = handler.untransform(_read_mmap(input_path))
    with open(output_path, "wb") as f:
        f.write(out)
    return len(out)


def transform_file_with_multiple_handlers(handlers: Iterable[FileFormatHandler],
                                          bundle: TransformBundle, input_path,
                                          output_path,
                                          file_extension: Optional[str] = None) -> int:
    out = transform_slice_with_multiple_handlers(
        handlers, _read_mmap(input_path), bundle, file_extension)
    with open(output_path, "wb") as f:
        f.write(out)
    return len(out)


def untransform_file_with_multiple_handlers(handlers: Iterable[FileFormatHandler],
                                            input_path, output_path,
                                            file_extension: Optional[str] = None) -> int:
    out = untransform_slice_with_multiple_handlers(
        handlers, _read_mmap(input_path), file_extension)
    with open(output_path, "wb") as f:
        f.write(out)
    return len(out)
