"""Shared host wrapper: bytes <-> device word streams, with chunking.

Every transform layout is described by a *stream spec*: an ordered list of
(bytes-per-block, words-per-chunk-divisor) segments. Because all streams are
per-block sequences, a large file can be processed in fixed-size block chunks --
chunk c's piece of stream s lands at ``stream_offset + chunk_start * bytes_per_block``
-- which caps device compile shapes at ONE per (format, layout family) regardless of
file size, and bounds device memory.

Small tails are padded to a power-of-two bucket as before.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import numpy as np

from . import lanes

# Full chunks are this many blocks; one compiled shape serves all large files.
CHUNK_BLOCKS = 1 << 21


def _pad_words(buf: bytes, n_words: int) -> np.ndarray:
    if len(buf) % 4:
        buf = buf + bytes(4 - len(buf) % 4)
    return lanes.pad_rows(np.frombuffer(buf, "<u4"), n_words)


def transform_chunked(data: bytes, block_size: int, words_per_block: int,
                      stream_spec: Sequence[int],
                      device_fn: Callable) -> bytes:
    """Run ``device_fn(flat_words) -> word-stream tuple`` over chunks and assemble.

    ``stream_spec[i]`` = bytes per block of output stream i (streams in on-disk
    order; sum == block_size).
    """
    n = len(data) // block_size
    out = bytearray(len(data))
    offsets = np.concatenate([[0], np.cumsum(np.asarray(stream_spec) * n)])
    start = 0
    while start < n:
        count = min(CHUNK_BLOCKS, n - start)
        padded = (CHUNK_BLOCKS if count == CHUNK_BLOCKS else lanes.bucket_size(count))
        chunk = data[start * block_size:(start + count) * block_size]
        flat = _pad_words(chunk, padded * words_per_block)
        streams = jax.device_get(device_fn(flat))
        assert len(streams) == len(stream_spec), (len(streams), stream_spec)
        for s, (bpb, arr) in enumerate(zip(stream_spec, streams)):
            piece = arr.astype("<u4").tobytes()[: bpb * count]
            pos = int(offsets[s]) + start * bpb
            out[pos:pos + len(piece)] = piece
        start += count
    return bytes(out)


def untransform_chunked(data: bytes, block_size: int, words_per_block: int,
                        stream_spec: Sequence[int],
                        device_fn: Callable) -> bytes:
    """Inverse: slice per-chunk stream pieces, run ``device_fn(streams) -> flat``."""
    n = len(data) // block_size
    out = bytearray(len(data))
    offsets = np.concatenate([[0], np.cumsum(np.asarray(stream_spec) * n)])
    start = 0
    while start < n:
        count = min(CHUNK_BLOCKS, n - start)
        padded = (CHUNK_BLOCKS if count == CHUNK_BLOCKS else lanes.bucket_size(count))
        streams = []
        for s, bpb in enumerate(stream_spec):
            pos = int(offsets[s]) + start * bpb
            piece = data[pos:pos + bpb * count]
            # stream word count for `padded` blocks: bpb * padded / 4
            streams.append(_pad_words(piece, bpb * padded // 4))
        flat = np.asarray(jax.device_get(device_fn(tuple(streams))))
        out[start * block_size:(start + count) * block_size] = \
            flat.astype("<u4").tobytes()[: count * block_size]
        start += count
    return bytes(out)


def bc1_stream_spec(settings) -> Tuple[int, ...]:
    return (2, 2, 4) if settings.split_colour_endpoints else (4, 4)


def bc2_stream_spec(settings) -> Tuple[int, ...]:
    return (8, 2, 2, 4) if settings.split_colour_endpoints else (8, 4, 4)


def bc3_stream_spec(settings) -> Tuple[int, ...]:
    spec = (1, 1) if settings.split_alpha_endpoints else (2,)
    spec = spec + (6,)
    spec = spec + ((2, 2) if settings.split_colour_endpoints else (4,))
    return spec + (4,)
