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


# Chunks kept in flight before the host blocks on the oldest result. JAX dispatch
# is async, so launching chunk N+1 (and its host->device transfer) before reading
# chunk N's output overlaps host prep + PCIe/relay transfer with device compute
# (SURVEY S7 "donation/double-buffering for host<->device overlap"). Measured on a
# 512 MiB BC1 file (32 chunks): depth 2 is 1.58x depth 1 end-to-end; depth 3 adds
# nothing (this environment's relay moves bytes at ~50 MB/s, so transfers dominate
# -- on a real PCIe-attached host the same overlap hides the device compute).
PIPELINE_DEPTH = 2


def _chunk_bounds(n: int):
    start = 0
    while start < n:
        count = min(CHUNK_BLOCKS, n - start)
        padded = (CHUNK_BLOCKS if count == CHUNK_BLOCKS else lanes.bucket_size(count))
        yield start, count, padded
        start += count


def transform_chunked(data: bytes, block_size: int, words_per_block: int,
                      stream_spec: Sequence[int],
                      device_fn: Callable) -> bytes:
    """Run ``device_fn(flat_words) -> word-stream tuple`` over chunks and assemble.

    ``stream_spec[i]`` = bytes per block of output stream i (streams in on-disk
    order; sum == block_size). Chunks are pipelined PIPELINE_DEPTH deep.
    """
    n = len(data) // block_size
    out = bytearray(len(data))
    offsets = np.concatenate([[0], np.cumsum(np.asarray(stream_spec) * n)])
    in_flight: list = []

    def _drain(start, count, streams):
        streams = jax.device_get(streams)
        if len(streams) != len(stream_spec):  # not an assert: survives python -O
            raise RuntimeError(
                f"device_fn returned {len(streams)} streams, spec has "
                f"{len(stream_spec)} ({stream_spec})")
        for s, (bpb, arr) in enumerate(zip(stream_spec, streams)):
            piece = arr.astype("<u4").tobytes()[: bpb * count]
            pos = int(offsets[s]) + start * bpb
            out[pos:pos + len(piece)] = piece

    for start, count, padded in _chunk_bounds(n):
        chunk = data[start * block_size:(start + count) * block_size]
        flat = _pad_words(chunk, padded * words_per_block)
        in_flight.append((start, count, device_fn(flat)))
        if len(in_flight) >= PIPELINE_DEPTH:
            _drain(*in_flight.pop(0))
    for item in in_flight:
        _drain(*item)
    return bytes(out)


def untransform_chunked(data: bytes, block_size: int, words_per_block: int,
                        stream_spec: Sequence[int],
                        device_fn: Callable) -> bytes:
    """Inverse: slice per-chunk stream pieces, run ``device_fn(streams) -> flat``."""
    n = len(data) // block_size
    out = bytearray(len(data))
    offsets = np.concatenate([[0], np.cumsum(np.asarray(stream_spec) * n)])
    in_flight: list = []

    def _drain(start, count, flat):
        flat = np.asarray(jax.device_get(flat))
        out[start * block_size:(start + count) * block_size] = \
            flat.astype("<u4").tobytes()[: count * block_size]

    for start, count, padded in _chunk_bounds(n):
        streams = []
        for s, bpb in enumerate(stream_spec):
            pos = int(offsets[s]) + start * bpb
            piece = data[pos:pos + bpb * count]
            # stream word count for `padded` blocks: bpb * padded / 4
            streams.append(_pad_words(piece, bpb * padded // 4))
        in_flight.append((start, count, device_fn(tuple(streams))))
        if len(in_flight) >= PIPELINE_DEPTH:
            _drain(*in_flight.pop(0))
    for item in in_flight:
        _drain(*item)
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
