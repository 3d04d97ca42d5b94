"""BC7 mode-aware transform / untransform (numpy bit-exact reference).

The reference's BC7 crate is a stub (``bc7/src/lib.rs:8-13``: MSB bit helpers only)
that reserves file-format header space for a future transform
(``file-formats-api/src/embed/mod.rs:97-103``). This module implements a real one,
designed TPU-first (see :class:`..settings.Bc7TransformSettings`).

Block layout (16 bytes; D3D11/Khronos BC7 spec): a 128-bit value read little-endian
byte 0 first, bits consumed LSB-first. The block *mode* is a unary prefix: mode ``m``
is signalled by ``m`` zero bits followed by a one, all within byte 0, so
``mode = ctz(byte0)``; ``byte0 == 0`` is an undefined/invalid block (decoders emit
transparent black) and gets mode id 8 here so it still round-trips losslessly.

Transformed layout for N blocks:

    sort_by_mode=True:  [mode stream: ceil(N/2) bytes, 2x u4 per byte, low nibble
                         first][payload: 16*N bytes]
    sort_by_mode=False: [payload: 16*N bytes]

where the payload is the (mode-sorted, when sorting) block bytes, transposed to
byte-plane-major (16, N) when ``split_byte_planes`` else block-major (N, 16).

The mode sort is *chunk-local*: blocks are stable-sorted by mode id within
consecutive chunks of :data:`SORT_CHUNK_BLOCKS` (= 4096) blocks (ragged tail sorted
on its own). Chunking preserves spatial locality for the downstream LZ window and
lets the device sort run as a batched (independent-rows) sort, ~4x faster than one
global sort at equal compression (mode streaks in encoder output are local anyway).
Everything is a pure byte permutation -- the inverse is bit-exact.
"""

from __future__ import annotations

import numpy as np

from ..settings import Bc7TransformSettings

BLOCK_SIZE = 16
SORT_CHUNK_BLOCKS = 4096  # mode-sort granularity (64 KiB of payload per chunk)

# ctz LUT over u8 values; 0 -> 8 (invalid-block sentinel, sorts after all real modes)
_CTZ8 = np.zeros(256, dtype=np.uint8)
_CTZ8[0] = 8
for _v in range(1, 256):
    _CTZ8[_v] = (_v & -_v).bit_length() - 1


def _require_len(data) -> int:
    if len(data) % BLOCK_SIZE != 0:
        raise ValueError(f"BC7 data length {len(data)} not divisible by {BLOCK_SIZE}")
    return len(data) // BLOCK_SIZE


def block_modes(data, lut: np.ndarray = _CTZ8) -> np.ndarray:
    """Per-block mode ids (uint8[N]) from byte 0 of each block via a 256-entry LUT.

    The default LUT is BC7's ctz (ids 0..8); :mod:`.bc6h` passes its own (the mode id
    is only a grouping key -- the mode bits themselves stay inside the payload)."""
    n = _require_len(data)
    b0 = np.frombuffer(data, dtype=np.uint8)[:: BLOCK_SIZE] if n else \
        np.empty(0, np.uint8)
    return lut[b0]


def mode_stream_len(n_blocks: int) -> int:
    """Packed 4-bit mode-stream length in bytes."""
    return (n_blocks + 1) // 2


def pack_mode_stream(modes: np.ndarray) -> bytes:
    """Pack mode ids two-per-byte, low nibble first; odd tail padded with 0."""
    n = len(modes)
    padded = np.zeros(2 * mode_stream_len(n), dtype=np.uint8)
    padded[:n] = modes
    return (padded[0::2] | (padded[1::2] << 4)).tobytes()


def unpack_mode_stream(stream, n_blocks: int) -> np.ndarray:
    """Inverse of :func:`pack_mode_stream`."""
    raw = np.frombuffer(stream, dtype=np.uint8)
    if len(raw) < mode_stream_len(n_blocks):
        raise ValueError("BC7 mode stream shorter than the block count requires")
    modes = np.empty(2 * len(raw), dtype=np.uint8)
    modes[0::2] = raw & 0x0F
    modes[1::2] = raw >> 4
    return modes[:n_blocks]


def transformed_len(original_len: int, settings: Bc7TransformSettings) -> int:
    """Transformed payload size for an ``original_len``-byte BC7 texture."""
    n = original_len // BLOCK_SIZE
    return original_len + (mode_stream_len(n) if settings.sort_by_mode else 0)


def original_len(transformed: int, settings: Bc7TransformSettings) -> int:
    """Inverse of :func:`transformed_len`; raises if no block count fits."""
    if not settings.sort_by_mode:
        if transformed % BLOCK_SIZE:
            raise ValueError(f"BC7 transformed length {transformed} not a block multiple")
        return transformed
    # 16n + ceil(n/2) == transformed  =>  n ~= 2*transformed // 33
    for n in (2 * transformed // 33, 2 * transformed // 33 + 1):
        if n >= 0 and BLOCK_SIZE * n + mode_stream_len(n) == transformed:
            return BLOCK_SIZE * n
    raise ValueError(f"no BC7 block count matches transformed length {transformed}")


def sort_order(modes: np.ndarray) -> np.ndarray:
    """Chunk-local stable mode-sort permutation: ``order[p]`` = original index of the
    block at sorted position ``p``."""
    n = len(modes)
    c = SORT_CHUNK_BLOCKS
    order = np.empty(n, dtype=np.int64)
    full = (n // c) * c
    if full:
        per_chunk = np.argsort(modes[:full].reshape(-1, c), axis=1, kind="stable")
        order[:full] = (per_chunk
                        + (np.arange(full // c, dtype=np.int64) * c)[:, None]).ravel()
    if n > full:
        order[full:] = full + np.argsort(modes[full:], kind="stable")
    return order


def transform(data, settings: Bc7TransformSettings = Bc7TransformSettings(),
              lut: np.ndarray = _CTZ8) -> bytes:
    """Transform interleaved BC7 blocks into the mode-grouped/plane-split layout."""
    n = _require_len(data)
    if n == 0:
        return b""
    blocks = np.frombuffer(data, dtype=np.uint8).reshape(n, BLOCK_SIZE)
    prefix = b""
    if settings.sort_by_mode:
        modes = block_modes(data, lut)
        prefix = pack_mode_stream(modes)
        blocks = blocks[sort_order(modes)]
    payload = blocks.T if settings.split_byte_planes else blocks
    return prefix + np.ascontiguousarray(payload).tobytes()


def untransform(data, settings: Bc7TransformSettings = Bc7TransformSettings()) -> bytes:
    """Bit-exact inverse of :func:`transform`."""
    if len(data) == 0:
        return b""
    n = original_len(len(data), settings) // BLOCK_SIZE
    msl = mode_stream_len(n) if settings.sort_by_mode else 0
    payload = np.frombuffer(data, dtype=np.uint8, offset=msl, count=n * BLOCK_SIZE)
    blocks = payload.reshape(BLOCK_SIZE, n).T if settings.split_byte_planes \
        else payload.reshape(n, BLOCK_SIZE)
    if settings.sort_by_mode:
        modes = unpack_mode_stream(data[:msl], n)
        order = sort_order(modes)
        out = np.empty((n, BLOCK_SIZE), dtype=np.uint8)
        out[order] = blocks
        return out.tobytes()
    return np.ascontiguousarray(blocks).tobytes()
