"""BC6H mode-aware transform (numpy bit-exact reference).

Framework extension: the reference reserves 80 extra header bytes for a future BC6H
transform (``file-formats-api/src/embed/mod.rs:97-103``) and ships nothing. BC6H
blocks are 16 bytes whose field layout depends on the block mode, signalled in the
low bits of byte 0 (D3D11 spec): if ``byte0 & 3 < 2`` the mode field is 2 bits
(the two 10-bit-endpoint two-region modes), otherwise 5 bits (``byte0 & 31``; valid
values 2,6,10,14,18,22,26,30 = two-region and 3,7,11,15 = one-region; 19,23,27,31
are reserved and decode to black).

The transform is the same machinery as BC7 (:mod:`.bc7`): chunk-local stable sort by
a per-block mode id + optional byte-plane split, with a packed 4-bit mode stream.
Only the byte0 -> mode-id map differs; the id is a pure grouping key (the mode bits
stay inside the payload), so reserved patterns simply share one id:

    id 0,1   = 2-bit modes
    id 2..9  = valid 5-bit two-region modes (ordered by bits 2-4)
    id 10..13 = valid 5-bit one-region modes
    id 14    = reserved/invalid 5-bit patterns
    (id 15 is never produced; 8-value nibble packing is shared with BC7's stream)
"""

from __future__ import annotations

import numpy as np

from ..settings import Bc6hTransformSettings
from . import bc7 as _machinery

BLOCK_SIZE = 16
SORT_CHUNK_BLOCKS = _machinery.SORT_CHUNK_BLOCKS

# byte0 -> grouping id, precomputed over all 256 values
MODE_LUT = np.empty(256, dtype=np.uint8)
for _b0 in range(256):
    _two = _b0 & 3
    if _two < 2:
        MODE_LUT[_b0] = _two
    else:
        _v = _b0 & 31
        if _v & 1:  # one-region (3,7,11,15) or reserved (19,23,27,31)
            MODE_LUT[_b0] = 10 + min(_v >> 2, 4)
        else:       # two-region (2,6,...,30)
            MODE_LUT[_b0] = 2 + (_v >> 2)

block_modes = lambda data: _machinery.block_modes(data, MODE_LUT)
pack_mode_stream = _machinery.pack_mode_stream
unpack_mode_stream = _machinery.unpack_mode_stream
mode_stream_len = _machinery.mode_stream_len
sort_order = _machinery.sort_order
transformed_len = _machinery.transformed_len
original_len = _machinery.original_len


def transform(data, settings: Bc6hTransformSettings = Bc6hTransformSettings()) -> bytes:
    """Transform interleaved BC6H blocks; bit-exact inverse via :func:`untransform`."""
    return _machinery.transform(data, settings, MODE_LUT)


def untransform(data, settings: Bc6hTransformSettings = Bc6hTransformSettings()) -> bytes:
    """Inverse of :func:`transform` (the mode stream carries the grouping ids, so the
    LUT is not needed on this side)."""
    return _machinery.untransform(data, settings)
