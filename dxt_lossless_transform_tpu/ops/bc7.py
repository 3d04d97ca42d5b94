"""BC7 groundwork: MSB-order bit utilities.

The reference's BC7 crate is a stub carrying only these helpers ("BC7 has unusual
non-standard bit order"; ``bc7/src/lib.rs:8-13``, ``util/msb_extract_bits.rs:33``,
``util/msb_insert_bits.rs``); the file-format layer reserves header space for a real
BC7 transform (48 extra bytes; ``embed/mod.rs:97-103``, mirrored in
:mod:`..formats.embed`). These work elementwise on numpy or jax integer arrays, so
they are ready for a future per-mode device transform.
"""

from __future__ import annotations


def extract_msb_bits(byte, start: int, end: int):
    """Extract bits [start..end] of a byte in MSB (left-to-right) order, right-aligned.

    Position 0 is the leftmost/most-significant bit.
    """
    assert 0 <= start <= end <= 7
    num_bits = end - start + 1
    mask = (1 << num_bits) - 1
    return (byte >> (7 - end)) & mask


def insert_msb_bits(byte, value, start: int, end: int):
    """Insert ``value`` into bits [start..end] (MSB order) of ``byte``."""
    assert 0 <= start <= end <= 7
    num_bits = end - start + 1
    shift = 7 - end
    mask = ((1 << num_bits) - 1) << shift
    return (byte & ~mask & 0xFF) | ((value << shift) & mask)
