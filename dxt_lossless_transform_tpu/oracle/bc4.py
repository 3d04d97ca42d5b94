"""BC4 (single-channel) and BC5 (dual-channel) transforms (numpy bit-exact reference).

The reference only *reserves* BC4/BC5 (DDS detection + header tags, no transform --
``embed/transform_format.rs``, ``dds/parse_dds.rs:138-147``); this build implements
them. A BC4 block is exactly the BC3 alpha section (8 bytes):

    offset 0: a0, a1 (u8 endpoints)
    offset 2: 6 bytes of 16x 3-bit indices

A BC5 block (16 bytes) is two BC4 blocks back-to-back (red then green channel).

Transformed layouts (this framework's definition, little-endian):

    BC4 no split: [ep u16 x N][indices 6B x N]
    BC4 split:    [a0 u8 x N][a1 u8 x N][indices 6B x N]
    BC5 no split: [Rep u16 x N][Gep u16 x N][Ridx 6B x N][Gidx 6B x N]
    BC5 split:    [Ra0][Ra1][Ga0][Ga1] (u8 x N each) [Ridx][Gidx]

Endpoint streams of both channels sit adjacent (similar statistics compress better).
"""

from __future__ import annotations

import numpy as np

from .. import endian
from ..settings import Bc4TransformSettings, Bc5TransformSettings

BC4_BLOCK_SIZE = 8
BC5_BLOCK_SIZE = 16


def _split_bc4_halves(halves: np.ndarray):
    """(N, 4) u16 view of BC4 blocks -> (ep u16[N], idx u16[N,3])."""
    return halves[:, 0].copy(), halves[:, 1:4].copy()


def _ep_streams(ep: np.ndarray, split: bool) -> bytes:
    if split:
        e = ep.astype(np.int64)
        return (e & 0xFF).astype(np.uint8).tobytes() + (e >> 8).astype(np.uint8).tobytes()
    return endian.to_bytes(ep, "u2")


def _ep_from_streams(data: bytes, n: int, split: bool) -> np.ndarray:
    if split:
        a0 = np.frombuffer(data[:n], np.uint8).astype(np.int64)
        a1 = np.frombuffer(data[n:2 * n], np.uint8).astype(np.int64)
        return (a0 | (a1 << 8)).astype(np.uint16)
    return endian.from_bytes(data[:2 * n], "u2").copy()


def transform_bc4(data, settings: Bc4TransformSettings = Bc4TransformSettings()) -> bytes:
    if len(data) % BC4_BLOCK_SIZE:
        raise ValueError(f"BC4 data length {len(data)} not divisible by {BC4_BLOCK_SIZE}")
    halves = endian.from_bytes(data, "u2").reshape(-1, 4)
    ep, idx = _split_bc4_halves(halves)
    return _ep_streams(ep, settings.split_endpoints) + endian.to_bytes(idx, "u2")


def untransform_bc4(data, settings: Bc4TransformSettings = Bc4TransformSettings()) -> bytes:
    if len(data) % BC4_BLOCK_SIZE:
        raise ValueError(f"BC4 data length {len(data)} not divisible by {BC4_BLOCK_SIZE}")
    n = len(data) // BC4_BLOCK_SIZE
    ep = _ep_from_streams(data, n, settings.split_endpoints)
    idx = endian.from_bytes(data[2 * n:], "u2").reshape(n, 3)
    halves = endian.empty((n, 4), "u2")
    halves[:, 0] = ep
    halves[:, 1:4] = idx
    return endian.to_bytes(halves, "u2")


def transform_bc5(data, settings: Bc5TransformSettings = Bc5TransformSettings()) -> bytes:
    if len(data) % BC5_BLOCK_SIZE:
        raise ValueError(f"BC5 data length {len(data)} not divisible by {BC5_BLOCK_SIZE}")
    halves = endian.from_bytes(data, "u2").reshape(-1, 8)
    r_ep, r_idx = _split_bc4_halves(halves[:, :4])
    g_ep, g_idx = _split_bc4_halves(halves[:, 4:])
    return (_ep_streams(r_ep, settings.split_endpoints)
            + _ep_streams(g_ep, settings.split_endpoints)
            + endian.to_bytes(r_idx, "u2") + endian.to_bytes(g_idx, "u2"))


def untransform_bc5(data, settings: Bc5TransformSettings = Bc5TransformSettings()) -> bytes:
    if len(data) % BC5_BLOCK_SIZE:
        raise ValueError(f"BC5 data length {len(data)} not divisible by {BC5_BLOCK_SIZE}")
    n = len(data) // BC5_BLOCK_SIZE
    r_ep = _ep_from_streams(data, n, settings.split_endpoints)
    g_ep = _ep_from_streams(data[2 * n:], n, settings.split_endpoints)
    r_idx = endian.from_bytes(data[4 * n:10 * n], "u2").reshape(n, 3)
    g_idx = endian.from_bytes(data[10 * n:16 * n], "u2").reshape(n, 3)
    halves = endian.empty((n, 8), "u2")
    halves[:, 0] = r_ep
    halves[:, 1:4] = r_idx
    halves[:, 4] = g_ep
    halves[:, 5:8] = g_idx
    return endian.to_bytes(halves, "u2")
