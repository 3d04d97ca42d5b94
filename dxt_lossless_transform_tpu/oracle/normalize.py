"""Experimental block normalization (vectorized numpy).

Behavioral reference: ``bc{1,2,3}/src/experimental/normalize_blocks/normalize.rs``.

Normalization canonicalizes blocks that have many equivalent encodings (solid-color
and uniform-alpha blocks) so the byte stream repeats more and compresses better. It
is *visually* lossless, not bit-lossless: round-trip guarantees apply to the
normalized file (reference ``transform/settings.rs:14``); the invariant -- checked by
the property tests, mirroring the reference's fuzz targets -- is that normalized
blocks decode to identical pixels.

Cases (BC1, ``normalize.rs:119-186``):
- all 16 pixels identical and transparent  -> all 8 bytes 0xFF
- all identical, opaque, and the color round-trips 8888->565->8888 exactly
  -> Color0Only: [c565, 0, indices 0] or ReplicateColor: [c565, c565, indices 0]
- anything else -> copied unchanged

BC2 (``bc2 normalize.rs:116-155``): color section only (alpha preserved verbatim),
solid-color test ignores alpha; no transparent case. BC3 adds uniform-alpha
normalization with three modes (``bc3 normalize.rs:117-136``).
"""

from __future__ import annotations

import enum

import numpy as np

from . import color565, decode


class ColorNormalizationMode(enum.IntEnum):
    """BC1/BC2/BC3 solid-color canonical forms (``bc1 normalize.rs:487-500``)."""

    NONE = 0
    COLOR0_ONLY = 1
    REPLICATE_COLOR = 2

    @staticmethod
    def all_values():
        return (ColorNormalizationMode.NONE, ColorNormalizationMode.COLOR0_ONLY,
                ColorNormalizationMode.REPLICATE_COLOR)


class AlphaNormalizationMode(enum.IntEnum):
    """BC3 uniform-alpha canonical forms (``bc3 normalize.rs:117-136``)."""

    NONE = 0
    UNIFORM_ALPHA_ZERO_INDICES = 1
    OPAQUE_FILL_ALL = 2
    OPAQUE_ZERO_ALPHA_MAX_INDICES = 3

    @staticmethod
    def all_values():
        return tuple(AlphaNormalizationMode)


def _solid_analysis(px, ignore_alpha: bool):
    """Per-block flags: (identical pixels, first-pixel RGBA, c565, roundtrip-ok)."""
    flat = px.reshape(len(px), 16, 4)
    first = flat[:, 0, :]
    channels = 3 if ignore_alpha else 4
    identical = (flat[:, :, :channels] == first[:, None, :channels]).all(axis=(1, 2))
    c565 = color565.from_rgb(first[:, 0], first[:, 1], first[:, 2])
    rt = color565.to_rgba8888(c565)
    roundtrip = (rt[:, :3] == first[:, :3]).all(axis=1)
    if not ignore_alpha:
        roundtrip &= first[:, 3] == 255
    return identical, first, c565, roundtrip


def _write_solid_colors(colors_u32, c565, mask, mode: ColorNormalizationMode):
    """Overwrite the 4-byte color field of masked blocks with the canonical form."""
    c = c565.astype(np.uint32)
    if mode == ColorNormalizationMode.COLOR0_ONLY:
        colors_u32[mask] = c[mask]
    elif mode == ColorNormalizationMode.REPLICATE_COLOR:
        colors_u32[mask] = c[mask] | (c[mask] << 16)


def normalize_blocks_bc1(data, color_mode) -> bytes:
    mode = ColorNormalizationMode(color_mode)
    if mode == ColorNormalizationMode.NONE:
        return bytes(data)
    words = np.frombuffer(data, "<u4").reshape(-1, 2).copy()
    px = decode.decode_bc1(data)
    identical, first, c565, roundtrip = _solid_analysis(px, ignore_alpha=False)

    transparent = identical & (first[:, 3] == 0)
    words[transparent] = 0xFFFFFFFF

    solid = identical & ~transparent & roundtrip
    _write_solid_colors(words[:, 0], c565, solid, mode)
    words[solid, 1] = 0  # indices = 0
    return words.tobytes()


def normalize_blocks_bc2(data, color_mode) -> bytes:
    mode = ColorNormalizationMode(color_mode)
    if mode == ColorNormalizationMode.NONE:
        return bytes(data)
    words = np.frombuffer(data, "<u4").reshape(-1, 4).copy()
    px = decode.decode_bc2(data)
    identical, first, c565, roundtrip = _solid_analysis(px, ignore_alpha=True)
    solid = identical & roundtrip
    _write_solid_colors(words[:, 2], c565, solid, mode)
    words[solid, 3] = 0
    return words.tobytes()


def _normalize_alpha_bc3(words, px, mode: AlphaNormalizationMode):
    if mode == AlphaNormalizationMode.NONE:
        return
    flat_a = px.reshape(len(px), 16, 4)[:, :, 3]
    uniform = (flat_a == flat_a[:, :1]).all(axis=1)
    value = flat_a[:, 0].astype(np.uint32)
    opaque = uniform & (value == 255)

    # UniformAlphaZeroIndices pattern: [value, 0, 0...0]; the opaque-only modes fall
    # back to it for non-opaque uniform blocks (bc3 normalize.rs:196-226).
    uni_mask = uniform if mode == AlphaNormalizationMode.UNIFORM_ALPHA_ZERO_INDICES \
        else (uniform & ~opaque)
    words[uni_mask, 0] = value[uni_mask]
    words[uni_mask, 1] = 0
    if mode == AlphaNormalizationMode.OPAQUE_FILL_ALL:
        words[opaque, 0] = 0xFFFFFFFF
        words[opaque, 1] = 0xFFFFFFFF
    elif mode == AlphaNormalizationMode.OPAQUE_ZERO_ALPHA_MAX_INDICES:
        words[opaque, 0] = 0xFFFF0000
        words[opaque, 1] = 0xFFFFFFFF
    elif mode == AlphaNormalizationMode.UNIFORM_ALPHA_ZERO_INDICES:
        pass
    # (opaque blocks under UNIFORM mode were already covered by uni_mask)


def normalize_blocks_bc3(data, alpha_mode, color_mode) -> bytes:
    amode = AlphaNormalizationMode(alpha_mode)
    cmode = ColorNormalizationMode(color_mode)
    if amode == AlphaNormalizationMode.NONE and cmode == ColorNormalizationMode.NONE:
        return bytes(data)
    words = np.frombuffer(data, "<u4").reshape(-1, 4).copy()
    px = decode.decode_bc3(data)
    _normalize_alpha_bc3(words, px, amode)
    if cmode != ColorNormalizationMode.NONE:
        identical, first, c565, roundtrip = _solid_analysis(px, ignore_alpha=True)
        solid = identical & roundtrip
        _write_solid_colors(words[:, 2], c565, solid, cmode)
        words[solid, 3] = 0
    return words.tobytes()


def normalize_blocks_all_modes_bc1(data) -> dict:
    """One decode pass -> a normalized copy per ColorNormalizationMode
    (``normalize_blocks_all_modes``, bc1 normalize.rs:417+)."""
    return {m: normalize_blocks_bc1(data, m) for m in ColorNormalizationMode.all_values()}


def normalize_blocks_all_modes_bc2(data) -> dict:
    """One pass -> a normalized copy per ColorNormalizationMode (bc2 analog of
    ``normalize_blocks_all_modes``)."""
    return {m: normalize_blocks_bc2(data, m) for m in ColorNormalizationMode.all_values()}


def normalize_blocks_all_modes_bc3(data) -> dict:
    """One pass -> {(alpha_mode, color_mode): normalized copy} over the full
    4 x 3 mode grid (bc3 normalize.rs ``normalize_blocks_all_modes``)."""
    return {(am, cm): normalize_blocks_bc3(data, am, cm)
            for am in AlphaNormalizationMode.all_values()
            for cm in ColorNormalizationMode.all_values()}


def normalize_split_blocks_in_place_bc1(colors: np.ndarray, indices: np.ndarray,
                                        color_mode) -> None:
    """Normalize already-split BC1 sections in place (bc1 normalize.rs:286+).

    ``colors``/``indices`` are u32 lane arrays of the standard-transformed layout
    (colors NOT decorrelated).
    """
    mode = ColorNormalizationMode(color_mode)
    if mode == ColorNormalizationMode.NONE:
        return
    from .bc1 import interleave_blocks

    data = interleave_blocks(colors, indices)
    out = np.frombuffer(normalize_blocks_bc1(data, mode), "<u4").reshape(-1, 2)
    colors[:] = out[:, 0]
    indices[:] = out[:, 1]


def normalize_split_blocks_in_place_bc2(alpha: np.ndarray, colors: np.ndarray,
                                        indices: np.ndarray, color_mode) -> None:
    """Normalize already-split BC2 sections in place (alpha u64 lanes untouched)."""
    mode = ColorNormalizationMode(color_mode)
    if mode == ColorNormalizationMode.NONE:
        return
    from .bc2 import interleave_blocks

    data = interleave_blocks(alpha, colors, indices)
    out = np.frombuffer(normalize_blocks_bc2(data, mode), "<u4").reshape(-1, 4)
    colors[:] = out[:, 2]
    indices[:] = out[:, 3]


def normalize_split_blocks_in_place_bc3(alpha_ep: np.ndarray, alpha_idx: np.ndarray,
                                        colors: np.ndarray, cidx: np.ndarray,
                                        alpha_mode, color_mode) -> None:
    """Normalize already-split BC3 sections in place.

    ``alpha_ep`` u16 lanes, ``alpha_idx`` (N, 6) bytes, ``colors``/``cidx`` u32.
    """
    amode = AlphaNormalizationMode(alpha_mode)
    cmode = ColorNormalizationMode(color_mode)
    if amode == AlphaNormalizationMode.NONE and cmode == ColorNormalizationMode.NONE:
        return
    from .bc3 import interleave_blocks, split_blocks

    data = interleave_blocks(alpha_ep, alpha_idx, colors, cidx)
    ep2, ai2, col2, ci2 = split_blocks(normalize_blocks_bc3(data, amode, cmode))
    alpha_ep[:] = ep2
    alpha_idx[:] = ai2
    colors[:] = col2
    cidx[:] = ci2
