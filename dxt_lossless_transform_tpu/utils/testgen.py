"""Deterministic test-data generators.

Mirrors the role of the reference's ``test_prelude.rs`` deterministic generators
(``bc1/src/test_prelude.rs:81-119``): reproducible block data covering the value space,
plus realistic synthetic textures (smooth gradients + noise regions, which actually
exercise the compression-ratio paths), and minimal in-memory DDS files (the analog of
the reference's integration test header writer,
``file-formats-api/tests/integration_test.rs:10-120``).
"""

from __future__ import annotations

import struct

import numpy as np

# --- raw block data -------------------------------------------------------------------

def bc_blocks(num_blocks: int, block_size: int, seed: int = 0) -> bytes:
    """Uniform-random block bytes (worst case: incompressible)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, num_blocks * block_size, dtype=np.uint8).tobytes()


def bc1_realistic(num_blocks: int, seed: int = 0) -> bytes:
    """BC1 blocks with texture-like structure: smoothly varying endpoints, correlated
    RGB channels, and low-entropy index patterns -- the regime where split+decorrelate
    actually wins."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 8 * np.pi, num_blocks)
    base_r = (96 + 80 * np.sin(t) + rng.normal(0, 8, num_blocks)).clip(0, 255)
    base_g = (base_r * 0.8 + rng.normal(0, 6, num_blocks)).clip(0, 255)
    base_b = (base_r * 0.6 + rng.normal(0, 6, num_blocks)).clip(0, 255)
    from ..oracle.color565 import from_rgb
    c0 = from_rgb(base_r.astype(np.uint8), base_g.astype(np.uint8), base_b.astype(np.uint8))
    delta = rng.integers(0, 24, num_blocks)
    c1 = from_rgb((base_r - delta).clip(0, 255).astype(np.uint8),
                  (base_g - delta).clip(0, 255).astype(np.uint8),
                  (base_b - delta).clip(0, 255).astype(np.uint8))
    # Index patterns: mostly a handful of repeated dither patterns
    patterns = rng.integers(0, 2**32, 8, dtype=np.uint32)
    idx = patterns[rng.integers(0, 8, num_blocks)]
    words = np.empty((num_blocks, 2), dtype="<u4")
    words[:, 0] = c0.astype(np.uint32) | (c1.astype(np.uint32) << 16)
    words[:, 1] = idx
    return words.tobytes()


def bc2_realistic(num_blocks: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    color_part = np.frombuffer(bc1_realistic(num_blocks, seed), dtype="<u4").reshape(-1, 2)
    words = np.empty((num_blocks, 4), dtype="<u4")
    alpha_patterns = rng.integers(0, 2**32, 4, dtype=np.uint32)
    words[:, 0] = alpha_patterns[rng.integers(0, 4, num_blocks)]
    words[:, 1] = 0xFFFFFFFF  # mostly-opaque upper alpha half
    words[:, 2] = color_part[:, 0]
    words[:, 3] = color_part[:, 1]
    return words.tobytes()


def bc3_realistic(num_blocks: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    color_part = np.frombuffer(bc1_realistic(num_blocks, seed), dtype="<u4").reshape(-1, 2)
    words = np.empty((num_blocks, 4), dtype="<u4")
    a0 = (200 + rng.normal(0, 20, num_blocks)).clip(0, 255).astype(np.uint32)
    a1 = (a0 - rng.integers(0, 64, num_blocks)).clip(0, 255).astype(np.uint32)
    idx_lo = rng.integers(0, 2**16, num_blocks, dtype=np.uint32)
    words[:, 0] = a0 | (a1 << 8) | (idx_lo << 16)
    words[:, 1] = rng.integers(0, 4, num_blocks, dtype=np.uint32) * 0x49249249
    words[:, 2] = color_part[:, 0]
    words[:, 3] = color_part[:, 1]
    return words.tobytes()


# --- synthetic DDS files --------------------------------------------------------------

_DDSD_CAPS = 0x1
_DDSD_HEIGHT = 0x2
_DDSD_WIDTH = 0x4
_DDSD_PIXELFORMAT = 0x1000
_DDSD_MIPMAPCOUNT = 0x20000
_DDPF_FOURCC = 0x4

_FOURCC = {"BC1": b"DXT1", "BC2": b"DXT3", "BC3": b"DXT5", "BC4": b"BC4U", "BC5": b"ATI2"}
_BLOCK_SIZE = {"BC1": 8, "BC2": 16, "BC3": 16, "BC4": 8, "BC5": 16}


def make_dds(fmt: str, width: int, height: int, mipmaps: int = 1, seed: int = 0,
             realistic: bool = True, trailing: bytes = b"") -> bytes:
    """Build a minimal legacy-header DDS file with synthetic texture payload.

    The header is written field-by-field per the MS layout (magic, 124-byte header with
    a 32-byte DDSPIXELFORMAT at offset 0x4C), the payload covers the whole mip chain
    with 4x4-block rounding per level.
    """
    if fmt not in _FOURCC:
        raise ValueError(f"unsupported synthetic format {fmt}")
    bs = _BLOCK_SIZE[fmt]

    total_blocks = 0
    w, h = width, height
    for _ in range(mipmaps):
        total_blocks += ((w + 3) // 4) * ((h + 3) // 4)
        w, h = max(w // 2, 1), max(h // 2, 1)

    gen = {"BC1": bc1_realistic, "BC2": bc2_realistic, "BC3": bc3_realistic,
           "BC4": lambda n, s: bc_blocks(n, 8, s), "BC5": lambda n, s: bc_blocks(n, 16, s)}[fmt]
    payload = gen(total_blocks, seed) if realistic else bc_blocks(total_blocks, bs, seed)

    flags = _DDSD_CAPS | _DDSD_HEIGHT | _DDSD_WIDTH | _DDSD_PIXELFORMAT
    if mipmaps > 1:
        flags |= _DDSD_MIPMAPCOUNT

    header = bytearray(128)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, flags, height, width, 0, 0, mipmaps)
    # DDSPIXELFORMAT at 0x4C: size, flags, fourcc
    struct.pack_into("<2I", header, 0x4C, 32, _DDPF_FOURCC)
    header[0x54:0x58] = _FOURCC[fmt]
    struct.pack_into("<I", header, 0x6C, 0x1000)  # caps: DDSCAPS_TEXTURE
    return bytes(header) + payload + trailing


def bc7_realistic(num_blocks: int, seed: int = 0) -> bytes:
    """Mode-clustered BC7 blocks (modes 4/5/6 mix, correlated payload bytes) --
    the regime where the mode-sort transform wins (``oracle/bc7.py``)."""
    rng = np.random.default_rng(seed)
    modes = rng.choice([4, 5, 6], size=num_blocks, p=[0.2, 0.3, 0.5])
    blocks = np.zeros((num_blocks, 16), np.uint8)
    blocks[:, 0] = (1 << modes).astype(np.uint8)
    base = rng.integers(0, 256, 16, np.uint8)
    noise = rng.integers(0, 24, (num_blocks, 16), np.uint8)
    blocks[:, 1:] = (base[None, 1:] + noise[:, 1:]
                     + (modes[:, None] * 31)).astype(np.uint8)
    return blocks.tobytes()


_DXGI = {"BC1": 71, "BC2": 74, "BC3": 77, "BC4": 80, "BC5": 83, "BC6H": 95,
         "BC7": 98}
_BLOCK_SIZE_DX10 = {"BC1": 8, "BC2": 16, "BC3": 16, "BC4": 8, "BC5": 16,
                    "BC6H": 16, "BC7": 16}


def make_dx10_dds(fmt: str, width: int, height: int, mipmaps: int = 1,
                  seed: int = 0, trailing: bytes = b"",
                  payload: bytes = None) -> bytes:
    """DX10-header DDS (magic + 124 B header + 20 B DX10 extension, payload at
    0x94; ``dds/constants.rs:5-73``) -- the only legal container form for
    BC6H/BC7. Default payload is realistic-synthetic; pass ``payload`` to wrap
    real-encoder data (``utils.bc7codec``, the corpus study's BC7/BC6H legs)."""
    if fmt not in _DXGI:
        raise ValueError(f"unsupported DX10 format {fmt}")
    bs = _BLOCK_SIZE_DX10[fmt]
    total_blocks = 0
    w, h = width, height
    for _ in range(mipmaps):
        total_blocks += ((w + 3) // 4) * ((h + 3) // 4)
        w, h = max(w // 2, 1), max(h // 2, 1)
    if payload is None:
        gen = {"BC1": bc1_realistic, "BC2": bc2_realistic, "BC3": bc3_realistic,
               "BC4": lambda n, s: bc_blocks(n, 8, s),
               "BC5": lambda n, s: bc_blocks(n, 16, s),
               "BC6H": bc7_realistic, "BC7": bc7_realistic}[fmt]
        payload = gen(total_blocks, seed)
    elif len(payload) != total_blocks * bs:
        raise ValueError(f"payload is {len(payload)} bytes; the stated "
                         f"{width}x{height}x{mipmaps} chain needs "
                         f"{total_blocks * bs}")

    flags = _DDSD_CAPS | _DDSD_HEIGHT | _DDSD_WIDTH | _DDSD_PIXELFORMAT
    if mipmaps > 1:
        flags |= _DDSD_MIPMAPCOUNT
    header = bytearray(0x94)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, flags, height, width, 0, 0, mipmaps)
    struct.pack_into("<2I", header, 0x4C, 32, _DDPF_FOURCC)
    header[0x54:0x58] = b"DX10"
    # DX10 extension: dxgiFormat, resourceDimension=3 (2D), miscFlag, arraySize,
    # miscFlags2
    struct.pack_into("<5I", header, 0x80, _DXGI[fmt], 3, 0, 1, 0)
    struct.pack_into("<I", header, 0x6C, 0x1000)  # caps: DDSCAPS_TEXTURE
    return bytes(header) + payload + trailing


def make_uncompressed_dds(layout: str, width: int, height: int,
                          seed: int = 0) -> bytes:
    """Legacy-header uncompressed-RGB DDS (masks-based detection,
    ``dds/parse_dds.rs:171-200``): layout in {rgba8888, bgra8888, bgr888}."""
    masks = {"rgba8888": (32, (0x000000FF, 0x0000FF00, 0x00FF0000, 0xFF000000)),
             "bgra8888": (32, (0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)),
             "bgr888": (24, (0x00FF0000, 0x0000FF00, 0x000000FF, 0))}[layout]
    bit_count, m = masks
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 200, 3)
    px = np.empty((height, width, bit_count // 8), np.uint8)
    yy = np.linspace(0, 40, height)[:, None]
    for c in range(3):
        px[..., c] = np.clip(base[c] + yy + rng.normal(0, 3, (height, width)),
                             0, 255).astype(np.uint8)
    if bit_count == 32:
        px[..., 3] = 255
    header = bytearray(0x80)
    header[0:4] = b"DDS "
    # 0x100F = CAPS|HEIGHT|WIDTH|PITCH|PIXELFORMAT: pitch claimed, so write it
    struct.pack_into("<7I", header, 4, 124, 0x100F, height, width,
                     width * (bit_count // 8), 0, 1)
    flags = 0x40 | (0x1 if m[3] else 0)  # DDPF_RGB (+ALPHAPIXELS)
    struct.pack_into("<3I", header, 0x4C, 32, flags, 0)
    struct.pack_into("<I", header, 0x58, bit_count)
    struct.pack_into("<4I", header, 0x5C, *m)
    struct.pack_into("<I", header, 0x6C, 0x1000)
    return bytes(header) + px.tobytes()
