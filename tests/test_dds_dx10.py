"""DX10-header DDS parsing and uncompressed-format detection."""

import struct

import pytest

from dxt_lossless_transform_tpu.formats import (
    DdsFormat, DdsHandler, TransformBundle, parse_dds,
)
from dxt_lossless_transform_tpu.utils import testgen


def make_dx10_dds(dxgi_format: int, width: int, height: int, payload: bytes) -> bytes:
    header = bytearray(0x94)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, 0x1007, height, width, 0, 0, 1)
    struct.pack_into("<2I", header, 0x4C, 32, 0x4)  # DDPF_FOURCC
    header[0x54:0x58] = b"DX10"
    # DX10 header: dxgiFormat, resourceDimension=3 (2D), miscFlag, arraySize, miscFlags2
    struct.pack_into("<5I", header, 0x80, dxgi_format, 3, 0, 1, 0)
    return bytes(header) + payload


def make_uncompressed_dds(width: int, height: int, bit_count: int, masks, payload) -> bytes:
    header = bytearray(0x80)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, 0x100F, height, width, 0, 0, 1)
    flags = 0x40 | (0x1 if masks[3] else 0)  # DDPF_RGB (+ALPHAPIXELS)
    struct.pack_into("<3I", header, 0x4C, 32, flags, 0)
    struct.pack_into("<I", header, 0x58, bit_count)
    struct.pack_into("<4I", header, 0x5C, *masks)
    return bytes(header) + payload


@pytest.mark.parametrize("dxgi,expected,bs", [
    (71, DdsFormat.BC1, 8),     # BC1_UNORM
    (77, DdsFormat.BC3, 16),    # BC3_UNORM
    (98, DdsFormat.BC7, 16),    # BC7_UNORM
    (80, DdsFormat.BC4, 8),     # BC4_UNORM
    (95, DdsFormat.BC6H, 16),   # BC6H_UF16
])
def test_dx10_formats(dxgi, expected, bs):
    payload = testgen.bc_blocks(8 * 8, bs, seed=1)
    data = make_dx10_dds(dxgi, 32, 32, payload)
    info = parse_dds(data)
    assert info.format == expected
    assert info.data_offset == 0x94
    assert info.data_length == 64 * bs


def test_dx10_bc1_handler_roundtrip():
    payload = testgen.bc1_realistic(64, seed=2)
    data = make_dx10_dds(71, 32, 32, payload)
    handler = DdsHandler()
    t = handler.transform_bundle(data, TransformBundle.default_all())
    assert t[4:0x94] == data[4:0x94]  # DX10 header preserved
    assert handler.untransform(t) == data


def test_dx10_unknown_dxgi():
    data = make_dx10_dds(10, 32, 32, bytes(64))  # R16G16B16A16_FLOAT: unsupported
    assert parse_dds(data).format == DdsFormat.UNKNOWN


def test_dx10_truncated_header():
    data = make_dx10_dds(71, 32, 32, b"")[:0x90]
    assert parse_dds(data) is None


@pytest.mark.parametrize("bit_count,masks,expected,bpp", [
    (32, (0xFF, 0xFF00, 0xFF0000, 0xFF000000), DdsFormat.RGBA8888, 4),
    (32, (0xFF0000, 0xFF00, 0xFF, 0xFF000000), DdsFormat.BGRA8888, 4),
    (24, (0xFF0000, 0xFF00, 0xFF, 0), DdsFormat.BGR888, 3),
    (32, (0xF800, 0x7E0, 0x1F, 0x8000), DdsFormat.UNKNOWN, 0),
])
def test_uncompressed_detection(bit_count, masks, expected, bpp):
    payload = bytes(16 * 16 * (bpp or 4))
    data = make_uncompressed_dds(16, 16, bit_count, masks, payload)
    info = parse_dds(data)
    assert info.format == expected
    if expected != DdsFormat.UNKNOWN:
        assert info.data_length == 16 * 16 * bpp


def make_cubemap_dds(width: int, height: int, payload: bytes, faces: int = 6) -> bytes:
    """Legacy BC1 cubemap: caps2 carries DDSCAPS2_CUBEMAP + per-face bits."""
    header = bytearray(0x80)
    header[0:4] = b"DDS "
    struct.pack_into("<7I", header, 4, 124, 0x1007, height, width, 0, 0, 1)
    struct.pack_into("<2I", header, 0x4C, 32, 0x4)
    header[0x54:0x58] = b"DXT1"
    face_bits = 0
    for i in range(faces):
        face_bits |= 0x400 << i
    struct.pack_into("<I", header, 0x70, 0x200 | face_bits)
    return bytes(header) + payload


def make_dx10_array_dds(dxgi_format: int, width: int, height: int, payload: bytes,
                        array_size: int, cube: bool = False) -> bytes:
    header = bytearray(make_dx10_dds(dxgi_format, width, height, b""))
    struct.pack_into("<2I", header, 0x88, 0x4 if cube else 0, array_size)
    return bytes(header) + payload


def test_cubemap_counts_all_faces():
    # Beyond the reference (which computes one face's chain and copies the other
    # five verbatim): all six faces are part of data_length and get transformed.
    per_face = 8 * 8 * 8  # 32x32 BC1
    payload = testgen.bc1_realistic(64 * 6, seed=4)
    data = make_cubemap_dds(32, 32, payload)
    info = parse_dds(data)
    assert info.data_length == per_face * 6
    handler = DdsHandler()
    t = handler.transform_bundle(data, TransformBundle.default_all())
    assert handler.untransform(t) == data


def test_partial_cubemap_faces():
    payload = testgen.bc1_realistic(64 * 2, seed=5)
    data = make_cubemap_dds(32, 32, payload, faces=2)
    assert parse_dds(data).data_length == 8 * 8 * 8 * 2


def test_dx10_texture_array():
    per_surface = 8 * 8 * 8
    payload = testgen.bc1_realistic(64 * 3, seed=6)
    data = make_dx10_array_dds(71, 32, 32, payload, array_size=3)
    assert parse_dds(data).data_length == per_surface * 3
    handler = DdsHandler()
    t = handler.transform_bundle(data, TransformBundle.default_all())
    assert handler.untransform(t) == data


def test_dx10_cubemap_array():
    payload = testgen.bc1_realistic(64 * 12, seed=7)
    data = make_dx10_array_dds(71, 32, 32, payload, array_size=2, cube=True)
    assert parse_dds(data).data_length == 8 * 8 * 8 * 12
