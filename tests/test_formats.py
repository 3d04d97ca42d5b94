"""File-format layer: DDS parsing, header embed, handler round-trips, multi-handler
dispatch (mirrors the reference's integration tests,
``file-formats-api/tests/integration_test.rs:10-120``)."""

import struct

import pytest

from dxt_lossless_transform_tpu.api import Bc1AutoTransformBuilder
from dxt_lossless_transform_tpu.estimate import ZstdEstimation
from dxt_lossless_transform_tpu.formats import (
    DdsFormat,
    DdsHandler,
    NoSupportedHandler,
    TransformBundle,
    TransformFormat,
    TransformHeader,
    file_io,
    likely_dds,
    parse_dds,
    transform_slice_with_multiple_handlers,
    untransform_slice_with_multiple_handlers,
)
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings,
    Bc2TransformSettings,
    Bc3TransformSettings,
)
from dxt_lossless_transform_tpu.utils import testgen


def test_parse_dds_legacy_fourcc():
    for fmt, expected in [("BC1", DdsFormat.BC1), ("BC2", DdsFormat.BC2),
                          ("BC3", DdsFormat.BC3)]:
        data = testgen.make_dds(fmt, 64, 64)
        info = parse_dds(data)
        assert info is not None and info.format == expected
        assert info.data_offset == 0x80
        bs = 8 if fmt == "BC1" else 16
        assert info.data_length == 16 * 16 * bs


def test_parse_dds_mipmap_chain():
    data = testgen.make_dds("BC1", 64, 64, mipmaps=7)
    info = parse_dds(data)
    # 16x16 + 8x8 + 4x4 + 2x2 + 1x1 + 1x1 + 1x1 blocks (4x4 rounding, min 1x1 texel)
    expected_blocks = 256 + 64 + 16 + 4 + 1 + 1 + 1
    assert info.data_length == expected_blocks * 8
    assert len(data) == 0x80 + info.data_length


def test_parse_dds_rejects_garbage():
    assert parse_dds(b"not a dds" * 20) is None
    assert not likely_dds(b"XXXX" + bytes(200))
    assert parse_dds(bytes(4)) is None  # too short


def test_header_roundtrip_all_formats():
    for s in Bc1TransformSettings.all_combinations():
        h = TransformHeader.for_bc1(s)
        assert TransformHeader.from_bytes(h.to_bytes()).bc1_settings() == s
    for s in Bc2TransformSettings.all_combinations():
        h = TransformHeader.for_bc2(s)
        assert TransformHeader.from_bytes(h.to_bytes()).bc2_settings() == s
    for s in Bc3TransformSettings.all_combinations():
        h = TransformHeader.for_bc3(s)
        assert TransformHeader.from_bytes(h.to_bytes()).bc3_settings() == s


def test_header_format_tags_match_reference():
    # u4 ids per embed/transform_format.rs:10-31
    assert TransformFormat.BC1 == 0x00
    assert TransformFormat.BC2 == 0x01
    assert TransformFormat.BC3 == 0x02
    assert TransformFormat.BC7 == 0x03
    assert TransformFormat.BC6H == 0x04
    assert TransformFormat.RGBA8888 == 0x05
    assert TransformFormat.BC4 == 0x08
    assert TransformFormat.BC5 == 0x09


def test_bc1_header_bit_layout():
    # Known bit positions: version=0 (bits 0-1), split (bit 2), variant bits 3-4
    from dxt_lossless_transform_tpu.settings import YCoCgVariant
    h = TransformHeader.for_bc1(Bc1TransformSettings(YCoCgVariant.VARIANT1, True))
    word = struct.unpack("<I", h.to_bytes())[0]
    assert word & 0xF == 0x00           # format tag BC1
    data = word >> 4
    assert data & 0x3 == 0              # version
    assert (data >> 2) & 1 == 1         # split
    assert (data >> 3) & 0x3 == 0       # Variant1 encodes as 0


@pytest.mark.parametrize("fmt", ["BC1", "BC2", "BC3"])
def test_dds_handler_roundtrip(fmt):
    data = testgen.make_dds(fmt, 64, 64, mipmaps=3, trailing=b"EXTRA-TAIL")
    handler = DdsHandler()
    bundle = TransformBundle.default_all()
    transformed = handler.transform_bundle(data, bundle)
    assert len(transformed) == len(data)
    # Magic must be overwritten...
    assert transformed[:4] != b"DDS "
    # ...headers and trailing bytes preserved
    assert transformed[4:0x80] == data[4:0x80]
    assert transformed.endswith(b"EXTRA-TAIL")
    restored = handler.untransform(transformed)
    assert restored == data


def test_dds_handler_detection():
    handler = DdsHandler()
    data = testgen.make_dds("BC1", 16, 16)
    assert handler.can_handle(data)
    assert not handler.can_handle(b"garbage" * 40)
    transformed = handler.transform_bundle(data, TransformBundle.default_all())
    assert handler.can_handle_untransform(transformed)


def test_multi_handler_dispatch():
    class RecordingHandler:
        def __init__(self):
            self.calls = []

        def can_handle(self, data, ext=None):
            self.calls.append("can_handle")
            return False

        def transform_bundle(self, data, bundle):
            raise AssertionError("should not be called")

    rec = RecordingHandler()
    data = testgen.make_dds("BC1", 16, 16)
    out = transform_slice_with_multiple_handlers(
        [rec, DdsHandler()], data, TransformBundle.default_all())
    assert rec.calls == ["can_handle"]
    back = untransform_slice_with_multiple_handlers([DdsHandler()], out)
    assert back == data


def test_multi_handler_no_match():
    with pytest.raises(NoSupportedHandler):
        transform_slice_with_multiple_handlers([], b"x", TransformBundle.default_all())


def test_missing_builder_error():
    from dxt_lossless_transform_tpu.formats import NoBuilderForFormat
    data = testgen.make_dds("BC2", 16, 16)
    bundle = TransformBundle(bc1=None, bc2=None)  # no BC2 builder
    with pytest.raises(NoBuilderForFormat):
        DdsHandler().transform_bundle(data, bundle)


def test_file_io_roundtrip(tmp_path):
    data = testgen.make_dds("BC1", 32, 32)
    src = tmp_path / "in.dds"
    src.write_bytes(data)
    t = tmp_path / "t.dds"
    r = tmp_path / "r.dds"
    handler = DdsHandler()
    file_io.transform_file_with_handler(handler, TransformBundle.default_all(), src, t)
    file_io.untransform_file_with_handler(handler, t, r)
    assert r.read_bytes() == data


def test_auto_builder_in_bundle():
    data = testgen.make_dds("BC1", 64, 64)
    bundle = TransformBundle(bc1=Bc1AutoTransformBuilder(ZstdEstimation(1)))
    handler = DdsHandler()
    transformed = handler.transform_bundle(data, bundle)
    assert handler.untransform(transformed) == data


def test_reference_asset_roundtrip(reference_assets):
    # Real files from the reference corpus: transform, check ratio improves, restore.
    import zstandard
    handler = DdsHandler()
    bundle = TransformBundle.default_all()
    cctx = zstandard.ZstdCompressor(level=16)
    for name in ("r2-256-bc1.dds", "r2-256-bc2.dds", "r2-256-bc3.dds"):
        data = open(f"{reference_assets}/{name}", "rb").read()
        transformed = handler.transform_bundle(data, bundle)
        assert handler.untransform(transformed) == data
        assert len(cctx.compress(transformed)) < len(cctx.compress(data))


def test_bc7_asset_roundtrip(reference_assets):
    # The mode-aware BC7 transform (framework extension; the reference only reserves
    # header space) must round-trip the real asset bit-exactly, including the
    # payload-size change from the prepended mode stream.
    data = open(f"{reference_assets}/r2-256-bc7.dds", "rb").read()
    handler = DdsHandler()
    assert handler.can_handle(data)
    transformed = handler.transform_bundle(data, TransformBundle.default_all())
    n_blocks = 65536 // 16
    assert len(transformed) == len(data) + (n_blocks + 1) // 2
    assert handler.can_handle_untransform(transformed)
    assert handler.untransform(transformed) == data
