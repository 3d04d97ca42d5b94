"""Uncompressed RGBA8888/BGRA8888/BGR888 transforms: oracle, device, end-to-end.

The reference reserves a decorrelation header flag for these formats
(``embed/formats/rgba8888.rs``) but ships no transform; this framework implements
channel-plane splitting + mod-256 lifting decorrelation (``oracle/rgb.py``).
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.estimate.zstd import ZstdEstimation
from dxt_lossless_transform_tpu.formats.bundle import TransformBundle
from dxt_lossless_transform_tpu.formats.embed import TransformFormat, TransformHeader
from dxt_lossless_transform_tpu.formats.handlers import DdsHandler
from dxt_lossless_transform_tpu.oracle import rgb as oracle_rgb
from dxt_lossless_transform_tpu.ops import rgb as ops_rgb
from dxt_lossless_transform_tpu.settings import RGB_FAST_CANDIDATES, RgbTransformSettings

from test_dds_dx10 import make_uncompressed_dds

LAYOUTS = ("rgba8888", "bgra8888", "bgr888")
ALL_SETTINGS = tuple(RgbTransformSettings.all_combinations())


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("settings", ALL_SETTINGS)
def test_oracle_roundtrip(layout, settings):
    size = oracle_rgb._LAYOUTS[layout][0]
    rng = np.random.default_rng(hash((layout, settings.decorrelate)) % 2**32)
    for n in (1, 7, 1000):
        data = rng.integers(0, 256, n * size, dtype=np.uint8).tobytes()
        t = oracle_rgb.transform(data, layout, settings)
        assert len(t) == len(data)
        assert oracle_rgb.untransform(t, layout, settings) == data


@pytest.mark.parametrize("layout", LAYOUTS)
def test_device_matches_oracle(layout, monkeypatch):
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")
    size = oracle_rgb._LAYOUTS[layout][0]
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 3000 * size, dtype=np.uint8).tobytes()
    for s in ALL_SETTINGS:
        t = ops_rgb.transform(data, layout, s)
        assert t == oracle_rgb.transform(data, layout, s), s
        assert ops_rgb.untransform(t, layout, s) == data, s


@pytest.mark.parametrize("layout", ("rgba8888", "bgra8888"))
@pytest.mark.parametrize("dec", (False, True))
def test_channel_kernels_interpret(layout, dec):
    """Flat Mosaic channel split/merge (interpret mode) vs the oracle, with the
    fused decorrelation."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops.pallas.channels import (
        merge_channels_tpu, split_channels_tpu,
    )
    from dxt_lossless_transform_tpu.ops.pallas.shuffle import MAX_ROWS, WIDTH

    _, ri, gi, bi = oracle_rgb._LAYOUTS[layout]
    n = MAX_ROWS * WIDTH  # one tile
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, 4 * n, dtype=np.uint8).tobytes()
    flat = jnp.asarray(np.frombuffer(data, "<u4"))
    streams = split_channels_tpu(flat, ri, gi, bi, dec, interpret=True)
    got = b"".join(np.asarray(s).astype("<u4").tobytes() for s in streams)
    want = oracle_rgb.transform(data, layout, RgbTransformSettings(dec, True))
    assert got == want
    back = merge_channels_tpu(tuple(streams), ri, gi, bi, dec, interpret=True)
    assert np.asarray(back).astype("<u4").tobytes() == data


@pytest.mark.parametrize("layout", ("rgba8888", "bgra8888"))
def test_word_decorrelate_xla_matches_oracle(layout):
    """The dec-only flat-u32 path (no channel split) vs the oracle."""
    rng = np.random.default_rng(22)
    data = rng.integers(0, 256, 4 * 4096, dtype=np.uint8).tobytes()
    flat = np.frombuffer(data, "<u4")
    out = np.asarray(ops_rgb._decorrelate_words_xla(flat, layout, True))
    want = oracle_rgb.transform(data, layout, RgbTransformSettings(True, False))
    assert out.astype("<u4").tobytes() == want
    back = np.asarray(ops_rgb._recorrelate_words_xla(out, layout, True))
    assert back.astype("<u4").tobytes() == data


def test_decorrelation_golden():
    # one RGBA pixel: R=200 G=100 B=50 A=7 -> r'=100, g=100, b'=206 (50-100 mod 256)
    data = bytes([200, 100, 50, 7])
    t = oracle_rgb.transform(data, "rgba8888", RgbTransformSettings(True, False))
    assert t == bytes([100, 100, 206, 7])
    # BGR888 stores B,G,R
    t = oracle_rgb.transform(bytes([50, 100, 200]), "bgr888",
                             RgbTransformSettings(True, False))
    assert t == bytes([206, 100, 100])


def test_channel_split_golden():
    data = bytes([1, 2, 3, 4, 5, 6, 7, 8])  # two RGBA pixels
    t = oracle_rgb.transform(data, "rgba8888", RgbTransformSettings(False, True))
    assert t == bytes([1, 5, 2, 6, 3, 7, 4, 8])


def test_header_roundtrip():
    for fmt in (TransformFormat.RGBA8888, TransformFormat.BGRA8888,
                TransformFormat.BGR888):
        for s in ALL_SETTINGS:
            h = TransformHeader.for_rgb(fmt, s)
            h2 = TransformHeader.from_bytes(h.to_bytes())
            assert h2.format == fmt and h2.rgb_settings() == s


def _gradient_pixels(n, size):
    # smooth image: channels correlated (g base, r/b small offsets), noisy alpha
    rng = np.random.default_rng(2)
    g = ((np.arange(n) // 8) % 256).astype(np.uint8)
    px = np.zeros((n, size), np.uint8)
    px[:, 0] = g + rng.integers(0, 3, n).astype(np.uint8)
    px[:, 1] = g
    px[:, 2] = g + rng.integers(0, 5, n).astype(np.uint8)
    if size == 4:
        px[:, 3] = 255
    return px


@pytest.mark.parametrize("layout,size", [("rgba8888", 4), ("bgr888", 3)])
def test_auto_improves_compression_on_gradient(layout, size):
    import zstandard as zstd

    data = _gradient_pixels(16384, size).tobytes()
    out, best = ops_rgb.transform_rgb_auto(data, layout, ZstdEstimation(1))
    assert best != RgbTransformSettings(False, False)
    assert ops_rgb.untransform(out, layout, best) == data
    c = zstd.ZstdCompressor(level=16)
    assert len(c.compress(out)) < len(c.compress(data))


def test_identity_on_noise():
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 4096 * 4, dtype=np.uint8).tobytes()
    out, best = ops_rgb.transform_rgb_auto(data, "rgba8888", ZstdEstimation(1))
    assert best == RgbTransformSettings(False, False)
    assert out == data


@pytest.mark.parametrize("bit_count,masks,size", [
    (32, (0xFF, 0xFF00, 0xFF0000, 0xFF000000), 4),   # RGBA8888
    (32, (0xFF0000, 0xFF00, 0xFF, 0xFF000000), 4),   # BGRA8888
    (24, (0xFF0000, 0xFF00, 0xFF, 0), 3),            # BGR888
])
def test_uncompressed_dds_end_to_end(bit_count, masks, size):
    payload = _gradient_pixels(64 * 64, size)[:, :size].tobytes()
    data = make_uncompressed_dds(64, 64, bit_count, masks, payload)
    handler = DdsHandler()
    assert handler.can_handle(data)
    transformed = handler.transform_bundle(data, TransformBundle.default_all())
    assert len(transformed) == len(data)
    assert handler.can_handle_untransform(transformed)
    assert handler.untransform(transformed) == data


@pytest.mark.parametrize("dec", [False, True])
def test_bgr_kernels_interpret_match_oracle(dec):
    """BGR888 Mosaic split/merge kernels (interpret mode) vs the numpy oracle."""
    import numpy as np

    from dxt_lossless_transform_tpu.oracle import rgb as orgb
    from dxt_lossless_transform_tpu.ops.pallas.channels import (
        MAX_ROWS, W_BGR, merge_bgr_tpu, split_bgr_tpu,
    )
    from dxt_lossless_transform_tpu.settings import RgbTransformSettings

    n = MAX_ROWS * 4 * (W_BGR // 3)  # one full tile of pixels
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, 3 * n, np.uint8).tobytes()
    s = RgbTransformSettings(decorrelate=dec, split_channels=True)
    want = orgb.transform(data, "bgr888", s)
    flat = np.frombuffer(data, "<u4")
    streams = split_bgr_tpu(flat, dec, interpret=True)
    got = b"".join(np.asarray(st).astype("<u4").tobytes() for st in streams)
    assert got == want
    back = merge_bgr_tpu(streams, dec, interpret=True)
    assert np.asarray(back).astype("<u4").tobytes() == data
