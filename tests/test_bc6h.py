"""BC6H mode-aware transform: oracle, device parity, native, header, end-to-end.

Framework extension: the reference reserves 80 header bytes for BC6H
(``embed/mod.rs:97-103``) and ships nothing; this build implements the same
chunk-local mode-sort machinery as BC7 with BC6H's mode-id map (``oracle/bc6h.py``).
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.estimate.zstd import ZstdEstimation
from dxt_lossless_transform_tpu.formats.bundle import TransformBundle
from dxt_lossless_transform_tpu.formats.embed import TransformFormat, TransformHeader
from dxt_lossless_transform_tpu.formats.handlers import DdsHandler
from dxt_lossless_transform_tpu.oracle import bc6h as oracle_bc6h
from dxt_lossless_transform_tpu.ops import bc6h as ops_bc6h
from dxt_lossless_transform_tpu.settings import Bc6hTransformSettings

from test_dds_dx10 import make_dx10_dds

ALL_SETTINGS = tuple(Bc6hTransformSettings.all_combinations())


def test_mode_lut():
    # 2-bit modes
    assert oracle_bc6h.MODE_LUT[0b00] == 0 and oracle_bc6h.MODE_LUT[0b01] == 1
    # valid 5-bit two-region modes 2,6,10,14,18,22,26,30 -> ids 2..9
    for i, v in enumerate((2, 6, 10, 14, 18, 22, 26, 30)):
        assert oracle_bc6h.MODE_LUT[v] == 2 + i
    # one-region modes 3,7,11,15 -> 10..13; reserved 19,23,27,31 share id 14
    for i, v in enumerate((3, 7, 11, 15)):
        assert oracle_bc6h.MODE_LUT[v] == 10 + i
    for v in (19, 23, 27, 31):
        assert oracle_bc6h.MODE_LUT[v] == 14
    # upper bits of byte0 (endpoint payload) never affect the id
    assert oracle_bc6h.MODE_LUT[0b11100010] == oracle_bc6h.MODE_LUT[2]
    assert int(oracle_bc6h.MODE_LUT.max()) <= 14  # id 15 reserved for device padding


@pytest.mark.parametrize("settings", ALL_SETTINGS)
@pytest.mark.parametrize("n", [1, 7, 1000, 4097])
def test_oracle_roundtrip(settings, n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 256, (n, 16), dtype=np.uint8).tobytes()
    t = oracle_bc6h.transform(data, settings)
    assert len(t) == oracle_bc6h.transformed_len(len(data), settings)
    assert oracle_bc6h.untransform(t, settings) == data


@pytest.mark.parametrize("settings", ALL_SETTINGS)
def test_device_matches_oracle(settings, monkeypatch):
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")
    for n in (1, 5, 1000, 4099):
        rng = np.random.default_rng(n + 20)
        data = rng.integers(0, 256, (n, 16), dtype=np.uint8).tobytes()
        t_dev = ops_bc6h.transform(data, settings)
        assert t_dev == oracle_bc6h.transform(data, settings)
        assert ops_bc6h.untransform(t_dev, settings) == data


def test_native_matches_oracle():
    from dxt_lossless_transform_tpu import runtime

    if not (runtime.available() or runtime.build()):
        pytest.skip("native runtime not buildable")
    rng = np.random.default_rng(6)
    data = rng.integers(0, 256, (4099, 16), dtype=np.uint8).tobytes()
    for s in ALL_SETTINGS:
        t = runtime.bc6h_transform(data, s.sort_by_mode, s.split_byte_planes)
        assert t == oracle_bc6h.transform(data, s)
        assert runtime.bc6h_untransform(t, len(data), s.sort_by_mode,
                                        s.split_byte_planes) == data


def test_header_roundtrip():
    for s in ALL_SETTINGS:
        h = TransformHeader.for_bc6h(s)
        assert h.format == TransformFormat.BC6H
        assert TransformHeader.from_bytes(h.to_bytes()).bc6h_settings() == s


def test_dds_end_to_end():
    # DXGI 95 = BC6H_UF16; 64x64 -> 256 blocks of 16 bytes
    rng = np.random.default_rng(12)
    blocks = rng.integers(0, 256, (256, 16), dtype=np.uint8)
    blocks[:128, 0] = 0xE2  # mode streaks (valid 5-bit mode 2 with endpoint bits)
    blocks[128:, 0] = 0x03  # one-region mode 3
    data = make_dx10_dds(95, 64, 64, blocks.tobytes())
    handler = DdsHandler()
    assert handler.can_handle(data)
    transformed = handler.transform_bundle(data, TransformBundle.default_all())
    assert len(transformed) == len(data) + 128  # ceil(256/2) mode-stream bytes
    assert handler.untransform(transformed) == data


def test_auto_identity_on_noise():
    rng = np.random.default_rng(13)
    data = rng.integers(0, 256, (2048, 16), dtype=np.uint8).tobytes()
    out, best = ops_bc6h.transform_bc6h_auto(data, ZstdEstimation(1))
    assert best == Bc6hTransformSettings(False, False)
    assert out == data
