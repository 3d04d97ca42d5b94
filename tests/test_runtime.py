"""Native C++ runtime: bit-exactness vs the oracle, zstd interop, batch driver."""

import numpy as np
import pytest

from dxt_lossless_transform_tpu import runtime
from dxt_lossless_transform_tpu.estimate import ZstdEstimation
from dxt_lossless_transform_tpu.estimate.ltu import DEFAULT_OFFSETS, _coverage_score_np
from dxt_lossless_transform_tpu.oracle import bc1 as o1, bc2 as o2, bc3 as o3
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
)
from dxt_lossless_transform_tpu.utils import testgen

pytestmark = pytest.mark.skipif(
    not (runtime.available() or runtime.build()), reason="native runtime not buildable")


def test_native_bc1_matches_oracle():
    data = testgen.bc1_realistic(1237, seed=1)  # odd count exercises remainders
    for s in Bc1TransformSettings.all_combinations():
        v, sp = int(s.decorrelation_mode), s.split_colour_endpoints
        assert runtime.bc1_transform(data, v, sp) == o1.transform(data, s)
        assert runtime.bc1_untransform(o1.transform(data, s), v, sp) == data


def test_native_bc2_bc3_match_oracle():
    d2 = testgen.bc2_realistic(731, seed=2)
    for s in Bc2TransformSettings.all_combinations():
        v, sp = int(s.decorrelation_mode), s.split_colour_endpoints
        assert runtime.bc2_transform(d2, v, sp) == o2.transform(d2, s)
        assert runtime.bc2_untransform(o2.transform(d2, s), v, sp) == d2
    d3 = testgen.bc3_realistic(731, seed=3)
    for s in Bc3TransformSettings.all_combinations():
        v = int(s.decorrelation_mode)
        sa, sc = s.split_alpha_endpoints, s.split_colour_endpoints
        assert runtime.bc3_transform(d3, v, sa, sc) == o3.transform(d3, s)
        assert runtime.bc3_untransform(o3.transform(d3, s), v, sa, sc) == d3


def test_native_ltu_matches_numpy():
    buf = testgen.bc1_realistic(4096, seed=9)
    assert runtime.ltu_estimate(buf) == _coverage_score_np(
        np.frombuffer(buf, np.uint8), DEFAULT_OFFSETS)


def test_native_zstd_interop():
    est = ZstdEstimation(3)
    payload = b"hello world" * 100
    blob = runtime.zstd_compress(payload, 3)
    assert est.decompress(blob, 2000) == payload
    assert runtime.zstd_decompress(est.compress(payload), 2000) == payload
    assert runtime.zstd_estimate(payload, 3) == len(blob)


def test_native_batch_estimate():
    bufs = [testgen.bc1_realistic(512, seed=i) for i in range(16)]
    batch = runtime.zstd_estimate_batch(bufs, level=1)
    singles = [runtime.zstd_estimate(b, 1) for b in bufs]
    assert batch == singles


def test_invalid_length_rejected():
    with pytest.raises(ValueError):
        runtime.bc1_transform(b"\x00" * 7, 1, True)


def test_estimator_vtable_custom():
    """A caller-supplied Python estimator drives the native auto-search."""
    import zstandard

    calls = []

    def my_estimate(buf: bytes) -> int:
        calls.append(len(buf))
        return len(zstandard.ZstdCompressor(level=1).compress(buf))

    data = testgen.bc1_realistic(2048, seed=21)
    est = runtime.make_estimator(my_estimate)
    out, variant, split = runtime.bc1_transform_auto(data, est, use_all=True)
    assert len(calls) == 8 and all(n == len(data) // 2 for n in calls)
    s = Bc1TransformSettings(type(Bc1TransformSettings().decorrelation_mode)(variant),
                             split)
    assert out == o1.transform(data, s)
    assert runtime.bc1_untransform(out, variant, split) == data
    # same winner as the pure-Python zstd auto path (identical candidate set/regions)
    from dxt_lossless_transform_tpu.ops import auto as ops_auto
    _, py_settings = ops_auto.transform_bc1_auto(
        data, ZstdEstimation(1), use_all_decorrelation_modes=True)
    assert (int(py_settings.decorrelation_mode), py_settings.split_colour_endpoints) \
        == (variant, split)


def test_estimator_vtable_builtin_and_errors():
    data = testgen.bc2_realistic(1024, seed=22)
    est = runtime.builtin_estimator("ltu")
    out, variant, split = runtime.bc2_transform_auto(data, est)
    assert runtime.bc2_untransform(out, variant, split) == data

    def boom(_buf):
        raise RuntimeError("estimator failed")

    from dxt_lossless_transform_tpu.errors import AutoTransformError

    with pytest.raises(AutoTransformError):
        runtime.bc1_transform_auto(testgen.bc1_realistic(64, seed=0),
                                   runtime.make_estimator(boom))


def test_c_vtable_consumer_program():
    """The pure-C consumer test (make test) builds and passes."""
    import os
    import subprocess

    native_dir = os.path.join(os.path.dirname(runtime.__file__), "native")
    res = subprocess.run(["make", "-C", native_dir, "test"],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr


def test_native_bc7_matches_oracle():
    from dxt_lossless_transform_tpu.oracle import bc7 as o7
    from dxt_lossless_transform_tpu.settings import Bc7TransformSettings

    rng = np.random.default_rng(7)
    for n in (1, 5, 4097, 10000):  # ragged + cross-chunk cases
        blocks = rng.integers(0, 256, (n, 16), dtype=np.uint8)
        if n > 3:
            blocks[2, 0] = 0  # invalid block (mode id 8)
        data = blocks.tobytes()
        for s in Bc7TransformSettings.all_combinations():
            t = runtime.bc7_transform(data, s.sort_by_mode, s.split_byte_planes)
            assert t == o7.transform(data, s), (n, s)
            assert runtime.bc7_untransform(t, len(data), s.sort_by_mode,
                                           s.split_byte_planes) == data, (n, s)


def test_native_rgb_matches_oracle():
    from dxt_lossless_transform_tpu.oracle import rgb as org
    from dxt_lossless_transform_tpu.settings import RgbTransformSettings

    rng = np.random.default_rng(8)
    for layout in ("rgba8888", "bgra8888", "bgr888"):
        size = org._LAYOUTS[layout][0]
        data = rng.integers(0, 256, 1237 * size, dtype=np.uint8).tobytes()
        for s in RgbTransformSettings.all_combinations():
            t = runtime.rgb_transform(data, layout, s.decorrelate, s.split_channels)
            assert t == org.transform(data, layout, s), (layout, s)
            assert runtime.rgb_untransform(t, layout, s.decorrelate,
                                           s.split_channels) == data, (layout, s)


def test_native_dds_parser_matches_python(reference_assets):
    """dlt_parse_dds (C) vs formats.dds.parse_dds (Python) on the real assets."""
    import ctypes
    import os

    from dxt_lossless_transform_tpu.formats.dds import parse_dds
    from dxt_lossless_transform_tpu import runtime as rt

    lib = rt._try_load()
    if lib is None:
        pytest.skip("native runtime unavailable")

    class DdsInfo(ctypes.Structure):
        _fields_ = [("format", ctypes.c_int), ("data_offset", ctypes.c_uint32),
                    ("data_length", ctypes.c_uint32)]

    lib.dlt_parse_dds.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                                  ctypes.POINTER(DdsInfo)]
    lib.dlt_parse_dds.restype = ctypes.c_int
    lib.dlt_is_dds.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
    lib.dlt_is_dds.restype = ctypes.c_int

    for name in sorted(os.listdir(reference_assets)):
        if not name.endswith(".dds"):
            continue
        raw = open(os.path.join(reference_assets, name), "rb").read()
        info_py = parse_dds(raw)
        info_c = DdsInfo()
        assert lib.dlt_is_dds(rt._buf(raw), len(raw)) == 1, name
        assert lib.dlt_parse_dds(rt._buf(raw), len(raw), ctypes.byref(info_c)) == 0
        assert info_c.format == int(info_py.format), name
        assert info_c.data_offset == info_py.data_offset, name
        assert info_c.data_length == info_py.data_length, name


def test_batch_untransform_matches_oracle():
    """One native call restores a whole window (pthread pool in C; settings
    vary per file) -- must be byte-identical to the oracle inverses."""
    import numpy as np

    from dxt_lossless_transform_tpu import runtime
    from dxt_lossless_transform_tpu.oracle import (
        bc1 as o1, bc2 as o2, bc3 as o3,
    )
    from dxt_lossless_transform_tpu.settings import (
        Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
        YCoCgVariant,
    )

    if not runtime.available():
        pytest.skip("native runtime not built")
    rng = np.random.default_rng(9)
    cases = (
        ("bc1", 8, o1,
         lambda i: Bc1TransformSettings(YCoCgVariant(i % 4), bool(i % 2))),
        ("bc2", 16, o2,
         lambda i: Bc2TransformSettings(YCoCgVariant(i % 4), bool(i % 2))),
        ("bc3", 16, o3,
         lambda i: Bc3TransformSettings(YCoCgVariant(i % 4), bool(i % 2),
                                        bool(i % 3))),
    )
    for fmt, bs, oracle, mk in cases:
        payloads = [rng.integers(0, 256, bs * n, np.uint8).tobytes()
                    for n in (1, 7, 100, 1001)]
        settings = [mk(i) for i in range(len(payloads))]
        t = [oracle.transform(p, s) for p, s in zip(payloads, settings)]
        assert runtime.batch_untransform(fmt, t, settings) == payloads, fmt
    assert runtime.batch_untransform("bc1", [], []) == []
