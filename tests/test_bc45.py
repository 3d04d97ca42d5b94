"""BC4/BC5 transforms (framework extension beyond the reference)."""

import pytest

from dxt_lossless_transform_tpu.estimate import LtuEstimation, ZstdEstimation
from dxt_lossless_transform_tpu.formats import DdsHandler, TransformBundle, TransformHeader
from dxt_lossless_transform_tpu.ops import bc45
from dxt_lossless_transform_tpu.settings import Bc4TransformSettings, Bc5TransformSettings
from dxt_lossless_transform_tpu.utils import testgen


@pytest.mark.parametrize("settings", list(Bc4TransformSettings.all_combinations()))
def test_bc4_roundtrip(settings):
    for n in (1, 3, 256, 1001):
        data = testgen.bc_blocks(n, 8, seed=n)
        t = bc45.transform_bc4(data, settings)
        assert len(t) == len(data)
        assert bc45.untransform_bc4(t, settings) == data


@pytest.mark.parametrize("settings", list(Bc5TransformSettings.all_combinations()))
def test_bc5_roundtrip(settings):
    for n in (1, 3, 256, 1001):
        data = testgen.bc_blocks(n, 16, seed=n)
        t = bc45.transform_bc5(data, settings)
        assert bc45.untransform_bc5(t, settings) == data


def test_bc4_layout():
    block = bytes(range(8)) + bytes(range(8, 16))
    t = bc45.transform_bc4(block, Bc4TransformSettings(split_endpoints=True))
    assert t == bytes([0, 8,            # a0 stream
                       1, 9,            # a1 stream
                       2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 14, 15])  # index streams
    t = bc45.transform_bc4(block, Bc4TransformSettings(split_endpoints=False))
    assert t == bytes([0, 1, 8, 9, 2, 3, 4, 5, 6, 7, 10, 11, 12, 13, 14, 15])


@pytest.mark.parametrize("estimator", [ZstdEstimation(1), LtuEstimation()])
def test_bc45_auto(estimator):
    d4 = testgen.bc_blocks(512, 8, seed=7)
    out, s = bc45.transform_bc4_auto(d4, estimator)
    assert bc45.untransform_bc4(out, s) == d4
    d5 = testgen.bc_blocks(512, 16, seed=8)
    out, s = bc45.transform_bc5_auto(d5, estimator)
    assert bc45.untransform_bc5(out, s) == d5


def test_bc45_header_roundtrip():
    for s in Bc4TransformSettings.all_combinations():
        h = TransformHeader.for_bc4(s)
        assert TransformHeader.from_bytes(h.to_bytes()).bc4_settings() == s
    for s in Bc5TransformSettings.all_combinations():
        h = TransformHeader.for_bc5(s)
        assert TransformHeader.from_bytes(h.to_bytes()).bc5_settings() == s


@pytest.mark.parametrize("fmt", ["BC4", "BC5"])
def test_bc45_dds_handler_roundtrip(fmt):
    data = testgen.make_dds(fmt, 32, 32, mipmaps=2, realistic=False)
    handler = DdsHandler()
    t = handler.transform_bundle(data, TransformBundle.default_all())
    assert t[:4] != b"DDS "
    assert handler.untransform(t) == data
