"""Chunked device processing: multi-chunk assembly must be byte-identical."""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.oracle import bc1 as o1, bc2 as o2, bc3 as o3
from dxt_lossless_transform_tpu.ops import bc1, bc2, bc3, hostwrap
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
)
from dxt_lossless_transform_tpu.utils import testgen


@pytest.fixture(autouse=True)
def small_chunks(monkeypatch):
    # force multi-chunk processing on modest buffers, and device path for all sizes
    monkeypatch.setattr(hostwrap, "CHUNK_BLOCKS", 4096)
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")


@pytest.mark.parametrize("settings", [
    Bc1TransformSettings(1, True), Bc1TransformSettings(2, False),
])
def test_bc1_chunked(settings):
    for n in (4096, 8192, 10000, 12289):  # exact, 2x, ragged tails
        data = testgen.bc1_realistic(n, seed=n)
        assert bc1.transform(data, settings) == o1.transform(data, settings)
        t = o1.transform(data, settings)
        assert bc1.untransform(t, settings) == data


@pytest.mark.parametrize("settings", [
    Bc2TransformSettings(1, True), Bc2TransformSettings(0, False),
])
def test_bc2_chunked(settings):
    for n in (8192, 9001):
        data = testgen.bc2_realistic(n, seed=n)
        assert bc2.transform(data, settings) == o2.transform(data, settings)
        assert bc2.untransform(o2.transform(data, settings), settings) == data


@pytest.mark.parametrize("settings", [
    Bc3TransformSettings(1, True, True), Bc3TransformSettings(3, False, True),
])
def test_bc3_chunked(settings):
    for n in (8192, 9001):
        data = testgen.bc3_realistic(n, seed=n)
        assert bc3.transform(data, settings) == o3.transform(data, settings)
        assert bc3.untransform(o3.transform(data, settings), settings) == data
