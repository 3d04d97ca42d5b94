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


@pytest.mark.parametrize("split", [False, True])
def test_bc4_device_path_matches_oracle(split):
    """Device (XLA fallback on CPU) and forced-chunked paths vs the numpy oracle."""
    import numpy as np

    from dxt_lossless_transform_tpu.oracle import bc4 as obc4
    from dxt_lossless_transform_tpu.ops import hostwrap

    s = Bc4TransformSettings(split)
    data = testgen.bc_blocks(5000, 8, seed=44)
    t = hostwrap.transform_chunked(
        data, 8, 2, bc45._bc4_spec(split),
        lambda flat: bc45.bc4_transform_device(flat, split))
    assert t == obc4.transform_bc4(data, s)
    back = hostwrap.untransform_chunked(
        t, 8, 2, bc45._bc4_spec(split),
        lambda streams: bc45.bc4_untransform_device(streams, split))
    assert back == data


@pytest.mark.parametrize("split", [False, True])
def test_bc5_device_path_matches_oracle(split):
    from dxt_lossless_transform_tpu.oracle import bc4 as obc4
    from dxt_lossless_transform_tpu.ops import hostwrap

    s = Bc5TransformSettings(split)
    data = testgen.bc_blocks(5000, 16, seed=45)
    t = hostwrap.transform_chunked(
        data, 16, 4, bc45._bc5_spec(split),
        lambda flat: bc45.bc5_transform_device(flat, split))
    assert t == obc4.transform_bc5(data, s)
    back = hostwrap.untransform_chunked(
        t, 16, 4, bc45._bc5_spec(split),
        lambda streams: bc45.bc5_untransform_device(streams, split))
    assert back == data


@pytest.mark.parametrize("split", [False, True])
def test_bc4_bc5_kernel_interpret(split):
    """Pallas BC4/BC5 kernels (interpret mode) vs the oracle byte streams."""
    import numpy as np
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.oracle import bc4 as obc4
    from dxt_lossless_transform_tpu.ops.pallas import shuffle

    rng = np.random.default_rng(7)
    data4 = rng.integers(0, 256, 8 * 2048, dtype=np.uint8).tobytes()
    words = jnp.asarray(np.frombuffer(data4, "<u4"))
    streams = shuffle.bc4_transform_tpu(words, split, interpret=True)
    got = b"".join(np.asarray(s).astype("<u4").tobytes() for s in streams)
    assert got == obc4.transform_bc4(data4, Bc4TransformSettings(split))
    back = shuffle.bc4_untransform_tpu(tuple(streams), split, interpret=True)
    assert np.asarray(back).astype("<u4").tobytes() == data4

    data5 = rng.integers(0, 256, 16 * 2048, dtype=np.uint8).tobytes()
    words = jnp.asarray(np.frombuffer(data5, "<u4"))
    streams = shuffle.bc5_transform_tpu(words, split, interpret=True)
    got = b"".join(np.asarray(s).astype("<u4").tobytes() for s in streams)
    assert got == obc4.transform_bc5(data5, Bc5TransformSettings(split))
    back = shuffle.bc5_untransform_tpu(tuple(streams), split, interpret=True)
    assert np.asarray(back).astype("<u4").tobytes() == data5


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
