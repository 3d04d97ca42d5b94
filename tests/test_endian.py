"""Endian-portability execution proof (coverage row #38).

The reference executes LE<->BE transform/untransform equality via cross/QEMU
(``commands/debug_endian/endian_test.rs:43-280``); here the same matrix runs
under the byteswap simulation (``dxt_lossless_transform_tpu.endian``): every
serialization boundary executes its big-endian-host form and the on-disk bytes
must match the native-LE run for all formats x settings, both directions.
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu import endian
from dxt_lossless_transform_tpu.utils.endian_harness import run_matrix


def test_endian_primitives():
    buf = bytes(range(16))
    with endian.simulate_big_endian():
        be_u4 = endian.from_bytes(buf, "u4")
        be_bytes = endian.to_bytes(be_u4, "u4")
        assert endian.simulating_big_endian()
    assert not endian.simulating_big_endian()
    np.testing.assert_array_equal(be_u4, np.frombuffer(buf, "<u4"))
    assert be_bytes == buf
    with endian.simulate_big_endian():
        assert endian.pack_u32(0x20534444) == b"DDS "
        assert endian.unpack_u32(b"DDS ") == 0x20534444


def test_endian_matrix_synthetic():
    report = run_matrix(assets_dir=None, n_blocks=64)
    # 10 formats, every settings combo, 4 checks each; 3 synthetic containers
    assert len(report.per_format) == 10
    assert report.containers == 3
    assert report.checks > 100


def test_endian_matrix_reference_assets(reference_assets):
    report = run_matrix(assets_dir=reference_assets, n_blocks=16)
    # bc1/bc2/bc3/bc7 real assets x their full settings matrices
    assert report.containers >= 3 + 4 + 4 + 8 + 4


def test_two_phase_exchange_cli(reference_assets, tmp_path):
    """debug-endian-transform (BE host) -> debug-endian-untransform (native):
    the on-disk exchange form of the cross-host matrix."""
    from dxt_lossless_transform_tpu.cli.main import main

    ex = tmp_path / "exchange"
    assert main(["debug-endian-transform", "--assets", reference_assets,
                 "--exchange", str(ex)]) == 0
    assert main(["debug-endian-untransform", "--assets", reference_assets,
                 "--exchange", str(ex)]) == 0


def test_simulation_detects_native_order_assumption():
    """The harness must actually detect an endianness bug: a boundary that
    serializes in HOST order (the bug class the simulation exists to catch)
    produces different bytes under the BE simulation."""
    arr = np.arange(4, dtype=np.uint32)

    def buggy_to_bytes(a):  # native-order serialization -- the bug
        return np.ascontiguousarray(
            a, dtype=(">u4" if endian.simulating_big_endian() else "<u4")
        ).tobytes()

    native = buggy_to_bytes(arr)
    with endian.simulate_big_endian():
        be = buggy_to_bytes(arr)
    assert native != be  # the simulation flags the bug

    # ...whereas the correct pinned boundary is invariant:
    native = endian.to_bytes(arr, "u4")
    with endian.simulate_big_endian():
        be = endian.to_bytes(arr, "u4")
    assert native == be
