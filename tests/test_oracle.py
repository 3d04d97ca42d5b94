"""Oracle self-consistency: round-trips, algebraic properties, decode sanity.

These tests pin the numpy oracle's semantics; the device ops are then tested against
the oracle in test_ops_*.py (differential testing, mirroring the reference's
SIMD-vs-portable pattern).
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.oracle import bc1, bc2, bc3, color565, decode, ycocg
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings,
    Bc2TransformSettings,
    Bc3TransformSettings,
)
from dxt_lossless_transform_tpu.utils import testgen

ALL_U16 = np.arange(65536, dtype=np.uint16)


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
def test_ycocg_roundtrip_exhaustive(variant):
    # decorrelate -> recorrelate is the identity on every possible 16-bit color
    out = ycocg.recorrelate(ycocg.decorrelate(ALL_U16, variant), variant)
    np.testing.assert_array_equal(out, ALL_U16)


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_ycocg_decorrelate_is_bijection(variant):
    out = ycocg.decorrelate(ALL_U16, variant)
    assert len(np.unique(out)) == 65536


def test_ycocg_variant_packings_differ():
    # Sanity: the three variants place bits differently (catch copy/paste errors)
    d1 = ycocg.decorrelate(ALL_U16, 1)
    d2 = ycocg.decorrelate(ALL_U16, 2)
    d3 = ycocg.decorrelate(ALL_U16, 3)
    assert not np.array_equal(d1, d2)
    assert not np.array_equal(d1, d3)
    assert not np.array_equal(d2, d3)


def test_color565_expansion():
    # Bit-replication expansion: endpoints 0 and max map to 0 and 255 exactly
    assert color565.expand_red(np.uint16(0xF800)) == 255
    assert color565.expand_green(np.uint16(0x07E0)) == 255
    assert color565.expand_blue(np.uint16(0x001F)) == 255
    assert color565.expand_red(np.uint16(0)) == 0
    # from_rgb(255,255,255) is all-ones
    assert color565.from_rgb(255, 255, 255) == 0xFFFF


@pytest.mark.parametrize("settings", list(Bc1TransformSettings.all_combinations()))
@pytest.mark.parametrize("gen,seed", [("random", 1), ("realistic", 2)])
def test_bc1_roundtrip(settings, gen, seed):
    for nblocks in (1, 2, 3, 7, 64, 1000):
        data = (testgen.bc_blocks(nblocks, 8, seed) if gen == "random"
                else testgen.bc1_realistic(nblocks, seed))
        t = bc1.transform(data, settings)
        assert len(t) == len(data)
        assert bc1.untransform(t, settings) == data


@pytest.mark.parametrize("settings", list(Bc2TransformSettings.all_combinations()))
def test_bc2_roundtrip(settings):
    for nblocks in (1, 2, 7, 256):
        data = testgen.bc2_realistic(nblocks, seed=3)
        t = bc2.transform(data, settings)
        assert len(t) == len(data)
        assert bc2.untransform(t, settings) == data
    data = testgen.bc_blocks(100, 16, seed=4)
    assert bc2.untransform(bc2.transform(data, settings), settings) == data


@pytest.mark.parametrize("settings", list(Bc3TransformSettings.all_combinations()))
def test_bc3_roundtrip(settings):
    for nblocks in (1, 2, 7, 256):
        data = testgen.bc3_realistic(nblocks, seed=5)
        t = bc3.transform(data, settings)
        assert len(t) == len(data)
        assert bc3.untransform(t, settings) == data
    data = testgen.bc_blocks(100, 16, seed=6)
    assert bc3.untransform(bc3.transform(data, settings), settings) == data


def test_bc1_transform_layout():
    # Two known blocks; verify the exact stream layout bytes (no decorrelation)
    blocks = bytes([0x01, 0x02, 0x03, 0x04, 0xAA, 0xBB, 0xCC, 0xDD,
                    0x11, 0x12, 0x13, 0x14, 0x55, 0x66, 0x77, 0x88])
    s = Bc1TransformSettings(decorrelation_mode=0, split_colour_endpoints=False)
    assert bc1.transform(blocks, s) == bytes(
        [0x01, 0x02, 0x03, 0x04, 0x11, 0x12, 0x13, 0x14,
         0xAA, 0xBB, 0xCC, 0xDD, 0x55, 0x66, 0x77, 0x88])
    s = Bc1TransformSettings(decorrelation_mode=0, split_colour_endpoints=True)
    assert bc1.transform(blocks, s) == bytes(
        [0x01, 0x02, 0x11, 0x12,   # c0 stream
         0x03, 0x04, 0x13, 0x14,   # c1 stream
         0xAA, 0xBB, 0xCC, 0xDD, 0x55, 0x66, 0x77, 0x88])


def test_bc3_transform_layout():
    # One known block; full-split layout check
    block = bytes(range(16))
    s = Bc3TransformSettings(decorrelation_mode=0, split_alpha_endpoints=True,
                             split_colour_endpoints=True)
    out = bc3.transform(block, s)
    assert out == bytes([0x00,                    # alpha0
                         0x01,                    # alpha1
                         0x02, 0x03, 0x04, 0x05, 0x06, 0x07,  # alpha indices
                         0x08, 0x09,              # c0
                         0x0A, 0x0B,              # c1
                         0x0C, 0x0D, 0x0E, 0x0F])  # color indices


def test_bc1_decode_solid_red():
    blk = bytes([0x00, 0xF8, 0x00, 0xF8, 0, 0, 0, 0])
    px = decode.decode_bc1(blk)
    assert px.shape == (1, 4, 4, 4)
    assert (px[0, ..., 0] == 255).all() and (px[0, ..., 1] == 0).all()
    assert (px[0, ..., 3] == 255).all()


def test_bc1_decode_three_color_mode():
    # c0 <= c1 -> index 3 is transparent black
    blk = bytes([0x00, 0x00, 0xFF, 0xFF]) + b"\xFF\xFF\xFF\xFF"  # all pixels index 3
    px = decode.decode_bc1(blk)
    assert (px[0, ..., 3] == 0).all()


def test_bc2_decode_alpha_scaling():
    # alpha nibble k scales to k*17
    alpha = bytes([0x10, 0x32, 0x54, 0x76, 0x98, 0xBA, 0xDC, 0xFE])
    blk = alpha + bytes([0x00, 0xF8, 0x00, 0xF8]) + bytes(4)
    px = decode.decode_bc2(blk)
    expected = (np.arange(16, dtype=np.uint32) * 17).reshape(4, 4)
    np.testing.assert_array_equal(px[0, ..., 3], expected)


def test_bc3_decode_alpha_modes():
    # a0 > a1: 8 interpolated values; a0 <= a1: codes 6/7 are 0/255
    blk7 = bytes([200, 100]) + bytes(6) + bytes([0x00, 0xF8, 0x00, 0xF8]) + bytes(4)
    px = decode.decode_bc3(blk7)
    assert px[0, 0, 0, 3] == 200  # code 0 -> a0
    idx_bytes = int(6).to_bytes(1, "little") * 6  # code pattern with 110 = 6 at pos 0
    blk5 = bytes([100, 200]) + idx_bytes + bytes([0x00, 0xF8, 0x00, 0xF8]) + bytes(4)
    px5 = decode.decode_bc3(blk5)
    assert px5[0, 0, 0, 3] == 0  # code 110 -> transparent in 5-interp mode


def test_decode_transform_invariance():
    # decode(untransform(transform(x))) == decode(x) for every settings combo
    data = testgen.bc1_realistic(64, seed=9)
    base = decode.decode_bc1(data)
    for s in Bc1TransformSettings.all_combinations():
        rt = bc1.untransform(bc1.transform(data, s), s)
        np.testing.assert_array_equal(decode.decode_bc1(rt), base)
