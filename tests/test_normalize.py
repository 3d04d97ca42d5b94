"""Normalization: visual-losslessness property tests + canonical byte patterns.

Mirrors the reference's fuzz invariant: a normalized block decodes to identical
pixels (``fuzz_targets/bc1_normalize.rs:17-72``).
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.estimate import ZstdEstimation
from dxt_lossless_transform_tpu.oracle import decode, normalize as onorm
from dxt_lossless_transform_tpu.oracle import bc1 as obc1
from dxt_lossless_transform_tpu.ops import normalize as ops_norm
from dxt_lossless_transform_tpu.settings import Bc1TransformSettings
from dxt_lossless_transform_tpu.utils import testgen

CM = onorm.ColorNormalizationMode
AM = onorm.AlphaNormalizationMode


def _mixed_bc1(n=512, seed=3) -> bytes:
    """Realistic blocks + solid-color blocks + transparent blocks."""
    rng = np.random.default_rng(seed)
    words = np.frombuffer(testgen.bc1_realistic(n, seed), "<u4").reshape(-1, 2).copy()
    # make ~1/4 solid (c0 == c1, indices select c0, 4-color irrelevant)
    solid = rng.random(n) < 0.25
    c = rng.integers(0, 65536, n, np.uint32)
    words[solid, 0] = (c | (c << 16))[solid]
    words[solid, 1] = 0
    # make ~1/8 transparent (c0 <= c1, all indices = 3)
    transp = (rng.random(n) < 0.125) & ~solid
    words[transp, 0] = 0x12340000  # c0=0 <= c1
    words[transp, 1] = 0xFFFFFFFF
    return words.tobytes()


@pytest.mark.parametrize("mode", list(CM.all_values()))
def test_bc1_normalize_visually_lossless(mode):
    data = _mixed_bc1()
    normalized = onorm.normalize_blocks_bc1(data, mode)
    assert len(normalized) == len(data)
    np.testing.assert_array_equal(decode.decode_bc1(normalized), decode.decode_bc1(data))


def test_bc1_normalize_canonical_patterns():
    # transparent block -> all 0xFF
    blk_transparent = bytes([0x00, 0x00, 0xFF, 0xFF]) + b"\xFF" * 4
    out = onorm.normalize_blocks_bc1(blk_transparent, CM.COLOR0_ONLY)
    assert out == b"\xFF" * 8
    # solid red (c0=c1=0xF800, idx 0) -> [c565, 0, 0] / [c565, c565, 0]
    blk_solid = bytes([0x00, 0xF8, 0x00, 0xF8, 0, 0, 0, 0])
    assert onorm.normalize_blocks_bc1(blk_solid, CM.COLOR0_ONLY) == \
        bytes([0x00, 0xF8, 0x00, 0x00, 0, 0, 0, 0])
    assert onorm.normalize_blocks_bc1(blk_solid, CM.REPLICATE_COLOR) == blk_solid


@pytest.mark.parametrize("mode", list(CM.all_values()))
def test_bc2_normalize_visually_lossless(mode):
    data = testgen.bc2_realistic(256, seed=4)
    normalized = onorm.normalize_blocks_bc2(data, mode)
    np.testing.assert_array_equal(decode.decode_bc2(normalized), decode.decode_bc2(data))


@pytest.mark.parametrize("amode", list(AM.all_values()))
@pytest.mark.parametrize("cmode", list(CM.all_values()))
def test_bc3_normalize_visually_lossless(amode, cmode):
    data = testgen.bc3_realistic(256, seed=5)
    normalized = onorm.normalize_blocks_bc3(data, amode, cmode)
    np.testing.assert_array_equal(decode.decode_bc3(normalized), decode.decode_bc3(data))


def test_bc3_alpha_canonical_patterns():
    color = bytes([0x00, 0xF8, 0x00, 0xF8, 0, 0, 0, 0])
    opaque = bytes([255, 255]) + bytes(6) + color  # uniform opaque alpha
    out = onorm.normalize_blocks_bc3(opaque, AM.OPAQUE_FILL_ALL, CM.NONE)
    assert out[:8] == b"\xFF" * 8
    out = onorm.normalize_blocks_bc3(opaque, AM.OPAQUE_ZERO_ALPHA_MAX_INDICES, CM.NONE)
    assert out[:8] == bytes([0, 0]) + b"\xFF" * 6
    half = bytes([128, 128]) + bytes(6) + color  # uniform alpha 128
    out = onorm.normalize_blocks_bc3(half, AM.OPAQUE_FILL_ALL, CM.NONE)
    assert out[:8] == bytes([128, 0, 0, 0, 0, 0, 0, 0])  # falls back to UNIFORM


def test_normalization_improves_compression():
    data = _mixed_bc1(4096, seed=7)
    est = ZstdEstimation(3)
    plain = est.estimate(obc1.transform(data, Bc1TransformSettings()))
    normalized = onorm.normalize_blocks_bc1(data, CM.COLOR0_ONLY)
    norm = est.estimate(obc1.transform(normalized, Bc1TransformSettings()))
    assert norm < plain


def test_auto_with_normalization_roundtrip():
    data = _mixed_bc1(1024, seed=8)
    est = ZstdEstimation(1)
    out, settings, mode = ops_norm.transform_bc1_auto_with_normalization(data, est)
    normalized = onorm.normalize_blocks_bc1(data, mode)
    # untransform reproduces the *normalized* file byte-exactly
    assert obc1.untransform(out, settings) == normalized
    # and the normalized file decodes identically to the original
    np.testing.assert_array_equal(decode.decode_bc1(normalized), decode.decode_bc1(data))


def test_bc2_auto_with_normalization():
    from dxt_lossless_transform_tpu.oracle import bc2 as obc2

    data = testgen.bc2_realistic(512, seed=11)
    est = ZstdEstimation(1)
    out, settings, mode = ops_norm.transform_bc2_auto_with_normalization(data, est)
    normalized = onorm.normalize_blocks_bc2(data, mode)
    assert obc2.untransform(out, settings) == normalized
    np.testing.assert_array_equal(decode.decode_bc2(normalized),
                                  decode.decode_bc2(data))


def test_bc3_auto_with_normalization():
    data = testgen.bc3_realistic(512, seed=9)
    est = ZstdEstimation(1)
    out, settings, amode, cmode = ops_norm.transform_bc3_auto_with_normalization(
        data, est, alpha_modes=(AM.NONE, AM.OPAQUE_FILL_ALL))
    from dxt_lossless_transform_tpu.oracle import bc3 as obc3
    normalized = onorm.normalize_blocks_bc3(data, amode, cmode)
    assert obc3.untransform(out, settings) == normalized


def test_normalize_split_blocks_in_place():
    data = _mixed_bc1(256, seed=10)
    colors, indices = obc1.split_blocks(data)
    onorm.normalize_split_blocks_in_place_bc1(colors, indices, CM.COLOR0_ONLY)
    expected = obc1.split_blocks(onorm.normalize_blocks_bc1(data, CM.COLOR0_ONLY))
    np.testing.assert_array_equal(colors, expected[0])
    np.testing.assert_array_equal(indices, expected[1])
