"""Randomized (hypothesis) property suite -- the analog of the reference's 13
libfuzzer targets (``src/fuzz/fuzz_targets/*``).

Campaign structure mirrors the fuzz crate:
- decode differential: device decoder vs numpy oracle on arbitrary block bytes
  (reference fuzzes its decoder against the independent rgbcx C++ oracle,
  ``bc1_decode.rs:19-54``);
- normalize: normalized blocks decode to IDENTICAL pixels for every mode
  (``bc1_normalize.rs:17-72``), incl. all-modes and in-place-split variants;
- transform/untransform: bit-exact round trip for arbitrary bytes and every
  settings combo (metamorphic inverse property).

Hypothesis generates adversarial byte patterns (all-zero, all-FF, boundary
values) that fixed seeds miss; shrinking gives minimal counterexamples.
"""

import numpy as np
from hypothesis import given, settings as hyp_settings, strategies as st

import jax.numpy as jnp

from dxt_lossless_transform_tpu.oracle import (
    bc1 as obc1, bc2 as obc2, bc3 as obc3, decode as odecode, normalize as onorm,
)
from dxt_lossless_transform_tpu.ops import decode as ddecode
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
)

CM = onorm.ColorNormalizationMode
AM = onorm.AlphaNormalizationMode

# block payloads: 1..64 blocks of raw bytes (any bit pattern is a valid BC block)
bc1_payload = st.binary(min_size=8, max_size=8 * 64).map(
    lambda b: b[: len(b) // 8 * 8] or b"\x00" * 8)
bc16_payload = st.binary(min_size=16, max_size=16 * 64).map(
    lambda b: b[: len(b) // 16 * 16] or b"\x00" * 16)

FAST = hyp_settings(max_examples=40, deadline=None)


# ------------------------------------------------------------- decode differential --

def _planes_to_rgba(planes) -> np.ndarray:
    """Device (4, N, 16) RGBA planes -> oracle (N, 4, 4, 4) pixel layout."""
    p = np.asarray(planes)
    return np.moveaxis(p, 0, -1).reshape(-1, 4, 4, 4).astype(np.uint8)


@FAST
@given(bc1_payload)
def test_fuzz_bc1_decode_device_vs_oracle(data):
    words = jnp.asarray(np.frombuffer(data, "<u4").reshape(-1, 2))
    np.testing.assert_array_equal(_planes_to_rgba(ddecode.decode_bc1(words)),
                                  odecode.decode_bc1(data))


@FAST
@given(bc16_payload)
def test_fuzz_bc2_decode_device_vs_oracle(data):
    words = jnp.asarray(np.frombuffer(data, "<u4").reshape(-1, 4))
    np.testing.assert_array_equal(_planes_to_rgba(ddecode.decode_bc2(words)),
                                  odecode.decode_bc2(data))


@FAST
@given(bc16_payload)
def test_fuzz_bc3_decode_device_vs_oracle(data):
    words = jnp.asarray(np.frombuffer(data, "<u4").reshape(-1, 4))
    np.testing.assert_array_equal(_planes_to_rgba(ddecode.decode_bc3(words)),
                                  odecode.decode_bc3(data))


# ------------------------------------------------------- normalize: visual equality --

@FAST
@given(bc1_payload, st.sampled_from(CM.all_values()))
def test_fuzz_bc1_normalize(data, mode):
    normalized = onorm.normalize_blocks_bc1(data, mode)
    np.testing.assert_array_equal(odecode.decode_bc1(normalized),
                                  odecode.decode_bc1(data))


@FAST
@given(bc16_payload, st.sampled_from(CM.all_values()))
def test_fuzz_bc2_normalize(data, mode):
    normalized = onorm.normalize_blocks_bc2(data, mode)
    np.testing.assert_array_equal(odecode.decode_bc2(normalized),
                                  odecode.decode_bc2(data))


@FAST
@given(bc16_payload, st.sampled_from(AM.all_values()),
       st.sampled_from(CM.all_values()))
def test_fuzz_bc3_normalize(data, amode, cmode):
    normalized = onorm.normalize_blocks_bc3(data, amode, cmode)
    np.testing.assert_array_equal(odecode.decode_bc3(normalized),
                                  odecode.decode_bc3(data))


@hyp_settings(max_examples=15, deadline=None)
@given(bc1_payload)
def test_fuzz_bc1_normalize_all_modes(data):
    for mode, normalized in onorm.normalize_blocks_all_modes_bc1(data).items():
        np.testing.assert_array_equal(odecode.decode_bc1(normalized),
                                      odecode.decode_bc1(data))


@hyp_settings(max_examples=10, deadline=None)
@given(bc16_payload)
def test_fuzz_bc2_bc3_normalize_all_modes(data):
    for mode, normalized in onorm.normalize_blocks_all_modes_bc2(data).items():
        np.testing.assert_array_equal(odecode.decode_bc2(normalized),
                                      odecode.decode_bc2(data))
    for (am, cm), normalized in onorm.normalize_blocks_all_modes_bc3(data).items():
        np.testing.assert_array_equal(odecode.decode_bc3(normalized),
                                      odecode.decode_bc3(data))


@FAST
@given(bc1_payload, st.sampled_from(CM.all_values()))
def test_fuzz_bc1_normalize_in_place_split(data, mode):
    colors, indices = obc1.split_blocks(data)
    colors, indices = colors.copy(), indices.copy()
    onorm.normalize_split_blocks_in_place_bc1(colors, indices, mode)
    assert obc1.interleave_blocks(colors, indices) == \
        onorm.normalize_blocks_bc1(data, mode)


@FAST
@given(bc16_payload, st.sampled_from(CM.all_values()))
def test_fuzz_bc2_normalize_in_place_split(data, mode):
    alpha, colors, indices = (a.copy() for a in obc2.split_blocks(data))
    onorm.normalize_split_blocks_in_place_bc2(alpha, colors, indices, mode)
    assert obc2.interleave_blocks(alpha, colors, indices) == \
        onorm.normalize_blocks_bc2(data, mode)


@FAST
@given(bc16_payload, st.sampled_from(AM.all_values()),
       st.sampled_from(CM.all_values()))
def test_fuzz_bc3_normalize_in_place_split(data, amode, cmode):
    ep, ai, col, ci = (a.copy() for a in obc3.split_blocks(data))
    onorm.normalize_split_blocks_in_place_bc3(ep, ai, col, ci, amode, cmode)
    assert obc3.interleave_blocks(ep, ai, col, ci) == \
        onorm.normalize_blocks_bc3(data, amode, cmode)


# -------------------------------------------------------------- roundtrip inverses --

@FAST
@given(bc1_payload, st.integers(0, 3), st.booleans())
def test_fuzz_bc1_roundtrip(data, variant, split):
    s = Bc1TransformSettings(variant, split)
    assert obc1.untransform(obc1.transform(data, s), s) == data


@FAST
@given(bc16_payload, st.integers(0, 3), st.booleans())
def test_fuzz_bc2_roundtrip(data, variant, split):
    s = Bc2TransformSettings(variant, split)
    assert obc2.untransform(obc2.transform(data, s), s) == data


@FAST
@given(bc16_payload, st.integers(0, 3), st.booleans(), st.booleans())
def test_fuzz_bc3_roundtrip(data, variant, sa, sc):
    s = Bc3TransformSettings(variant, sa, sc)
    assert obc3.untransform(obc3.transform(data, s), s) == data


# ---------------------------- extension formats (BC4/BC5/BC7/BC6H/RGB) ---------------

from dxt_lossless_transform_tpu.oracle import (  # noqa: E402
    bc4 as obc4, bc6h as obc6h, bc7 as obc7, rgb as orgb,
)
from dxt_lossless_transform_tpu.settings import (  # noqa: E402
    Bc4TransformSettings, Bc5TransformSettings, Bc6hTransformSettings,
    Bc7TransformSettings, RgbTransformSettings,
)

bc8_payload = st.binary(min_size=8, max_size=8 * 64).map(
    lambda b: b[: len(b) // 8 * 8] or b"\x00" * 8)


@FAST
@given(bc8_payload, st.booleans())
def test_fuzz_bc4_roundtrip(data, split):
    s = Bc4TransformSettings(split)
    assert obc4.untransform_bc4(obc4.transform_bc4(data, s), s) == data


@FAST
@given(bc16_payload, st.booleans())
def test_fuzz_bc5_roundtrip(data, split):
    s = Bc5TransformSettings(split)
    assert obc4.untransform_bc5(obc4.transform_bc5(data, s), s) == data


@FAST
@given(bc16_payload, st.booleans(), st.booleans())
def test_fuzz_bc7_roundtrip(data, sort, planes):
    s = Bc7TransformSettings(sort, planes)
    assert obc7.untransform(obc7.transform(data, s), s) == data


@FAST
@given(bc16_payload, st.booleans(), st.booleans())
def test_fuzz_bc6h_roundtrip(data, sort, planes):
    s = Bc6hTransformSettings(sort, planes)
    assert obc6h.untransform(obc6h.transform(data, s), s) == data


@FAST
@given(st.binary(min_size=4, max_size=256),
       st.sampled_from(["rgba8888", "bgra8888", "bgr888"]),
       st.booleans(), st.booleans())
def test_fuzz_rgb_roundtrip(data, layout, dec, split):
    size = orgb._LAYOUTS[layout][0]
    data = data[: len(data) // size * size] or b"\x00" * size
    s = RgbTransformSettings(dec, split)
    assert orgb.untransform(orgb.transform(data, layout, s), layout, s) == data


# ------------------------------------ header embed ------------------------------------

@FAST
@given(st.integers(0, 3), st.booleans())
def test_fuzz_bc1_header_roundtrip(variant, split):
    from dxt_lossless_transform_tpu.formats.embed import TransformHeader

    s = Bc1TransformSettings(variant, split)
    h2 = TransformHeader.from_bytes(TransformHeader.for_bc1(s).to_bytes())
    assert h2.bc1_settings() == s


# --- round 5: batched untransform + endian simulation properties --------------------


@given(st.lists(st.tuples(st.binary(min_size=0, max_size=8 * 40),
                          st.sampled_from(tuple(Bc1TransformSettings
                                                .all_combinations()))),
                min_size=1, max_size=6))
@FAST
def test_fuzz_untransform_batch_matches_per_file(entries):
    """UntransformBatchProcessor restores exactly what per-file untransform
    restores, for arbitrary (payload, settings) mixes (ordered, isolated)."""
    from dxt_lossless_transform_tpu.parallel.pipeline import (
        UntransformBatchProcessor,
    )

    entries = [(b[: len(b) // 8 * 8], s) for b, s in entries]
    transformed = [(obc1.transform(p, s), s) for p, s in entries]
    got = UntransformBatchProcessor("bc1", max_batch=3).process(transformed)
    assert got == [p for p, _ in entries]


@given(bc1_payload, st.integers(0, 3), st.booleans())
@FAST
def test_fuzz_endian_sim_transform_invariant(data, variant, split):
    """Arbitrary payloads serialize identically on the simulated BE host --
    the randomized extension of tests/test_endian.py's fixed matrix."""
    from dxt_lossless_transform_tpu import endian

    s = Bc1TransformSettings(variant, split)
    t_le = obc1.transform(data, s)
    with endian.simulate_big_endian():
        t_be = obc1.transform(data, s)
        back_be = obc1.untransform(t_le, s)
    assert t_be == t_le
    assert back_be == data


@given(st.integers(0, 2**32 - 1), st.sampled_from([1, 3, 4, 5, 6, 7]),
       st.integers(0, 3), st.integers(0, 1))
@hyp_settings(max_examples=40, deadline=None)
def test_fuzz_bc7_codec_mode_exactness(seed, mode, rot, idxm):
    """Random pixel blocks, every implemented BC7 mode x rotation x idxMode:
    the packed bits must decode to exactly the reconstruction the encoder
    scored (err is computed in the original channel space, so equality proves
    the decoder un-rotates and un-swaps the index arrays too)."""
    import dxt_lossless_transform_tpu.utils.bc7codec as C

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (8, 16, 4), np.uint8)
    if mode in (1, 3):
        px[..., 3] = 255
    if mode not in (4, 5):
        rot = 0
    if mode != 4:
        idxm = 0
    packed, err = C._encode_mode(px, mode, rot=rot, idxm=idxm)
    dec = C._decode_mode(packed, mode)
    mse = ((dec.astype(np.int64) - px.astype(np.int64)) ** 2).sum(axis=(1, 2))
    np.testing.assert_array_equal(mse, err)


@given(st.integers(0, 2**32 - 1), st.sampled_from([3, 7, 11, 15]))
@hyp_settings(max_examples=25, deadline=None)
def test_fuzz_bc6h_codec_mode_exactness(seed, hv):
    """Random half-float blocks, every one-region BC6H mode (incl. the
    delta-endpoint forms): packed bits decode to the scored reconstruction."""
    import dxt_lossless_transform_tpu.utils.bc7codec as C

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 0x7C00, (8, 16, 3), np.int64)  # finite half range
    packed, err = C._encode_bc6h_mode(px, hv)
    dec = C.decode_bc6h(packed.tobytes())
    mse = ((dec.astype(np.int64) - px) ** 2).sum(axis=(1, 2))
    np.testing.assert_array_equal(mse, err)
