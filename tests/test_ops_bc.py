"""Device ops vs numpy oracle: differential + round-trip tests.

The TPU-build analog of the reference's SIMD-vs-portable parity tests
(``bc1/src/test_prelude.rs:154-536``): every device kernel family is compared
byte-for-byte against the oracle on deterministic and realistic data, including
remainder-exercising block counts.
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.oracle import bc1 as obc1, bc2 as obc2, bc3 as obc3, ycocg as oycocg
from dxt_lossless_transform_tpu.ops import bc1, bc2, bc3, ycocg
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings,
    Bc2TransformSettings,
    Bc3TransformSettings,
)
from dxt_lossless_transform_tpu.utils import testgen

BLOCK_COUNTS = (1, 3, 255, 256, 1000)


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
def test_ycocg_matches_oracle_exhaustive(variant):
    import jax.numpy as jnp

    all_u16 = np.arange(65536, dtype=np.int32)
    dec = np.asarray(ycocg.decorrelate(jnp.asarray(all_u16), variant))
    np.testing.assert_array_equal(dec.astype(np.uint16), oycocg.decorrelate(all_u16, variant))
    rec = np.asarray(ycocg.recorrelate(jnp.asarray(dec), variant))
    np.testing.assert_array_equal(rec.astype(np.uint16), all_u16.astype(np.uint16))


@pytest.mark.parametrize("settings", list(Bc1TransformSettings.all_combinations()))
def test_bc1_matches_oracle(settings):
    for n in BLOCK_COUNTS:
        data = testgen.bc1_realistic(n, seed=n)
        assert bc1.transform(data, settings) == obc1.transform(data, settings)
        t = obc1.transform(data, settings)
        assert bc1.untransform(t, settings) == data


@pytest.mark.parametrize("settings", list(Bc2TransformSettings.all_combinations()))
def test_bc2_matches_oracle(settings):
    for n in (1, 3, 256):
        data = testgen.bc2_realistic(n, seed=n)
        assert bc2.transform(data, settings) == obc2.transform(data, settings)
        t = obc2.transform(data, settings)
        assert bc2.untransform(t, settings) == data


@pytest.mark.parametrize("settings", list(Bc3TransformSettings.all_combinations()))
def test_bc3_matches_oracle(settings):
    for n in (1, 3, 256):
        data = testgen.bc3_realistic(n, seed=n)
        assert bc3.transform(data, settings) == obc3.transform(data, settings)
        t = obc3.transform(data, settings)
        assert bc3.untransform(t, settings) == data


def test_bc1_random_data_all_settings():
    data = testgen.bc_blocks(513, 8, seed=7)
    for s in Bc1TransformSettings.all_combinations():
        assert bc1.transform(data, s) == obc1.transform(data, s)
        assert bc1.untransform(bc1.transform(data, s), s) == data


@pytest.mark.parametrize("variant", [0, 1, 2, 3])
@pytest.mark.parametrize("split", [False, True])
def test_bc1_fused_words_path(variant, split):
    import jax.numpy as jnp

    n = 512
    data = testgen.bc1_realistic(n, seed=11)
    flat = jnp.asarray(np.frombuffer(data, "<u4"))
    flat = bc1.transform_words_fused(flat, int(variant), split)
    expected = obc1.transform(
        data, Bc1TransformSettings(variant, split))
    assert np.asarray(flat).astype("<u4").tobytes() == expected
    back = bc1.untransform_words_fused(flat, int(variant), split)
    assert np.asarray(back).astype("<u4").tobytes() == data


@pytest.mark.parametrize("variant", [0, 1])
@pytest.mark.parametrize("split", [False, True])
def test_bc2_fused_words_path(variant, split):
    import jax.numpy as jnp

    n = 256
    data = testgen.bc2_realistic(n, seed=12)
    flat = jnp.asarray(np.frombuffer(data, "<u4"))
    flat = bc2.transform_words_fused(flat, int(variant), split)
    expected = obc2.transform(data, Bc2TransformSettings(variant, split))
    assert np.asarray(flat).astype("<u4").tobytes() == expected
    back = bc2.untransform_words_fused(flat, int(variant), split)
    assert np.asarray(back).astype("<u4").tobytes() == data


@pytest.mark.parametrize("variant", [0, 1])
@pytest.mark.parametrize("split_alpha", [False, True])
@pytest.mark.parametrize("split_colour", [False, True])
def test_bc3_fused_words_path(variant, split_alpha, split_colour):
    import jax.numpy as jnp

    n = 256
    data = testgen.bc3_realistic(n, seed=13)
    flat = jnp.asarray(np.frombuffer(data, "<u4"))
    flat = bc3.transform_words_fused(flat, int(variant), split_alpha, split_colour)
    expected = obc3.transform(data, Bc3TransformSettings(variant, split_alpha, split_colour))
    assert np.asarray(flat).astype("<u4").tobytes() == expected
    back = bc3.untransform_words_fused(flat, int(variant), split_alpha, split_colour)
    assert np.asarray(back).astype("<u4").tobytes() == data
