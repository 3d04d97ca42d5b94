"""Pallas coverage kernel vs the XLA twin (interpret mode on CPU; real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dxt_lossless_transform_tpu.estimate.ltu import DEFAULT_OFFSETS, _coverage_scores


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic kernel requires TPU; CPU runs the XLA twin")
def test_pallas_coverage_bit_identical():
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import (
        SPAN, coverage_scores_pallas,
    )

    rng = np.random.default_rng(3)
    regions = jnp.asarray(rng.integers(0, 8, (3, 2 * SPAN), np.uint8))
    for valid in (2 * SPAN, 2 * SPAN - 999):
        a = np.asarray(_coverage_scores(regions, jnp.int32(valid), DEFAULT_OFFSETS))
        b = np.asarray(coverage_scores_pallas(regions, jnp.int32(valid), DEFAULT_OFFSETS))
        np.testing.assert_array_equal(a, b)
