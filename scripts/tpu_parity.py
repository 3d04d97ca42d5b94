"""Full kernel-parity matrix on the real TPU: every BC1-BC5 settings combo plus the
BC7/BC6H mode-sort paths (flat Mosaic kernels, ragged valid counts), compiled
kernels vs the numpy byte-oracle, plus the Pallas LTU estimator kernel vs its
XLA twin.

Run: python scripts/tpu_parity.py          (exit 0 = all green)
"""

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    import jax

    from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache
    from dxt_lossless_transform_tpu.utils import parity

    _enable_persistent_compile_cache()
    if jax.default_backend() != "tpu":
        print("SKIP: not a TPU backend", flush=True)
        return 0

    t0 = time.time()
    count = parity.run(parity.full_combos(),
                       log=lambda m: print(f"[{time.time()-t0:6.1f}s] {m}", flush=True))

    # Pallas LTU coverage kernel vs the XLA scorer
    import numpy as np
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.estimate.ltu import DEFAULT_OFFSETS, _coverage_scores
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import SPAN, coverage_scores_pallas

    rng = np.random.default_rng(3)
    regions = jnp.asarray(rng.integers(0, 256, (4, 8 * SPAN), dtype=np.uint8))
    valid = jnp.int32(8 * SPAN - 123)
    got = np.asarray(coverage_scores_pallas(regions, valid, DEFAULT_OFFSETS))
    want = np.asarray(_coverage_scores(regions, valid, DEFAULT_OFFSETS))
    np.testing.assert_allclose(got, want)
    print(f"[{time.time()-t0:6.1f}s] parity ok: pallas LTU kernel ({count + 1} checks)",
          flush=True)
    print("ALL PARITY CHECKS PASSED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
