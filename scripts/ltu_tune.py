"""Offline LTU-scorer tuning: rank-quality of scorer variants vs zstd-16 truth.

Variants of the sampled-offset coverage model are evaluated by selection
efficiency (truth size of picked candidate / truth size of best candidate) on the
same corpus as scripts/corpus_study.py. CPU-only.
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from dxt_lossless_transform_tpu import runtime  # noqa: E402
from dxt_lossless_transform_tpu.oracle import bc1 as obc1, bc3 as obc3  # noqa: E402
from dxt_lossless_transform_tpu.settings import (  # noqa: E402
    BC1_COMPREHENSIVE_CANDIDATES, BC3_COMPREHENSIVE_CANDIDATES,
)
from dxt_lossless_transform_tpu.utils.encode import (  # noqa: E402
    encode_bc1, encode_bc3, procedural_texture,
)

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


OFF_BASE = (1, 2, 3, 4, 6, 8, 12, 16, 32, 64, 256, 1024, 4096)
OFF_DENSE = (1, 2, 3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 256, 512,
             1024, 2048, 4096)


def coverage(data: np.ndarray, offsets) -> int:
    """Covered 3-gram positions (twin of estimate/ltu._coverage_score_np math)."""
    if len(data) < 3:
        return 0
    g = (data[:-2].astype(np.uint32) | (data[1:-1].astype(np.uint32) << 8)
         | (data[2:].astype(np.uint32) << 16))
    covered = np.zeros(len(g), bool)
    for k in offsets:
        if k >= len(g):
            break
        covered[k:] |= g[k:] == g[:-k]
    return int(covered.sum())


def entropy_bits(data: np.ndarray) -> float:
    counts = np.bincount(data, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum()) * len(data)


def scorers():
    return {
        "cov_base": lambda d: len(d) - coverage(d, OFF_BASE),
        "cov_dense": lambda d: len(d) - coverage(d, OFF_DENSE),
        "entropy": lambda d: entropy_bits(d) / 8.0,
        "cov+ent*0.5": lambda d: (len(d) - coverage(d, OFF_BASE))
        + 0.5 * entropy_bits(d) / 8.0,
        "cov*ent": lambda d: (len(d) - coverage(d, OFF_BASE))
        * (entropy_bits(d) / (8.0 * len(d))),
        "cov_dense*ent": lambda d: (len(d) - coverage(d, OFF_DENSE))
        * (entropy_bits(d) / (8.0 * len(d))),
    }


def regions_bc1(data, s):
    out = obc1.transform(data, s)
    return [out[: len(data) // 2]]


def regions_bc3(data, s):
    n = len(data) // 16
    out = obc3.transform(data, s)
    return [out[: 2 * n], out[8 * n:12 * n]]


def study(fmt, oracle, cands, encode, regions_fn, images):
    payloads = [encode(img) for img in images]
    truth = []
    outs = []
    for d in payloads:
        outs.extend(oracle.transform(d, s) for s in cands)
    truth = np.asarray(runtime.zstd_estimate_batch(outs, level=16)).reshape(
        len(payloads), len(cands))
    best = truth.min(axis=1)
    log(f"{fmt}: truth done")
    for name, fn in scorers().items():
        effs = []
        exact = 0
        for i, d in enumerate(payloads):
            scores = [sum(fn(np.frombuffer(r, np.uint8))
                          for r in regions_fn(d, s)) for s in cands]
            ci = int(np.argmin(scores))
            effs.append(best[i] / truth[i, ci])
            exact += int(truth[i, ci] == best[i])
        log(f"{fmt}/{name:14s} exact {100*exact/len(payloads):5.1f}% "
            f"efficiency {100*np.mean(effs):6.2f}%")


def main():
    images = [procedural_texture((128, 256, 512)[i % 3], seed=1000 + i,
                                 kind=("albedo", "foliage")[(i // 3) % 2])
              for i in range(60)]
    study("bc1", obc1, tuple(BC1_COMPREHENSIVE_CANDIDATES),
          lambda img: encode_bc1(img[..., :3]), regions_bc1, images)
    study("bc3", obc3, tuple(BC3_COMPREHENSIVE_CANDIDATES), encode_bc3,
          regions_bc3, images)


if __name__ == "__main__":
    main()
