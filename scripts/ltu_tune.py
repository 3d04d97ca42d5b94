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
             1024, 2048, 4096)  # == estimate.ltu.DEFAULT_OFFSETS (round-2 pick)
# candidate ladders for the round-4 retune (kernel constraint: every offset
# >= 1024 must be a multiple of 1024 -- the static row-slice path)
OFF_DENSER = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 96,
              128, 192, 256, 384, 512, 768, 1024, 2048, 4096)
OFF_SHORT = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 48, 64,
             128, 256)
# u16-lane-biased ladder (colour/endpoint streams are 2-byte lanes; even
# offsets catch lane-aligned matches, a few odds keep byte-phase coverage)
OFF_U16 = (1, 2, 3, 4, 6, 8, 10, 12, 16, 20, 24, 32, 48, 64, 96, 128, 192,
           256, 384, 512, 768, 1024, 2048, 4096)


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


def coverage4(data: np.ndarray, offsets) -> int:
    """4-gram variant: longer grams reject coincidental 3-byte matches."""
    if len(data) < 4:
        return 0
    d = data.astype(np.uint64)
    g = d[:-3] | (d[1:-2] << 8) | (d[2:-1] << 16) | (d[3:] << 24)
    covered = np.zeros(len(g), bool)
    for k in offsets:
        if k >= len(g):
            break
        covered[k:] |= g[k:] == g[:-k]
    return int(covered.sum())


def weighted_coverage(data: np.ndarray, offsets, alpha: float) -> float:
    """Coverage with far matches discounted: a position matched only at a large
    offset is worth (1 - alpha*log2(k)/12) of a position matched nearby."""
    if len(data) < 3:
        return 0.0
    g = (data[:-2].astype(np.uint32) | (data[1:-1].astype(np.uint32) << 8)
         | (data[2:].astype(np.uint32) << 16))
    kmin = np.zeros(len(g), np.int32)
    for k in sorted(offsets, reverse=True):
        if k >= len(g):
            continue
        eq = g[k:] == g[:-k]
        kmin[k:][eq] = k
    cov = kmin > 0
    w = 1.0 - alpha * np.log2(np.maximum(kmin, 1)) / 12.0
    return float(np.where(cov, w, 0.0).sum())


def weighted_coverage4(data: np.ndarray, offsets, alpha: float) -> float:
    """4-gram grams + far-match discount combined."""
    if len(data) < 4:
        return 0.0
    d = data.astype(np.uint64)
    g = d[:-3] | (d[1:-2] << 8) | (d[2:-1] << 16) | (d[3:] << 24)
    kmin = np.zeros(len(g), np.int64)
    for k in sorted(offsets, reverse=True):
        if k >= len(g):
            continue
        eq = g[k:] == g[:-k]
        kmin[k:][eq] = k
    cov = kmin > 0
    w = 1.0 - alpha * np.log2(np.maximum(kmin, 1)) / 12.0
    return float(np.where(cov, w, 0.0).sum())


def int_weight(k: int, slope: float = 1.0, base: int = 24) -> int:
    """Integer offset discount: base - slope*log2(k), floored at 1."""
    import math
    return max(1, base - int(round(slope * math.log2(k)))) if k > 1 else base


def weighted_coverage4_int(data: np.ndarray, offsets, slope: float = 1.0,
                           base: int = 24) -> int:
    """Kernel-ready integer form: 4-grams, per-position weight of the SMALLEST
    matching offset from a static table; score = base*len - this."""
    if len(data) < 4:
        return 0
    d = data.astype(np.uint64)
    g = d[:-3] | (d[1:-2] << 8) | (d[2:-1] << 16) | (d[3:] << 24)
    w = np.zeros(len(g), np.int32)
    for k in sorted(offsets, reverse=True):
        if k >= len(g):
            continue
        eq = g[k:] == g[:-k]
        w[k:][eq] = int_weight(k, slope, base)
    return int(w.sum())


def entropy_bits(data: np.ndarray) -> float:
    counts = np.bincount(data, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum()) * len(data)


def scorers():
    return {
        "cov_dense": lambda d: len(d) - coverage(d, OFF_DENSE),
        "cov_denser": lambda d: len(d) - coverage(d, OFF_DENSER),
        "cov_short": lambda d: len(d) - coverage(d, OFF_SHORT),
        "entropy": lambda d: entropy_bits(d) / 8.0,
        "cov_dense+ent*0.5": lambda d: (len(d) - coverage(d, OFF_DENSE))
        + 0.5 * entropy_bits(d) / 8.0,
        "cov_dense+ent*1.0": lambda d: (len(d) - coverage(d, OFF_DENSE))
        + entropy_bits(d) / 8.0,
        "cov_dense*ent": lambda d: (len(d) - coverage(d, OFF_DENSE))
        * (entropy_bits(d) / (8.0 * len(d))),
        "cov_denser*ent": lambda d: (len(d) - coverage(d, OFF_DENSER))
        * (entropy_bits(d) / (8.0 * len(d))),
        "cov4_dense": lambda d: len(d) - coverage4(d, OFF_DENSE),
        "cov4_denser": lambda d: len(d) - coverage4(d, OFF_DENSER),
        "cov_w0.25": lambda d: len(d) - weighted_coverage(d, OFF_DENSE, 0.25),
        "cov_w0.5": lambda d: len(d) - weighted_coverage(d, OFF_DENSE, 0.5),
        "cov4_w0.25": lambda d: len(d) - weighted_coverage(d, OFF_DENSER, 0.25),
        "cov4g_w0.5": lambda d: len(d) - weighted_coverage4(d, OFF_DENSE, 0.5),
        "cov4g_w0.5_dsr": lambda d: len(d) - weighted_coverage4(d, OFF_DENSER, 0.5),
        "cov4g_int": lambda d: 24 * len(d) - weighted_coverage4_int(d, OFF_DENSE),
        # round-5 per-format retune candidates: offset ladders x weight slopes
        "cov4g_int_dsr": lambda d: 24 * len(d)
        - weighted_coverage4_int(d, OFF_DENSER),
        "cov4g_int_short": lambda d: 24 * len(d)
        - weighted_coverage4_int(d, OFF_SHORT),
        "cov4g_int_s2": lambda d: 24 * len(d)
        - weighted_coverage4_int(d, OFF_DENSE, slope=2.0),
        "cov4g_int_s0.5": lambda d: 24 * len(d)
        - weighted_coverage4_int(d, OFF_DENSE, slope=0.5),
        "cov4g_int_s3b36": lambda d: 36 * len(d)
        - weighted_coverage4_int(d, OFF_DENSE, slope=3.0, base=36),
        "cov4g_int_u16": lambda d: 24 * len(d)
        - weighted_coverage4_int(d, OFF_U16),
        "cov4g_int+ent": lambda d: 24 * len(d)
        - weighted_coverage4_int(d, OFF_DENSE) + 3.0 * entropy_bits(d) / 8.0,
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
    # estimator-family ceiling: files where >= 2 candidates are within eps of the
    # true best are coin-flips for ANY approximate estimator
    for eps in (0.0, 1e-3, 5e-3):
        tied = int(((truth <= best[:, None] * (1 + eps)).sum(axis=1) > 1).sum())
        log(f"{fmt}: files with >=2 candidates within {eps*100:.1f}% of best: "
            f"{100.0 * tied / len(payloads):.1f}%")
    log(f"{fmt}: truth done")
    # files whose best is clear by >0.1%: misses there are real estimator errors,
    # not coin flips between near-equal candidates
    clear = (truth <= best[:, None] * 1.001).sum(axis=1) == 1
    for name, fn in scorers().items():
        effs = []
        exact = clear_exact = 0
        for i, d in enumerate(payloads):
            scores = [sum(fn(np.frombuffer(r, np.uint8))
                          for r in regions_fn(d, s)) for s in cands]
            ci = int(np.argmin(scores))
            effs.append(best[i] / truth[i, ci])
            exact += int(truth[i, ci] == best[i])
            clear_exact += int(clear[i] and truth[i, ci] == best[i])
        n_clear = max(int(clear.sum()), 1)
        log(f"{fmt}/{name:14s} exact {100*exact/len(payloads):5.1f}% "
            f"(clear-margin files: {100*clear_exact/n_clear:5.1f}%) "
            f"efficiency {100*np.mean(effs):6.2f}%")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--legacy", action="store_true",
                    help="round-2 procedural corpus instead of the realistic one")
    args = ap.parse_args()
    if args.legacy:
        images = [procedural_texture((128, 256, 512)[i % 3], seed=1000 + i,
                                     kind=("albedo", "foliage")[(i // 3) % 2])
                  for i in range(args.files)]
    else:
        # the corpus-study v2 families (photo/normal/flat/tiled/terrain), single
        # top mips at study sizes small enough for the python scorer loop
        from dxt_lossless_transform_tpu.utils import corpus as corpus_mod

        images = [mips[0] for _name, mips in corpus_mod.build_realistic_corpus(
            args.files, sizes=(256, 320, 512), with_mips=False)]
    study("bc1", obc1, tuple(BC1_COMPREHENSIVE_CANDIDATES),
          lambda img: encode_bc1(img[..., :3]), regions_bc1, images)
    study("bc3", obc3, tuple(BC3_COMPREHENSIVE_CANDIDATES), encode_bc3,
          regions_bc3, images)


if __name__ == "__main__":
    main()
