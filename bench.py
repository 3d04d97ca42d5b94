"""Round benchmark: prints ONE JSON line with the headline metric.

Headline: BC1 on-device round-trip (transform + untransform) SUSTAINED throughput
per chip, compared against the reference's published single-thread numbers
(transform ~24 GB/s, untransform ~32.2 GB/s decimal => combined 13.75 GB/s;
BASELINE.md rows 1-2).

Methodology: kernel rates are measured with K round-trips chained inside one jit
(back-to-back device execution, as a streaming pipeline with >=2 buffers in flight
sustains); the ~2 ms per-dispatch relay latency of this environment is reported
separately as single-dispatch rates in BENCH_DETAILS.json.

Every round also re-runs a quick kernel-parity subset on the chip (the full
settings matrix lives in scripts/tpu_parity.py).
"""

import json
import sys
import time

import numpy as np

_T0 = time.time()
CHAIN_K = 8


def _stage(msg):
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)

# Reference combined round-trip rate: 1 / (1/24 + 1/32.2) GB/s (decimal GB)
BASELINE_ROUNDTRIP_GBPS = 1.0 / (1.0 / 24.0 + 1.0 / 32.2)


def _sync(x):
    """Force real completion: the axon relay's block_until_ready is unreliable, so
    read back a scalar that depends on the data."""
    import jax.numpy as jnp

    leaf = x
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    return float(jnp.max(leaf.astype(jnp.float32)))


def _bench(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _roundtrip_chains():
    """Per-format jitted functions running CHAIN_K transform+untransform pairs."""
    import jax

    from dxt_lossless_transform_tpu.ops.pallas import shuffle as pk

    def bc1(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc1_transform_tpu.__wrapped__(flat, 1, True, False)
            flat = pk.bc1_untransform_tpu.__wrapped__(tuple(streams), 1, True, False)
        return flat

    def bc2(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc2_transform_tpu.__wrapped__(flat, 1, True, False)
            flat = pk.bc2_untransform_tpu.__wrapped__(tuple(streams), 1, True, False)
        return flat

    def bc3(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc3_transform_tpu.__wrapped__(flat, 1, True, True, False)
            flat = pk.bc3_untransform_tpu.__wrapped__(tuple(streams), 1, True, True,
                                                      False)
        return flat

    def bc4(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc4_transform_tpu.__wrapped__(flat, True, False)
            flat = pk.bc4_untransform_tpu.__wrapped__(tuple(streams), True, False)
        return flat

    def bc5(flat):
        for _ in range(CHAIN_K):
            streams = pk.bc5_transform_tpu.__wrapped__(flat, True, False)
            flat = pk.bc5_untransform_tpu.__wrapped__(tuple(streams), True, False)
        return flat

    return {name: jax.jit(fn) for name, fn in
            (("bc1", bc1), ("bc2", bc2), ("bc3", bc3), ("bc4", bc4), ("bc5", bc5))}


def main():
    import jax
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache

    _enable_persistent_compile_cache()

    from dxt_lossless_transform_tpu.ops import bc1, bc2, bc3
    from dxt_lossless_transform_tpu.utils import parity

    rng = np.random.default_rng(0)
    details = {"device": str(jax.devices()[0]),
               "methodology": {
                   "sustained": f"{CHAIN_K} roundtrips chained in one jit "
                                "(streaming-pipeline rate)",
                   "single_dispatch": "one transform per dispatch through the relay "
                                      "(~2 ms fixed overhead)"}}

    # In-round kernel parity on the chip (quick subset; full matrix in
    # scripts/tpu_parity.py)
    _stage("kernel parity (quick)")
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        details["parity_quick"] = parity.run(parity.quick_combos())

    # Sustained roundtrip rates (headline) + single-dispatch rates (detail)
    results = {}
    nbytes = 128 * 1024 * 1024
    chains = _roundtrip_chains() if on_tpu else {}
    for name, mod in (("bc1", bc1), ("bc2", bc2), ("bc3", bc3)):
        words = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
        if name == "bc3":
            fwd = lambda w: mod.transform_device(w, 1, True, True)
            inv = lambda s: mod.untransform_device(s, 1, True, True)
        else:
            fwd = lambda w: mod.transform_device(w, 1, True)
            inv = lambda s: mod.untransform_device(s, 1, True)
        _stage(f"kernels: {name}")
        streams = fwd(words)
        t_fwd = _bench(fwd, words)
        t_inv = _bench(inv, streams)
        entry = {
            "transform_single_dispatch_GBps": nbytes / t_fwd / 1e9,
            "untransform_single_dispatch_GBps": nbytes / t_inv / 1e9,
        }
        if name in chains:
            t_rt = _bench(chains[name], words, iters=5)
            entry["roundtrip_sustained_GBps"] = nbytes * CHAIN_K / t_rt / 1e9
        results[name] = entry
    for name in ("bc4", "bc5"):
        if name not in chains:
            continue
        _stage(f"kernels: {name}")
        words = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
        t_rt = _bench(chains[name], words, iters=5)
        results[name] = {"roundtrip_sustained_GBps": nbytes * CHAIN_K / t_rt / 1e9}

    # BC7 mode-aware kernel (framework extension): chunk-local mode sort (lax.sort,
    # the only viable TPU permutation primitive: row gather measured 0.29 GB/s,
    # one-hot MXU permutation costs the same as the sort) + Mosaic byte-plane
    # kernels. Both real auto-search candidates are reported.
    from dxt_lossless_transform_tpu.ops import bc7 as ops_bc7

    _stage("kernels: bc7")
    nblk = nbytes // 16
    words7 = jnp.asarray(rng.integers(0, 2**32, (nblk, 4), dtype=np.uint32))
    results["bc7"] = {}
    for label, sort7 in (("sort_planes", True), ("planes_only", False)):
        fwd7 = lambda w: ops_bc7.transform_device(w, nblk, sort7, True)
        planes, stream = fwd7(words7)
        sraw = np.asarray(stream)  # unpack nibbles (low first), as untransform does
        m_np = np.empty(2 * len(sraw), np.uint8)
        m_np[0::2] = sraw & 0x0F
        m_np[1::2] = sraw >> 4
        modes7 = jnp.asarray(m_np)
        inv7 = lambda p: ops_bc7.untransform_device(p, modes7, nblk, sort7, True)
        t_fwd = _bench(fwd7, words7)
        t_inv = _bench(inv7, planes)
        results["bc7"][label] = {
            "transform_GBps": nbytes / t_fwd / 1e9,
            "untransform_GBps": nbytes / t_inv / 1e9,
            "roundtrip_GBps": nbytes / (t_fwd + t_inv) / 1e9,
        }
    details["kernels"] = results

    # Auto-search throughput: batched candidate search + estimator + winning
    # transform, all on device (reference: ~1018 MiB/s LTU auto, BASELINE.md)
    from dxt_lossless_transform_tpu.parallel.sharded import bc1_auto_step_single

    flat = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
    _stage("auto-search")
    t_auto = _bench(lambda f: bc1_auto_step_single(f), flat, iters=20)
    details["bc1_auto_transform_MiBps"] = nbytes / t_auto / (1 << 20)

    # Batched corpus auto step (the pipeline hot path, Mosaic coverage scoring)
    from dxt_lossless_transform_tpu.parallel.sharded import auto_step_batched, _BC1_CANDIDATES

    _stage("batched auto step")
    B, nb = 16, 1 << 20
    flats = jnp.asarray(rng.integers(0, 2**32, (B, 2 * nb), dtype=np.uint32))
    valid = jnp.asarray(np.full((B,), 4 * nb), jnp.int32)
    step = auto_step_batched("bc1", _BC1_CANDIDATES)
    t_b = _bench(step, flats, valid, iters=10)
    details["bc1_batched_auto_MiBps"] = B * nb * 8 / t_b / (1 << 20)

    # Compression ratio on a synthetic encoded-texture corpus (8x 512^2 BC1)
    import zstandard as _z

    from dxt_lossless_transform_tpu.estimate import ZstdEstimation as _ZE
    from dxt_lossless_transform_tpu.ops import auto as _auto
    from dxt_lossless_transform_tpu.utils.encode import encode_bc1, procedural_texture

    _stage("corpus ratio")
    cctx16 = _z.ZstdCompressor(level=16)
    est1 = _ZE(1)
    plain_total = trans_total = 0
    for seed in range(8):
        payload = encode_bc1(procedural_texture(512, seed=seed)[..., :3])
        out, _ = _auto.transform_bc1_auto(payload, est1, use_all_decorrelation_modes=True)
        plain_total += len(cctx16.compress(payload))
        trans_total += len(cctx16.compress(out))
    details["corpus_ratio"] = {
        "plain_zstd16": plain_total, "transformed_zstd16": trans_total,
        "reduction_pct": round(100.0 * (1 - trans_total / plain_total), 2),
    }

    # Compression-ratio parity on the reference corpus asset (if mounted)
    try:
        import zstandard

        from dxt_lossless_transform_tpu.formats.debug import extract_blocks_from_dds
        from dxt_lossless_transform_tpu.ops import auto as ops_auto
        from dxt_lossless_transform_tpu.estimate import ZstdEstimation

        raw = open("/root/reference/src/assets/tests/r2-256-bc1.dds", "rb").read()
        ex = extract_blocks_from_dds(raw)
        cctx = zstandard.ZstdCompressor(level=16)
        out, _ = ops_auto.transform_bc1_auto(ex.data, ZstdEstimation(1),
                                             use_all_decorrelation_modes=True)
        details["ratio_check"] = {
            "plain_zstd16": len(cctx.compress(ex.data)),
            "transformed_zstd16": len(cctx.compress(out)),
        }
    except (OSError, ImportError):
        pass

    _stage("done")
    value = results["bc1"].get("roundtrip_sustained_GBps", 0.0)
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)
    print(json.dumps({
        "metric": "bc1_roundtrip_sustained_throughput_per_chip",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / BASELINE_ROUNDTRIP_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
