"""BC7 sort-path experiments, round 4 (verdict items: u16 payload columns,
fused forward stages, cumsum-derived inverse permutation).

Stages timed separately with chained jits (single-dispatch rates understate the
hardware through the relay; see PERF_NOTES). Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("DLT_COMPILE_CACHE", "/root/repo/.xla_cache")

from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache  # noqa: E402

_enable_persistent_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

T0 = time.time()
NBYTES = int(os.environ.get("PERF_BYTES", str(128 << 20)))
NBLK = NBYTES // 16
C = 4096


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


def sync(x):
    leaf = x
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    return float(jnp.max(leaf.astype(jnp.float32)))


def bench(fn, *args, iters=8, name=""):
    out = fn(*args)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    rate = NBYTES / best / 1e9
    log(f"{name}: {best*1e3:.2f} ms -> {rate:.2f} GB/s")
    return rate


def main():
    from dxt_lossless_transform_tpu.ops import bc7 as ops_bc7

    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, 4 * NBLK, dtype=np.uint32))
    sync(words)
    log(f"payload uploaded ({NBYTES >> 20} MiB, {NBLK} blocks)")

    modes_np = rng.integers(0, 8, NBLK, dtype=np.uint16)
    modes = jnp.asarray(modes_np)
    key_np = (modes_np.reshape(-1, C) * C
              + np.arange(C, dtype=np.uint16)).astype(np.uint16)
    keys = jnp.asarray(key_np)
    cols = tuple(jnp.asarray(rng.integers(0, 2**32, NBLK, dtype=np.uint32))
                 for _ in range(4))
    cols16 = tuple(jnp.asarray(rng.integers(0, 2**16, NBLK, dtype=np.uint16))
                   for _ in range(8))

    # --- A. payload sort width: u16 key + 4 x u32 (current) vs 9 x u16 ---
    @jax.jit
    def sort_u32(keys, cols):
        out = jax.lax.sort((keys, *(c.reshape(-1, C) for c in cols)),
                           num_keys=1, dimension=1)
        return tuple(o.reshape(-1) for o in out[1:])

    @jax.jit
    def sort_u16(keys, cols16):
        out = jax.lax.sort((keys, *(c.reshape(-1, C) for c in cols16)),
                           num_keys=1, dimension=1)
        return tuple(o.reshape(-1) for o in out[1:])

    bench(sort_u32, keys, cols, name="payload sort, key+4xu32")
    bench(sort_u16, keys, cols16, name="payload sort, key+8xu16")

    # --- B. derivation: u16 single-operand sort vs one-hot cumsum ---
    @jax.jit
    def derive_sort(keys):
        return jax.lax.sort(keys, dimension=1) & jnp.uint16(C - 1)

    @jax.jit
    def derive_cumsum(modes):
        m = modes.reshape(-1, C).astype(jnp.int32)
        oh = jax.nn.one_hot(m, 16, dtype=jnp.int32)        # (chunks, C, 16)
        ranks = jnp.cumsum(oh, axis=1) - oh                 # stable rank in mode
        counts = oh.sum(axis=1)                             # (chunks, 16)
        seg = jnp.cumsum(counts, axis=1) - counts           # segment starts
        pos = (seg[:, None, :] + ranks)                     # (chunks, C, 16)
        return jnp.take_along_axis(pos, m[..., None], axis=2)[..., 0]

    bench(derive_sort, keys, name="derivation, u16 key sort")
    bench(derive_cumsum, modes, name="derivation, one-hot cumsum")

    # --- C. end-to-end current sort path for reference ---
    fwd = lambda w: ops_bc7.transform_device(w, NBLK, True, True)
    planes, stream = fwd(words)
    sraw = np.asarray(stream)
    m_np = np.empty(2 * len(sraw), np.uint8)
    m_np[0::2] = sraw & 0x0F
    m_np[1::2] = sraw >> 4
    modes_dev = jnp.asarray(m_np)
    inv = lambda p: ops_bc7.untransform_device(p, modes_dev, NBLK, True, True)
    r_f = bench(fwd, words, name="sort_planes fwd (current)")
    r_i = bench(inv, planes, name="sort_planes inv (current)")
    log(f"roundtrip (current): {1.0/(1.0/r_f + 1.0/r_i):.2f} GB/s")


if __name__ == "__main__":
    main()
