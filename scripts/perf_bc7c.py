"""Round-3 BC7 inverse experiment: cumsum-based order derivation vs key-only sort.

The inverse pays two lax.sorts today (8 B key-derivation + 20 B payload apply).
The permutation of a chunk-local stable mode sort is computable without sorting:
order[p] = seg_start[mode[p]] + |{q < p : mode[q] == mode[p]}| -- one-hot cumsum.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

C = 4096


def order_by_sort(m):
    key = (m.reshape(-1, C) * jnp.uint32(1 << 28)
           + jnp.arange(C, dtype=jnp.uint32)[None, :])
    local = jnp.broadcast_to(jnp.arange(C, dtype=jnp.uint32), key.shape)
    _, order = jax.lax.sort((key, local), num_keys=1, dimension=1)
    return order


def order_by_cumsum(m):
    key = m.reshape(-1, C).astype(jnp.int32)            # (chunks, C)
    oh = (key[..., None] == jnp.arange(16, dtype=jnp.int32)).astype(jnp.int32)
    cum = jnp.cumsum(oh, axis=1)
    rank = jnp.take_along_axis(cum - oh, key[..., None], axis=2)[..., 0]
    counts = cum[:, -1, :]                              # (chunks, 16)
    seg = jnp.cumsum(counts, axis=1) - counts
    base = jnp.take_along_axis(seg, key, axis=1)
    # order_by_sort returns order[p_sorted] = source local idx; ours is dest[p].
    # dest is the inverse permutation of that; for the apply-sort we need dest as
    # the sort key, which is what the payload sort uses -- compare cost only here.
    return (base + rank).astype(jnp.uint32)


def bench(fn, m, iters=10):
    f = jax.jit(fn)
    out = f(m)
    jnp.max(out.astype(jnp.float32)).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(m)
    float(jnp.max(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    n = 8 << 20  # 8M blocks = 128 MiB payload
    m = jnp.asarray(rng.integers(0, 8, n, dtype=np.uint32))
    t_sort = bench(order_by_sort, m)
    t_cum = bench(order_by_cumsum, m)
    payload = n * 16
    print(f"key-only sort: {t_sort*1e3:.2f} ms ({payload/t_sort/1e9:.1f} GB/s-of-payload)")
    print(f"cumsum order:  {t_cum*1e3:.2f} ms ({payload/t_cum/1e9:.1f} GB/s-of-payload)")

    # sanity: dest from cumsum is the inverse permutation of order_by_sort's source map
    ms = m[:2 * C]
    src = np.asarray(order_by_sort(ms))          # (2, C) source index at sorted pos
    dest = np.asarray(order_by_cumsum(ms)).reshape(2, C)
    inv = np.empty_like(dest)
    for c in range(2):
        inv[c, src[c]] = np.arange(C)
    assert np.array_equal(dest, inv), "permutation mismatch"
    print("permutation equivalence ok")


if __name__ == "__main__":
    main()
