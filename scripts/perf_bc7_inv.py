"""BC7 kernel-path stage timings on the chip (round-3 flat-layout redesign).

History: with (N, 4)/(N, 16) device arrays, XLA pads the tiny minor dim to the
128-lane tile (8-32x write amplification); the planes-only untransform measured
22.6 GB/s against 63 GB/s for the Mosaic merge kernel alone.  The flat kernels
(`split_planes_flat_tpu`/`merge_planes_flat_tpu`/`weave_cols_tpu`) keep every
device array 1-D and recovered the gap.

Run: python scripts/perf_bc7_inv.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from dxt_lossless_transform_tpu.ops import bc7 as ops
from dxt_lossless_transform_tpu.ops.pallas import planes as pk

NBYTES = 128 * 1024 * 1024
NBLK = NBYTES // 16


def sync(x):
    # the axon relay's block_until_ready is unreliable; read back a data-dependent
    # scalar instead (same workaround as bench.py:_sync)
    leaf = x
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    return float(jnp.max(leaf.astype(jnp.float32)))


def bench(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
flat = jnp.asarray(rng.integers(0, 2**32, 4 * NBLK, dtype=np.uint32))
modes_zero = jnp.zeros((NBLK,), jnp.uint8)

for label, sort in (("planes_only", False), ("sort_planes", True)):
    fwd = jax.jit(lambda w, s=sort: ops._transform_xla.__wrapped__(
        w, jnp.uint32(NBLK), s, True, "bc7", True))
    payload, stream = fwd(flat)
    if sort:
        sraw = np.asarray(stream)
        m = np.empty(2 * len(sraw), np.uint8)
        m[0::2] = sraw & 0x0F
        m[1::2] = sraw >> 4
        modes = jnp.asarray(m)
    else:
        modes = modes_zero
    inv = jax.jit(lambda p, ms=modes, s=sort: ops._untransform_xla.__wrapped__(
        p, ms, jnp.uint32(NBLK), s, True, True))
    t_f, t_i = bench(fwd, flat), bench(inv, payload)
    rt = NBYTES / (t_f + t_i) / 1e9
    print(f"{label}: fwd {NBYTES / t_f / 1e9:6.1f}  inv {NBYTES / t_i / 1e9:6.1f}"
          f"  roundtrip {rt:6.1f} GB/s")
    # parity vs oracle on a small prefix is covered by tests; here just roundtrip
    back = inv(payload)
    ok = bool(jnp.all(back == flat))
    print(f"  roundtrip bit-exact: {ok}")

# individual kernels
split_f = jax.jit(lambda f: pk.split_planes_flat_tpu.__wrapped__(f))
planes = split_f(flat)
print(f"split_planes_flat : {NBYTES / bench(split_f, flat) / 1e9:6.1f} GB/s")
merge_f = jax.jit(lambda p: pk.merge_planes_flat_tpu.__wrapped__(tuple(p)))
print(f"merge_planes_flat : {NBYTES / bench(merge_f, planes) / 1e9:6.1f} GB/s")
split_c = jax.jit(lambda f: pk.split_cols_tpu.__wrapped__(f))
cols = split_c(flat)
print(f"split_cols        : {NBYTES / bench(split_c, flat) / 1e9:6.1f} GB/s")
weave_c = jax.jit(lambda c: pk.weave_cols_tpu.__wrapped__(tuple(c)))
print(f"weave_cols        : {NBYTES / bench(weave_c, cols) / 1e9:6.1f} GB/s")
