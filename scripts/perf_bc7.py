"""BC7 mode-sort variants: where does the time go, and is take_along_axis faster
than dragging 4 payload columns through lax.sort?"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache  # noqa: E402

_enable_persistent_compile_cache()

from dxt_lossless_transform_tpu.ops import bc7 as ops_bc7  # noqa: E402
from dxt_lossless_transform_tpu.ops.bc7 import (  # noqa: E402
    _KEY_SHIFT, _chunk_keys, _modes_from_words, _pack_nibbles, _planes_from_cols,
)


def sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    return float(jnp.max(leaf.astype(jnp.float32)))


def bench(fn, *a, iters=5):
    out = fn(*a); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    sync(out)
    return (time.perf_counter() - t0) / iters


NB = (128 * 1024 * 1024) // 16
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, (NB, 4), dtype=np.uint32))
nbytes = NB * 16


@jax.jit
def modes_only(words):
    return _modes_from_words(words.T[0], jnp.uint32(NB))


@jax.jit
def sort5(words):
    cols = words.T
    modes = _modes_from_words(cols[0], jnp.uint32(NB))
    key = _chunk_keys(modes)
    sorted_ = jax.lax.sort((key, *(c.reshape(key.shape) for c in cols)),
                           num_keys=1, dimension=1)
    return jnp.stack([c.reshape(-1) for c in sorted_[1:]])


@jax.jit
def sort2_gather(words):
    cols = words.T
    modes = _modes_from_words(cols[0], jnp.uint32(NB))
    key = _chunk_keys(modes)
    local = jnp.broadcast_to(jnp.arange(key.shape[1], dtype=jnp.uint32), key.shape)
    _, perm = jax.lax.sort((key, local), num_keys=1, dimension=1)
    perm32 = perm.astype(jnp.int32)
    out = [jnp.take_along_axis(c.reshape(key.shape), perm32, axis=1).reshape(-1)
           for c in cols]
    return jnp.stack(out)


@jax.jit
def planes_only(cols):
    return _planes_from_cols(cols)


@jax.jit
def full_current(words):
    return ops_bc7._transform_xla.__wrapped__(words, jnp.uint32(NB), True, True, "bc7")


print(f"device={jax.devices()[0]} NB={NB}")
for name, fn, arg in (("modes_only", modes_only, words),
                      ("sort5 (current)", sort5, words),
                      ("sort2+gather", sort2_gather, words),
                      ("full_current", full_current, words)):
    try:
        t = bench(fn, arg)
        print(f"{name:18s} {nbytes / t / 1e9:7.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:18s} FAILED {type(e).__name__}: {str(e).splitlines()[0][:100]}",
              flush=True)

cols_sorted = sort5(words)
t = bench(planes_only, cols_sorted)
print(f"{'planes_only':18s} {nbytes / t / 1e9:7.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
