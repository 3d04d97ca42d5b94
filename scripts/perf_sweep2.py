"""Sweep 2: is the ~40 GB/s memcpy ceiling dispatch overhead or HBM bandwidth?

- payload scaling (64/128/256/512 MiB) at fixed kernel
- chaining K kernel applications inside ONE jit (amortizes relay dispatch)
- dimension_semantics parallel vs arbitrary
- finer rows sweep
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache  # noqa: E402

_enable_persistent_compile_cache()

WIDTH = 2048


def _sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    return float(jnp.max(leaf.astype(jnp.float32)))


def bench(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def memcpy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.uint32(1)  # +1 so chained calls can't be CSE'd


def mk_memcpy(rows, semantics=None):
    params = {}
    if semantics is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(semantics,))

    @jax.jit
    def run(flat):
        grid = flat.shape[0] // (rows * WIDTH)
        return pl.pallas_call(
            memcpy_kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, WIDTH), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, WIDTH), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * rows, WIDTH), jnp.uint32),
            **params,
        )(flat.reshape(grid * rows, WIDTH)).reshape(-1)
    return run


def mk_chained(rows, k):
    inner = mk_memcpy(rows)

    @jax.jit
    def run(flat):
        y = flat
        for _ in range(k):
            y = inner(y)
        return y
    return run


def main():
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}")

    # payload scaling at rows=32
    for mib in (64, 128, 256, 512):
        flat = jnp.asarray(rng.integers(0, 2**32, mib * (1 << 18), dtype=np.uint32))
        fn = mk_memcpy(32)
        t = bench(fn, flat, iters=10)
        print(f"memcpy rows=32 payload={mib:4d}MiB  {mib * (1 << 20) / t / 1e9:8.2f} GB/s"
              f"  ({t * 1e3:.2f} ms/iter)", flush=True)

    # chained in one jit, 128 MiB
    flat = jnp.asarray(rng.integers(0, 2**32, 128 * (1 << 18), dtype=np.uint32))
    for k in (1, 4, 16):
        fn = mk_chained(32, k)
        t = bench(fn, flat, iters=5)
        print(f"chain k={k:3d} rows=32 128MiB  per-pass "
              f"{128 * (1 << 20) * k / t / 1e9:8.2f} GB/s", flush=True)

    # XLA (non-pallas) elementwise for reference
    xla = jax.jit(lambda x: x + jnp.uint32(1))
    t = bench(xla, flat, iters=10)
    print(f"xla +1 128MiB                 {128 * (1 << 20) / t / 1e9:8.2f} GB/s", flush=True)

    # dimension semantics
    for sem in (None, "parallel", "arbitrary"):
        try:
            fn = mk_memcpy(32, sem)
            t = bench(fn, flat, iters=10)
            print(f"memcpy rows=32 sem={str(sem):9s}  {128 * (1 << 20) / t / 1e9:8.2f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"memcpy sem={sem}: FAILED {type(e).__name__}", flush=True)

    # finer rows sweep
    for rows in (16, 64, 96, 128, 192):
        try:
            fn = mk_memcpy(rows)
            t = bench(fn, flat, iters=10)
            print(f"memcpy rows={rows:4d} 128MiB      {128 * (1 << 20) / t / 1e9:8.2f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"memcpy rows={rows}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
