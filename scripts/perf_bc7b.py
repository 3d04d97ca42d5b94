"""BC7 sweep 2: sort key width + chunk size + Pallas byte-plane kernels."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache  # noqa: E402

_enable_persistent_compile_cache()

NB = (128 * 1024 * 1024) // 16
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, (NB, 4), dtype=np.uint32))
nbytes = NB * 16
WIDTH = 2048


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


def mk_sort(chunk, key16):
    @jax.jit
    def run(words):
        cols = words.T
        b0 = cols[0] & jnp.uint32(0xFF)
        lsb = b0 & (jnp.uint32(0) - b0)
        mode = jnp.minimum(jax.lax.population_count(lsb - jnp.uint32(1)), jnp.uint32(8))
        key = mode.reshape(-1, chunk) * jnp.uint32(chunk) \
            + jnp.arange(chunk, dtype=jnp.uint32)[None, :]
        if key16:
            key = key.astype(jnp.uint16)
        sorted_ = jax.lax.sort((key, *(c.reshape(key.shape) for c in cols)),
                               num_keys=1, dimension=1)
        return jnp.stack([c.reshape(-1) for c in sorted_[1:]])
    return run


# Pallas plane split: (N, 4) words -> 16 plane streams as u32 words
def _vspec(w, rows):
    return pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _phases(vt, k):
    w, rows = vt.shape
    return tuple(vt.reshape(w // k, k, rows)[:, c, :] for c in range(k))


def plane_kernel(x_ref, *out_refs):
    xt = x_ref[:].astype(jnp.uint32).T
    wp = _phases(xt, 4)          # word phases mod 4, each (W/4, R)
    for p in range(16):
        w, b = p // 4, p % 4
        byte = (wp[w] >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)  # (W/4, R)
        q = _phases(byte, 4)     # block phases mod 4 within the plane
        word = (q[0] | (q[1] << jnp.uint32(8)) | (q[2] << jnp.uint32(16))
                | (q[3] << jnp.uint32(24)))
        out_refs[p][:] = word.T


@jax.jit
def pallas_planes(flat):
    rows = 128
    grid = flat.shape[0] // (rows * WIDTH)
    outs = pl.pallas_call(
        plane_kernel, grid=(grid,),
        in_specs=[_vspec(WIDTH, rows)],
        out_specs=[_vspec(WIDTH // 16, rows) for _ in range(16)],
        out_shape=[jax.ShapeDtypeStruct((grid * rows, WIDTH // 16), jnp.uint32)
                   for _ in range(16)],
    )(flat.reshape(grid * rows, WIDTH))
    return outs


def unplane_kernel(*refs):
    *ins, out_ref = refs
    planes = [r[:].astype(jnp.uint32).T for r in ins]   # each (W/16, R)
    wp = []
    for w in range(4):
        qs = []
        for j in range(4):  # block phase j mod 4
            b = [(planes[4 * w + k] >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)
                 for k in range(4)]
            qs.append(b[0] | (b[1] << jnp.uint32(8)) | (b[2] << jnp.uint32(16))
                      | (b[3] << jnp.uint32(24)))
        # interleave the 4 block phases -> (W/4, R)
        w4, rr = qs[0].shape
        wp.append(jnp.concatenate([q[:, None, :] for q in qs], axis=1)
                  .reshape(4 * w4, rr))
    full = jnp.concatenate([x[:, None, :] for x in wp], axis=1)
    out_ref[:] = full.reshape(WIDTH, wp[0].shape[1]).T


@jax.jit
def pallas_unplanes(planes16):
    rows = 128
    grid = planes16[0].shape[0] // rows
    out = pl.pallas_call(
        unplane_kernel, grid=(grid,),
        in_specs=[_vspec(WIDTH // 16, rows) for _ in range(16)],
        out_specs=[_vspec(WIDTH, rows)],
        out_shape=[jax.ShapeDtypeStruct((grid * rows, WIDTH), jnp.uint32)],
    )(*[p.reshape(grid * rows, WIDTH // 16) for p in planes16])
    return out[0]


print(f"device={jax.devices()[0]}")
for chunk in (512, 1024, 4096):
    for key16 in (False, True):
        try:
            fn = mk_sort(chunk, key16)
            t = bench(fn, words)
            print(f"sort5 chunk={chunk:5d} key16={int(key16)}  "
                  f"{nbytes / t / 1e9:7.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"sort5 chunk={chunk} key16={key16} FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:90]}", flush=True)

flat = words.reshape(-1)
try:
    planes16 = pallas_planes(flat)
    # correctness: plane p word t == bytes p of blocks 4t..4t+3
    w_np = np.asarray(words)
    blocks = w_np.astype("<u4").tobytes()
    arr = np.frombuffer(blocks, np.uint8).reshape(NB, 16)
    for p in (0, 5, 15):
        got = np.asarray(planes16[p]).astype("<u4").tobytes()
        assert got == arr[:, p].tobytes(), p
    back = pallas_unplanes(tuple(planes16))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(flat))
    print("pallas planes parity ok")
    t = bench(pallas_planes, flat)
    print(f"pallas_planes      {nbytes / t / 1e9:7.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
    t = bench(lambda ps: pallas_unplanes(tuple(ps)), planes16)
    print(f"pallas_unplanes    {nbytes / t / 1e9:7.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
except Exception as e:  # noqa: BLE001
    import traceback; traceback.print_exc()
