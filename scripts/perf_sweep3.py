"""Sweep 3: sustained (chained-in-one-jit) BC1 roundtrip throughput per variant.

Chains k transform+untransform roundtrips inside one jit so the ~2 ms relay
dispatch overhead amortizes away; reports per-roundtrip payload GB/s, which is the
number a production pipeline streaming many chunks back-to-back sustains.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache  # noqa: E402
from dxt_lossless_transform_tpu.ops import ycocg  # noqa: E402

_enable_persistent_compile_cache()

WIDTH = 2048


def _sync(x):
    leaf = x[0] if isinstance(x, (tuple, list)) else x
    return float(jnp.max(leaf.astype(jnp.float32)))


def bench(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def _split_halves(w):
    w = w.astype(jnp.uint32)
    return ((w & jnp.uint32(0xFFFF)).astype(jnp.int32),
            (w >> jnp.uint32(16)).astype(jnp.int32))


def _join(lo, hi):
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << jnp.uint32(16))


def _decorr(variant, x):
    return lax.switch(variant, [lambda v: v, ycocg.decorrelate_var1,
                                ycocg.decorrelate_var2, ycocg.decorrelate_var3], x)


def _recorr(variant, x):
    return lax.switch(variant, [lambda v: v, ycocg.recorrelate_var1,
                                ycocg.recorrelate_var2, ycocg.recorrelate_var3], x)


def _vspec(w, rows):
    return pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _mk_call(kernel, in_widths, out_widths, rows):
    def run(variant, *arrays):
        grid = arrays[0].shape[0] // (rows * in_widths[0])
        res = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [_vspec(w, rows) for w in in_widths],
            out_specs=[_vspec(w, rows) for w in out_widths],
            out_shape=[jax.ShapeDtypeStruct((grid * rows, w), jnp.uint32)
                       for w in out_widths],
        )(variant, *(a.reshape(grid * rows, w) for a, w in zip(arrays, in_widths)))
        return [r.reshape(-1) for r in res]
    return run


# --- current (round-1) pair ----------------------------------------------------------

def cur_pair(rows):
    def _dei(v, k):
        r, w = v.shape
        vt = v.T.reshape(w // k, k, r)
        return tuple(vt[:, c, :].T for c in range(k))

    def _inter(parts):
        k = len(parts)
        r, w = parts[0].shape
        stacked = jnp.concatenate([p.T[:, None, :] for p in parts], axis=1)
        return stacked.reshape(k * w, r).T

    def t_kernel(variant_ref, x_ref, c0_ref, c1_ref, idx_ref):
        variant = variant_ref[0]
        cE, iE, cO, iO = _dei(x_ref[:].astype(jnp.uint32), 4)
        c0E, c1E = _split_halves(cE)
        c0O, c1O = _split_halves(cO)
        w = c0E.shape[1]
        d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        c0_ref[:] = _join(d[:, :w], d[:, 2*w:3*w])
        c1_ref[:] = _join(d[:, w:2*w], d[:, 3*w:])
        idx_ref[:] = _inter([iE, iO])

    def u_kernel(variant_ref, c0_ref, c1_ref, idx_ref, out_ref):
        variant = variant_ref[0]
        c0E, c0O = _split_halves(c0_ref[:])
        c1E, c1O = _split_halves(c1_ref[:])
        w = c0E.shape[1]
        r = _recorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        colE = _join(r[:, :w], r[:, w:2*w])
        colO = _join(r[:, 2*w:3*w], r[:, 3*w:])
        idxE, idxO = _dei(idx_ref[:].astype(jnp.uint32), 2)
        out_ref[:] = _inter([colE, idxE, colO, idxO])

    T = _mk_call(t_kernel, [WIDTH], [WIDTH // 4, WIDTH // 4, WIDTH // 2], rows)
    U = _mk_call(u_kernel, [WIDTH // 4, WIDTH // 4, WIDTH // 2], [WIDTH], rows)
    return T, U


# --- transposed-space pair (2 full-tile transposes per direction) --------------------

def ts_pair(rows):
    def t_kernel(variant_ref, x_ref, c0_ref, c1_ref, idx_ref):
        variant = variant_ref[0]
        xt = x_ref[:].astype(jnp.uint32).T.reshape(WIDTH // 4, 4, rows)
        colE, idxE, colO, idxO = (xt[:, c, :] for c in range(4))
        idx_ref[:] = jnp.concatenate([idxE[:, None, :], idxO[:, None, :]],
                                     axis=1).reshape(WIDTH // 2, rows).T
        c0E, c1E = _split_halves(colE)
        c0O, c1O = _split_halves(colO)
        h = c0E.shape[0]
        d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=0))
        c0_ref[:] = _join(d[:h], d[2*h:3*h]).T
        c1_ref[:] = _join(d[h:2*h], d[3*h:]).T

    def u_kernel(variant_ref, c0_ref, c1_ref, idx_ref, out_ref):
        variant = variant_ref[0]
        c0t = c0_ref[:].astype(jnp.uint32).T        # (W/4, R)
        c1t = c1_ref[:].astype(jnp.uint32).T
        idxt = idx_ref[:].astype(jnp.uint32).T      # (W/2, R)
        c0E, c0O = _split_halves(c0t)
        c1E, c1O = _split_halves(c1t)
        h = c0E.shape[0]
        r = _recorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=0))
        colE = _join(r[:h], r[h:2*h])
        colO = _join(r[2*h:3*h], r[3*h:])
        idx2 = idxt.reshape(WIDTH // 4, 2, rows)
        idxE, idxO = idx2[:, 0, :], idx2[:, 1, :]
        woven = jnp.concatenate(
            [colE[:, None, :], idxE[:, None, :], colO[:, None, :], idxO[:, None, :]],
            axis=1).reshape(WIDTH, rows)
        out_ref[:] = woven.T

    T = _mk_call(t_kernel, [WIDTH], [WIDTH // 4, WIDTH // 4, WIDTH // 2], rows)
    U = _mk_call(u_kernel, [WIDTH // 4, WIDTH // 4, WIDTH // 2], [WIDTH], rows)
    return T, U


def mk_roundtrip(pair, rows, k):
    T, U = pair(rows)

    @jax.jit
    def run(flat, variant):
        v = jnp.asarray(variant, jnp.int32).reshape(1)
        y = flat
        for _ in range(k):
            streams = T(v, y)
            (y,) = U(v, *streams)
        return y
    return run


def mk_memcpy_chain(rows, k):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.uint32(1)

    def one(flat):
        grid = flat.shape[0] // (rows * WIDTH)
        return pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=[_vspec(WIDTH, rows)], out_specs=_vspec(WIDTH, rows),
            out_shape=jax.ShapeDtypeStruct((grid * rows, WIDTH), jnp.uint32),
        )(flat.reshape(grid * rows, WIDTH)).reshape(-1)

    @jax.jit
    def run(flat, variant):
        y = flat
        for _ in range(2 * k):  # 2 kernels per roundtrip for fairness
            y = one(y)
        return y
    return run


def main():
    rng = np.random.default_rng(0)
    nbytes = 128 * 1024 * 1024
    flat = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
    variant = jnp.int32(1)
    K = 8
    print(f"device={jax.devices()[0]} payload=128MiB chain k={K} roundtrips")

    # correctness cross-check of ts vs cur once (small slice)
    small = flat[: WIDTH * 128]
    for rows in (32,):
        Tc, Uc = cur_pair(rows)
        Tt, Ut = ts_pair(rows)
        v = jnp.asarray(1, jnp.int32).reshape(1)
        sc = jax.jit(lambda f: Tc(v, f))(small)
        st = jax.jit(lambda f: Tt(v, f))(small)
        for a, b in zip(sc, st):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        rc = jax.jit(lambda s: Uc(v, *s))(sc)[0]
        rt = jax.jit(lambda s: Ut(v, *s))(st)[0]
        np.testing.assert_array_equal(np.asarray(rc), np.asarray(small))
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(small))
    print("parity ok (cur == ts == identity roundtrip)")

    for name, mk in (("memcpy2x", mk_memcpy_chain),
                     ("cur", lambda r, k: mk_roundtrip(cur_pair, r, k)),
                     ("ts", lambda r, k: mk_roundtrip(ts_pair, r, k))):
        for rows in (32, 64, 128):
            try:
                fn = mk(rows, K)
                t = bench(fn, flat, variant, iters=5)
                print(f"{name:10s} rows={rows:4d}  roundtrip {nbytes * K / t / 1e9:8.2f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:10s} rows={rows:4d}  FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
