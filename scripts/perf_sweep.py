"""Microbenchmark sweep for the Pallas shuffle-kernel design space (runs on TPU).

Times, per variant, a BC1-transform-shaped kernel (split path: the common case) on a
128 MiB u32 image. Variants differ only in how the stride-2/4 lane de-interleave and
re-interleave are expressed; the YCoCg math is identical.

Usage: python scripts/perf_sweep.py [--iters N]
"""

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from dxt_lossless_transform_tpu.ops import ycocg  # noqa: E402
from dxt_lossless_transform_tpu.ops.pallas import shuffle  # noqa: E402


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


def _split_halves(w):
    w = w.astype(jnp.uint32)
    return ((w & jnp.uint32(0xFFFF)).astype(jnp.int32),
            (w >> jnp.uint32(16)).astype(jnp.int32))


def _join(lo, hi):
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << jnp.uint32(16))


def _decorr(variant, x):
    return lax.switch(variant, [lambda v: v, ycocg.decorrelate_var1,
                                ycocg.decorrelate_var2, ycocg.decorrelate_var3], x)


def _vspec(w, rows):
    return pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _mk_call(kernel, in_widths, out_widths, rows, width):
    @jax.jit
    def run(*args):
        *arrays, variant = args
        grid = arrays[0].shape[0] // (rows * in_widths[0])
        res = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                     + [_vspec(w, rows) for w in in_widths],
            out_specs=[_vspec(w, rows) for w in out_widths],
            out_shape=[jax.ShapeDtypeStruct((grid * rows, w), jnp.uint32)
                       for w in out_widths],
        )(jnp.asarray(variant, jnp.int32).reshape(1),
          *(a.reshape(grid * rows, w) for a, w in zip(arrays, in_widths)))
        return res
    return run


# ---- variants: BC1 split transform: flat[2N] -> (c0w[N/2], c1w[N/2], idx[N]) -------

def v_current(rows, width):
    """Transpose-sandwich deinterleave(4) + interleave(2) (round-1 shipped design)."""
    def _dei(v, k):
        r, w = v.shape
        vt = v.T.reshape(w // k, k, r)
        return tuple(vt[:, c, :].T for c in range(k))

    def _inter(parts):
        k = len(parts)
        r, w = parts[0].shape
        stacked = jnp.concatenate([p.T[:, None, :] for p in parts], axis=1)
        return stacked.reshape(k * w, r).T

    def kernel(variant_ref, x_ref, c0_ref, c1_ref, idx_ref):
        variant = variant_ref[0]
        cE, iE, cO, iO = _dei(x_ref[:].astype(jnp.uint32), 4)
        c0E, c1E = _split_halves(cE)
        c0O, c1O = _split_halves(cO)
        w = c0E.shape[1]
        d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        c0E, c1E, c0O, c1O = d[:, :w], d[:, w:2*w], d[:, 2*w:3*w], d[:, 3*w:]
        c0_ref[:] = _join(c0E, c0O)
        c1_ref[:] = _join(c1E, c1O)
        idx_ref[:] = _inter([iE, iO])
    return _mk_call(kernel, [width], [width // 4, width // 4, width // 2],
                    rows, width)


def v_strided(rows, width):
    """Lane-strided slices x[:, p::2]; idx stream taken directly (1.5-tile shuffle)."""
    def kernel(variant_ref, x_ref, c0_ref, c1_ref, idx_ref):
        variant = variant_ref[0]
        x = x_ref[:].astype(jnp.uint32)
        cols = x[:, 0::2]
        idx_ref[:] = x[:, 1::2]
        colE = cols[:, 0::2]
        colO = cols[:, 1::2]
        c0E, c1E = _split_halves(colE)
        c0O, c1O = _split_halves(colO)
        w = c0E.shape[1]
        d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        c0_ref[:] = _join(d[:, :w], d[:, 2*w:3*w])
        c1_ref[:] = _join(d[:, w:2*w], d[:, 3*w:])
    return _mk_call(kernel, [width], [width // 4, width // 4, width // 2],
                    rows, width)


def v_reshape_minor(rows, width):
    """Minor-dim reshape + slice: x.reshape(R, W//2, 2)[:, :, p]."""
    def kernel(variant_ref, x_ref, c0_ref, c1_ref, idx_ref):
        variant = variant_ref[0]
        x = x_ref[:].astype(jnp.uint32).reshape(rows, width // 2, 2)
        cols = x[:, :, 0]
        idx_ref[:] = x[:, :, 1]
        c = cols.reshape(rows, width // 4, 2)
        colE = c[:, :, 0]
        colO = c[:, :, 1]
        c0E, c1E = _split_halves(colE)
        c0O, c1O = _split_halves(colO)
        w = c0E.shape[1]
        d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        c0_ref[:] = _join(d[:, :w], d[:, 2*w:3*w])
        c1_ref[:] = _join(d[:, w:2*w], d[:, 3*w:])
    return _mk_call(kernel, [width], [width // 4, width // 4, width // 2],
                    rows, width)


def v_transposed_space(rows, width):
    """One full-tile transpose; all phase math in (W, R) orientation; outputs
    transposed back. Needs rows >= 128 for decent lane occupancy."""
    def kernel(variant_ref, x_ref, c0_ref, c1_ref, idx_ref):
        variant = variant_ref[0]
        xt = x_ref[:].astype(jnp.uint32).T.reshape(width // 2, 2, rows)
        cols = xt[:, 0, :]              # (W/2, R)
        idx_ref[:] = xt[:, 1, :].reshape(width // 2, rows).T
        c = cols.reshape(width // 4, 2, rows)
        colE = c[:, 0, :]
        colO = c[:, 1, :]
        c0E, c1E = _split_halves(colE)
        c0O, c1O = _split_halves(colO)
        h = c0E.shape[0]
        d = _decorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=0))
        c0_ref[:] = _join(d[:h], d[2*h:3*h]).T
        c1_ref[:] = _join(d[h:2*h], d[3*h:]).T
    return _mk_call(kernel, [width], [width // 4, width // 4, width // 2],
                    rows, width)


def v_memcpy(rows, width):
    def kernel(variant_ref, x_ref, out_ref):
        out_ref[:] = x_ref[:]
    return _mk_call(kernel, [width], [width], rows, width)


def v_elementwise(rows, width):
    """No shuffle at all: decorrelate halves in place (lower bound w/ math)."""
    def kernel(variant_ref, x_ref, out_ref):
        variant = variant_ref[0]
        lo, hi = _split_halves(x_ref[:])
        w = lo.shape[1]
        d = _decorr(variant, jnp.concatenate([lo, hi], axis=1))
        out_ref[:] = _join(d[:, :w], d[:, w:])
    return _mk_call(kernel, [width], [width], rows, width)


# ---- untransform variants: (c0w, c1w, idx) -> flat ---------------------------------

def _recorr(variant, x):
    return lax.switch(variant, [lambda v: v, ycocg.recorrelate_var1,
                                ycocg.recorrelate_var2, ycocg.recorrelate_var3], x)


def u_current(rows, width):
    def _dei(v, k):
        r, w = v.shape
        vt = v.T.reshape(w // k, k, r)
        return tuple(vt[:, c, :].T for c in range(k))

    def _inter(parts):
        k = len(parts)
        r, w = parts[0].shape
        stacked = jnp.concatenate([p.T[:, None, :] for p in parts], axis=1)
        return stacked.reshape(k * w, r).T

    def kernel(variant_ref, c0_ref, c1_ref, idx_ref, out_ref):
        variant = variant_ref[0]
        c0E, c0O = _split_halves(c0_ref[:])
        c1E, c1O = _split_halves(c1_ref[:])
        w = c0E.shape[1]
        r = _recorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        colE = _join(r[:, :w], r[:, w:2*w])
        colO = _join(r[:, 2*w:3*w], r[:, 3*w:])
        idxE, idxO = _dei(idx_ref[:].astype(jnp.uint32), 2)
        out_ref[:] = _inter([colE, idxE, colO, idxO])
    return _mk_call(kernel, [width // 4, width // 4, width // 2], [width],
                    rows, width)


def u_stack_minor(rows, width):
    """Minor-dim interleave via stack+reshape; no transposes."""
    def kernel(variant_ref, c0_ref, c1_ref, idx_ref, out_ref):
        variant = variant_ref[0]
        c0E, c0O = _split_halves(c0_ref[:])
        c1E, c1O = _split_halves(c1_ref[:])
        w = c0E.shape[1]
        r = _recorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        colE = _join(r[:, :w], r[:, w:2*w])
        colO = _join(r[:, 2*w:3*w], r[:, 3*w:])
        cols = jnp.stack([colE, colO], axis=-1).reshape(rows, width // 2)
        idx = idx_ref[:].astype(jnp.uint32)
        out_ref[:] = jnp.stack([cols, idx], axis=-1).reshape(rows, width)
    return _mk_call(kernel, [width // 4, width // 4, width // 2], [width],
                    rows, width)


def u_set_strided(rows, width):
    """Strided .at[...].set into a concat skeleton (mirrors lanes.interleave)."""
    def kernel(variant_ref, c0_ref, c1_ref, idx_ref, out_ref):
        variant = variant_ref[0]
        c0E, c0O = _split_halves(c0_ref[:])
        c1E, c1O = _split_halves(c1_ref[:])
        w = c0E.shape[1]
        r = _recorr(variant, jnp.concatenate([c0E, c1E, c0O, c1O], axis=1))
        colE = _join(r[:, :w], r[:, w:2*w])
        colO = _join(r[:, 2*w:3*w], r[:, 3*w:])
        out_ref[:, 0::4] = colE
        out_ref[:, 2::4] = colO
        idx = idx_ref[:].astype(jnp.uint32)
        out_ref[:, 1::4] = idx[:, 0::2]
        out_ref[:, 3::4] = idx[:, 1::2]
    return _mk_call(kernel, [width // 4, width // 4, width // 2], [width],
                    rows, width)


TRANSFORMS = {
    "t_current": v_current,
    "t_strided": v_strided,
    "t_reshape_minor": v_reshape_minor,
    "t_transposed_space": v_transposed_space,
    "memcpy": v_memcpy,
    "elementwise": v_elementwise,
}
UNTRANSFORMS = {
    "u_current": u_current,
    "u_stack_minor": u_stack_minor,
    "u_set_strided": u_set_strided,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mib", type=int, default=128)
    ap.add_argument("--rows", type=int, nargs="*", default=[8, 32, 128, 256])
    ap.add_argument("--only", type=str, nargs="*", default=None)
    args = ap.parse_args()

    from dxt_lossless_transform_tpu.cli.main import _enable_persistent_compile_cache
    _enable_persistent_compile_cache()

    nbytes = args.mib * 1024 * 1024
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
    variant = jnp.int32(1)
    width = shuffle.WIDTH

    print(f"device={jax.devices()[0]} payload={args.mib} MiB width={width}")
    for name, mk in TRANSFORMS.items():
        if args.only and name not in args.only:
            continue
        for rows in args.rows:
            if name != "t_transposed_space" and rows > 256:
                continue
            try:
                fn = mk(rows, width)
                t = bench(fn, flat, variant, iters=args.iters)
                print(f"{name:22s} rows={rows:4d}  {nbytes / t / 1e9:8.2f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:22s} rows={rows:4d}  FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)

    # untransform variants take the three stream inputs
    c0 = jnp.asarray(rng.integers(0, 2**32, nbytes // 16, dtype=np.uint32))
    c1 = jnp.asarray(rng.integers(0, 2**32, nbytes // 16, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, 2**32, nbytes // 8, dtype=np.uint32))
    for name, mk in UNTRANSFORMS.items():
        if args.only and name not in args.only:
            continue
        for rows in args.rows:
            try:
                fn = mk(rows, width)
                t = bench(fn, c0, c1, idx, variant, iters=args.iters)
                print(f"{name:22s} rows={rows:4d}  {nbytes / t / 1e9:8.2f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:22s} rows={rows:4d}  FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
