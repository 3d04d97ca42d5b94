"""Sweep 4: SWAR-pair YCoCg + transposed-space BC1 kernels, chained roundtrip."""

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
from dxt_lossless_transform_tpu.oracle import bc1 as obc1  # noqa: E402
from dxt_lossless_transform_tpu.settings import Bc1TransformSettings, YCoCgVariant  # noqa: E402

_enable_persistent_compile_cache()

WIDTH = 2048
U = jnp.uint32


# --- SWAR YCoCg on packed c0|c1<<16 words (guard bits stop cross-field carries) ------

def swar_decorr_pair(p, variant: int):
    if variant == 0:
        return p
    M5 = U(0x001F001F)
    M4 = U(0x000F000F)
    G = U(0x00200020)
    r = (p >> U(11)) & M5
    g = (p >> U(6)) & M5
    gl = (p >> U(5)) & U(0x00010001)
    b = p & M5
    co = ((r | G) - b) & M5
    t = (b + ((co >> U(1)) & M4)) & M5
    cg = ((g | G) - t) & M5
    y = (t + ((cg >> U(1)) & M4)) & M5
    if variant == 1:
        return (y << U(11)) | (co << U(6)) | (gl << U(5)) | cg
    if variant == 2:
        return (gl << U(15)) | (y << U(10)) | (co << U(5)) | cg
    return (y << U(11)) | (co << U(6)) | (cg << U(1)) | gl


def swar_recorr_pair(p, variant: int):
    if variant == 0:
        return p
    M5 = U(0x001F001F)
    M4 = U(0x000F000F)
    G = U(0x00200020)
    if variant == 1:
        y = (p >> U(11)) & M5; co = (p >> U(6)) & M5
        gl = (p >> U(5)) & U(0x00010001); cg = p & M5
    elif variant == 2:
        gl = (p >> U(15)) & U(0x00010001); y = (p >> U(10)) & M5
        co = (p >> U(5)) & M5; cg = p & M5
    else:
        y = (p >> U(11)) & M5; co = (p >> U(6)) & M5
        cg = (p >> U(1)) & M5; gl = p & U(0x00010001)
    t = ((y | G) - ((cg >> U(1)) & M4)) & M5
    g = (cg + t) & M5
    b = ((t | G) - ((co >> U(1)) & M4)) & M5
    r = (b + co) & M5
    return (r << U(11)) | (g << U(6)) | (gl << U(5)) | b


def _vspec(w, rows):
    return pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _mk_call(kernel, in_widths, out_widths, rows, smem_variant, vmem_mb=None):
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024)

    def run(variant, *arrays):
        grid = arrays[0].shape[0] // (rows * in_widths[0])
        in_specs = [_vspec(w, rows) for w in in_widths]
        args = [a.reshape(grid * rows, w) for a, w in zip(arrays, in_widths)]
        if smem_variant:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
            args = [variant] + args
        res = pl.pallas_call(
            kernel, grid=(grid,),
            in_specs=in_specs,
            out_specs=[_vspec(w, rows) for w in out_widths],
            out_shape=[jax.ShapeDtypeStruct((grid * rows, w), jnp.uint32)
                       for w in out_widths],
            **params,
        )(*args)
        return [r.reshape(-1) for r in res]
    return run


def ts_swar_pair(rows, static_variant=None, vmem_mb=None):
    """Transposed-space + SWAR; variant either traced (lax.switch) or static."""
    def _dec(v, p):
        if static_variant is not None:
            return swar_decorr_pair(p, static_variant)
        return lax.switch(v, [lambda q, i=i: swar_decorr_pair(q, i) for i in range(4)], p)

    def _rec(v, p):
        if static_variant is not None:
            return swar_recorr_pair(p, static_variant)
        return lax.switch(v, [lambda q, i=i: swar_recorr_pair(q, i) for i in range(4)], p)

    def t_kernel(*refs):
        if static_variant is None:
            variant_ref, x_ref, c0_ref, c1_ref, idx_ref = refs
            v = variant_ref[0]
        else:
            x_ref, c0_ref, c1_ref, idx_ref = refs
            v = None
        xt = x_ref[:].astype(U).T.reshape(WIDTH // 4, 4, rows)
        colE, idxE, colO, idxO = (xt[:, c, :] for c in range(4))
        dE = _dec(v, colE)
        dO = _dec(v, colO)
        c0_ref[:] = ((dE & U(0xFFFF)) | (dO << U(16))).T
        c1_ref[:] = ((dE >> U(16)) | (dO & U(0xFFFF0000))).T
        idx_ref[:] = jnp.concatenate(
            [idxE[:, None, :], idxO[:, None, :]], axis=1).reshape(WIDTH // 2, rows).T

    def u_kernel(*refs):
        if static_variant is None:
            variant_ref, c0_ref, c1_ref, idx_ref, out_ref = refs
            v = variant_ref[0]
        else:
            c0_ref, c1_ref, idx_ref, out_ref = refs
            v = None
        c0t = c0_ref[:].astype(U).T
        c1t = c1_ref[:].astype(U).T
        idxt = idx_ref[:].astype(U).T.reshape(WIDTH // 4, 2, rows)
        wE = (c0t & U(0xFFFF)) | (c1t << U(16))
        wO = (c0t >> U(16)) | (c1t & U(0xFFFF0000))
        colE = _rec(v, wE)
        colO = _rec(v, wO)
        out_ref[:] = jnp.concatenate(
            [colE[:, None, :], idxt[:, 0:1, :], colO[:, None, :], idxt[:, 1:2, :]],
            axis=1).reshape(WIDTH, rows).T

    sv = static_variant is None
    T = _mk_call(t_kernel, [WIDTH], [WIDTH // 4, WIDTH // 4, WIDTH // 2], rows, sv, vmem_mb)
    Un = _mk_call(u_kernel, [WIDTH // 4, WIDTH // 4, WIDTH // 2], [WIDTH], rows, sv, vmem_mb)
    return T, Un


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


def mk_roundtrip(T, Un, k):
    @jax.jit
    def run(flat, variant):
        v = jnp.asarray(variant, jnp.int32).reshape(1)
        y = flat
        for _ in range(k):
            streams = T(v, y)
            (y,) = Un(v, *streams)
        return y
    return run


def main():
    rng = np.random.default_rng(0)
    nbytes = 128 * 1024 * 1024
    flat = jnp.asarray(rng.integers(0, 2**32, nbytes // 4, dtype=np.uint32))
    K = 8
    print(f"device={jax.devices()[0]} chained k={K}")

    # correctness vs the byte-oracle for every variant
    small_np = np.asarray(rng.integers(0, 2**32, 32 * WIDTH, dtype=np.uint32))
    small = jnp.asarray(small_np)
    data = small_np.astype("<u4").tobytes()
    for var in range(4):
        T, Un = ts_swar_pair(32)
        v = jnp.asarray(var, jnp.int32).reshape(1)
        c0, c1, idx = jax.jit(lambda f: T(v, f))(small)
        got = (np.asarray(c0).astype("<u4").tobytes()
               + np.asarray(c1).astype("<u4").tobytes()
               + np.asarray(idx).astype("<u4").tobytes())
        exp = obc1.transform(data, Bc1TransformSettings(YCoCgVariant(var), True))
        assert got == exp, f"variant {var} mismatch"
        back = jax.jit(lambda s: Un(v, *s))((c0, c1, idx))[0]
        np.testing.assert_array_equal(np.asarray(back), small_np)
    print("oracle parity ok for all 4 variants")

    for label, rows, static, vmem in (
        ("ts_swar_switch", 128, None, None),
        ("ts_swar_static1", 128, 1, None),
        ("ts_swar_switch_r256", 256, None, 100),
        ("ts_swar_switch_r64", 64, None, None),
    ):
        try:
            T, Un = ts_swar_pair(rows, static, vmem)
            fn = mk_roundtrip(T, Un, K)
            t = bench(fn, flat, jnp.int32(1), iters=5)
            print(f"{label:22s} rows={rows:4d}  roundtrip {nbytes * K / t / 1e9:8.2f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:22s} rows={rows:4d}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
