"""Native host runtime bindings (ctypes).

Loads ``libdlt_native.so`` (built from ``native/dlt_native.cpp``; ``make -C
dxt_lossless_transform_tpu/runtime/native``) and exposes its C API. Everything
degrades gracefully: if the library is missing, :func:`available` is False and
callers fall back to the numpy oracle / python-zstandard paths.

This is the analog of the reference's C-ABI exports (``bc1/src/c_api/*``,
``bc2/src/c_api/*``, ``api-common/src/c_api/size_estimation.rs``) plus the
threaded corpus batch driver its CLI gets from rayon.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

from ..errors import AutoTransformError, NativeError

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "native", "libdlt_native.so")

_lib = None

# Function-pointer types of the pluggable estimator vtable (the C analog of the
# reference's DltSizeEstimator, api-common/src/c_api/size_estimation.rs:17-125).
MAX_SIZE_FN = ctypes.CFUNCTYPE(ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t)
ESTIMATE_FN = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_size_t))


class DltSizeEstimator(ctypes.Structure):
    """{context, max_compressed_size, estimate_compressed_size} C vtable."""

    _fields_ = [("context", ctypes.c_void_p),
                ("max_compressed_size", MAX_SIZE_FN),
                ("estimate_compressed_size", ESTIMATE_FN)]


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dlt_bc1_transform.argtypes = [u8p, u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
    lib.dlt_bc1_untransform.argtypes = lib.dlt_bc1_transform.argtypes
    lib.dlt_bc2_transform.argtypes = lib.dlt_bc1_transform.argtypes
    lib.dlt_bc2_untransform.argtypes = lib.dlt_bc1_transform.argtypes
    lib.dlt_bc3_transform.argtypes = [u8p, u8p, ctypes.c_size_t, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int]
    lib.dlt_bc3_untransform.argtypes = lib.dlt_bc3_transform.argtypes
    for f in (lib.dlt_bc1_transform, lib.dlt_bc1_untransform, lib.dlt_bc2_transform,
              lib.dlt_bc2_untransform, lib.dlt_bc3_transform, lib.dlt_bc3_untransform):
        f.restype = ctypes.c_int
    lib.dlt_zstd_estimate.argtypes = [u8p, ctypes.c_size_t, ctypes.c_int]
    lib.dlt_zstd_estimate.restype = ctypes.c_size_t
    lib.dlt_zstd_bound.argtypes = [ctypes.c_size_t]
    lib.dlt_zstd_bound.restype = ctypes.c_size_t
    lib.dlt_zstd_compress.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t,
                                      ctypes.c_int]
    lib.dlt_zstd_compress.restype = ctypes.c_size_t
    lib.dlt_zstd_decompress.argtypes = [u8p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.dlt_zstd_decompress.restype = ctypes.c_size_t
    lib.dlt_zstd_estimate_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_size_t), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
    lib.dlt_zstd_estimate_batch.restype = ctypes.c_int
    lib.dlt_ltu_estimate.argtypes = [u8p, ctypes.c_size_t]
    lib.dlt_ltu_estimate.restype = ctypes.c_size_t
    for name in ("dlt_bc1_transform_auto", "dlt_bc2_transform_auto"):
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.argtypes = [u8p, u8p, ctypes.c_size_t,
                           ctypes.POINTER(DltSizeEstimator), ctypes.c_int,
                           ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            fn.restype = ctypes.c_int
    fn = getattr(lib, "dlt_bc3_transform_auto", None)
    if fn is not None:
        fn.argtypes = [u8p, u8p, ctypes.c_size_t,
                       ctypes.POINTER(DltSizeEstimator), ctypes.c_int,
                       ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                       ctypes.POINTER(ctypes.c_int)]
        fn.restype = ctypes.c_int
    for name, argt in (("dlt_estimator_zstd", [ctypes.POINTER(DltSizeEstimator),
                                               ctypes.c_int]),
                       ("dlt_estimator_ltu", [ctypes.POINTER(DltSizeEstimator)])):
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.argtypes = argt
            fn.restype = None
    for name in ("dlt_bc7_transform", "dlt_bc7_untransform",
                 "dlt_bc6h_transform", "dlt_bc6h_untransform"):
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.argtypes = [u8p, u8p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
            fn.restype = ctypes.c_int
    for name in ("dlt_rgb_transform", "dlt_rgb_untransform"):
        fn = getattr(lib, name, None)
        if fn is not None:
            fn.argtypes = [u8p, u8p, ctypes.c_size_t] + [ctypes.c_int] * 5
            fn.restype = ctypes.c_int
    fn = getattr(lib, "dlt_ltu_set_g_table", None)
    if fn is not None:
        # Install numpy's entropy table as the native scorer's authority so the
        # host/native twin equality holds on any libm (a 1-ULP log2 difference
        # could flip a floor(x+0.5) entry). The C side copies the buffer.
        # gtable is numpy-only by design -- this loader must not import jax.
        try:
            import numpy as np

            from ..estimate.gtable import G_TABLE

            fn.argtypes = [ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
            fn.restype = ctypes.c_int
            tbl = np.ascontiguousarray(G_TABLE, dtype=np.int64)
            fn(tbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), tbl.size)
        except Exception:  # pragma: no cover - degrade gracefully: the C++
            pass  # fallback table is equal on every platform tested
    _lib = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Build the native library in-place; returns True if it is then loadable."""
    try:
        subprocess.run(["make", "-C", os.path.join(_DIR, "native")],
                       check=True, capture_output=quiet)
    except (subprocess.CalledProcessError, OSError):
        return False
    global _lib
    _lib = None
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def _buf(data) -> ctypes.POINTER(ctypes.c_uint8):
    return ctypes.cast(ctypes.c_char_p(bytes(data)) if not isinstance(data, bytes)
                       else ctypes.c_char_p(data), ctypes.POINTER(ctypes.c_uint8))


def _run_transform(fn, data: bytes, *flags) -> bytes:
    import numpy as np

    out = np.empty(len(data), np.uint8)  # uninitialized; fn writes every byte
    rc = fn(_buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(data), *[int(f) for f in flags])
    if rc != 0:
        raise NativeError("transform", rc, f"native transform failed (rc={rc}, len={len(data)})")
    return out.tobytes()


def bc1_transform(data: bytes, variant: int, split: bool) -> bytes:
    return _run_transform(_try_load().dlt_bc1_transform, data, variant, split)


def bc1_untransform(data: bytes, variant: int, split: bool) -> bytes:
    return _run_transform(_try_load().dlt_bc1_untransform, data, variant, split)


def bc2_transform(data: bytes, variant: int, split: bool) -> bytes:
    return _run_transform(_try_load().dlt_bc2_transform, data, variant, split)


def bc2_untransform(data: bytes, variant: int, split: bool) -> bytes:
    return _run_transform(_try_load().dlt_bc2_untransform, data, variant, split)


def bc3_transform(data: bytes, variant: int, split_alpha: bool,
                  split_colour: bool) -> bytes:
    return _run_transform(_try_load().dlt_bc3_transform, data, variant,
                          split_alpha, split_colour)


def bc3_untransform(data: bytes, variant: int, split_alpha: bool,
                    split_colour: bool) -> bytes:
    return _run_transform(_try_load().dlt_bc3_untransform, data, variant,
                          split_alpha, split_colour)


_BATCH_FMT_IDS = {"bc1": 0, "bc2": 1, "bc3": 2}


def batch_untransform(fmt: str, payloads, settings_list) -> list:
    """Restore a whole window of payloads in ONE native call (pthread pool in
    C, GIL released once) -- the load-path twin of :func:`zstd_estimate_batch`.
    Settings vary per file; ``fmt`` is one of bc1/bc2/bc3."""
    import numpy as np

    lib = _try_load()
    count = len(payloads)
    if count == 0:
        return []
    fmt_id = _BATCH_FMT_IDS[fmt]
    outs = [np.empty(len(p), np.uint8) for p in payloads]
    PtrArr = ctypes.POINTER(ctypes.c_uint8) * count
    in_bufs = [_buf(p) for p in payloads]  # keep refs alive across the call
    ins = PtrArr(*in_bufs)
    outp = PtrArr(*[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                    for o in outs])
    lens = (ctypes.c_size_t * count)(*[len(p) for p in payloads])
    variants = (ctypes.c_int * count)(
        *[int(getattr(s, "decorrelation_mode", 0)) for s in settings_list])
    if fmt == "bc3":
        fa = (ctypes.c_uint8 * count)(
            *[int(s.split_alpha_endpoints) for s in settings_list])
        fb = (ctypes.c_uint8 * count)(
            *[int(s.split_colour_endpoints) for s in settings_list])
    else:
        fa = (ctypes.c_uint8 * count)(
            *[int(s.split_colour_endpoints) for s in settings_list])
        fb = (ctypes.c_uint8 * count)(*([0] * count))
    rc = lib.dlt_batch_untransform(fmt_id, ins, lens, outp, variants, fa, fb,
                                   ctypes.c_size_t(count), 0)
    if rc != 0:
        raise NativeError("batch_untransform", rc,
                          f"native batch untransform failed (rc={rc})")
    return [o.tobytes() for o in outs]


def zstd_estimate(data: bytes, level: int = 1) -> int:
    return int(_try_load().dlt_zstd_estimate(_buf(data), len(data), level))


def zstd_compress(data: bytes, level: int) -> bytes:
    lib = _try_load()
    cap = int(lib.dlt_zstd_bound(len(data)))
    out = ctypes.create_string_buffer(cap)
    r = lib.dlt_zstd_compress(_buf(data), len(data),
                              ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
                              cap, level)
    if r == ctypes.c_size_t(-1).value:
        raise NativeError("zstd compress", -1)
    return out.raw[:r]


def zstd_decompress(data: bytes, expected_len: int) -> bytes:
    lib = _try_load()
    out = ctypes.create_string_buffer(expected_len)
    r = lib.dlt_zstd_decompress(_buf(data), len(data),
                                ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)),
                                expected_len)
    if r == ctypes.c_size_t(-1).value:
        raise NativeError("zstd decompress", -1)
    return out.raw[:r]


def zstd_estimate_batch(buffers: Sequence[bytes], level: int = 1,
                        num_threads: int = 0) -> list:
    """Threaded batch estimation (GIL-free): the corpus-scale hot path."""
    lib = _try_load()
    count = len(buffers)
    keep = [bytes(b) for b in buffers]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * count)(
        *[ctypes.cast(ctypes.c_char_p(b), ctypes.POINTER(ctypes.c_uint8)) for b in keep])
    lens = (ctypes.c_size_t * count)(*[len(b) for b in keep])
    sizes = (ctypes.c_size_t * count)()
    rc = lib.dlt_zstd_estimate_batch(ptrs, lens, sizes, count, level, num_threads)
    if rc != 0:
        raise NativeError("zstd batch estimate", -1)
    return list(sizes)


def ltu_estimate(data: bytes) -> int:
    return int(_try_load().dlt_ltu_estimate(_buf(data), len(data)))


def bc7_transform(data: bytes, sort: bool, planes: bool) -> bytes:
    import numpy as np

    n = len(data) // 16
    out = np.empty(len(data) + ((n + 1) // 2 if sort else 0), np.uint8)
    rc = _try_load().dlt_bc7_transform(
        _buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data), int(sort), int(planes))
    if rc != 0:
        raise NativeError("bc7 transform", rc)
    return out.tobytes()


def bc7_untransform(data: bytes, original_len: int, sort: bool, planes: bool) -> bytes:
    import numpy as np

    out = np.empty(original_len, np.uint8)
    rc = _try_load().dlt_bc7_untransform(
        _buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        original_len, int(sort), int(planes))
    if rc != 0:
        raise NativeError("bc7 untransform", rc)
    return out.tobytes()


_RGB_ARGS = {"rgba8888": (4, 0, 1, 2), "bgra8888": (4, 2, 1, 0), "bgr888": (3, 2, 1, 0)}


def rgb_transform(data: bytes, layout: str, dec: bool, split: bool) -> bytes:
    size, ri, gi, bi = _RGB_ARGS[layout]
    return _run_transform(_try_load().dlt_rgb_transform, data, size, ri, gi, bi,
                          dec, split)


def rgb_untransform(data: bytes, layout: str, dec: bool, split: bool) -> bytes:
    size, ri, gi, bi = _RGB_ARGS[layout]
    return _run_transform(_try_load().dlt_rgb_untransform, data, size, ri, gi, bi,
                          dec, split)


def bc6h_transform(data: bytes, sort: bool, planes: bool) -> bytes:
    import numpy as np

    n = len(data) // 16
    out = np.empty(len(data) + ((n + 1) // 2 if sort else 0), np.uint8)
    rc = _try_load().dlt_bc6h_transform(
        _buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(data), int(sort), int(planes))
    if rc != 0:
        raise NativeError("bc6h transform", rc)
    return out.tobytes()


def make_estimator(fn) -> DltSizeEstimator:
    """Wrap a Python ``bytes -> int`` callable as a C estimator vtable.

    The returned struct keeps its callback thunks alive via attributes; hold a
    reference to it for as long as the auto-search may run.
    """
    def _max(_ctx, length):
        return length

    def _est(_ctx, data_ptr, length, out_ptr):
        try:
            out_ptr[0] = int(fn(ctypes.string_at(data_ptr, length)))
            return 0
        except Exception:  # noqa: BLE001 -- must not unwind through C
            return -1

    est = DltSizeEstimator()
    est.context = None
    est.max_compressed_size = MAX_SIZE_FN(_max)
    est.estimate_compressed_size = ESTIMATE_FN(_est)
    est._keepalive = (est.max_compressed_size, est.estimate_compressed_size)
    return est


def builtin_estimator(kind: str, level: int = 1) -> DltSizeEstimator:
    """Native built-in estimator vtable ('zstd' or 'ltu')."""
    lib = _try_load()
    est = DltSizeEstimator()
    if kind == "zstd":
        lib.dlt_estimator_zstd(ctypes.byref(est), level)
    elif kind == "ltu":
        lib.dlt_estimator_ltu(ctypes.byref(est))
    else:
        raise ValueError(f"unknown builtin estimator {kind!r}")
    return est


def _transform_auto(fn, data: bytes, estimator: DltSizeEstimator, use_all: bool):
    import numpy as np

    out = np.empty(len(data), np.uint8)
    variant = ctypes.c_int(0)
    split = ctypes.c_int(0)
    rc = fn(_buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(data), ctypes.byref(estimator), int(use_all),
            ctypes.byref(variant), ctypes.byref(split))
    if rc != 0:
        raise AutoTransformError("native", f"rc={rc}")
    return out.tobytes(), variant.value, bool(split.value)


def bc1_transform_auto(data: bytes, estimator: DltSizeEstimator,
                       use_all: bool = False):
    """Native brute-force BC1 auto-search with a pluggable estimator.

    Returns (transformed, variant, split). Reference:
    bc1/src/c_api/transform_auto.rs:143 + the DltSizeEstimator vtable contract.
    """
    return _transform_auto(_try_load().dlt_bc1_transform_auto, data, estimator,
                           use_all)


def bc2_transform_auto(data: bytes, estimator: DltSizeEstimator,
                       use_all: bool = False):
    return _transform_auto(_try_load().dlt_bc2_transform_auto, data, estimator,
                           use_all)


def bc3_transform_auto(data: bytes, estimator: DltSizeEstimator,
                       use_all: bool = False):
    """Native BC3 auto-search (3 knobs; alpha+colour regions summed).

    Returns (transformed, variant, split_alpha, split_colour)."""
    import numpy as np

    lib = _try_load()
    out = np.empty(len(data), np.uint8)
    variant = ctypes.c_int(0)
    split_a = ctypes.c_int(0)
    split_c = ctypes.c_int(0)
    rc = lib.dlt_bc3_transform_auto(
        _buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        ctypes.byref(estimator), int(use_all), ctypes.byref(variant),
        ctypes.byref(split_a), ctypes.byref(split_c))
    if rc != 0:
        raise AutoTransformError("native", f"rc={rc}")
    return out.tobytes(), variant.value, bool(split_a.value), bool(split_c.value)


def bc6h_untransform(data: bytes, original_len: int, sort: bool, planes: bool) -> bytes:
    import numpy as np

    out = np.empty(original_len, np.uint8)
    rc = _try_load().dlt_bc6h_untransform(
        _buf(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        original_len, int(sort), int(planes))
    if rc != 0:
        raise NativeError("bc6h untransform", rc)
    return out.tobytes()
