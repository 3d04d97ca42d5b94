"""Kernel-parity harness: Pallas kernels vs the numpy byte-oracle.

One driver serves three consumers (the analog of the reference's co-located
per-kernel round-trip tests, ``bc1/src/test_prelude.rs:154-536``):

- ``tests/test_pallas_kernels.py``: interpret=True on CPU, every settings combo
  -- plain pytest catches kernel regressions without a TPU;
- ``scripts/tpu_parity.py``: compiled kernels on the real chip, full matrix;
- ``bench.py``: a quick subset on the chip every round (kernels it times anyway).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np

from ..oracle import bc1 as obc1, bc2 as obc2, bc3 as obc3
from ..settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
)


def _words(data: bytes):
    import jax.numpy as jnp

    return jnp.asarray(np.frombuffer(data, "<u4"))


def _stream_bytes(streams) -> bytes:
    return b"".join(np.asarray(s).astype("<u4").tobytes() for s in streams)


def check_bc1(settings: Bc1TransformSettings, n_blocks: int = 8192, seed: int = 0,
              interpret: bool = False) -> None:
    from ..ops.pallas import shuffle

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 8 * n_blocks, dtype=np.uint8).tobytes()
    v, sp = int(settings.decorrelation_mode), settings.split_colour_endpoints
    streams = shuffle.bc1_transform_tpu(_words(data), v, sp, interpret=interpret)
    assert _stream_bytes(streams) == obc1.transform(data, settings), settings
    back = shuffle.bc1_untransform_tpu(tuple(streams), v, sp, interpret=interpret)
    assert np.asarray(back).astype("<u4").tobytes() == data, settings


def check_bc2(settings: Bc2TransformSettings, n_blocks: int = 4096, seed: int = 0,
              interpret: bool = False) -> None:
    from ..ops.pallas import shuffle

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 16 * n_blocks, dtype=np.uint8).tobytes()
    v, sp = int(settings.decorrelation_mode), settings.split_colour_endpoints
    streams = shuffle.bc2_transform_tpu(_words(data), v, sp, interpret=interpret)
    assert _stream_bytes(streams) == obc2.transform(data, settings), settings
    back = shuffle.bc2_untransform_tpu(tuple(streams), v, sp, interpret=interpret)
    assert np.asarray(back).astype("<u4").tobytes() == data, settings


def check_bc3(settings: Bc3TransformSettings, n_blocks: int = 4096, seed: int = 0,
              interpret: bool = False) -> None:
    from ..ops.pallas import shuffle

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 16 * n_blocks, dtype=np.uint8).tobytes()
    v = int(settings.decorrelation_mode)
    sa, sc = settings.split_alpha_endpoints, settings.split_colour_endpoints
    streams = shuffle.bc3_transform_tpu(_words(data), v, sa, sc, interpret=interpret)
    assert _stream_bytes(streams) == obc3.transform(data, settings), settings
    back = shuffle.bc3_untransform_tpu(tuple(streams), v, sa, sc, interpret=interpret)
    assert np.asarray(back).astype("<u4").tobytes() == data, settings


def check_bc4(settings, n_blocks: int = 8192, seed: int = 0,
              interpret: bool = False) -> None:
    from ..oracle import bc4 as obc4
    from ..ops.pallas import shuffle

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 8 * n_blocks, dtype=np.uint8).tobytes()
    sp = settings.split_endpoints
    streams = shuffle.bc4_transform_tpu(_words(data), sp, interpret=interpret)
    assert _stream_bytes(streams) == obc4.transform_bc4(data, settings), settings
    back = shuffle.bc4_untransform_tpu(tuple(streams), sp, interpret=interpret)
    assert np.asarray(back).astype("<u4").tobytes() == data, settings


def check_bc5(settings, n_blocks: int = 4096, seed: int = 0,
              interpret: bool = False) -> None:
    from ..oracle import bc4 as obc4
    from ..ops.pallas import shuffle

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 16 * n_blocks, dtype=np.uint8).tobytes()
    sp = settings.split_endpoints
    streams = shuffle.bc5_transform_tpu(_words(data), sp, interpret=interpret)
    assert _stream_bytes(streams) == obc4.transform_bc5(data, settings), settings
    back = shuffle.bc5_untransform_tpu(tuple(streams), sp, interpret=interpret)
    assert np.asarray(back).astype("<u4").tobytes() == data, settings


def _check_modesort(fmt: str, settings, oracle_mod, n_blocks: int, seed: int) -> None:
    """BC7/BC6H device path (flat Mosaic kernels + chunk-local sort) vs the oracle.

    Drives transform_device/untransform_device directly with a ragged valid count
    so the padding-block handling is exercised; compiled path only (the interpret
    twin lives in tests/test_bc7.py)."""
    import jax.numpy as jnp

    from ..oracle import bc7 as _o  # mode_stream_len shared shape helpers
    from ..ops import bc7 as ops, lanes

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, 16 * n_blocks, dtype=np.uint8).tobytes()
    n_pad = lanes.bucket_size(n_blocks)
    flat = jnp.asarray(lanes.pad_rows(np.frombuffer(data, "<u4"), 4 * n_pad))
    sort, planes = settings.sort_by_mode, settings.split_byte_planes
    payload, stream = ops.transform_device(flat, n_blocks, sort, planes, fmt)
    prefix = b""
    if sort:
        prefix = np.asarray(stream).tobytes()[:oracle_mod.mode_stream_len(n_blocks)]
    if isinstance(payload, tuple):
        body = b"".join(np.asarray(p).astype("<u4").tobytes()[:n_blocks]
                        for p in payload)
    elif planes:
        body = np.ascontiguousarray(np.asarray(payload)[:, :n_blocks]).tobytes()
    else:
        body = np.asarray(payload)[:4 * n_blocks].astype("<u4").tobytes()
    assert prefix + body == oracle_mod.transform(data, settings), (fmt, settings)
    modes = lanes.pad_rows(
        oracle_mod.unpack_mode_stream(prefix, n_blocks), n_pad) if sort else \
        np.zeros(n_pad, np.uint8)
    back = ops.untransform_device(payload, jnp.asarray(modes), n_blocks, sort, planes)
    assert np.asarray(back)[:4 * n_blocks].astype("<u4").tobytes() == data, \
        (fmt, settings)


def check_bc7(settings, n_blocks: int = 65536 - 777, seed: int = 7, **_kw) -> None:
    from ..oracle import bc7 as obc7

    _check_modesort("bc7", settings, obc7, n_blocks, seed)


def check_bc6h(settings, n_blocks: int = 65536 - 777, seed: int = 8, **_kw) -> None:
    from ..oracle import bc6h as obc6h

    _check_modesort("bc6h", settings, obc6h, n_blocks, seed)


def quick_combos() -> Iterable[Tuple[str, object]]:
    """The subset bench.py checks every round: the kernels it times (variant 1,
    full split) plus the identity variant of each family."""
    yield "bc1", Bc1TransformSettings(1, True)
    yield "bc1", Bc1TransformSettings(0, False)
    yield "bc2", Bc2TransformSettings(1, True)
    yield "bc3", Bc3TransformSettings(1, True, True)


def full_combos() -> Iterable[Tuple[str, object]]:
    from ..settings import (
        Bc4TransformSettings, Bc5TransformSettings, Bc6hTransformSettings,
        Bc7TransformSettings,
    )

    for s in Bc1TransformSettings.all_combinations():
        yield "bc1", s
    for s in Bc2TransformSettings.all_combinations():
        yield "bc2", s
    for s in Bc3TransformSettings.all_combinations():
        yield "bc3", s
    for s in Bc4TransformSettings.all_combinations():
        yield "bc4", s
    for s in Bc5TransformSettings.all_combinations():
        yield "bc5", s
    for s in Bc7TransformSettings.all_combinations():
        yield "bc7", s
    for s in Bc6hTransformSettings.all_combinations():
        yield "bc6h", s


_CHECKS = {"bc1": check_bc1, "bc2": check_bc2, "bc3": check_bc3,
           "bc4": check_bc4, "bc5": check_bc5, "bc7": check_bc7,
           "bc6h": check_bc6h}


def run(combos, interpret: bool = False, log=None) -> int:
    count = 0
    for fmt, settings in combos:
        _CHECKS[fmt](settings, interpret=interpret)
        count += 1
        if log:
            log(f"parity ok: {fmt} {settings}")
    return count
