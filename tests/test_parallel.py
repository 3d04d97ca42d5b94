"""Sharded steps, corpus pipeline, distributed helpers (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dxt_lossless_transform_tpu.estimate import LtuEstimation
from dxt_lossless_transform_tpu.oracle import bc1 as obc1
from dxt_lossless_transform_tpu.ops import auto as ops_auto
from dxt_lossless_transform_tpu.parallel import bc1_auto_step, bc1_auto_step_single, make_mesh  # noqa
from dxt_lossless_transform_tpu.parallel.distributed import initialize, is_primary
from dxt_lossless_transform_tpu.parallel.pipeline import Bc1BatchProcessor
from dxt_lossless_transform_tpu.settings import BC1_FAST_CANDIDATES
from dxt_lossless_transform_tpu.utils import testgen


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"files", "blocks"}
    assert make_mesh(4).devices.size == 4


def test_auto_step_single_matches_host_auto():
    data = testgen.bc1_realistic(2048, seed=31)
    flat = jnp.asarray(np.frombuffer(data, "<u4"))
    d0, d1, idx, best = jax.device_get(bc1_auto_step_single(flat))
    settings = BC1_FAST_CANDIDATES[int(best)]
    # The same candidate the (device-estimator) host auto path picks
    _, host_settings = ops_auto.transform_bc1_auto(
        data, LtuEstimation(), candidates=BC1_FAST_CANDIDATES)
    assert settings == host_settings
    # And the streams match the oracle transform for those settings. The step
    # always returns maximally split lanes; the no-split on-disk layout is the
    # u32 rejoin of the c0/c1 halves (host packing, as the pipeline does).
    expected = obc1.transform(data, settings)
    if settings.split_colour_endpoints:
        got = (d0.astype("<u2").tobytes() + d1.astype("<u2").tobytes()
               + idx.astype("<u4").tobytes())
    else:
        colors = (d0.astype(np.uint32) | (d1.astype(np.uint32) << 16))
        got = colors.astype("<u4").tobytes() + idx.astype("<u4").tobytes()
    assert got == expected


def test_sharded_step_matches_single():
    mesh = make_mesh(8)
    step = bc1_auto_step(mesh)
    batch, nblocks = 4, 2048
    rng = np.random.default_rng(5)
    flats = jnp.asarray(rng.integers(0, 2**32, (batch, 2 * nblocks), dtype=np.uint32))
    valid = jnp.full((batch,), 4 * nblocks, jnp.int32)
    c0, c1, idx, best = jax.device_get(jax.block_until_ready(step(flats, valid)))
    for b in range(batch):
        s0, s1, sidx, sbest = jax.device_get(bc1_auto_step_single(flats[b]))
        np.testing.assert_array_equal(c0[b], s0)
        np.testing.assert_array_equal(c1[b], s1)
        np.testing.assert_array_equal(idx[b], sidx)
        assert int(best[b]) == int(sbest)


@pytest.mark.parametrize("use_mesh", [False, True])
def test_batch_pipeline_roundtrip(use_mesh):
    mesh = make_mesh(8) if use_mesh else None
    proc = Bc1BatchProcessor(mesh=mesh, max_batch=8)
    payloads = [testgen.bc1_realistic(n, seed=n) for n in (100, 2048, 2049, 5000, 64)]
    results = proc.process(payloads)
    assert [r.index for r in results] == list(range(len(payloads)))
    for r, data in zip(results, payloads):
        assert len(r.transformed) == len(data)
        # bit-exact vs the oracle transform with the chosen settings, and reversible
        assert r.transformed == obc1.transform(data, r.settings)
        assert obc1.untransform(r.transformed, r.settings) == data


def test_batch_pipeline_small_native_matches_device(monkeypatch):
    """DLT_MEDIUM_BATCH_NATIVE=1 routes sub-threshold payloads through the
    native LTU auto; it must pick the same settings and bytes as the default
    device-scored step (exact-integer twin scorers in this size regime)."""
    payloads = [testgen.bc1_realistic(n, seed=100 + n) for n in (512, 2048, 3000)]
    device = Bc1BatchProcessor(max_batch=8).process(payloads)
    monkeypatch.setenv("DLT_MEDIUM_BATCH_NATIVE", "1")
    native = Bc1BatchProcessor(max_batch=8).process(payloads)
    for a, b in zip(native, device):
        assert a.settings == b.settings
        assert a.transformed == b.transformed


def test_distributed_helpers_single_process():
    assert initialize(num_processes=1) is False
    assert is_primary() is True


@pytest.mark.parametrize("fmt", ["bc2", "bc3"])
def test_batch_pipeline_bc2_bc3(fmt):
    from dxt_lossless_transform_tpu.parallel.pipeline import BatchProcessor
    from dxt_lossless_transform_tpu.oracle import bc2 as obc2, bc3 as obc3

    gen = {"bc2": testgen.bc2_realistic, "bc3": testgen.bc3_realistic}[fmt]
    oracle = {"bc2": obc2, "bc3": obc3}[fmt]
    proc = BatchProcessor(fmt, mesh=make_mesh(8), max_batch=4)
    payloads = [gen(n, seed=n) for n in (100, 2048, 3000)]
    results = proc.process(payloads)
    for r, data in zip(results, payloads):
        assert r.transformed == oracle.transform(data, r.settings)
        assert oracle.untransform(r.transformed, r.settings) == data


@pytest.mark.parametrize("fmt,use_mesh", [("bc4", False), ("bc4", True),
                                          ("bc5", False), ("bc5", True)])
def test_batch_pipeline_bc4_bc5(fmt, use_mesh):
    from dxt_lossless_transform_tpu.parallel.pipeline import BatchProcessor
    from dxt_lossless_transform_tpu.oracle import bc4 as obc45

    bs = {"bc4": 8, "bc5": 16}[fmt]
    tf = {"bc4": obc45.transform_bc4, "bc5": obc45.transform_bc5}[fmt]
    utf = {"bc4": obc45.untransform_bc4, "bc5": obc45.untransform_bc5}[fmt]
    proc = BatchProcessor(fmt, mesh=make_mesh(8) if use_mesh else None, max_batch=4)
    payloads = [testgen.bc_blocks(n, bs, seed=n) for n in (100, 2048, 3000)]
    results = proc.process(payloads)
    assert [r.index for r in results] == list(range(len(payloads)))
    for r, data in zip(results, payloads):
        assert r.transformed == tf(data, r.settings)
        assert utf(r.transformed, r.settings) == data


def test_bc4_single_step_matches_host_auto():
    from dxt_lossless_transform_tpu.ops.bc45 import transform_bc4_auto
    from dxt_lossless_transform_tpu.parallel import bc4_auto_step_single
    from dxt_lossless_transform_tpu.parallel.pipeline import _serialize_bc4
    from dxt_lossless_transform_tpu.settings import Bc4TransformSettings

    data = testgen.bc_blocks(1500, 8, seed=77)
    host_out, host_settings = transform_bc4_auto(data, LtuEstimation())
    flat = jnp.asarray(np.frombuffer(data, "<u4"))
    out = jax.device_get(bc4_auto_step_single(flat))
    settings = tuple(Bc4TransformSettings.all_combinations())[int(out[-1])]
    assert settings == host_settings
    assert _serialize_bc4(out[:-1], 1500, settings) == host_out


def test_sharded_modesort_step_matches_oracle():
    # BC7/BC6H sharded step: blocks axis sharded across the mesh; chunk-local sort
    # keeps every chunk inside one shard, so the result must equal the host oracle.
    import jax
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.oracle import bc6h as o6h, bc7 as o7
    from dxt_lossless_transform_tpu.parallel import make_mesh, modesort_transform_step
    from dxt_lossless_transform_tpu.settings import (
        Bc6hTransformSettings, Bc7TransformSettings,
    )

    mesh = make_mesh(8)
    assert mesh.shape["files"] * mesh.shape["blocks"] == 8
    rng = np.random.default_rng(0)
    blocks_axis = mesh.shape["blocks"]
    n_per_file = 4096 * blocks_axis  # chunk multiple so chunks stay shard-local
    B = 2 * mesh.shape["files"]
    words = jnp.asarray(rng.integers(0, 2**32, (B, 4 * n_per_file), dtype=np.uint32))
    valid = jnp.full((B,), n_per_file, jnp.uint32)
    for fmt, oracle, settings in (("bc7", o7, Bc7TransformSettings(True, True)),
                                  ("bc6h", o6h, Bc6hTransformSettings(True, True))):
        step = modesort_transform_step(mesh, fmt)
        planes, streams = jax.block_until_ready(step(words, valid))
        assert planes.shape == (B, 16, n_per_file)
        for b in range(B):
            data = np.asarray(words[b]).astype("<u4").tobytes()
            msl = (n_per_file + 1) // 2
            got = np.asarray(streams[b]).tobytes()[:msl] + np.asarray(planes[b]).tobytes()
            assert got == oracle.transform(data, settings), (fmt, b)


def test_sharded_step_shardmap_scorer_matches_single(monkeypatch):
    """Mesh path with shapes satisfying the shard_map gate: the Mosaic coverage
    kernel runs per shard (interpret-mode on CPU) with explicit SPAN halos, and the
    result stays bit-identical to the unsharded single step (XLA-twin scored)."""
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import SPAN
    from dxt_lossless_transform_tpu.parallel import sharded

    calls = {"n": 0}
    real = sharded._scores_flat_shardmap

    def spy(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(sharded, "_scores_flat_shardmap", spy)

    mesh = make_mesh(8)
    nb = mesh.shape["blocks"]
    nblocks = nb * SPAN // 4          # colour region L = 4*nblocks = nb*SPAN
    batch = 2 * mesh.shape["files"]
    rng = np.random.default_rng(9)
    flats = jnp.asarray(rng.integers(0, 2**32, (batch, 2 * nblocks), dtype=np.uint32))
    valid = jnp.asarray(
        [4 * nblocks, 4 * nblocks - 500] * (batch // 2), jnp.int32)
    step = sharded.bc1_auto_step(mesh)
    c0, c1, idx, best = jax.device_get(jax.block_until_ready(step(flats, valid)))
    assert calls["n"] == 1, "shard_map scorer was not used"
    for b in range(batch):
        s0, s1, sidx, sbest = jax.device_get(
            bc1_auto_step_single(flats[b], valid[b]))
        np.testing.assert_array_equal(c0[b], s0)
        np.testing.assert_array_equal(c1[b], s1)
        np.testing.assert_array_equal(idx[b], sidx)
        assert int(best[b]) == int(sbest)


def test_grid_rows_ok_matches_grid_rows():
    from dxt_lossless_transform_tpu.ops.pallas.shuffle import (
        WIDTH, _grid_rows, grid_rows_ok,
    )

    for words in (0, WIDTH - 1, WIDTH, 2 * WIDTH, 128 * WIDTH, 160 * WIDTH,
                  256 * WIDTH, 129 * WIDTH, 384 * WIDTH):
        ok = grid_rows_ok(words, 128)
        try:
            _grid_rows(words, 128)
            raised = False
        except ValueError:
            raised = True
        assert ok == (not raised), words


def test_pad_batch_for_tiles():
    from dxt_lossless_transform_tpu.parallel.pipeline import _pad_batch_for_tiles

    # 2 rows/file (bc1 min bucket): 10 files -> 20 rows <= 128, no padding
    assert _pad_batch_for_tiles(10, 4096, 1) == 10
    # 80 files x 2 rows = 160 rows: pad to a multiple of 64 files (128 rows)
    assert _pad_batch_for_tiles(80, 4096, 1) == 128
    # 4 rows/file: 40 files -> 160 rows: pad to multiple of 32
    assert _pad_batch_for_tiles(40, 8192, 1) == 64
    # >=128 rows per file always divides
    assert _pad_batch_for_tiles(33, 128 * 2048, 1) == 33
    # word counts below one tile keep the caller's padding (gate falls back)
    assert _pad_batch_for_tiles(7, 1024, 1) == 7


def test_batched_words_gate_divisibility():
    """The gate must reject flattened batches whose tile-row total exceeds 128
    without dividing it (ADVICE r3: 10 x 128 KiB BC1 files -> 160 rows raised at
    trace time on TPU)."""
    from dxt_lossless_transform_tpu.parallel import sharded

    offsets = (1, 2, 4)
    orig = sharded._WORDS_INTERPRET
    sharded._WORDS_INTERPRET = True  # make the backend check pass on CPU
    try:
        w2 = 32768  # 16384 blocks = 128 KiB per file, 16 tile rows each
        assert sharded._batched_words_gate(2 * w2, 8, w2, 2, offsets, True, None)
        assert not sharded._batched_words_gate(2 * w2, 10, w2, 2, offsets, True,
                                               None)  # 160 rows
        assert sharded._batched_words_gate(2 * w2, 16, w2, 2, offsets, True, None)
    finally:
        sharded._WORDS_INTERPRET = orig


def test_batched_words_path_matches_byte_path(monkeypatch):
    """Single-device batched step: the Mosaic words path (interpret mode on CPU)
    must be bit-identical to the XLA byte path, ragged files included."""
    from dxt_lossless_transform_tpu.parallel import sharded

    monkeypatch.setattr(sharded, "_WORDS_INTERPRET", True)
    rng = np.random.default_rng(12)
    nblocks = 16384  # region bytes 65536 = 2 * SPAN
    B = 2
    flats = jnp.asarray(rng.integers(0, 2**32, (B, 2 * nblocks), dtype=np.uint32))
    valid = jnp.asarray([4 * nblocks, 4 * nblocks - 502], jnp.int32)
    key = sharded._BC1_CANDIDATES
    words = jax.device_get(sharded._bc1_batched_impl(
        flats, valid, key, sharded.DEFAULT_OFFSETS, allow_pallas=True))
    bytes_ = jax.device_get(sharded._bc1_batched_impl(
        flats, valid, key, sharded.DEFAULT_OFFSETS, allow_pallas=False))
    for w, b in zip(words, bytes_):
        np.testing.assert_array_equal(w, b)


def test_mesh_words_path_matches_single(monkeypatch):
    """Full Mosaic words path under an 8-device mesh (per-shard region builders +
    deinterleave + packed windowed scorer): bit-identical to the unsharded
    single step, ragged file included."""
    from dxt_lossless_transform_tpu.parallel import sharded

    monkeypatch.setattr(sharded, "_WORDS_INTERPRET", True)
    calls = {"mesh_words": 0, "packed_shardmap": 0}
    real_call, real_scores = sharded._mesh_words_call, sharded._packed_scores_shardmap

    def spy_call(*a, **k):
        calls["mesh_words"] += 1
        return real_call(*a, **k)

    def spy_scores(*a, **k):
        calls["packed_shardmap"] += 1
        return real_scores(*a, **k)

    monkeypatch.setattr(sharded, "_mesh_words_call", spy_call)
    monkeypatch.setattr(sharded, "_packed_scores_shardmap", spy_scores)

    mesh = make_mesh(8)
    nb = mesh.shape["blocks"]
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import SPAN

    nblocks = nb * SPAN // 2  # colour-region chunk per shard = 2 * SPAN bytes
    B = 2 * mesh.shape["files"]
    rng = np.random.default_rng(21)
    flats = jnp.asarray(rng.integers(0, 2**32, (B, 2 * nblocks), dtype=np.uint32))
    valid = jnp.asarray([4 * nblocks, 4 * nblocks - 502] * (B // 2), jnp.int32)
    step = sharded.bc1_auto_step(mesh)
    c0, c1, idx, best = jax.device_get(jax.block_until_ready(step(flats, valid)))
    assert calls["mesh_words"] == 2, "per-shard words kernels were not used"
    assert calls["packed_shardmap"] == 1, "packed shard_map scorer was not used"
    for b in range(B):
        s0, s1, sidx, sbest = jax.device_get(
            bc1_auto_step_single(flats[b], valid[b]))
        np.testing.assert_array_equal(c0[b], s0)
        np.testing.assert_array_equal(c1[b], s1)
        np.testing.assert_array_equal(idx[b], sidx)
        assert int(best[b]) == int(sbest)


def test_mesh_words_path_bc3_matches_single(monkeypatch):
    """BC3 mesh words path (dedup'd alpha + colour rows, two packed shard_map
    scorer calls) vs the unsharded single step."""
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import SPAN
    from dxt_lossless_transform_tpu.parallel import sharded

    monkeypatch.setattr(sharded, "_WORDS_INTERPRET", True)
    calls = {"packed_shardmap": 0}
    real_scores = sharded._packed_scores_shardmap

    def spy_scores(*a, **k):
        calls["packed_shardmap"] += 1
        return real_scores(*a, **k)

    monkeypatch.setattr(sharded, "_packed_scores_shardmap", spy_scores)
    mesh = make_mesh(8)
    nb = mesh.shape["blocks"]
    nblocks = nb * SPAN // 2  # alpha chunk/shard = SPAN bytes, colour = 2*SPAN
    B = mesh.shape["files"]
    rng = np.random.default_rng(33)
    flats = jnp.asarray(rng.integers(0, 2**32, (B, 4 * nblocks), dtype=np.uint32))
    valid = jnp.asarray([4 * nblocks - 502] * B, jnp.int32)
    step = sharded.bc3_auto_step(mesh)
    out = jax.device_get(jax.block_until_ready(step(flats, valid)))
    assert calls["packed_shardmap"] == 2, "packed shard_map scorer not used"
    for b in range(B):
        single = jax.device_get(
            sharded.bc3_auto_step_single(flats[b], valid[b]))
        for got, want in zip(out, single):
            np.testing.assert_array_equal(got[b], want)


@pytest.mark.parametrize("fmt", ["bc1", "bc2", "bc3"])
def test_batch_pipeline_host_scored_zstd(fmt, monkeypatch):
    """Host-scored (zstd-preset) batch mode: device-built candidate regions +
    host batch estimation must reproduce the per-file auto path exactly
    (same settings, same bytes). Threshold forced to 0 so the DEVICE region
    path is exercised (small payloads otherwise take the all-native shortcut,
    covered by test_batch_pipeline_host_scored_small_native)."""
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")
    from dxt_lossless_transform_tpu.estimate import ZstdEstimation
    from dxt_lossless_transform_tpu.parallel.pipeline import BatchProcessor
    from dxt_lossless_transform_tpu.oracle import bc2 as obc2, bc3 as obc3

    gen = {"bc1": testgen.bc1_realistic, "bc2": testgen.bc2_realistic,
           "bc3": testgen.bc3_realistic}[fmt]
    oracle = {"bc1": obc1, "bc2": obc2, "bc3": obc3}[fmt]
    auto = {"bc1": ops_auto.transform_bc1_auto, "bc2": ops_auto.transform_bc2_auto,
            "bc3": ops_auto.transform_bc3_auto}[fmt]
    est = ZstdEstimation(1)
    proc = BatchProcessor(fmt, estimator=est, max_batch=4)
    payloads = [gen(n, seed=100 + n) for n in (64, 600, 2048, 2049, 3000)]
    results = proc.process(payloads)
    assert [r.index for r in results] == list(range(len(payloads)))
    for r, data in zip(results, payloads):
        # Bit-exact vs the oracle transform with the chosen settings + reversible
        assert r.transformed == oracle.transform(data, r.settings)
        assert oracle.untransform(r.transformed, r.settings) == data
        # Same winner as the per-file host auto with the same estimator
        _, host_settings = auto(data, est)
        assert r.settings == host_settings, (r.settings, host_settings)


def test_batch_pipeline_host_scored_small_native():
    """Sub-threshold payloads in host-scored mode take the all-native auto and
    still return ordered, per-file-identical results (mixed with empty files)."""
    from dxt_lossless_transform_tpu.estimate import ZstdEstimation
    from dxt_lossless_transform_tpu.parallel.pipeline import BatchProcessor

    est = ZstdEstimation(1)
    proc = BatchProcessor("bc1", estimator=est, max_batch=4)
    payloads = [testgen.bc1_realistic(n, seed=n) for n in (64, 700, 2048)] + [b""]
    results = proc.process(payloads)
    assert [r.index for r in results] == list(range(len(payloads)))
    assert results[-1].transformed == b""
    for r, data in zip(results[:-1], payloads):
        assert r.transformed == obc1.transform(data, r.settings)
        _, host_settings = ops_auto.transform_bc1_auto(data, est)
        assert r.settings == host_settings


@pytest.mark.parametrize("fmt", ["bc7", "bc6h"])
def test_modesort_batch_processor_matches_per_file(fmt):
    """BC7/BC6H corpus batching picks and bytes must equal the per-file auto
    (the scorer twins are bit-identical)."""
    from dxt_lossless_transform_tpu.estimate import LtuEstimation
    from dxt_lossless_transform_tpu.ops import bc6h as ops_bc6h, bc7 as ops_bc7
    from dxt_lossless_transform_tpu.oracle import bc6h as obc6h, bc7 as obc7
    from dxt_lossless_transform_tpu.parallel.pipeline import ModeSortBatchProcessor
    from dxt_lossless_transform_tpu.utils import testgen

    auto = {"bc7": ops_bc7.transform_bc7_auto,
            "bc6h": ops_bc6h.transform_bc6h_auto}[fmt]
    oracle = {"bc7": obc7, "bc6h": obc6h}[fmt]
    est = LtuEstimation()
    proc = ModeSortBatchProcessor(fmt, max_batch=4)
    payloads = [testgen.bc7_realistic(n, seed=n) for n in (64, 700, 2048, 2049)]
    payloads.append(b"")
    results = proc.process(payloads)
    assert [r.index for r in results] == list(range(len(payloads)))
    assert results[-1].transformed == b""
    for r, data in zip(results[:-1], payloads):
        _, host_settings = auto(data, est)
        assert r.settings == host_settings, (fmt, r.index)
        assert r.transformed == oracle.transform(data, r.settings)
        assert oracle.untransform(r.transformed, r.settings) == data


@pytest.mark.parametrize("fmt", ["bc4", "bc5"])
def test_batch_pipeline_host_scored_bc45(fmt, monkeypatch):
    """BC4/BC5 host-scored (zstd) batch mode vs the per-file auto path."""
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")  # exercise the device rows
    from dxt_lossless_transform_tpu.estimate import ZstdEstimation
    from dxt_lossless_transform_tpu.ops import bc45 as ops_bc45
    from dxt_lossless_transform_tpu.oracle import bc4 as obc45
    from dxt_lossless_transform_tpu.parallel.pipeline import BatchProcessor

    bs = {"bc4": 8, "bc5": 16}[fmt]
    auto = {"bc4": ops_bc45.transform_bc4_auto,
            "bc5": ops_bc45.transform_bc5_auto}[fmt]
    tf = {"bc4": obc45.transform_bc4, "bc5": obc45.transform_bc5}[fmt]
    utf = {"bc4": obc45.untransform_bc4, "bc5": obc45.untransform_bc5}[fmt]
    est = ZstdEstimation(1)
    proc = BatchProcessor(fmt, estimator=est, max_batch=4)
    payloads = [testgen.bc_blocks(n, bs, seed=n) for n in (64, 700, 2048, 2049)]
    results = proc.process(payloads)
    assert [r.index for r in results] == list(range(len(payloads)))
    for r, data in zip(results, payloads):
        _, host_settings = auto(data, est)
        assert r.settings == host_settings, (fmt, r.index)
        assert r.transformed == tf(data, r.settings)
        assert utf(r.transformed, r.settings) == data


def test_sharded_untransform_step_matches_oracle():
    """The load-path mesh step: per-stream (B, L) arrays sharded P("files"),
    vmapped fused inverse; bit-exact vs the oracle for bc1 and bc3."""
    from dxt_lossless_transform_tpu.oracle import bc3 as obc3
    from dxt_lossless_transform_tpu.ops import hostwrap
    from dxt_lossless_transform_tpu.parallel.sharded import untransform_step
    from dxt_lossless_transform_tpu.settings import (
        Bc1TransformSettings, Bc3TransformSettings, YCoCgVariant,
    )

    mesh = make_mesh(8)
    B, n = 2 * mesh.shape["files"], 2048
    rng = np.random.default_rng(4)
    from dxt_lossless_transform_tpu.oracle import bc2 as obc2, bc4 as obc45
    from dxt_lossless_transform_tpu.ops import bc45 as ops_bc45
    from dxt_lossless_transform_tpu.settings import (
        Bc2TransformSettings, Bc4TransformSettings, Bc5TransformSettings,
    )

    class _Bc45Oracle:
        def __init__(self, t, u):
            self.transform, self.untransform = t, u

    for fmt, bs, oracle, s, spec in (
            ("bc1", 8, obc1, Bc1TransformSettings(YCoCgVariant.VARIANT2, True),
             hostwrap.bc1_stream_spec),
            ("bc2", 16, obc2, Bc2TransformSettings(YCoCgVariant.VARIANT3, True),
             hostwrap.bc2_stream_spec),
            ("bc3", 16, obc3,
             Bc3TransformSettings(YCoCgVariant.VARIANT1, True, True),
             hostwrap.bc3_stream_spec),
            ("bc4", 8, _Bc45Oracle(obc45.transform_bc4, obc45.untransform_bc4),
             Bc4TransformSettings(True),
             lambda st: ops_bc45._bc4_spec(st.split_endpoints)),
            ("bc5", 16, _Bc45Oracle(obc45.transform_bc5, obc45.untransform_bc5),
             Bc5TransformSettings(True),
             lambda st: ops_bc45._bc5_spec(st.split_endpoints))):
        payloads = [rng.integers(0, 256, bs * n, np.uint8).tobytes()
                    for _ in range(B)]
        t = [oracle.transform(p, s) for p in payloads]
        streams, pos = [], 0
        for bpb in spec(s):
            arr = np.stack([np.frombuffer(tp, np.uint8)[pos * n:(pos + bpb) * n]
                            .copy().view("<u4") for tp in t])
            streams.append(jnp.asarray(arr))
            pos += bpb
        out = np.asarray(jax.block_until_ready(
            untransform_step(mesh, fmt, s)(*streams)))
        for b in range(B):
            assert out[b].astype("<u4").tobytes() == payloads[b], (fmt, b)
