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
