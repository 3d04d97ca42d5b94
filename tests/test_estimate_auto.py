"""Estimators and the batched auto-search."""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.estimate import LtuEstimation, NoEstimation, ZstdEstimation
from dxt_lossless_transform_tpu.oracle import bc1 as obc1, bc2 as obc2, bc3 as obc3
from dxt_lossless_transform_tpu.ops import auto
from dxt_lossless_transform_tpu.settings import (
    BC1_COMPREHENSIVE_CANDIDATES,
    Bc1TransformSettings,
)
from dxt_lossless_transform_tpu.utils import testgen


def test_zstd_estimator_orders_compressibility():
    est = ZstdEstimation(1)
    compressible = b"abcd" * 1000
    incompressible = np.random.default_rng(0).integers(0, 256, 4000, np.uint8).tobytes()
    assert est.estimate(compressible) < est.estimate(incompressible)
    assert est.estimate(b"") == 0
    assert est.max_compressed_size(4000) >= 4000


def test_zstd_estimator_magicless():
    est = ZstdEstimation(3)
    blob = est.compress(b"hello world" * 50)
    assert not blob.startswith(b"\x28\xb5\x2f\xfd")  # no zstd magic
    assert est.decompress(blob, 550) == b"hello world" * 50


def test_ltu_estimator_orders_compressibility():
    est = LtuEstimation()
    compressible = b"abcd" * 1000
    incompressible = np.random.default_rng(0).integers(0, 256, 4000, np.uint8).tobytes()
    assert est.estimate(compressible) < est.estimate(incompressible)
    assert est.estimate(b"") == 0


def test_ltu_device_batch_matches_single():
    est = LtuEstimation()
    rng = np.random.default_rng(1)
    rows = np.stack([rng.integers(0, 256, 4096, np.uint8) for _ in range(4)])
    import jax.numpy as jnp
    batch = np.asarray(est.estimate_batch_device(jnp.asarray(rows), 4096))
    singles = [est.estimate(r.tobytes()) for r in rows]
    np.testing.assert_allclose(batch, singles)


@pytest.mark.parametrize("estimator", [ZstdEstimation(1), LtuEstimation()])
def test_bc1_auto_roundtrip(estimator):
    data = testgen.bc1_realistic(2048, seed=21)
    out, settings = auto.transform_bc1_auto(data, estimator, use_all_decorrelation_modes=True)
    assert obc1.untransform(out, settings) == data
    assert out == obc1.transform(data, settings)


def test_bc1_auto_picks_argmin_of_zstd():
    # The winner must really be the zstd-argmin over the candidates' colour regions
    data = testgen.bc1_realistic(4096, seed=22)
    est = ZstdEstimation(1)
    _, settings = auto.transform_bc1_auto(data, est, use_all_decorrelation_modes=True)
    sizes = {}
    for s in BC1_COMPREHENSIVE_CANDIDATES:
        t = obc1.transform(data, s)
        sizes[s] = est.estimate(t[: len(t) // 2])
    assert sizes[settings] == min(sizes.values())


@pytest.mark.parametrize("estimator", [ZstdEstimation(1), LtuEstimation()])
def test_bc2_bc3_auto_roundtrip(estimator):
    data2 = testgen.bc2_realistic(1024, seed=23)
    out2, s2 = auto.transform_bc2_auto(data2, estimator)
    assert obc2.untransform(out2, s2) == data2

    data3 = testgen.bc3_realistic(1024, seed=24)
    out3, s3 = auto.transform_bc3_auto(data3, estimator, use_all_decorrelation_modes=True)
    assert obc3.untransform(out3, s3) == data3


def test_auto_with_no_estimation_is_stable():
    # NoEstimation scores everything 0 -> argmin picks the first candidate; still valid.
    data = testgen.bc1_realistic(128, seed=25)
    out, settings = auto.transform_bc1_auto(data, NoEstimation())
    assert obc1.untransform(out, settings) == data


def test_ltu_selection_agreement_with_zstd(reference_assets):
    """Selection-quality check (the LTU-accuracy analog, reference README ~74%):
    on the real corpus file, the LTU winner's true zstd size must be within 2% of
    the true zstd winner."""
    raw = open(f"{reference_assets}/r2-256-bc1.dds", "rb").read()
    payload = raw[0x80:]
    payload = payload[: len(payload) // 8 * 8]
    zstd = ZstdEstimation(1)
    _, s_ltu = auto.transform_bc1_auto(payload, LtuEstimation(),
                                       use_all_decorrelation_modes=True)
    _, s_zstd = auto.transform_bc1_auto(payload, zstd,
                                        use_all_decorrelation_modes=True)
    true_size = {s: zstd.estimate(obc1.transform(payload, s))
                 for s in (s_ltu, s_zstd)}
    assert true_size[s_ltu] <= true_size[s_zstd] * 1.02


def test_device_and_host_auto_agree_on_padded_sizes(monkeypatch):
    """Regression: padded split-candidate regions must not score padding bytes
    (zero runs made split layouts look spuriously compressible on the device path)."""
    data = testgen.bc1_realistic(3000, seed=42)  # non-power-of-two block count
    est = LtuEstimation()
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")
    _, dev = auto.transform_bc1_auto(data, est, use_all_decorrelation_modes=True)
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", str(1 << 30))
    _, host = auto.transform_bc1_auto(data, est, use_all_decorrelation_modes=True)
    assert dev == host


def test_bc3_normalization_colour_modes_distinguishable():
    """Regression: the BC3 norm-mode search must score the colour region (it used
    to score only the alpha half, making every colour mode tie)."""
    from dxt_lossless_transform_tpu.ops.normalize import _scored_auto
    from dxt_lossless_transform_tpu.oracle import normalize as onorm

    # solid-colour-heavy BC3 corpus: colour normalization changes the colour bytes
    words = np.zeros((512, 4), "<u4")
    words[:, 0] = 0x0000FFFF  # opaque uniform alpha
    c = np.uint32(0xF800)
    words[:, 2] = c | (c << 16)
    data = words.tobytes()
    est = ZstdEstimation(1)
    scores = {}
    for cm in onorm.ColorNormalizationMode.all_values():
        normalized = onorm.normalize_blocks_bc3(data, onorm.AlphaNormalizationMode.NONE, cm)
        _, _, score = _scored_auto(auto.transform_bc3_auto, normalized, est, False, fmt="bc3")
        scores[cm] = score
    assert len(set(scores.values())) > 1  # colour modes actually distinguish


def test_typed_errors_per_format():
    """Ops-layer typed errors (reference: Bc1ValidationError safe/mod.rs:15-23,
    DetermineBestTransformError transform_auto.rs:15-23)."""
    import pytest

    from dxt_lossless_transform_tpu import errors
    from dxt_lossless_transform_tpu.ops import (
        auto as ops_auto, bc1 as ops_bc1, bc2 as ops_bc2, bc3 as ops_bc3,
        bc45 as ops_bc45, bc7 as ops_bc7,
    )

    with pytest.raises(errors.Bc1ValidationError) as e1:
        ops_bc1.transform(b"\x00" * 7)
    assert e1.value.divisor == 8 and isinstance(e1.value, ValueError)
    with pytest.raises(errors.Bc2ValidationError):
        ops_bc2.transform(b"\x00" * 15)
    with pytest.raises(errors.Bc3ValidationError):
        ops_bc3.transform(b"\x00" * 15)
    with pytest.raises(errors.Bc4ValidationError):
        ops_bc45.transform_bc4(b"\x00" * 7)
    with pytest.raises(errors.Bc5ValidationError):
        ops_bc45.transform_bc5(b"\x00" * 15)
    with pytest.raises(errors.Bc7ValidationError):
        ops_bc7.transform(b"\x00" * 15)

    class Failing:
        on_device = False

        def max_compressed_size(self, n):
            return 0

        def estimate(self, data):
            raise OSError("boom")

        def estimate_batch(self, regions):
            raise OSError("boom")

        def estimate_batch_device(self, regions, valid_len):
            return None

    data = b"\x00" * 64
    with pytest.raises(errors.AutoTransformError) as ea:
        ops_auto.transform_bc1_auto(data, Failing())
    assert ea.value.fmt == "BC1"
    with pytest.raises(errors.AutoTransformError):
        ops_auto.transform_bc2_auto(b"\x00" * 128, Failing())
    with pytest.raises(errors.AutoTransformError):
        ops_auto.transform_bc3_auto(b"\x00" * 128, Failing())


@pytest.mark.parametrize("fmt", ["bc1", "bc2", "bc3"])
def test_native_ltu_auto_matches_python_path(fmt):
    """The C++ LTU auto shortcut (small payloads) must pick exactly what the
    python region path picks -- the scorer twins are bit-identical and both
    argmins keep the first minimum."""
    from dxt_lossless_transform_tpu import runtime
    from dxt_lossless_transform_tpu.estimate import LtuEstimation
    from dxt_lossless_transform_tpu.ops import auto as ops_auto
    from dxt_lossless_transform_tpu.settings import (
        BC1_FAST_CANDIDATES, BC2_FAST_CANDIDATES, BC3_FAST_CANDIDATES,
    )
    from dxt_lossless_transform_tpu.utils import testgen

    if not runtime.available():
        pytest.skip("native runtime unavailable")
    gen = {"bc1": testgen.bc1_realistic, "bc2": testgen.bc2_realistic,
           "bc3": testgen.bc3_realistic}[fmt]
    auto = {"bc1": ops_auto.transform_bc1_auto, "bc2": ops_auto.transform_bc2_auto,
            "bc3": ops_auto.transform_bc3_auto}[fmt]
    cands = {"bc1": BC1_FAST_CANDIDATES, "bc2": BC2_FAST_CANDIDATES,
             "bc3": BC3_FAST_CANDIDATES}[fmt]
    est = LtuEstimation()
    for seed in range(6):
        data = gen(1024 + 37 * seed, seed=seed)
        out_native, s_native = auto(data, est)                  # native shortcut
        out_py, s_py = auto(data, est, candidates=cands)        # python regions
        assert s_native == s_py, (fmt, seed)
        assert out_native == out_py


def test_scorer_v4_entropy_twins():
    """Scorer v4's sampled-prefix entropy term: the shared integer table and
    the combined scores must be identical across numpy, C++, and XLA."""
    import ctypes

    import jax.numpy as jnp

    from dxt_lossless_transform_tpu import runtime
    from dxt_lossless_transform_tpu.estimate.ltu import (
        DEFAULT_OFFSETS, ENTROPY_CAP, G_TABLE, _coverage_score_np,
        _coverage_scores, _entropy_term_np,
    )

    # exact identities of the term itself
    assert _entropy_term_np(np.zeros(100, np.uint8)) == 0  # uniform -> 0 bits
    rnd = np.random.default_rng(1).integers(0, 256, 4096, np.uint8)
    assert _entropy_term_np(rnd) > 0
    # cap: bytes beyond 64 KiB never change the term
    big = np.random.default_rng(2).integers(0, 256, ENTROPY_CAP + 999, np.uint8)
    assert _entropy_term_np(big) == _entropy_term_np(big[:ENTROPY_CAP])

    if runtime.available():
        lib = runtime._try_load()
        lib.dlt_ltu_g_table_entry.restype = ctypes.c_int64
        lib.dlt_ltu_g_table_entry.argtypes = [ctypes.c_int]
        for n in (0, 1, 2, 3, 255, 4096, 65535, ENTROPY_CAP):
            assert lib.dlt_ltu_g_table_entry(n) == int(G_TABLE[n]), n
        rng = np.random.default_rng(3)
        for ln in (5, 1000, 70000):
            data = rng.integers(0, 256, ln, np.uint8)
            assert (_coverage_score_np(data, DEFAULT_OFFSETS)
                    == runtime.ltu_estimate(data.tobytes())), ln

    rng = np.random.default_rng(4)
    for ln in (64, 4096, 70000):
        data = rng.integers(0, 256, ln, np.uint8)
        host = _coverage_score_np(data, DEFAULT_OFFSETS)
        dev = float(_coverage_scores(jnp.asarray(data)[None], jnp.int32(ln),
                                     DEFAULT_OFFSETS)[0])
        assert host == dev, (ln, host, dev)


def test_scorer_v4_packed_words_entropy():
    """The u32-packed-rows entry must produce the same entropy-adjusted score
    as the u8 form (the words fast path feeds packed rows)."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.estimate.ltu import (
        DEFAULT_OFFSETS, _coverage_score_np,
    )
    from dxt_lossless_transform_tpu.estimate.pallas_ltu import (
        SPAN, coverage_scores_pallas,
    )

    rng = np.random.default_rng(5)
    nbytes = 4 * SPAN
    data = rng.integers(0, 256, nbytes, np.uint8)
    want = _coverage_score_np(data, DEFAULT_OFFSETS)
    words = jnp.asarray(data.view("<u4"))
    got = float(coverage_scores_pallas(words[None], jnp.int32(nbytes),
                                       DEFAULT_OFFSETS, interpret=True)[0])
    assert got == want
    got8 = float(coverage_scores_pallas(jnp.asarray(data)[None],
                                        jnp.int32(nbytes), DEFAULT_OFFSETS,
                                        interpret=True)[0])
    assert got8 == want
