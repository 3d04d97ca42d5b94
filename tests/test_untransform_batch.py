"""UntransformBatchProcessor: the batched load path.

The restore direction must be bit-exact for every (format, settings, size)
combination while riding the stacked fused kernels (or the host thread pool for
sub-threshold payloads). Differential-tested against the per-file oracle
transforms, the same discipline as the transform-side pipeline tests.
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.oracle import (
    bc1 as obc1, bc2 as obc2, bc3 as obc3, bc4 as obc4,
)
from dxt_lossless_transform_tpu.parallel.pipeline import (
    UntransformBatchProcessor, _pad_batch_for_family,
)
from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
    Bc4TransformSettings, Bc5TransformSettings, YCoCgVariant,
)


def _payloads(rng, block_size, ns):
    return [rng.integers(0, 256, block_size * n, dtype=np.uint8).tobytes()
            for n in ns]


# Mixed sizes: bucket-exact, ragged, odd block counts (exercises byte-level
# section scatter for the 1-byte/block split-alpha streams), plus a tiny file
# that must take the host-pool path even with the device threshold at 0.
NS = [2048, 1000, 2048, 4096, 3001, 2048, 16]


@pytest.mark.parametrize("fmt,block_size,oracle,settings", [
    ("bc1", 8, obc1,
     [Bc1TransformSettings(YCoCgVariant.VARIANT1, True),
      Bc1TransformSettings(YCoCgVariant.NONE, False)]),
    ("bc2", 16, obc2,
     [Bc2TransformSettings(YCoCgVariant.VARIANT2, True),
      Bc2TransformSettings(YCoCgVariant.VARIANT1, False)]),
    ("bc3", 16, obc3,
     [Bc3TransformSettings(YCoCgVariant.VARIANT1, True, True),
      Bc3TransformSettings(YCoCgVariant.VARIANT3, False, True)]),
])
def test_roundtrip_mixed_settings(fmt, block_size, oracle, settings, monkeypatch):
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "1024")
    rng = np.random.default_rng(7)
    originals = _payloads(rng, block_size, NS)
    entries = [(oracle.transform(p, settings[i % len(settings)]),
                settings[i % len(settings)])
               for i, p in enumerate(originals)]
    got = UntransformBatchProcessor(fmt, max_batch=3).process(entries)
    assert len(got) == len(originals)
    for g, orig in zip(got, originals):
        assert g == orig


@pytest.mark.parametrize("fmt,block_size,transform,settings", [
    ("bc4", 8, obc4.transform_bc4,
     [Bc4TransformSettings(True), Bc4TransformSettings(False)]),
    ("bc5", 16, obc4.transform_bc5,
     [Bc5TransformSettings(True), Bc5TransformSettings(False)]),
])
def test_roundtrip_bc45(fmt, block_size, transform, settings, monkeypatch):
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "1024")
    rng = np.random.default_rng(11)
    originals = _payloads(rng, block_size, NS)
    entries = [(transform(p, settings[i % len(settings)]),
                settings[i % len(settings)])
               for i, p in enumerate(originals)]
    got = UntransformBatchProcessor(fmt, max_batch=4).process(entries)
    for g, orig in zip(got, originals):
        assert g == orig


def test_host_pool_formats(monkeypatch):
    """BC7 / RGB ride the host pool (no stacked device path) but keep order."""
    from dxt_lossless_transform_tpu.oracle import bc7 as obc7, rgb as orgb
    from dxt_lossless_transform_tpu.settings import (
        Bc7TransformSettings, RgbTransformSettings,
    )

    rng = np.random.default_rng(3)
    s7 = Bc7TransformSettings(True, True)
    originals = _payloads(rng, 16, [64, 256, 1])
    entries = [(obc7.transform(p, s7), s7) for p in originals]
    got = UntransformBatchProcessor("bc7").process(entries)
    for g, orig in zip(got, originals):
        assert g == orig

    sr = RgbTransformSettings(True, True)
    originals = [rng.integers(0, 256, 4 * n, dtype=np.uint8).tobytes()
                 for n in (100, 4096)]
    entries = [(orgb.transform(p, "rgba8888", sr), sr) for p in originals]
    got = UntransformBatchProcessor("rgba8888").process(entries)
    for g, orig in zip(got, originals):
        assert g == orig


def test_empty_payloads():
    proc = UntransformBatchProcessor("bc1")
    assert proc.process([(b"", Bc1TransformSettings())]) == [b""]


def test_pad_batch_for_family_powers_of_two():
    from dxt_lossless_transform_tpu.ops.pallas.shuffle import FAMILY_ROWS, WIDTH

    for fmt, wpb in [("bc1", 2), ("bc2", 4), ("bc3", 4), ("bc4", 2), ("bc5", 4)]:
        cap = FAMILY_ROWS[fmt]
        for bucket in (2048, 4096, 1 << 17):
            for b in (1, 3, 7, 64):
                padded = _pad_batch_for_family(b, wpb * bucket, fmt)
                assert padded >= b
                total_rows = padded * (wpb * bucket) // WIDTH
                assert total_rows % min(cap, total_rows) == 0
