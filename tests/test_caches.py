"""Persistent size + compressed-blob caches (reference CLI cache analogs)."""

from pathlib import Path

from dxt_lossless_transform_tpu.utils.cache import (
    CompressedDataCache, CompressionSizeCache,
)


def test_size_cache_persists(tmp_path: Path):
    path = tmp_path / "sizes.json"
    calls = []

    def compute():
        calls.append(1)
        return 42

    c1 = CompressionSizeCache(path)
    assert c1.get_or_compute(b"data", 3, "zstd", compute) == 42
    assert c1.get_or_compute(b"data", 3, "zstd", compute) == 42
    c1.save()
    c2 = CompressionSizeCache(path)
    assert c2.get_or_compute(b"data", 3, "zstd", compute) == 42
    assert len(calls) == 1  # second instance hit the persisted entry


def test_blob_cache_skips_recompression(tmp_path: Path):
    cache = CompressedDataCache(tmp_path / "blobs")
    calls = []

    def compute():
        calls.append(1)
        return b"compressed-bytes"

    assert cache.get_or_compute(b"payload", 16, "zstd", compute) == b"compressed-bytes"
    assert cache.get_or_compute(b"payload", 16, "zstd", compute) == b"compressed-bytes"
    assert len(calls) == 1
    # distinct (level, algo) keys do not collide
    assert cache.get_or_compute(b"payload", 1, "zstd", lambda: b"other") == b"other"
