"""Persistent compression-size cache.

Analog of the reference CLI's ``CompressionSizeCache``
(``debug_format/compression_size_cache.rs:14-70``): a (content-hash, level, algo) ->
size map persisted to the user cache dir so repeated stats/benchmark runs skip
recompression. Uses blake2b-128 content hashing and JSON persistence.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path
from typing import Callable, Optional


def _default_cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return Path(base) / "dxt-lossless-transform-tpu"


class CompressionSizeCache:
    def __init__(self, path: Optional[Path] = None):
        self.path = Path(path) if path else _default_cache_dir() / "compression_size_cache.json"
        self._map: dict[str, int] = {}
        self._dirty = False
        try:
            self._map = json.loads(self.path.read_text())
        except (OSError, ValueError):
            self._map = {}

    @staticmethod
    def _key(content: bytes, level: int, algo: str) -> str:
        h = hashlib.blake2b(content, digest_size=16).hexdigest()
        return f"{h}:{level}:{algo}"

    def get_or_compute(self, content: bytes, level: int, algo: str,
                       compute: Callable[[], int]) -> int:
        key = self._key(content, level, algo)
        if key not in self._map:
            self._map[key] = int(compute())
            self._dirty = True
        return self._map[key]

    def save(self) -> None:
        if not self._dirty:
            return
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self._map))
        tmp.replace(self.path)
        self._dirty = False


class CompressedDataCache:
    """Persistent compressed-*blob* cache.

    Analog of the reference CLI's ``CompressedDataCache``
    (``debug_format/compressed_data_cache.rs``): stores the full compressed payload
    keyed by (content hash, level, algo) so benchmark reruns skip recompression
    entirely (the size cache only skips the *size* lookup; benchmarks also need the
    bytes to time decompression). One file per blob under the cache dir.
    """

    def __init__(self, path: Optional[Path] = None):
        self.dir = Path(path) if path else _default_cache_dir() / "compressed_blobs"

    @staticmethod
    def _name(content: bytes, level: int, algo: str) -> str:
        h = hashlib.blake2b(content, digest_size=16).hexdigest()
        return f"{h}-{level}-{algo}.bin"

    def get_or_compute(self, content: bytes, level: int, algo: str,
                       compute: Callable[[], bytes]) -> bytes:
        blob_path = self.dir / self._name(content, level, algo)
        try:
            return blob_path.read_bytes()
        except OSError:
            pass
        blob = compute()
        try:
            self.dir.mkdir(parents=True, exist_ok=True)
            tmp = blob_path.with_suffix(".tmp")
            tmp.write_bytes(blob)
            tmp.replace(blob_path)
        except OSError:
            pass  # cache is best-effort
        return blob
