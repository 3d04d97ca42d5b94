"""BC7 mode-aware transform: oracle, device parity, header, auto-search, end-to-end.

The reference stubs BC7 (``bc7/src/lib.rs:8-13``); this framework implements a real
mode-aware transform (mode-stable sort + byte-plane split; see ``oracle/bc7.py``).
"""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.estimate.zstd import ZstdEstimation
from dxt_lossless_transform_tpu.formats.embed import TransformFormat, TransformHeader
from dxt_lossless_transform_tpu.oracle import bc7 as oracle_bc7
from dxt_lossless_transform_tpu.ops import bc7 as ops_bc7
from dxt_lossless_transform_tpu.settings import BC7_FAST_CANDIDATES, Bc7TransformSettings

ALL_SETTINGS = tuple(Bc7TransformSettings.all_combinations())


def _random_blocks(n, seed=0, with_invalid=True):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    if with_invalid and n > 3:
        blocks[2, 0] = 0  # byte0 == 0: invalid block, mode id 8
    return blocks.tobytes()


def test_block_modes_ctz():
    # mode m <=> m zero bits then a one, LSB-first in byte 0
    blocks = np.zeros((9, 16), dtype=np.uint8)
    for m in range(8):
        blocks[m, 0] = 1 << m
    # blocks[8] keeps byte0 == 0 -> invalid sentinel 8
    modes = oracle_bc7.block_modes(blocks.tobytes())
    assert list(modes) == [0, 1, 2, 3, 4, 5, 6, 7, 8]


def test_mode_stream_pack_roundtrip():
    rng = np.random.default_rng(1)
    for n in (0, 1, 2, 5, 100):
        modes = rng.integers(0, 9, n).astype(np.uint8)
        stream = oracle_bc7.pack_mode_stream(modes)
        assert len(stream) == (n + 1) // 2
        assert list(oracle_bc7.unpack_mode_stream(stream, n)) == list(modes)


@pytest.mark.parametrize("settings", ALL_SETTINGS)
@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 1000])
def test_oracle_roundtrip(settings, n):
    data = _random_blocks(n, seed=n)
    t = oracle_bc7.transform(data, settings)
    assert len(t) == oracle_bc7.transformed_len(len(data), settings)
    assert oracle_bc7.original_len(len(t), settings) == len(data)
    assert oracle_bc7.untransform(t, settings) == data


@pytest.mark.parametrize("settings", ALL_SETTINGS)
def test_device_matches_oracle(settings, monkeypatch):
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")
    for n in (1, 5, 1000):
        data = _random_blocks(n, seed=n + 10)
        t_dev = ops_bc7.transform(data, settings)
        assert t_dev == oracle_bc7.transform(data, settings)
        assert ops_bc7.untransform(t_dev, settings) == data


@pytest.mark.parametrize("n", [4096, 4097, 10000, 12289])
def test_cross_chunk_roundtrip(n, monkeypatch):
    # The mode sort is chunk-local (4096 blocks); cover exact/ragged chunk boundaries
    # on both the oracle and the device path, with invalid (byte0 == 0) blocks mixed in.
    monkeypatch.setenv("DLT_DEVICE_MIN_BYTES", "0")
    rng = np.random.default_rng(n)
    blocks = rng.integers(0, 256, (n, 16), dtype=np.uint8)
    blocks[rng.integers(0, n, 20), 0] = 0
    data = blocks.tobytes()
    s = Bc7TransformSettings(True, True)
    t = oracle_bc7.transform(data, s)
    assert oracle_bc7.untransform(t, s) == data
    assert ops_bc7.transform(data, s) == t
    assert ops_bc7.untransform(t, s) == data


def test_golden_bytes():
    # Two blocks: mode 6 (byte0 bit 6) then mode 0 (byte0 bit 0); stable sort swaps
    # them; planes interleave the sorted blocks' bytes column-major.
    b0 = bytes([0x40]) + bytes(range(1, 16))          # mode 6
    b1 = bytes([0x01]) + bytes(range(101, 116))       # mode 0
    data = b0 + b1
    t = oracle_bc7.transform(data, Bc7TransformSettings(True, False))
    assert t[0] == 0x06 | (0x00 << 4) or t[0] == (6 | (0 << 4))  # nibbles: 6 then 0
    assert t[0] == 0x06
    assert t[1:] == b1 + b0  # sorted: mode 0 first
    tp = oracle_bc7.transform(data, Bc7TransformSettings(True, True))
    planes = bytes(x for pair in zip(b1, b0) for x in pair)
    assert tp[1:] == planes
    ti = oracle_bc7.transform(data, Bc7TransformSettings(False, False))
    assert ti == data


def test_empty_and_alignment():
    assert oracle_bc7.transform(b"") == b""
    assert ops_bc7.transform(b"") == b""
    assert ops_bc7.untransform(b"") == b""
    with pytest.raises(ValueError):
        ops_bc7.transform(b"\x00" * 15)
    assert oracle_bc7.original_len(17, Bc7TransformSettings(True, True)) == 16
    with pytest.raises(ValueError):
        oracle_bc7.original_len(18, Bc7TransformSettings(True, True))


def test_header_roundtrip():
    for s in ALL_SETTINGS:
        h = TransformHeader.for_bc7(s)
        assert h.format == TransformFormat.BC7
        h2 = TransformHeader.from_bytes(h.to_bytes())
        assert h2.bc7_settings() == s


def test_auto_prefers_identity_on_noise():
    data = _random_blocks(2048, seed=3, with_invalid=False)
    out, best = ops_bc7.transform_bc7_auto(data, ZstdEstimation(1))
    assert best == Bc7TransformSettings(False, False)
    assert out == data


def test_ltu_auto_identity_guard_postcondition():
    """Under the LTU estimator the shipped result is never worse than identity
    by the zstd-1 confirmation (ops/bc7.py:ltu_identity_guard): whenever a
    transform is shipped, its zstd-1 size strictly beats the raw payload's."""
    from dxt_lossless_transform_tpu.estimate import LtuEstimation
    from dxt_lossless_transform_tpu.estimate.zstd import ZstdEstimation as Z
    from dxt_lossless_transform_tpu.utils.corpus import build_bc7_dds_corpus

    est, z1 = LtuEstimation(), Z(1)
    ident = Bc7TransformSettings(False, False)
    flipped = shipped_transform = 0
    for entry in build_bc7_dds_corpus(6, sizes=(64, 128)):
        payload = entry[1][0x94:]
        out, picked = ops_bc7.transform_bc7_auto(payload, est)
        if picked == ident:
            assert out == payload
            # the guard only ever flips TO identity; a flip means the raw
            # LTU argmin preferred a transform that zstd-1 refuted
            raw = [ops_bc7.transform(payload, s) for s in ALL_SETTINGS]
            if int(np.argmin(est.estimate_batch(raw))) != ALL_SETTINGS.index(ident):
                flipped += 1
        else:
            shipped_transform += 1
            assert z1.estimate(out) < z1.estimate(payload)
            assert ops_bc7.untransform(out, picked) == payload
    assert flipped + shipped_transform > 0  # the guard actually engaged


def test_auto_prefers_transform_on_structured():
    # Synthetic mode-6-like blocks with smoothly varying endpoint bytes and noisy
    # index bytes: the plane split should win under the estimator.
    n = 4096
    rng = np.random.default_rng(4)
    blocks = np.empty((n, 16), dtype=np.uint8)
    ramp = (np.arange(n) // 16) % 200
    for k in range(9):  # endpoint-ish bytes: smooth + tiny noise
        blocks[:, k] = (ramp + 3 * k + rng.integers(0, 2, n)) % 256
    blocks[:, 0] = 0x40  # mode 6 prefix
    blocks[:, 9:] = rng.integers(0, 256, (n, 7))  # index-ish noise
    data = blocks.tobytes()
    out, best = ops_bc7.transform_bc7_auto(data, ZstdEstimation(1))
    assert best.split_byte_planes
    assert ops_bc7.untransform(out, best) == data
    import zstandard as zstd

    c = zstd.ZstdCompressor(level=16)
    assert len(c.compress(out)) < len(c.compress(data))


def test_candidate_set_includes_identity_and_full():
    assert Bc7TransformSettings(False, False) in BC7_FAST_CANDIDATES
    assert Bc7TransformSettings(True, True) == BC7_FAST_CANDIDATES[-1]


def test_pallas_plane_kernels_interpret():
    """Mosaic plane split/merge (interpret mode) vs the XLA shift/mask path."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops.bc7 import _planes_from_cols
    from dxt_lossless_transform_tpu.ops.pallas.planes import (
        merge_planes_tpu, split_planes_tpu,
    )

    from dxt_lossless_transform_tpu.ops.pallas.planes import W_IN
    from dxt_lossless_transform_tpu.ops.pallas.shuffle import MAX_ROWS

    rng = np.random.default_rng(11)
    n = MAX_ROWS * W_IN  # one tile per column
    cols = jnp.asarray(rng.integers(0, 2**32, (4, n), dtype=np.uint32))
    planes = split_planes_tpu(cols, interpret=True)
    ref = np.asarray(_planes_from_cols(cols))  # (16, N) u8
    for p in range(16):
        got = np.asarray(planes[p]).astype("<u4").tobytes()
        assert got == ref[p].tobytes(), p
    back = merge_planes_tpu(tuple(planes), interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(cols))


def test_pallas_flat_plane_kernels_interpret():
    """Flat-layout Mosaic kernels (interpret mode): split/merge of the interleaved
    block-word stream, plus the column weave/split pair used by the sort path."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops.pallas.planes import (
        W_IN, merge_planes_flat_tpu, split_cols_tpu, split_planes_flat_tpu,
        weave_cols_tpu,
    )
    from dxt_lossless_transform_tpu.ops.pallas.shuffle import MAX_ROWS

    rng = np.random.default_rng(12)
    n = 2 * MAX_ROWS * W_IN  # two tiles
    flat_np = rng.integers(0, 2**32, 4 * n, dtype=np.uint32)
    blocks = flat_np.view(np.uint8).reshape(n, 16)
    flat = jnp.asarray(flat_np)

    planes = split_planes_flat_tpu(flat, interpret=True)
    for p in range(16):
        ref = np.ascontiguousarray(blocks[:, p]).view("<u4")
        np.testing.assert_array_equal(np.asarray(planes[p]), ref)
    back = merge_planes_flat_tpu(tuple(planes), interpret=True)
    np.testing.assert_array_equal(np.asarray(back), flat_np)

    cols = split_cols_tpu(flat, interpret=True)
    for w in range(4):
        np.testing.assert_array_equal(np.asarray(cols[w]), flat_np[w::4])
    woven = weave_cols_tpu(tuple(cols), interpret=True)
    np.testing.assert_array_equal(np.asarray(woven), flat_np)


def test_device_auto_stream_assembly_matches_oracle():
    """_assemble_stream_row builds each candidate's exact on-disk stream (with the
    row tail masked by valid_len), including ragged n < padded block counts."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops import lanes
    from dxt_lossless_transform_tpu.ops.bc7 import _assemble_stream_row

    n = 3000  # ragged: bucket pads to 4096
    data = _random_blocks(n, seed=13)
    n_pad = lanes.bucket_size(n)
    flat = lanes.pad_rows(np.frombuffer(data, "<u4"), 4 * n_pad)
    row_len = n_pad // 2 + 16 * n_pad
    for s in ALL_SETTINGS:
        row, valid = _assemble_stream_row(
            jnp.asarray(flat), jnp.uint32(n), row_len, s.sort_by_mode,
            s.split_byte_planes, "bc7", use_pallas=False)
        got = np.asarray(row).tobytes()[:int(valid)]
        assert got == oracle_bc7.transform(data, s), s


def test_transform_auto_device_gate_off_on_cpu():
    """On CPU the device gate stays closed and the host path is used."""
    from dxt_lossless_transform_tpu.estimate import LtuEstimation
    from dxt_lossless_transform_tpu.ops.bc7 import _auto_device_ok

    assert _auto_device_ok(LtuEstimation(), 1 << 20) is False


@pytest.mark.parametrize("fmt", ["bc7", "bc6h"])
def test_split_cols_modes_fused_kernel(fmt):
    """The fused forward kernel (cols + raw keys + packed mode words) must agree
    with the separate XLA stages, padding fixup included."""
    import jax.numpy as jnp

    from dxt_lossless_transform_tpu.ops import bc7 as ops_bc7
    from dxt_lossless_transform_tpu.ops.pallas.planes import split_cols_modes_tpu
    from dxt_lossless_transform_tpu.oracle.bc7 import SORT_CHUNK_BLOCKS as C

    n = 128 * 512  # one tile
    rng = np.random.default_rng(17)
    flat = jnp.asarray(rng.integers(0, 2**32, 4 * n, dtype=np.uint32))
    n_valid = jnp.uint32(n - 777)
    cols, rawkeys, packed = split_cols_modes_tpu(flat, fmt, C, interpret=True)
    want_cols = tuple(np.asarray(flat).reshape(-1, 4).T)
    for got, want in zip(cols, want_cols):
        np.testing.assert_array_equal(np.asarray(got), want)
    modes = ops_bc7._modes_from_words(cols[0], n_valid, fmt)
    want_keys = ops_bc7._chunk_keys(modes).reshape(-1)
    idx = jnp.arange(n, dtype=jnp.uint32)
    pad = {"bc7": 8, "bc6h": 15}[fmt]
    got_keys = jnp.where(idx < n_valid, rawkeys,
                         jnp.uint32(pad * C) + (idx & jnp.uint32(C - 1))
                         ).astype(jnp.uint16)
    np.testing.assert_array_equal(np.asarray(got_keys), np.asarray(want_keys))
    want_stream = np.asarray(ops_bc7._pack_nibbles(modes, n_valid))
    got_stream = np.asarray(ops_bc7._packed_stream_bytes(packed, n_valid))
    np.testing.assert_array_equal(got_stream, want_stream)
