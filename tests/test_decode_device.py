"""Device decoders vs the numpy oracle, BC7 bit utils, block extraction, endianness."""

import numpy as np
import pytest

from dxt_lossless_transform_tpu.formats.debug import (
    TransformFormatFilter, extract_blocks_from_dds,
)
from dxt_lossless_transform_tpu.formats.embed import TransformFormat
from dxt_lossless_transform_tpu.ops import bc7, decode as ddecode
from dxt_lossless_transform_tpu.oracle import decode as odecode
from dxt_lossless_transform_tpu.utils import testgen


def _planes_to_rgba(planes) -> np.ndarray:
    # (4, N, 16) -> (N, 4, 4, 4)
    p = np.asarray(planes)
    return np.moveaxis(p, 0, -1).reshape(-1, 4, 4, 4).astype(np.uint8)


@pytest.mark.parametrize("fmt,cols,dec_d,dec_o", [
    ("bc1", 2, ddecode.decode_bc1, odecode.decode_bc1),
    ("bc2", 4, ddecode.decode_bc2, odecode.decode_bc2),
    ("bc3", 4, ddecode.decode_bc3, odecode.decode_bc3),
])
def test_device_decode_matches_oracle(fmt, cols, dec_d, dec_o):
    import jax.numpy as jnp

    gen = {"bc1": testgen.bc1_realistic, "bc2": testgen.bc2_realistic,
           "bc3": testgen.bc3_realistic}[fmt]
    for data in (gen(257, seed=1), testgen.bc_blocks(257, 4 * cols, seed=2)):
        words = jnp.asarray(np.frombuffer(data, "<u4").reshape(-1, cols))
        got = _planes_to_rgba(dec_d(words))
        np.testing.assert_array_equal(got, dec_o(data))


def test_bc7_msb_bits():
    assert bc7.extract_msb_bits(0b10110000, 0, 0) == 1
    assert bc7.extract_msb_bits(0b10110000, 1, 3) == 0b011
    assert bc7.extract_msb_bits(0b10110001, 4, 7) == 0b0001
    assert bc7.insert_msb_bits(0, 0b101, 0, 2) == 0b10100000
    assert bc7.insert_msb_bits(0, 0b11, 6, 7) == 0b00000011
    # roundtrip over all bytes and ranges
    for byte in (0x00, 0x5A, 0xFF, 0b10110001):
        for start in range(8):
            for end in range(start, 8):
                v = bc7.extract_msb_bits(byte, start, end)
                assert bc7.extract_msb_bits(
                    bc7.insert_msb_bits(0, v, start, end), start, end) == v
    # vectorized over numpy arrays
    arr = np.arange(256, dtype=np.int64)
    np.testing.assert_array_equal(bc7.extract_msb_bits(arr, 0, 7), arr)


def test_block_extraction():
    data = testgen.make_dds("BC1", 32, 32, mipmaps=2, trailing=b"tail")
    ex = extract_blocks_from_dds(data)
    assert ex is not None and ex.format == TransformFormat.BC1
    assert ex.num_blocks == 64 + 16
    assert ex.data == data[0x80:0x80 + 80 * 8]
    assert extract_blocks_from_dds(data, TransformFormatFilter.BC3) is None
    assert extract_blocks_from_dds(b"garbage" * 40) is None


# --- endianness pinning (the debug-endian harness analog) ---------------------------
# The on-disk transformed format is defined little-endian; these golden bytes pin it
# against regressions regardless of host byte order (reference endian_test.rs).

def test_transformed_format_golden_bytes():
    from dxt_lossless_transform_tpu.oracle import bc1
    from dxt_lossless_transform_tpu.settings import Bc1TransformSettings, YCoCgVariant

    data = bytes(range(16))  # two BC1 blocks
    out = bc1.transform(data, Bc1TransformSettings(YCoCgVariant.VARIANT1, True))
    assert out.hex() == "041050e69bf7d705040506070c0d0e0f"


def test_header_golden_bytes():
    from dxt_lossless_transform_tpu.formats.embed import TransformHeader
    from dxt_lossless_transform_tpu.settings import Bc1TransformSettings, YCoCgVariant

    h = TransformHeader.for_bc1(Bc1TransformSettings(YCoCgVariant.VARIANT2, False))
    # tag=0 (BC1), version=0, split=0, variant bits=1 -> word = 0b01000 << 4 = 0x80
    assert h.to_bytes() == bytes([0x80, 0x00, 0x00, 0x00])
