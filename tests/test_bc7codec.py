"""Real BC7/BC6H codec validation (utils/bc7codec.py).

The decoder is the oracle: every implemented mode's packed output must decode
to EXACTLY the reconstruction the encoder scored (bit-level packing proof), and
whole images must decode at sane PSNR with content-driven mode statistics --
the properties that make the corpus study's BC7 evidence "real encoder" grade.
"""

import numpy as np
import pytest

import dxt_lossless_transform_tpu.utils.bc7codec as C
from dxt_lossless_transform_tpu.utils.corpus import realistic_texture
from dxt_lossless_transform_tpu.utils.encode import _blockify, procedural_texture


def _opaque_img(seed, size=32):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (size, size, 4), np.uint8)
    img[..., 3] = 255
    return img


@pytest.mark.parametrize("mode", [1, 3, 6])
def test_opaque_mode_encode_decode_exact(mode):
    px = _blockify(_opaque_img(3))
    packed, err = C._encode_mode(px, mode)
    dec = C._decode_mode(packed, mode)
    mse = ((dec.astype(np.int64) - px.astype(np.int64)) ** 2).sum(axis=(1, 2))
    np.testing.assert_array_equal(mse, err)
    # every block carries the requested mode bit pattern
    b0 = packed[:, 0]
    assert ((b0 & ((1 << (mode + 1)) - 1)) == (1 << mode)).all()


@pytest.mark.parametrize("mode", [4, 5, 6, 7])
def test_alpha_mode_encode_decode_exact(mode):
    px = _blockify(procedural_texture(32, seed=5, kind="foliage"))
    packed, err = C._encode_mode(px, mode)
    dec = C._decode_mode(packed, mode)
    mse = ((dec.astype(np.int64) - px.astype(np.int64)) ** 2).sum(axis=(1, 2))
    np.testing.assert_array_equal(mse, err)


@pytest.mark.parametrize("mode,rot,idxm", [(4, r, i) for r in range(4)
                                           for i in (0, 1)]
                         + [(5, r, 0) for r in range(1, 4)])
def test_rotation_idxmode_encode_decode_exact(mode, rot, idxm):
    """Every rotation/idxMode variant must decode to exactly the
    reconstruction the encoder scored (the err array is computed in the
    ORIGINAL channel space, so equality proves the decoder un-rotates and
    un-swaps the index arrays correctly)."""
    px = _blockify(procedural_texture(32, seed=6, kind="foliage"))
    packed, err = C._encode_mode(px, mode, rot=rot, idxm=idxm)
    dec = C._decode_mode(packed, mode)
    mse = ((dec.astype(np.int64) - px.astype(np.int64)) ** 2).sum(axis=(1, 2))
    np.testing.assert_array_equal(mse, err)
    # header fields round-trip: rotation bits sit right after the mode field
    r = C._BitReader(packed)
    r.get(mode + 1)
    np.testing.assert_array_equal(r.get(2), rot)
    if mode == 4:
        np.testing.assert_array_equal(r.get(1), idxm)


def test_rotation_is_channel_swap():
    """Patching the rotation field of a rot=0 block must decode to the
    channel-swapped pixels of the unpatched block (decoder-only property,
    independent of the encoder's rotation search)."""
    px = _blockify(procedural_texture(16, seed=8, kind="foliage"))
    packed, _ = C._encode_mode(px, 5)
    base = C._decode_mode(packed, 5)
    for rot, ch in ((1, 0), (2, 1), (3, 2)):
        patched = packed.copy()
        patched[:, 0] |= rot << 6  # mode-5 field is 6 bits, rotation next
        got = C._decode_mode(patched, 5)
        want = base.copy()
        want[..., [ch, 3]] = want[..., [3, ch]]
        np.testing.assert_array_equal(got, want)


def test_partition_anchor_consistency():
    """Encoder-eligible partitions place the subset-1 anchor inside subset 1
    and pixel 0 inside subset 0 (the spec-table invariant)."""
    assert C._ENCODABLE_P2.sum() >= 60
    for pid in np.nonzero(C._ENCODABLE_P2)[0]:
        assert C._P2[pid][0] == 0
        assert C._P2[pid][C._ANCHOR2[pid]] == 1


def test_weight_tables_symmetric():
    """Endpoint-swap + index-flip must reproduce identical pixels (the anchor
    fix-up relies on it), which requires symmetric interpolation weights."""
    for ib, w in C._WEIGHTS.items():
        assert (w + w[::-1] == 64).all()


def test_image_psnr_and_mode_mix():
    got = {}
    for seed in range(1, 6):
        kind, img = realistic_texture(64, seed)
        if img.shape[2] == 3:  # pragma: no cover - families are RGBA today
            img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
        img = img.copy()
        img[..., 3] = 255
        data = C.encode_bc7(img)
        dec = C.decode_bc7(data)
        src = _blockify(img).astype(np.int64)
        mse = ((dec.astype(np.int64) - src) ** 2).mean()
        psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
        hist = C.block_mode_histogram(data)
        got[kind] = (psnr, hist)
        assert psnr > 22, (kind, psnr)
        assert set(hist) <= {1, 3, 6}, hist  # opaque working set
    # mode statistics are content-driven, not constant
    assert len({tuple(sorted(h.items())) for _, h in got.values()}) > 1


def test_alpha_content_uses_alpha_modes():
    img = procedural_texture(64, seed=7, kind="foliage")
    data = C.encode_bc7(img)
    hist = C.block_mode_histogram(data)
    assert set(hist) <= {4, 5, 6, 7}, hist
    dec = C.decode_bc7(data)
    src = _blockify(img).astype(np.int64)
    a_mse = ((dec[..., 3].astype(np.int64) - src[..., 3]) ** 2).mean()
    assert a_mse < 300  # alpha channel actually encoded


def test_bc6h_roundtrip():
    rng = np.random.default_rng(2)
    rgb = (np.abs(rng.standard_normal((32, 32, 3))) * 4).astype(np.float16)
    data = C.encode_bc6h(rgb)
    assert len(data) == (32 * 32 // 16) * 16
    # every block carries a one-region mode header (11-14)
    b0 = np.frombuffer(data, np.uint8)[::16]
    assert np.isin(b0 & 0x1F, (3, 7, 11, 15)).all()
    dec = C.decode_bc6h(data)
    src = _blockify(rgb.view(np.uint16).reshape(32, 32, 3)).astype(np.int64)
    err = np.abs(dec.astype(np.int64) - src)
    assert err.max() < 1 << 13  # within 10-bit quantization of the u16 lanes


@pytest.mark.parametrize("hv", [3, 7, 11, 15])
def test_bc6h_mode_encode_decode_exact(hv):
    """Each one-region mode decodes to exactly the reconstruction the encoder
    scored (bit-level packing proof for the delta-endpoint forms too)."""
    rng = np.random.default_rng(hv)
    rgb = (np.abs(rng.standard_normal((32, 32, 3))) * 4).astype(np.float16)
    px = _blockify(rgb.view(np.uint16).reshape(32, 32, 3)).astype(np.int64)
    packed, err = C._encode_bc6h_mode(px, hv)
    assert ((packed[:, 0] & 0x1F) == hv).all()
    dec = C.decode_bc6h(packed.tobytes())
    mse = ((dec.astype(np.int64) - px) ** 2).sum(axis=(1, 2))
    np.testing.assert_array_equal(mse, err)


def test_bc6h_mode_statistics_content_driven():
    """Flat content lands in the tight-delta modes, busy content in mode 11 --
    first-byte statistics emerge from content, which is what makes the BC6H
    corpus evidence real-encoder grade."""
    flat = np.full((16, 16, 3), 1.5, np.float16)
    noisy = (np.abs(np.random.default_rng(9).standard_normal((32, 32, 3)))
             * 64).astype(np.float16)
    hv_flat = set((np.frombuffer(C.encode_bc6h(flat), np.uint8)[::16]
                   & 0x1F).tolist())
    hv_noisy = set((np.frombuffer(C.encode_bc6h(noisy), np.uint8)[::16]
                    & 0x1F).tolist())
    assert hv_flat == {15}, hv_flat  # exact 16.4 representation, zero error
    assert 3 in hv_noisy, hv_noisy   # wide ranges need the 10.10 form
    assert hv_flat != hv_noisy


def test_corpus_builders_container_roundtrip():
    from dxt_lossless_transform_tpu.api import (
        Bc6hAutoTransformBuilder, Bc7AutoTransformBuilder,
    )
    from dxt_lossless_transform_tpu.estimate import LtuEstimation
    from dxt_lossless_transform_tpu.formats import TransformBundle
    from dxt_lossless_transform_tpu.formats.dds import DdsFormat, parse_dds
    from dxt_lossless_transform_tpu.formats.handlers import DdsHandler
    from dxt_lossless_transform_tpu.utils.corpus import (
        build_bc6h_dds_corpus, build_bc7_dds_corpus,
    )

    h = DdsHandler()
    bundle = TransformBundle(bc7=Bc7AutoTransformBuilder(LtuEstimation()),
                             bc6h=Bc6hAutoTransformBuilder(LtuEstimation()))
    for name, dds, hist in build_bc7_dds_corpus(3, sizes=(32,)):
        info = parse_dds(dds)
        assert info.format == DdsFormat.BC7
        assert len(dds) == info.data_offset + info.data_length
        assert sum(hist.values()) * 16 == info.data_length
        assert h.untransform(h.transform_bundle(dds, bundle)) == dds
    for name, dds in build_bc6h_dds_corpus(2, sizes=(32,)):
        info = parse_dds(dds)
        assert info.format == DdsFormat.BC6H
        assert h.untransform(h.transform_bundle(dds, bundle)) == dds
