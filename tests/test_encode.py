"""BC1/BC3 encoders (corpus generation) + ratio sanity on encoded textures."""

import numpy as np

from dxt_lossless_transform_tpu.estimate import ZstdEstimation
from dxt_lossless_transform_tpu.oracle import bc1 as o1, decode
from dxt_lossless_transform_tpu.settings import Bc1TransformSettings
from dxt_lossless_transform_tpu.utils.encode import (
    encode_bc1, encode_bc3, procedural_texture,
)


def test_encode_bc1_quality_and_decode():
    img = procedural_texture(128, seed=1)
    data = encode_bc1(img[..., :3])
    assert len(data) == 32 * 32 * 8
    px = decode.decode_bc1(data)
    rec = px.reshape(32, 32, 4, 4, 4).transpose(0, 2, 1, 3, 4).reshape(128, 128, 4)
    err = np.abs(rec[..., :3].astype(int) - img[..., :3].astype(int)).mean()
    assert err < 8.0  # range-fit quality bound on smooth procedural content
    assert (rec[..., 3] == 255).all()


def test_encode_bc3_alpha():
    img = procedural_texture(128, seed=2, kind="foliage")
    data = encode_bc3(img)
    assert len(data) == 32 * 32 * 16
    px = decode.decode_bc3(data)
    rec_a = px[..., 3].reshape(32, 32, 4, 4).transpose(0, 2, 1, 3).reshape(128, 128)
    err = np.abs(rec_a.astype(int) - img[..., 3].astype(int)).mean()
    assert err < 10.0


def test_transform_improves_ratio_on_encoded_texture():
    payload = encode_bc1(procedural_texture(256, seed=3)[..., :3])
    est = ZstdEstimation(16)
    plain = est.estimate(payload)
    best = min(est.estimate(o1.transform(payload, s))
               for s in Bc1TransformSettings.all_combinations())
    assert best < plain * 0.97  # >= 3% gain on realistic content
