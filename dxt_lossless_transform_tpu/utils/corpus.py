"""Realistic texture-corpus generation for ratio benchmarks.

The reference's headline ratio (-14.7..14.9% on 2,130 Skyrim BC1 textures,
``bc1-api/README.MD:236-266``) is measured on real game content: photographic
albedos, smooth normal maps, flat UI/decals, tiled surfaces -- all with full mip
chains. :func:`..utils.encode.procedural_texture` (pure value noise) badly
under-represents that redundancy, so this module builds a corpus from the real
raster sources available offline plus structured procedural families:

- ``photo``:   crops/rescales/tints of real photographs (matplotlib's
  grace_hopper sample, the reference's own r2-256.png source art);
- ``normal``:  tangent-space normal maps derived from real DEM heightmaps
  (matplotlib topobathy/jacksboro samples) and fractal height fields --
  the smoothest, most compressible family, very common in game packs;
- ``flat``:    few-color decal/UI sheets with hard edges and alpha;
- ``tiled``:   periodic brick/tile patterns (LZ matches at row strides);
- ``terrain``: multi-octave noise shaded through a small color LUT.

Every texture gets a FULL MIP CHAIN down to 4x4 (box filter), concatenated the
way a DDS payload stores it -- the transform sees all mips in one call
(``DdsHandler`` behavior, ``dds/handler/file_format_handler.rs:15-120``).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


# --------------------------------------------------------------- raster sources ----

def _sample_data_dir() -> str:
    import matplotlib

    return os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                        "sample_data")


def _load_photos() -> List[np.ndarray]:
    """Real RGB rasters available offline; [] if none can be loaded."""
    photos = []
    try:
        from PIL import Image

        p = os.path.join(_sample_data_dir(), "grace_hopper.jpg")
        if os.path.exists(p):
            photos.append(np.asarray(Image.open(p).convert("RGB")))
        ref_png = "/root/reference/src/assets/tests/r2-256.png"
        if os.path.exists(ref_png):
            photos.append(np.asarray(Image.open(ref_png).convert("RGB")))
    except Exception:
        pass
    return photos


def _load_heightmaps() -> List[np.ndarray]:
    """Real float heightfields (DEM samples); [] if unavailable."""
    maps = []
    for name, key in (("topobathy.npz", "topo"), ("jacksboro_fault_dem.npz",
                                                  "elevation")):
        try:
            with np.load(os.path.join(_sample_data_dir(), name)) as z:
                arr = z[key if key in z else list(z.keys())[0]]
            maps.append(np.asarray(arr, np.float64))
        except Exception:
            pass
    return maps


_PHOTOS = None
_HEIGHTS = None


def _photos() -> List[np.ndarray]:
    global _PHOTOS
    if _PHOTOS is None:
        _PHOTOS = _load_photos()
    return _PHOTOS


def _heights() -> List[np.ndarray]:
    global _HEIGHTS
    if _HEIGHTS is None:
        _HEIGHTS = _load_heightmaps()
    return _HEIGHTS


# ------------------------------------------------------------------- resampling ----

def _resize(img: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbour wrap-around resample of (H, W[, C]) to (size, size[, C])."""
    h, w = img.shape[:2]
    ys = (np.arange(size) * h // size) % h
    xs = (np.arange(size) * w // size) % w
    return img[np.ix_(ys, xs)]


def box_downsample(img: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> (H/2, W/2, C) box filter (the DDS mip generator)."""
    h, w, c = img.shape
    v = img.astype(np.uint16).reshape(h // 2, 2, w // 2, 2, c)
    return ((v.sum(axis=(1, 3)) + 2) // 4).astype(np.uint8)


def mip_chain(img: np.ndarray, min_size: int = 4) -> List[np.ndarray]:
    """Mip chain [img, img/2, ...] down to ``min_size`` (power-of-two inputs) or
    to the last level whose halving stays 4x4-block encodable (non-power-of-two
    inputs, e.g. 320 -> ... -> 20; real DDS chains continue to 1x1 with block
    rounding, which the block encoders here do not model)."""
    chain = [img]
    while (img.shape[0] > min_size
           and img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0):
        img = box_downsample(img)
        chain.append(img)
    return chain


# ------------------------------------------------------------- texture families ----

def _photo_texture(size: int, rng) -> np.ndarray:
    photos = _photos()
    if not photos:
        return _terrain_texture(size, rng)
    src = photos[rng.integers(len(photos))]
    h, w = src.shape[:2]
    crop = min(h, w, size * 2)
    y0 = rng.integers(0, h - crop + 1)
    x0 = rng.integers(0, w - crop + 1)
    img = _resize(src[y0:y0 + crop, x0:x0 + crop], size)
    img = np.rot90(img, k=int(rng.integers(4))).copy()
    tint = rng.uniform(0.8, 1.2, 3)
    rgb = np.clip(img * tint, 0, 255).astype(np.uint8)
    out = np.empty((size, size, 4), np.uint8)
    out[..., :3] = rgb
    out[..., 3] = 255
    return out


def _fractal_height(size: int, rng) -> np.ndarray:
    acc = np.zeros((size, size))
    for octave in range(2, int(np.log2(size))):
        cells = 1 << octave
        grid = rng.standard_normal((cells, cells))
        if size % cells == 0:
            up = np.kron(grid, np.ones((size // cells, size // cells)))
        else:  # non-power-of-two size: nearest upsample of the octave grid
            up = _resize(grid, size)
        acc += up / (1 << (octave - 2))
    return acc


def _normal_texture(size: int, rng) -> np.ndarray:
    """Tangent-space normal map from a real DEM (or fractal) heightfield."""
    heights = _heights()
    if heights and rng.random() < 0.7:
        src = heights[rng.integers(len(heights))]
        h, w = src.shape
        crop = min(h, w, size)
        y0 = rng.integers(0, h - crop + 1)
        x0 = rng.integers(0, w - crop + 1)
        z = _resize(src[y0:y0 + crop, x0:x0 + crop], size)
        z = (z - z.mean()) / (z.std() + 1e-9)
    else:
        z = _fractal_height(size, rng)
    scale = rng.uniform(1.0, 4.0)
    dx = (np.roll(z, -1, axis=1) - np.roll(z, 1, axis=1)) * scale
    dy = (np.roll(z, -1, axis=0) - np.roll(z, 1, axis=0)) * scale
    inv = 1.0 / np.sqrt(dx * dx + dy * dy + 1.0)
    out = np.empty((size, size, 4), np.uint8)
    out[..., 0] = np.clip((-dx * inv * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    out[..., 1] = np.clip((-dy * inv * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    out[..., 2] = np.clip((inv * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    out[..., 3] = 255
    return out


def _flat_texture(size: int, rng) -> np.ndarray:
    """Few-color decal/UI sheet: flat rectangles + a circular emblem + alpha."""
    ncolors = int(rng.integers(2, 6))
    palette = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = palette[0]
    img[..., 3] = 0
    for _ in range(int(rng.integers(3, 9))):
        c = palette[rng.integers(ncolors)]
        y0, x0 = rng.integers(0, size, 2)
        hgt, wid = rng.integers(size // 8, size // 2, 2)
        img[y0:y0 + hgt, x0:x0 + wid, :3] = c
        img[y0:y0 + hgt, x0:x0 + wid, 3] = 255
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = rng.integers(size // 4, 3 * size // 4, 2)
    r = rng.integers(size // 8, size // 3)
    disc = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
    img[disc, :3] = palette[rng.integers(ncolors)]
    img[disc, 3] = 255
    return img


def _tiled_texture(size: int, rng) -> np.ndarray:
    """Brick/tile pattern: periodic structure + per-brick shade + soft noise."""
    bh = int(rng.choice([8, 16, 32]))
    bw = bh * 2
    yy, xx = np.mgrid[0:size, 0:size]
    row = yy // bh
    col = (xx + (row % 2) * (bw // 2)) // bw
    mortar = ((yy % bh) < 1) | (((xx + (row % 2) * (bw // 2)) % bw) < 1)
    shade = rng.integers(-18, 18, (size // bh + 2, size // bw + 2))
    base = np.asarray(rng.integers(60, 200, 3), np.int32)
    img = np.empty((size, size, 4), np.uint8)
    per_brick = shade[row, col]
    for ch in range(3):
        v = base[ch] + per_brick + rng.normal(0, 2, (size, size))
        v = np.where(mortar, base[ch] // 2, v)
        img[..., ch] = np.clip(v, 0, 255).astype(np.uint8)
    img[..., 3] = 255
    return img


def _terrain_texture(size: int, rng) -> np.ndarray:
    """Noise shaded through a small color LUT (quantized-palette albedo)."""
    acc = _fractal_height(size, rng)
    acc = (acc - acc.min()) / (np.ptp(acc) + 1e-9)
    nstops = int(rng.integers(3, 6))
    stops = np.sort(rng.uniform(0, 1, nstops))
    colors = rng.integers(30, 226, (nstops, 3))
    idx = np.clip(np.searchsorted(stops, acc) - 1, 0, nstops - 2)
    t = np.clip((acc - stops[idx]) / (stops[idx + 1] - stops[idx] + 1e-9), 0, 1)
    img = np.empty((size, size, 4), np.uint8)
    for ch in range(3):
        v = colors[idx, ch] * (1 - t) + colors[idx + 1, ch] * t
        img[..., ch] = np.clip(v + rng.normal(0, 2, v.shape), 0, 255).astype(np.uint8)
    img[..., 3] = np.clip((acc - 0.35) * 510, 0, 255).astype(np.uint8) \
        if rng.random() < 0.3 else 255
    return img


_FAMILIES = (("photo", _photo_texture), ("normal", _normal_texture),
             ("flat", _flat_texture), ("tiled", _tiled_texture),
             ("terrain", _terrain_texture))


def realistic_texture(size: int, seed: int) -> Tuple[str, np.ndarray]:
    """One corpus texture: (family name, (size, size, 4) uint8)."""
    rng = np.random.default_rng(seed)
    name, fn = _FAMILIES[seed % len(_FAMILIES)]
    return name, fn(size, rng)


def build_realistic_corpus(n_files: int, sizes=(256, 512, 1024),
                           with_mips: bool = True):
    """n_files (family, [mip images]) entries cycling through sizes/families."""
    out = []
    for i in range(n_files):
        size = sizes[(i // len(_FAMILIES)) % len(sizes)]
        name, img = realistic_texture(size, seed=31000 + i)
        out.append((name, mip_chain(img) if with_mips else [img]))
    return out


def encode_mips(mips, encode_fn) -> bytes:
    """Concatenated per-mip payload, the way a DDS data section stores a chain."""
    return b"".join(encode_fn(m) for m in mips)


def _with_alpha(img: np.ndarray, rng, translucent: bool) -> np.ndarray:
    if not translucent:
        out = img.copy()
        out[..., 3] = 255
        return out
    # foliage/decal-style alpha cut from the luma field
    luma = img[..., :3].astype(np.int64) @ [299, 587, 114] // 1000
    out = img.copy()
    out[..., 3] = np.clip((luma - int(rng.integers(40, 120))) * 3,
                          0, 255).astype(np.uint8)
    return out


def build_bc7_dds_corpus(n_files: int, sizes=(128, 256), seed0: int = 52000,
                         translucent_every: int = 3):
    """Real-encoder BC7 corpus: (name, DX10 DDS bytes, mode histogram) files.

    Textures come from the realistic families, full mip chains, encoded per
    block by the least-error multi-mode encoder (``utils.bc7codec``); every
    ``translucent_every``-th file carries a derived alpha channel so the
    alpha-mode working set (5/6/7) appears alongside the opaque one (1/3/6)."""
    from . import testgen
    from .bc7codec import block_mode_histogram, encode_bc7

    for i in range(n_files):
        size = sizes[(i // len(_FAMILIES)) % len(sizes)]
        name, img = realistic_texture(size, seed=seed0 + i)
        rng = np.random.default_rng(seed0 + 7 * i)
        rgba = _with_alpha(img, rng, translucent=(i % translucent_every == 0))
        mips = mip_chain(rgba)
        payload = encode_mips(mips, encode_bc7)
        dds = testgen.make_dx10_dds("BC7", size, size, mipmaps=len(mips),
                                    payload=payload)
        yield (f"{name}{'_a' if i % translucent_every == 0 else ''}", dds,
               block_mode_histogram(payload))


def build_bc6h_dds_corpus(n_files: int, sizes=(128, 256), seed0: int = 63000):
    """Real-encoder BC6H corpus: realistic textures HDR-ified (gamma-decode +
    per-file exposure scale into float16) and encoded with the one-region
    (modes 11-14) least-error BC6H encoder; yields (name, DX10 DDS bytes)."""
    from . import testgen
    from .bc7codec import encode_bc6h

    for i in range(n_files):
        size = sizes[(i // len(_FAMILIES)) % len(sizes)]
        name, img = realistic_texture(size, seed=seed0 + i)
        rng = np.random.default_rng(seed0 + 11 * i)
        scale = float(rng.uniform(0.5, 8.0))
        hdr = ((img[..., :3].astype(np.float64) / 255.0) ** 2.2
               * scale).astype(np.float16)
        mips, cur = [], hdr
        while True:
            mips.append(cur)
            if min(cur.shape[:2]) <= 4:
                break
            cur = cur[::2, ::2]
        payload = encode_mips(mips, encode_bc6h)
        dds = testgen.make_dx10_dds("BC6H", size, size, mipmaps=len(mips),
                                    payload=payload)
        yield name, dds
