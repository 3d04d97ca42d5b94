"""Real BC7 / BC6H encoders + decoders (numpy, vectorized) for corpus synthesis.

The reference ships no BC7 transform (stub crate) but documents the block
structure it intends to exploit (``src/assets/research/dds-bc7-blocks.hexpat``);
this framework implements the BC7/BC6H transforms, so its corpus evidence must
come from blocks with REAL ENCODER statistics -- mode fields chosen per block by
least-error search, endpoints from range fits of actual pixels, index fields
spatially coherent -- not from hand-clustered synthetic bytes
(``testgen.bc7_realistic`` remains for unit tests; this module feeds the corpus
study, CORPUS_REPORT.md).

Implemented BC7 modes: 1, 3, 6 (opaque) and 4, 5, 6, 7 (alpha) -- the working
set of fast production encoders (bc7enc's default is modes 1+6; RDO variants
add 4/5/7). Modes 4/5 search all four rotations and mode 4 both idxModes. Per
block, every enabled variant is encoded and the least-squared-error one wins,
so mode statistics emerge from content exactly as with a real encoder.
BC6H: the one-region family, modes 11-14 (10.10 / 11.9 / 12.8 / 16.4
delta-compressed endpoints, 4-bit indices), selected per block by least error
-- flat blocks land in mode 14, smooth gradients in 12/13, wide ranges in 11,
like production HDR encoders; encoding treats non-negative half-float bit
patterns as monotone integers (range fit + nearest-palette), which is the
standard cheap-BC6H trick.

Bit layouts follow the spec (LSB-first across the 16 bytes; mode m = m zero
bits then a one). The decoder is the validation oracle: encode->decode must
reproduce the encoder's own palette reconstruction bit-for-bit, and PSNR vs the
source is asserted in tests. The 2-subset partition and anchor tables are the
spec constants; encoder and decoder share them, so the codec is self-consistent
by construction.
"""

from __future__ import annotations

import numpy as np

# --- spec tables ----------------------------------------------------------------------

# 64 two-subset partition patterns (16 pixels each, raster order).
_P2 = np.array([
    [0,0,1,1,0,0,1,1,0,0,1,1,0,0,1,1],[0,0,0,1,0,0,0,1,0,0,0,1,0,0,0,1],
    [0,1,1,1,0,1,1,1,0,1,1,1,0,1,1,1],[0,0,0,1,0,0,1,1,0,0,1,1,0,1,1,1],
    [0,0,0,0,0,0,0,1,0,0,0,1,0,0,1,1],[0,0,1,1,0,1,1,1,0,1,1,1,1,1,1,1],
    [0,0,0,1,0,0,1,1,0,1,1,1,1,1,1,1],[0,0,0,0,0,0,0,1,0,0,1,1,0,1,1,1],
    [0,0,0,0,0,0,0,0,0,0,0,1,0,0,1,1],[0,0,1,1,0,1,1,1,1,1,1,1,1,1,1,1],
    [0,0,0,0,0,0,0,1,0,1,1,1,1,1,1,1],[0,0,0,0,0,0,0,0,0,0,0,1,0,1,1,1],
    [0,0,0,1,0,1,1,1,1,1,1,1,1,1,1,1],[0,0,0,0,0,0,0,0,1,1,1,1,1,1,1,1],
    [0,0,0,0,1,1,1,1,1,1,1,1,1,1,1,1],[0,0,0,0,0,0,0,0,0,0,0,0,1,1,1,1],
    [0,0,0,0,1,0,0,0,1,1,1,0,1,1,1,1],[0,1,1,1,0,0,0,1,0,0,0,0,0,0,0,0],
    [0,0,0,0,0,0,0,0,1,0,0,0,1,1,1,0],[0,1,1,1,0,0,1,1,0,0,0,1,0,0,0,0],
    [0,0,1,1,0,0,0,1,0,0,0,0,0,0,0,0],[0,0,0,0,1,0,0,0,1,1,0,0,1,1,1,0],
    [0,0,0,0,0,0,0,0,1,0,0,0,1,1,0,0],[0,1,1,1,0,0,1,1,0,0,1,1,0,0,0,1],
    [0,0,1,1,0,0,0,1,0,0,0,1,0,0,0,0],[0,0,0,0,1,0,0,0,1,0,0,0,1,1,0,0],
    [0,1,1,0,0,1,1,0,0,1,1,0,0,1,1,0],[0,0,1,1,0,1,1,0,0,1,1,0,1,1,0,0],
    [0,0,0,1,0,1,1,1,1,1,1,0,1,0,0,0],[0,0,0,0,1,1,1,1,1,1,1,1,0,0,0,0],
    [0,1,1,1,0,0,0,1,1,0,0,0,1,1,1,0],[0,0,1,1,1,0,0,1,1,0,0,1,1,1,0,0],
    [0,1,0,1,0,1,0,1,0,1,0,1,0,1,0,1],[0,0,0,0,1,1,1,1,0,0,0,0,1,1,1,1],
    [0,1,0,1,1,0,1,0,0,1,0,1,1,0,1,0],[0,0,1,1,0,0,1,1,1,1,0,0,1,1,0,0],
    [0,0,1,1,1,1,0,0,0,0,1,1,1,1,0,0],[0,1,0,1,0,1,0,1,1,0,1,0,1,0,1,0],
    [0,1,1,0,1,0,0,1,0,1,1,0,1,0,0,1],[0,1,0,1,1,0,1,0,1,0,1,0,0,1,0,1],
    [0,1,1,1,0,0,1,1,1,1,0,0,1,1,1,0],[0,0,0,1,0,0,1,1,1,1,0,0,1,0,0,0],
    [0,0,1,1,0,0,1,0,0,1,0,0,1,1,0,0],[0,0,1,1,1,0,1,1,1,1,0,1,1,1,0,0],
    [0,1,1,0,1,0,0,1,1,0,0,1,0,1,1,0],[0,0,1,1,1,1,0,0,1,1,0,0,0,0,1,1],
    [0,1,1,0,0,1,1,0,1,0,0,1,1,0,0,1],[0,0,0,0,0,1,1,0,0,1,1,0,0,0,0,0],
    [0,1,0,0,1,1,1,0,0,1,0,0,0,0,0,0],[0,0,1,0,0,1,1,1,0,0,1,0,0,0,0,0],
    [0,0,0,0,0,0,1,0,0,1,1,1,0,0,1,0],[0,0,0,0,0,1,0,0,1,1,1,0,0,1,0,0],
    [0,1,1,0,1,1,0,0,1,0,0,1,0,0,1,1],[0,0,1,1,0,1,1,0,1,1,0,0,1,0,0,1],
    [0,1,1,0,0,0,1,1,1,0,0,1,1,1,0,0],[0,0,1,1,1,0,0,1,1,1,0,0,0,1,1,0],
    [0,1,1,0,1,1,0,0,1,1,0,0,1,0,0,1],[0,1,1,0,0,0,1,1,0,0,1,1,1,0,0,1],
    [0,1,1,1,1,1,1,0,1,0,0,0,0,0,0,1],[0,0,0,1,1,0,0,0,1,1,1,0,0,1,1,1],
    [0,0,0,0,1,1,1,1,0,0,1,1,0,0,1,1],[0,0,1,1,0,0,1,1,1,1,1,1,0,0,0,0],
    [0,0,1,0,0,0,1,0,1,1,1,0,1,1,1,0],[0,1,0,0,0,1,0,0,1,1,1,0,1,1,1,0],
], dtype=np.uint8)

# Anchor pixel of the SECOND subset per 2-subset partition (first subset: 0).
_ANCHOR2 = np.array([
    15,15,15,15,15,15,15,15,15,15,15,15,15,15,15,15,
    15, 2, 8, 2, 2, 8, 8,15, 2, 8, 2, 2, 8, 8, 2, 2,
    15,15, 6, 8, 2, 8,15,15, 2, 8, 2, 2, 2,15,15, 6,
     6, 2, 6, 8,15,15, 2, 2,15,15,15,15,15, 2, 2,15], dtype=np.int64)

# Partitions the ENCODER may pick: the subset-1 anchor must lie in subset 1
# (true of the spec tables by construction; this guards any transcription slip
# in the constants above -- an inconsistent row could truncate a non-flippable
# anchor index). The decoder handles all 64 rows.
_ENCODABLE_P2 = np.array([_P2[pid][_ANCHOR2[pid]] == 1 and _P2[pid][0] == 0
                          for pid in range(64)])

_W2 = np.array([0, 21, 43, 64], np.int64)
_W3 = np.array([0, 9, 18, 27, 37, 46, 55, 64], np.int64)
_W4 = np.array([0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64],
               np.int64)
_WEIGHTS = {2: _W2, 3: _W3, 4: _W4}


# --- bit packing ----------------------------------------------------------------------

class _BitWriter:
    """Vectorized LSB-first bit packer into (N, 16) uint8 blocks."""

    def __init__(self, n: int):
        self.out = np.zeros((n, 16), np.uint8)
        self.pos = 0

    def put(self, vals, width: int):
        vals = np.asarray(vals, np.int64)
        for b in range(width):
            bit = (vals >> b) & 1
            byte, off = divmod(self.pos, 8)
            self.out[:, byte] |= (bit << off).astype(np.uint8)
            self.pos += 1


class _BitReader:
    """Vectorized LSB-first bit reader over (N, 16) uint8 blocks."""

    def __init__(self, blocks: np.ndarray):
        self.blocks = blocks
        self.pos = 0

    def get(self, width: int) -> np.ndarray:
        out = np.zeros(len(self.blocks), np.int64)
        for b in range(width):
            byte, off = divmod(self.pos, 8)
            out |= ((self.blocks[:, byte].astype(np.int64) >> off) & 1) << b
            self.pos += 1
        return out


# --- endpoint quantization ------------------------------------------------------------

def _dequant(e, bits: int, p=None):
    """Endpoint -> 8-bit value per spec: append P-bit, left-align, replicate."""
    e = np.asarray(e, np.int64)
    if p is not None:
        e = (e << 1) | np.asarray(p, np.int64)
        bits = bits + 1
    v = e << (8 - bits)
    return v | (v >> bits)


def _quant(v, bits: int):
    """8-bit -> best `bits`-bit endpoint (round through the dequant rule)."""
    v = np.asarray(v, np.int64)
    q = (v * ((1 << bits) - 1) + 127) // 255
    return np.clip(q, 0, (1 << bits) - 1)


def _interp(a, b, w):
    """BC7 interpolation: a, b (..., C); w (...,) 0..64 -> rounded lanes."""
    return (a * (64 - w[..., None]) + b * w[..., None] + 32) >> 6


# --- mode configs ---------------------------------------------------------------------
# fields: subsets, partition bits, color bits, alpha bits, p-bit mode
# ('per_endpoint' | 'shared' | None), index bits (color), alpha index bits
# (mode 5 only), rotation bits (mode 5 only)

_MODES = {
    1: dict(subsets=2, pb=6, cb=6, ab=0, p="shared", ib=3),
    3: dict(subsets=2, pb=6, cb=7, ab=0, p="per_endpoint", ib=2),
    4: dict(subsets=1, pb=0, cb=5, ab=6, p=None, ib=2, ib2=3, rot=2),
    5: dict(subsets=1, pb=0, cb=7, ab=8, p=None, ib=2, ib2=2, rot=2),
    6: dict(subsets=1, pb=0, cb=7, ab=7, p="per_endpoint", ib=4),
    7: dict(subsets=2, pb=6, cb=5, ab=5, p="per_endpoint", ib=2),
}


def _subset_masks(partition_ids, subsets: int):
    """(N,) partition ids -> (N, 16) subset index per pixel."""
    if subsets == 1:
        return np.zeros((len(partition_ids), 16), np.int64)
    return _P2[partition_ids].astype(np.int64)


def _anchor_index(partition_ids, subset: int):
    if subset == 0:
        return np.zeros(len(partition_ids), np.int64)
    return _ANCHOR2[partition_ids]


def _fit_endpoints(pixels, mask):
    """Range fit: per-channel min/max over the masked pixels.

    pixels (N, 16, C); mask (N, 16) bool -> (lo (N, C), hi (N, C))."""
    big, small = np.int64(255 << 8), np.int64(-1)
    px = pixels.astype(np.int64)
    lo = np.where(mask[..., None], px, big).min(axis=1)
    hi = np.where(mask[..., None], px, small).max(axis=1)
    return np.clip(lo, 0, None), np.clip(hi, 0, 255)


def _choose_partition(pixels, channels: int):
    """Best of the 64 two-subset partitions by summed per-subset spread."""
    px = pixels[..., :channels].astype(np.int64)
    best_err = None
    best_id = np.zeros(len(pixels), np.int64)
    for pid in range(64):
        if not _ENCODABLE_P2[pid]:
            continue
        mask1 = _P2[pid].astype(bool)
        err = np.zeros(len(pixels), np.int64)
        for mask in (~mask1, mask1):
            sub = px[:, mask, :]
            spread = sub.max(axis=1) - sub.min(axis=1)
            err += (spread * spread).sum(axis=1)
        if best_err is None:
            best_err, best_id = err, np.full(len(pixels), pid, np.int64)
        else:
            take = err < best_err
            best_err = np.where(take, err, best_err)
            best_id = np.where(take, pid, best_id)
    return best_id


def _encode_mode(pixels, mode: int, rot: int = 0, idxm: int = 0):
    """Encode every block with one mode (modes 4/5: one rotation; mode 4: one
    idxMode). pixels (N, 16, 4) uint8.

    ``rot`` r in 1..3 swaps channel r-1 with alpha before encoding (the spec's
    rotation field; squared error is channel-permutation-invariant, so ``err``
    stays valid in the original space). ``idxm=1`` (mode 4 only) drives color
    with the stored 3-bit index array and alpha with the 2-bit one; the arrays
    keep their stored widths (2 then 3 bits) either way.

    Returns (packed (N, 16) uint8, err (N,) int64 squared error)."""
    cfg = _MODES[mode]
    if rot and mode not in (4, 5):
        raise ValueError("rotation applies to modes 4/5 only")
    if idxm and mode != 4:
        raise ValueError("idxMode applies to mode 4 only")
    if rot:
        pixels = pixels.copy()
        pixels[..., [rot - 1, 3]] = pixels[..., [3, rot - 1]]
    n = len(pixels)
    subsets, cb, ab, ib = cfg["subsets"], cfg["cb"], cfg["ab"], cfg["ib"]
    ib_color = 3 if idxm else ib  # palette sizes under idxMode
    ib_alpha = (2 if idxm else cfg["ib2"]) if mode in (4, 5) else 0
    channels = 4 if (ab and mode not in (4, 5)) else 3
    weights = _WEIGHTS[ib_color]

    if subsets == 2:
        pids = _choose_partition(pixels, channels)
    else:
        pids = np.zeros(n, np.int64)
    subset_of = _subset_masks(pids, subsets)

    # per-subset endpoints, quantized (with p-bit from rounding), palettes
    quant_lo, quant_hi, p_lo, p_hi = [], [], [], []
    pal = np.zeros((n, subsets, 1 << ib_color, channels), np.int64)
    for s in range(subsets):
        mask = subset_of == s
        lo, hi = _fit_endpoints(pixels[..., :channels], mask)
        if cfg["p"] is not None:
            # p-bit search: try both; pick per endpoint (or shared) by
            # round-trip error of the endpoint colors themselves
            cand = []
            for p in (0, 1):
                ql, qh = _quant(lo, cb), _quant(hi, cb)
                dl = np.abs(_dequant(ql, cb, np.full(n, p)[:, None]) - lo).sum(axis=1)
                dh = np.abs(_dequant(qh, cb, np.full(n, p)[:, None]) - hi).sum(axis=1)
                cand.append((ql, qh, dl, dh))
            (ql0, qh0, dl0, dh0), (ql1, qh1, dl1, dh1) = cand
            if cfg["p"] == "shared":
                both0, both1 = dl0 + dh0, dl1 + dh1
                pl = ph = (both1 < both0).astype(np.int64)
            else:
                pl = (dl1 < dl0).astype(np.int64)
                ph = (dh1 < dh0).astype(np.int64)
            ql = np.where(pl[:, None] == 0, ql0, ql1)
            qh = np.where(ph[:, None] == 0, qh0, qh1)
            dq_lo = _dequant(ql, cb, pl[:, None])
            dq_hi = _dequant(qh, cb, ph[:, None])
        else:
            ql, qh = _quant(lo, cb), _quant(hi, cb)
            pl = ph = np.zeros(n, np.int64)
            dq_lo, dq_hi = _dequant(ql, cb), _dequant(qh, cb)
        quant_lo.append(ql)
        quant_hi.append(qh)
        p_lo.append(pl)
        p_hi.append(ph)
        pal[:, s] = _interp(dq_lo[:, None, :], dq_hi[:, None, :],
                            np.broadcast_to(weights, (n, 1 << ib_color)))

    # indices: nearest palette entry per pixel (within its subset's palette)
    px = pixels[..., :channels].astype(np.int64)
    pal_of_pixel = pal[np.arange(n)[:, None], subset_of]  # (N,16,2^ib,C)
    dist = ((px[:, :, None, :] - pal_of_pixel) ** 2).sum(-1)  # (N,16,2^ib)
    idx = dist.argmin(-1)  # (N,16)
    # reconstruction error with the PRE-flip palette/indices (flipping reverses
    # both, so the decoded pixels are identical; fix-up below is packing-only)
    recon = pal_of_pixel[np.arange(n)[:, None], np.arange(16)[None, :], idx]
    err = ((px - recon) ** 2).sum(axis=(1, 2))

    # anchor fix-up: anchor index MSB must be 0 -> swap endpoints + flip
    for s in range(subsets):
        anchor = _anchor_index(pids, s)
        a_idx = idx[np.arange(n), anchor]
        flip = ((a_idx >> (ib_color - 1)) & 1).astype(bool) & \
            (subset_of[np.arange(n), anchor] == s)
        if not flip.any():
            continue
        maxi = (1 << ib_color) - 1
        in_subset = subset_of == s
        idx = np.where(flip[:, None] & in_subset, maxi - idx, idx)
        for arrs in (quant_lo, quant_hi), (p_lo, p_hi):
            a, b = arrs[0][s], arrs[1][s]
            na = np.where(flip if a.ndim == 1 else flip[:, None], b, a)
            nb = np.where(flip if a.ndim == 1 else flip[:, None], a, b)
            arrs[0][s], arrs[1][s] = na, nb

    # modes 4/5: alpha channel encoded separately (mode 4: 6.6 quantized
    # endpoints + 3-bit indices; mode 5: 8-bit direct + 2-bit indices)
    if mode in (4, 5):
        al = pixels[..., 3].astype(np.int64)
        a_lo, a_hi = al.min(axis=1), al.max(axis=1)
        if mode == 4:
            qa_lo, qa_hi = _quant(a_lo, ab), _quant(a_hi, ab)
            da_lo, da_hi = _dequant(qa_lo, ab), _dequant(qa_hi, ab)
        else:
            qa_lo, qa_hi = a_lo, a_hi
            da_lo, da_hi = a_lo, a_hi
        w2 = _WEIGHTS[ib_alpha]
        a_pal = (da_lo[:, None] * (64 - w2) + da_hi[:, None] * w2 + 32) >> 6
        a_idx = np.abs(al[:, :, None] - a_pal[:, None, :]).argmin(-1)
        a_recon = a_pal[np.arange(n)[:, None], a_idx]  # pre-flip reconstruction
        flip = ((a_idx[:, 0] >> (ib_alpha - 1)) & 1).astype(bool)
        a_idx = np.where(flip[:, None], (1 << ib_alpha) - 1 - a_idx, a_idx)
        a_lo = np.where(flip, qa_hi, qa_lo)  # pack the (quantized) endpoints
        a_hi = np.where(flip, qa_lo, qa_hi)
    if mode in (4, 5):
        err = err + ((al - a_recon) ** 2).sum(axis=1)
    elif channels == 3 and ab == 0:
        # opaque modes pay for any non-255 alpha they cannot represent
        err = err + ((pixels[..., 3].astype(np.int64) - 255) ** 2).sum(axis=1)

    # ---- pack ----
    w = _BitWriter(n)
    w.put(np.full(n, 1 << mode), mode + 1)
    if cfg["pb"]:
        w.put(pids, cfg["pb"])
    if mode in (4, 5):
        w.put(np.full(n, rot), 2)  # rotation: channel rot-1 <-> alpha
    if mode == 4:
        w.put(np.full(n, idxm), 1)  # idxMode: which array drives color
    # endpoint channel fields: R all endpoints, G, B, (A)
    for ch in range(3):
        for s in range(subsets):
            w.put(quant_lo[s][:, ch], cb)
            w.put(quant_hi[s][:, ch], cb)
    if mode in (4, 5):
        w.put(a_lo, 8 if mode == 5 else ab)
        w.put(a_hi, 8 if mode == 5 else ab)
    elif ab:
        for s in range(subsets):
            w.put(quant_lo[s][:, 3], ab)
            w.put(quant_hi[s][:, 3], ab)
    if cfg["p"] == "shared":
        for s in range(subsets):
            w.put(p_lo[s], 1)
    elif cfg["p"] == "per_endpoint":
        for s in range(subsets):
            w.put(p_lo[s], 1)
            w.put(p_hi[s], 1)
    # index bits, anchors compressed by one bit. Arrays are stored at their
    # fixed widths (first: ib, second: ib2); under mode 4's idxMode=1 the
    # FIRST (2-bit) array holds the alpha indices and the SECOND (3-bit) the
    # color indices.
    first_vals = a_idx if idxm else idx
    second_vals = (idx if idxm else a_idx) if mode in (4, 5) else None
    anchors = [_anchor_index(pids, s) for s in range(subsets)]
    for pix in range(16):
        is_anchor = np.zeros(n, bool)
        for a in anchors:
            is_anchor |= a == pix
        width_full = np.where(is_anchor, ib - 1, ib)
        # vectorized variable-width: write ib-1 bits always, then the MSB only
        # for non-anchors -- but bit positions differ per block, so fall back
        # to per-width masking: write bit-by-bit with per-block positions.
        vals = first_vals[:, pix]
        for b in range(ib):
            sel = b < width_full
            byte_pos = w.pos_arr if hasattr(w, "pos_arr") else None
            # maintain per-block positions
            if byte_pos is None:
                w.pos_arr = np.full(n, w.pos, np.int64)
                byte_pos = w.pos_arr
            bit = ((vals >> b) & 1) & sel
            byte, off = np.divmod(byte_pos, 8)
            byte = np.where(sel, byte, 0)  # exhausted blocks: write 0 to byte 0
            np.bitwise_or.at(w.out, (np.arange(n), byte),
                             (bit << off).astype(np.uint8))
            byte_pos += sel.astype(np.int64)
        w.pos_arr = byte_pos
    if mode in (4, 5):
        for pix in range(16):
            width_full = np.where(pix == 0, cfg["ib2"] - 1, cfg["ib2"])
            vals = second_vals[:, pix]
            byte_pos = w.pos_arr
            for b in range(cfg["ib2"]):
                sel = b < width_full
                bit = ((vals >> b) & 1) & sel
                byte, off = np.divmod(byte_pos, 8)
                byte = np.where(sel, byte, 0)
                np.bitwise_or.at(w.out, (np.arange(n), byte),
                                 (bit << off).astype(np.uint8))
                byte_pos += np.asarray(sel, np.int64)
            w.pos_arr = byte_pos
    return w.out, err


def encode_bc7(rgba: np.ndarray, modes=None) -> bytes:
    """Encode an (H, W, 4) uint8 image to BC7; per block the least-error
    variant of the enabled mode set wins (opaque default: 1/3/6; with alpha:
    4/5/6/7). Modes 4/5 search all four rotations and mode 4 both idxModes,
    like production encoders, so those header fields occur in the output."""
    from .encode import _blockify

    pixels = _blockify(np.ascontiguousarray(rgba))
    if modes is None:
        modes = (1, 3, 6) if (pixels[..., 3] == 255).all() else (4, 5, 6, 7)
    variants = []
    for m in modes:
        if m == 4:
            variants += [(4, r, i) for r in range(4) for i in (0, 1)]
        elif m == 5:
            variants += [(5, r, 0) for r in range(4)]
        else:
            variants.append((m, 0, 0))
    packed, errs = [], []
    for m, r, i in variants:
        p, e = _encode_mode(pixels, m, r, i)
        packed.append(p)
        errs.append(e)
    errs = np.stack(errs)          # (M, N)
    best = errs.argmin(axis=0)     # (N,)
    out = np.stack(packed)[best, np.arange(len(pixels))]
    return out.tobytes()


def block_mode_histogram(data: bytes) -> dict:
    """Mode id -> count over a BC7 payload (ctz of the first byte; 8 = the
    invalid all-zero mode byte)."""
    b0 = np.frombuffer(data, np.uint8)[::16]
    ctz = np.argmax((b0[:, None] >> np.arange(8)) & 1, axis=1)  # 0 for b0==0
    modes = np.where(b0 == 0, 8, ctz)
    vals, counts = np.unique(modes, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, counts)}


# --- decoder (validation oracle for the encoder) --------------------------------------

def decode_bc7(data: bytes) -> np.ndarray:
    """Decode BC7 blocks of the implemented modes -> (N, 16, 4) uint8.

    Blocks are grouped by mode and decoded vectorized per group. All mode 4/5
    header fields are honored per block: rotation (1..3 swaps the decoded
    alpha with channel R/G/B) and mode 4's idxMode (selects which stored
    index array drives color vs alpha)."""
    blocks = np.frombuffer(data, np.uint8).reshape(-1, 16)
    out = np.zeros((len(blocks), 16, 4), np.uint8)
    out[..., 3] = 255
    b0 = blocks[:, 0]
    for mode in _MODES:
        rows = np.nonzero((b0 & ((1 << (mode + 1)) - 1)) == (1 << mode))[0]
        if len(rows):
            out[rows] = _decode_mode(blocks[rows], mode)
    return out


def _read_indices(r: _BitReader, n, ib, anchors):
    idx = np.zeros((n, 16), np.int64)
    pos = np.full(n, r.pos, np.int64)
    blocks = r.blocks
    for pix in range(16):
        is_anchor = np.zeros(n, bool)
        for a in anchors:
            is_anchor |= a == pix
        width_full = np.where(is_anchor, ib - 1, ib)
        vals = np.zeros(n, np.int64)
        for b in range(ib):
            sel = b < width_full
            byte, off = np.divmod(pos, 8)
            byte = np.where(sel, byte, 0)
            bit = (blocks[np.arange(n), byte].astype(np.int64) >> off) & 1
            vals |= (bit & sel) << b
            pos += sel.astype(np.int64)
        idx[:, pix] = vals
    r.pos = None  # consumed variably; no further fixed-width reads allowed
    return idx, pos


def _decode_mode(blocks: np.ndarray, mode: int) -> np.ndarray:
    cfg = _MODES[mode]
    n = len(blocks)
    subsets, cb, ab, ib = cfg["subsets"], cfg["cb"], cfg["ab"], cfg["ib"]
    r = _BitReader(blocks)
    r.get(mode + 1)
    pids = r.get(cfg["pb"]) if cfg["pb"] else np.zeros(n, np.int64)
    rot = r.get(2) if mode in (4, 5) else None
    idxm = r.get(1) if mode == 4 else None
    ep = np.zeros((n, subsets, 2, 4), np.int64)
    for ch in range(3):
        for s in range(subsets):
            ep[:, s, 0, ch] = r.get(cb)
            ep[:, s, 1, ch] = r.get(cb)
    if mode == 5:
        a_lo, a_hi = r.get(8), r.get(8)
    elif mode == 4:
        a_lo = _dequant(r.get(ab), ab)
        a_hi = _dequant(r.get(ab), ab)
    elif ab:
        for s in range(subsets):
            ep[:, s, 0, 3] = r.get(ab)
            ep[:, s, 1, 3] = r.get(ab)
    p = np.zeros((n, subsets, 2), np.int64)
    if cfg["p"] == "shared":
        for s in range(subsets):
            p[:, s, 0] = p[:, s, 1] = r.get(1)
    elif cfg["p"] == "per_endpoint":
        for s in range(subsets):
            p[:, s, 0] = r.get(1)
            p[:, s, 1] = r.get(1)
    channels = 4 if (ab and mode not in (4, 5)) else 3
    dq = np.zeros((n, subsets, 2, channels), np.int64)
    for s in range(subsets):
        for e in range(2):
            if cfg["p"] is None:
                dq[:, s, e] = _dequant(ep[:, s, e, :channels], cb)
            else:
                dq[:, s, e] = _dequant(ep[:, s, e, :channels], cb,
                                       p[:, s, e, None])
    anchors = [_anchor_index(pids, s) for s in range(subsets)]
    idx, pos = _read_indices(r, n, ib, anchors)
    subset_of = _subset_masks(pids, subsets)
    if mode in (4, 5):
        # second stored index array (always present: mode 4 = 3-bit,
        # mode 5 = 2-bit), anchored at pixel 0 like the first
        ib2 = cfg["ib2"]
        idx2 = np.zeros((n, 16), np.int64)
        for pix in range(16):
            width_full = np.where(pix == 0, ib2 - 1, ib2)
            vals = np.zeros(n, np.int64)
            for b in range(ib2):
                sel = b < width_full
                byte, off = np.divmod(pos, 8)
                byte = np.where(sel, byte, 0)
                bit = (blocks[np.arange(n), byte].astype(np.int64) >> off) & 1
                vals |= (bit & sel) << b
                pos += np.asarray(sel, np.int64)
            idx2[:, pix] = vals
        # mode 4 idxMode=1: the 3-bit array drives COLOR, the 2-bit ALPHA
        swap = (idxm == 1)[:, None] if mode == 4 else np.zeros((n, 1), bool)
        w = np.where(swap, _WEIGHTS[ib2][idx2], _WEIGHTS[ib][idx])
        w_alpha = np.where(swap, _WEIGHTS[ib][idx], _WEIGHTS[ib2][idx2])
    else:
        w = _WEIGHTS[ib][idx]  # (N,16)
    lo = dq[np.arange(n)[:, None], subset_of, 0]
    hi = dq[np.arange(n)[:, None], subset_of, 1]
    px = _interp(lo, hi, w)
    out = np.zeros((n, 16, 4), np.uint8)
    out[..., :channels] = px
    if channels == 3:
        out[..., 3] = 255
    if mode in (4, 5):
        out[..., 3] = ((a_lo[:, None] * (64 - w_alpha)
                        + a_hi[:, None] * w_alpha + 32) >> 6).astype(np.uint8)
        # rotation: swap the decoded alpha back into channel rot-1
        for rv, ch in ((1, 0), (2, 1), (3, 2)):
            sel = np.nonzero(rot == rv)[0]
            if len(sel):
                tmp = out[sel, :, ch].copy()
                out[sel, :, ch] = out[sel, :, 3]
                out[sel, :, 3] = tmp
    return out


# --- BC6H (one-region modes 11-14, unsigned) ------------------------------------------
# Header value (5 LSBs of byte 0) -> (endpoint base bits, signed delta bits or
# None). Modes 12-14 delta-compress the second endpoint against the first --
# the spec's one-region family (11: 10.10, 12: 11.9, 13: 12.8, 14: 16.4).
# Per-block least-error selection over the family gives real first-byte mode
# statistics (flat blocks land in 14, smooth in 12/13, wide-range in 11).
# Simplification vs the full spec (documented; the decoder below is the
# oracle): base/delta fields are stored contiguously LSB-first without the
# spec's per-bit reversal quirks, and endpoints dequantize by left-shift.

_BC6H_MODES = {3: (10, None), 7: (11, 9), 11: (12, 8), 15: (16, 4)}


def _bc6h_pack_indices(w, idx):
    """16 x 4-bit indices, anchor pixel 0 compressed to 3 bits (63 bits)."""
    n = len(idx)
    pos = np.full(n, w.pos, np.int64)
    for pix in range(16):
        width = 3 if pix == 0 else 4
        vals = idx[:, pix]
        for b in range(4):
            sel = b < np.full(n, width)
            bit = ((vals >> b) & 1) & sel
            byte, off = np.divmod(pos, 8)
            byte = np.where(sel, byte, 0)
            np.bitwise_or.at(w.out, (np.arange(n), byte),
                             (bit << off).astype(np.uint8))
            pos += np.asarray(sel, np.int64)


def _encode_bc6h_mode(pixels, hv: int):
    """Encode every block with one one-region mode; returns (packed, err)."""
    bw, dw = _BC6H_MODES[hv]
    s = 16 - bw
    n = len(pixels)
    lo, hi = pixels.min(axis=1), pixels.max(axis=1)
    qlo, qhi = lo >> s, hi >> s
    if dw is not None:
        # symmetric clamp so the delta fits in EITHER orientation after the
        # anchor flip (sacrifices the extra negative two's-complement value)
        dmax = (1 << (dw - 1)) - 1
        qhi = qlo + np.minimum(qhi - qlo, dmax)
    dlo, dhi = qlo << s, qhi << s
    pal = _interp(dlo[:, None, :], dhi[:, None, :],
                  np.broadcast_to(_W4, (n, 16)))  # (N,16pal,3)
    dist = ((pixels[:, :, None, :] - pal[:, None, :, :]) ** 2).sum(-1)
    idx = dist.argmin(-1)
    recon = pal[np.arange(n)[:, None], idx]
    err = ((pixels - recon) ** 2).sum(axis=(1, 2))
    flip = ((idx[:, 0] >> 3) & 1).astype(bool)  # anchor MSB must be 0
    idx = np.where(flip[:, None], 15 - idx, idx)
    base = np.where(flip[:, None], qhi, qlo)
    other = np.where(flip[:, None], qlo, qhi)
    w = _BitWriter(n)
    w.put(np.full(n, hv), 5)
    for ch in range(3):
        w.put(base[:, ch], bw)
    if dw is None:
        for ch in range(3):
            w.put(other[:, ch], bw)
    else:
        delta = (other - base) & ((1 << dw) - 1)  # two's complement, fits
        for ch in range(3):
            w.put(delta[:, ch], dw)
    _bc6h_pack_indices(w, idx)
    return w.out, err


def encode_bc6h(rgb16: np.ndarray, modes=None) -> bytes:
    """Encode an (H, W, 3) float16 (non-negative) image to BC6H blocks.

    Half-float bit patterns of non-negative values are monotone integers, so
    range fit + nearest-palette runs directly on the raw u16 lanes quantized to
    each mode's endpoint precision (the standard fast-encoder shortcut). Per
    block the least-error mode of the one-region family (11-14) wins, so mode
    statistics emerge from content like production HDR encoders."""
    from .encode import _blockify

    raw = np.ascontiguousarray(rgb16).view(np.uint16)
    pixels = _blockify(raw.reshape(rgb16.shape)).astype(np.int64)  # (N,16,3)
    # tightest-delta-first: argmin keeps the FIRST minimum, so ties (e.g. flat
    # blocks, exactly representable everywhere) land in the highest-precision
    # mode, the way production encoders iterate
    hvs = tuple(modes) if modes is not None else (15, 11, 7, 3)
    packed, errs = [], []
    for hv in hvs:
        p, e = _encode_bc6h_mode(pixels, hv)
        packed.append(p)
        errs.append(e)
    best = np.stack(errs).argmin(axis=0)
    return np.stack(packed)[best, np.arange(len(pixels))].tobytes()


def decode_bc6h(data: bytes) -> np.ndarray:
    """Decode one-region BC6H blocks (modes 11-14) -> (N, 16, 3) uint16
    half-float bit lanes. Blocks are grouped by mode and decoded vectorized."""
    blocks = np.frombuffer(data, np.uint8).reshape(-1, 16)
    n_all = len(blocks)
    header_all = blocks[:, 0] & 0x1F
    known = np.isin(header_all, list(_BC6H_MODES))
    if not known.all():
        bad = sorted(set(header_all[~known].tolist()))
        raise ValueError(f"decode_bc6h handles one-region modes 11-14 only "
                         f"(header values {sorted(_BC6H_MODES)}); got {bad}")
    out = np.zeros((n_all, 16, 3), np.uint16)
    for hv, (bw, dw) in _BC6H_MODES.items():
        rows = np.nonzero(header_all == hv)[0]
        if not len(rows):
            continue
        grp = blocks[rows]
        n = len(grp)
        s = 16 - bw
        r = _BitReader(grp)
        r.get(5)
        base = np.stack([r.get(bw) for _ in range(3)], axis=1)
        if dw is None:
            other = np.stack([r.get(bw) for _ in range(3)], axis=1)
        else:
            raw_d = np.stack([r.get(dw) for _ in range(3)], axis=1)
            sign = 1 << (dw - 1)
            delta = (raw_d ^ sign) - sign  # sign-extend two's complement
            other = (base + delta) & ((1 << bw) - 1)
        lo, hi = base << s, other << s
        pos = np.full(n, r.pos, np.int64)
        idx = np.zeros((n, 16), np.int64)
        for pix in range(16):
            width = 3 if pix == 0 else 4
            vals = np.zeros(n, np.int64)
            for b in range(4):
                sel = b < np.full(n, width)
                byte, off = np.divmod(pos, 8)
                byte = np.where(sel, byte, 0)
                bit = (grp[np.arange(n), byte].astype(np.int64) >> off) & 1
                vals |= (bit & sel) << b
                pos += np.asarray(sel, np.int64)
            idx[:, pix] = vals
        w = _W4[idx]
        out[rows] = _interp(lo[:, None, :], hi[:, None, :], w).astype(np.uint16)
    return out
