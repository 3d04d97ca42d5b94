// dlt_native: host-side native runtime for dxt-lossless-transform-tpu.
//
// Role: the C-ABI runtime the reference exposes from its Rust crates
// (c_api modules of bc1/bc2, dltbc1core_* exports) rebuilt as a portable C++
// library. It provides:
//   - scalar/auto-vectorized BC1/BC2/BC3 stream transforms (bit-identical to the
//     numpy oracle and the TPU kernels) -- the host fast path for payloads too
//     small to be worth device dispatch, and a C API for non-Python consumers;
//   - magicless zstd size estimation/compression (reference: dxt-lossless-
//     transform-zstd/src/lib.rs:53-199);
//   - the sampled-offset LZ-coverage estimator (numpy/JAX twin in estimate/ltu.py);
//   - a pthread batch driver for corpus-scale estimation.
//
// Build: make -C . (produces libdlt_native.so). Loaded via ctypes from
// runtime/__init__.py; everything degrades gracefully if the .so is missing.

#include <algorithm>
#include <new>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#define ZSTD_STATIC_LINKING_ONLY  // magicless-format enums are in the experimental API
#include <zstd.h>

// ---------------------------------------------------------------- YCoCg-R -----------
// Lifting scheme on 5-bit fields; bit layouts per variant match
// common/src/color_565/decorrelate.rs (var1 :101-127, var2 :187-214, var3 :274-300).

template <int V>
static inline uint16_t ycocg_decorrelate_t(uint16_t c) {
    if (V == 0) return c;
    int r = (c >> 11) & 0x1F, g = (c >> 6) & 0x1F, gl = (c >> 5) & 1, b = c & 0x1F;
    int co = (r - b) & 0x1F;
    int t = (b + (co >> 1)) & 0x1F;
    int cg = (g - t) & 0x1F;
    int y = (t + (cg >> 1)) & 0x1F;
    if (V == 1) return (uint16_t)((y << 11) | (co << 6) | (gl << 5) | cg);
    if (V == 2) return (uint16_t)((gl << 15) | (y << 10) | (co << 5) | cg);
    return (uint16_t)((y << 11) | (co << 6) | (cg << 1) | gl);
}

template <int V>
static inline uint16_t ycocg_recorrelate_t(uint16_t c) {
    if (V == 0) return c;
    int y, co, cg, gl;
    if (V == 1) {
        y = (c >> 11) & 0x1F; co = (c >> 6) & 0x1F; gl = (c >> 5) & 1; cg = c & 0x1F;
    } else if (V == 2) {
        gl = (c >> 15) & 1; y = (c >> 10) & 0x1F; co = (c >> 5) & 0x1F; cg = c & 0x1F;
    } else {
        y = (c >> 11) & 0x1F; co = (c >> 6) & 0x1F; cg = (c >> 1) & 0x1F; gl = c & 1;
    }
    int t = (y - (cg >> 1)) & 0x1F;
    int g = (cg + t) & 0x1F;
    int b = (t - (co >> 1)) & 0x1F;
    int r = (b + co) & 0x1F;
    return (uint16_t)((r << 11) | (g << 6) | (gl << 5) | b);
}

static inline uint16_t ycocg_decorrelate(uint16_t c, int variant) {
    switch (variant) {
        case 1: return ycocg_decorrelate_t<1>(c);
        case 2: return ycocg_decorrelate_t<2>(c);
        case 3: return ycocg_decorrelate_t<3>(c);
        default: return c;
    }
}

static inline uint16_t ycocg_recorrelate(uint16_t c, int variant) {
    switch (variant) {
        case 1: return ycocg_recorrelate_t<1>(c);
        case 2: return ycocg_recorrelate_t<2>(c);
        case 3: return ycocg_recorrelate_t<3>(c);
        default: return c;
    }
}

extern "C" void dlt_ycocg_decorrelate(const uint16_t* in, uint16_t* out, size_t n, int variant) {
    for (size_t i = 0; i < n; i++) out[i] = ycocg_decorrelate(in[i], variant);
}

extern "C" void dlt_ycocg_recorrelate(const uint16_t* in, uint16_t* out, size_t n, int variant) {
    for (size_t i = 0; i < n; i++) out[i] = ycocg_recorrelate(in[i], variant);
}

static inline uint16_t load16(const uint8_t* p) {
    uint16_t v; std::memcpy(&v, p, 2); return v;
}
static inline uint32_t load32(const uint8_t* p) {
    uint32_t v; std::memcpy(&v, p, 4); return v;
}
static inline void store16(uint8_t* p, uint16_t v) { std::memcpy(p, &v, 2); }
static inline void store32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }

// ------------------------------------------------------------------ BC1 -------------
// Layouts: bc1/src/transform/transform_with_settings.rs:41-59.

// SWAR YCoCg: process BOTH u16 halves of a packed c0|c1<<16 word at once, with
// guard bits stopping borrow/carry propagation across the 16-bit field boundary.
// Pure u32 elementwise math -> the compiler auto-vectorizes the stream loops.

template <int V>
static inline uint32_t ycocg_decorrelate_pair(uint32_t p) {
    if (V == 0) return p;
    uint32_t r = (p >> 11) & 0x001F001F;
    uint32_t g = (p >> 6) & 0x001F001F;
    uint32_t gl = (p >> 5) & 0x00010001;
    uint32_t b = p & 0x001F001F;
    uint32_t co = ((r | 0x00200020) - b) & 0x001F001F;
    uint32_t t = (b + ((co >> 1) & 0x000F000F)) & 0x001F001F;
    uint32_t cg = ((g | 0x00200020) - t) & 0x001F001F;
    uint32_t y = (t + ((cg >> 1) & 0x000F000F)) & 0x001F001F;
    if (V == 1) return (y << 11) | (co << 6) | (gl << 5) | cg;
    if (V == 2) return (gl << 15) | (y << 10) | (co << 5) | cg;
    return (y << 11) | (co << 6) | (cg << 1) | gl;
}

template <int V>
static inline uint32_t ycocg_recorrelate_pair(uint32_t p) {
    if (V == 0) return p;
    uint32_t y, co, cg, gl;
    if (V == 1) {
        y = (p >> 11) & 0x001F001F; co = (p >> 6) & 0x001F001F;
        gl = (p >> 5) & 0x00010001; cg = p & 0x001F001F;
    } else if (V == 2) {
        gl = (p >> 15) & 0x00010001; y = (p >> 10) & 0x001F001F;
        co = (p >> 5) & 0x001F001F; cg = p & 0x001F001F;
    } else {
        y = (p >> 11) & 0x001F001F; co = (p >> 6) & 0x001F001F;
        cg = (p >> 1) & 0x001F001F; gl = p & 0x00010001;
    }
    uint32_t t = ((y | 0x00200020) - ((cg >> 1) & 0x000F000F)) & 0x001F001F;
    uint32_t g = (cg + t) & 0x001F001F;
    uint32_t b = ((t | 0x00200020) - ((co >> 1) & 0x000F000F)) & 0x001F001F;
    uint32_t r = (b + co) & 0x001F001F;
    return (r << 11) | (g << 6) | (gl << 5) | b;
}

template <int V, bool SPLIT>
static void bc1_transform_impl(const uint8_t* in, uint8_t* out, size_t n) {
    // All wide accesses go through memcpy-based load32/store32: the c1 stream
    // starts at byte offset 2n, which is only 2-aligned when n is odd.
    uint8_t* c0s = out;
    uint8_t* c1s = out + 2 * n;
    uint8_t* idxs = out + 4 * n;
    size_t i = 0;
    if (SPLIT) {
        for (; i + 1 < n; i += 2) {  // two blocks -> one u32 store per stream
            uint32_t p0 = ycocg_decorrelate_pair<V>(load32(in + 8 * i));
            uint32_t p1 = ycocg_decorrelate_pair<V>(load32(in + 8 * i + 8));
            store32(c0s + 2 * i, (p0 & 0xFFFF) | (p1 << 16));
            store32(c1s + 2 * i, (p0 >> 16) | (p1 & 0xFFFF0000u));
            store32(idxs + 4 * i, load32(in + 8 * i + 4));
            store32(idxs + 4 * i + 4, load32(in + 8 * i + 12));
        }
        for (; i < n; i++) {  // odd tail block: 16-bit stores
            uint32_t p = ycocg_decorrelate_pair<V>(load32(in + 8 * i));
            store16(c0s + 2 * i, (uint16_t)p);
            store16(c1s + 2 * i, (uint16_t)(p >> 16));
            store32(idxs + 4 * i, load32(in + 8 * i + 4));
        }
    } else {
        for (; i < n; i++) {
            store32(out + 4 * i, ycocg_decorrelate_pair<V>(load32(in + 8 * i)));
            store32(idxs + 4 * i, load32(in + 8 * i + 4));
        }
    }
}

template <int V, bool SPLIT>
static void bc1_untransform_impl(const uint8_t* in, uint8_t* out, size_t n) {
    const uint8_t* c0s = in;
    const uint8_t* c1s = in + 2 * n;
    const uint8_t* idxs = in + 4 * n;
    size_t i = 0;
    if (SPLIT) {
        for (; i + 1 < n; i += 2) {
            uint32_t a = load32(c0s + 2 * i), b = load32(c1s + 2 * i);
            store32(out + 8 * i,
                    ycocg_recorrelate_pair<V>((a & 0xFFFF) | (b << 16)));
            store32(out + 8 * i + 8,
                    ycocg_recorrelate_pair<V>((a >> 16) | (b & 0xFFFF0000u)));
            store32(out + 8 * i + 4, load32(idxs + 4 * i));
            store32(out + 8 * i + 12, load32(idxs + 4 * i + 4));
        }
        for (; i < n; i++) {
            uint32_t p = (uint32_t)load16(c0s + 2 * i)
                       | ((uint32_t)load16(c1s + 2 * i) << 16);
            store32(out + 8 * i, ycocg_recorrelate_pair<V>(p));
            store32(out + 8 * i + 4, load32(idxs + 4 * i));
        }
    } else {
        for (; i < n; i++) {
            store32(out + 8 * i, ycocg_recorrelate_pair<V>(load32(in + 4 * i)));
            store32(out + 8 * i + 4, load32(idxs + 4 * i));
        }
    }
}

// Dispatch (variant, split) to a fully specialized, auto-vectorizable loop --
// the C++ analog of the reference's per-ISA kernel families.
#define DLT_BC1_DISPATCH(fn)                                                   \
    do {                                                                       \
        if (len % 8) return -1;                                                \
        size_t n = len / 8;                                                    \
        switch (variant * 2 + (split ? 1 : 0)) {                               \
            case 0: fn<0, false>(in, out, n); break;                           \
            case 1: fn<0, true>(in, out, n); break;                            \
            case 2: fn<1, false>(in, out, n); break;                           \
            case 3: fn<1, true>(in, out, n); break;                            \
            case 4: fn<2, false>(in, out, n); break;                           \
            case 5: fn<2, true>(in, out, n); break;                            \
            case 6: fn<3, false>(in, out, n); break;                           \
            case 7: fn<3, true>(in, out, n); break;                            \
            default: return -1;                                                \
        }                                                                      \
        return 0;                                                              \
    } while (0)

extern "C" int dlt_bc1_transform(const uint8_t* in, uint8_t* out, size_t len,
                      int variant, int split) {
    DLT_BC1_DISPATCH(bc1_transform_impl);
}

extern "C" int dlt_bc1_untransform(const uint8_t* in, uint8_t* out, size_t len,
                        int variant, int split) {
    DLT_BC1_DISPATCH(bc1_untransform_impl);
}

// ------------------------------------------------------------------ BC2 -------------
// Layouts: bc2/src/transform/transform_with_settings.rs:30-75.

extern "C" int dlt_bc2_transform(const uint8_t* in, uint8_t* out, size_t len,
                      int variant, int split) {
    if (len % 16) return -1;
    size_t n = len / 16;
    for (size_t i = 0; i < n; i++) {
        std::memcpy(out + 8 * i, in + 16 * i, 8);  // alpha stream
        uint16_t c0 = ycocg_decorrelate(load16(in + 16 * i + 8), variant);
        uint16_t c1 = ycocg_decorrelate(load16(in + 16 * i + 10), variant);
        if (split) {
            store16(out + 8 * n + 2 * i, c0);
            store16(out + 10 * n + 2 * i, c1);
        } else {
            store16(out + 8 * n + 4 * i, c0);
            store16(out + 8 * n + 4 * i + 2, c1);
        }
        store32(out + 12 * n + 4 * i, load32(in + 16 * i + 12));
    }
    return 0;
}

extern "C" int dlt_bc2_untransform(const uint8_t* in, uint8_t* out, size_t len,
                        int variant, int split) {
    if (len % 16) return -1;
    size_t n = len / 16;
    for (size_t i = 0; i < n; i++) {
        std::memcpy(out + 16 * i, in + 8 * i, 8);
        uint16_t c0 = split ? load16(in + 8 * n + 2 * i) : load16(in + 8 * n + 4 * i);
        uint16_t c1 = split ? load16(in + 10 * n + 2 * i) : load16(in + 8 * n + 4 * i + 2);
        store16(out + 16 * i + 8, ycocg_recorrelate(c0, variant));
        store16(out + 16 * i + 10, ycocg_recorrelate(c1, variant));
        store32(out + 16 * i + 12, load32(in + 12 * n + 4 * i));
    }
    return 0;
}

// ------------------------------------------------------------------ BC3 -------------
// Layouts: bc3/src/transform/transform_with_settings.rs:44-140.

extern "C" int dlt_bc3_transform(const uint8_t* in, uint8_t* out, size_t len,
                      int variant, int split_alpha, int split_colour) {
    if (len % 16) return -1;
    size_t n = len / 16;
    for (size_t i = 0; i < n; i++) {
        const uint8_t* blk = in + 16 * i;
        if (split_alpha) {
            out[i] = blk[0];
            out[n + i] = blk[1];
        } else {
            out[2 * i] = blk[0];
            out[2 * i + 1] = blk[1];
        }
        std::memcpy(out + 2 * n + 6 * i, blk + 2, 6);  // alpha indices
        uint16_t c0 = ycocg_decorrelate(load16(blk + 8), variant);
        uint16_t c1 = ycocg_decorrelate(load16(blk + 10), variant);
        if (split_colour) {
            store16(out + 8 * n + 2 * i, c0);
            store16(out + 10 * n + 2 * i, c1);
        } else {
            store16(out + 8 * n + 4 * i, c0);
            store16(out + 8 * n + 4 * i + 2, c1);
        }
        store32(out + 12 * n + 4 * i, load32(blk + 12));
    }
    return 0;
}

extern "C" int dlt_bc3_untransform(const uint8_t* in, uint8_t* out, size_t len,
                        int variant, int split_alpha, int split_colour) {
    if (len % 16) return -1;
    size_t n = len / 16;
    for (size_t i = 0; i < n; i++) {
        uint8_t* blk = out + 16 * i;
        if (split_alpha) {
            blk[0] = in[i];
            blk[1] = in[n + i];
        } else {
            blk[0] = in[2 * i];
            blk[1] = in[2 * i + 1];
        }
        std::memcpy(blk + 2, in + 2 * n + 6 * i, 6);
        uint16_t c0 = split_colour ? load16(in + 8 * n + 2 * i)
                                   : load16(in + 8 * n + 4 * i);
        uint16_t c1 = split_colour ? load16(in + 10 * n + 2 * i)
                                   : load16(in + 8 * n + 4 * i + 2);
        store16(blk + 8, ycocg_recorrelate(c0, variant));
        store16(blk + 10, ycocg_recorrelate(c1, variant));
        store32(blk + 12, load32(in + 12 * n + 4 * i));
    }
    return 0;
}

// ------------------------------------------- batch untransform (load path) ---------
// One C call restores a whole window of sub-device-threshold files: the CLI's
// batched load path hands (payload, settings) arrays here instead of making one
// ctypes call per file -- the pthread twin of dlt_zstd_estimate_batch below
// (GIL released once for the whole batch; settings vary per file).

extern "C" int dlt_batch_untransform(int fmt, const uint8_t* const* ins,
                                     const size_t* lens, uint8_t* const* outs,
                                     const int* variants, const uint8_t* flag_a,
                                     const uint8_t* flag_b, size_t count,
                                     int num_threads) {
    if (num_threads <= 0)
        num_threads = (int)std::thread::hardware_concurrency();
    std::atomic<size_t> next(0);
    std::atomic<int> err(0);
    auto work = [&]() {
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= count) break;
            int rc;
            switch (fmt) {
                case 0: rc = dlt_bc1_untransform(ins[i], outs[i], lens[i],
                                                 variants[i], flag_a[i]); break;
                case 1: rc = dlt_bc2_untransform(ins[i], outs[i], lens[i],
                                                 variants[i], flag_a[i]); break;
                case 2: rc = dlt_bc3_untransform(ins[i], outs[i], lens[i],
                                                 variants[i], flag_a[i],
                                                 flag_b[i]); break;
                default: rc = -2;
            }
            if (rc != 0) { err.store(rc); break; }
        }
    };
    std::vector<std::thread> pool;
    int nt = std::max(1, std::min<int>(num_threads, (int)count));
    for (int t = 0; t < nt; t++) pool.emplace_back(work);
    for (auto& th : pool) th.join();
    return err.load();
}

// ----------------------------------------------------------- zstd estimation --------
// Magicless frames, no content-size/checksum/dictID: pure payload size
// (reference zstd estimator lib.rs:183-199).

static void set_magicless(ZSTD_CCtx* cctx, int level) {
    ZSTD_CCtx_setParameter(cctx, ZSTD_c_compressionLevel, level);
    ZSTD_CCtx_setParameter(cctx, ZSTD_c_format, ZSTD_f_zstd1_magicless);
    ZSTD_CCtx_setParameter(cctx, ZSTD_c_contentSizeFlag, 0);
    ZSTD_CCtx_setParameter(cctx, ZSTD_c_checksumFlag, 0);
    ZSTD_CCtx_setParameter(cctx, ZSTD_c_dictIDFlag, 0);
}

extern "C" size_t dlt_zstd_bound(size_t len) { return ZSTD_compressBound(len); }

// Returns compressed size, or (size_t)-1 on error.
extern "C" size_t dlt_zstd_compress(const uint8_t* in, size_t len, uint8_t* dst,
                         size_t dst_cap, int level) {
    ZSTD_CCtx* cctx = ZSTD_createCCtx();
    if (!cctx) return (size_t)-1;
    set_magicless(cctx, level);
    size_t r = ZSTD_compress2(cctx, dst, dst_cap, in, len);
    ZSTD_freeCCtx(cctx);
    return ZSTD_isError(r) ? (size_t)-1 : r;
}

extern "C" size_t dlt_zstd_decompress(const uint8_t* in, size_t len, uint8_t* dst,
                           size_t dst_cap) {
    ZSTD_DCtx* dctx = ZSTD_createDCtx();
    if (!dctx) return (size_t)-1;
    ZSTD_DCtx_setParameter(dctx, ZSTD_d_format, ZSTD_f_zstd1_magicless);
    size_t r = ZSTD_decompressDCtx(dctx, dst, dst_cap, in, len);
    ZSTD_freeDCtx(dctx);
    return ZSTD_isError(r) ? (size_t)-1 : r;
}

extern "C" size_t dlt_zstd_estimate(const uint8_t* in, size_t len, int level) {
    if (len == 0) return 0;
    std::vector<uint8_t> buf(ZSTD_compressBound(len));
    return dlt_zstd_compress(in, len, buf.data(), buf.size(), level);
}

// Estimate `count` independent buffers in parallel (corpus auto-search batches).
// sizes_out[i] = estimate of (ptrs[i], lens[i]). Returns 0 on success.
extern "C" int dlt_zstd_estimate_batch(const uint8_t* const* ptrs, const size_t* lens,
                            size_t* sizes_out, size_t count, int level,
                            int num_threads) {
    if (num_threads <= 0)
        num_threads = (int)std::thread::hardware_concurrency();
    std::atomic<size_t> next(0);
    std::atomic<int> err(0);
    auto work = [&]() {
        std::vector<uint8_t> buf;
        ZSTD_CCtx* cctx = ZSTD_createCCtx();
        if (!cctx) { err.store(1); return; }
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= count) break;
            set_magicless(cctx, level);
            buf.resize(ZSTD_compressBound(lens[i]));
            size_t r = ZSTD_compress2(cctx, buf.data(), buf.size(), ptrs[i], lens[i]);
            if (ZSTD_isError(r)) { err.store(1); break; }
            sizes_out[i] = r;
        }
        ZSTD_freeCCtx(cctx);
    };
    std::vector<std::thread> pool;
    int nt = std::max(1, std::min<int>(num_threads, (int)count));
    for (int t = 0; t < nt; t++) pool.emplace_back(work);
    for (auto& th : pool) th.join();
    return err.load();
}

// ------------------------------------------------- sampled-offset LZ coverage -------
// Twin of estimate/ltu.py::_coverage_score_np -- must stay bit-identical.
// Round 4: 4-byte grams, offset-weighted (W(k) = 24 - lround(log2 k); descending
// offset order so the NEAREST match's weight wins); score = 24*len - sum W.

static const int kOffsets[] = {1, 2, 3, 4, 5, 6, 8, 12, 16, 24, 32, 48, 64, 96,
                               128, 256, 512, 1024, 2048, 4096};
static const int kWeightScale = 24;

static inline uint8_t ltu_weight(int k) {
    return (uint8_t)(kWeightScale - (k > 1 ? (int)lround(log2((double)k)) : 0));
}

// scorer v4 (round 5): sampled-prefix entropy term. Exact-integer twin of
// estimate/ltu.py::_entropy_term_np -- the shared table G[n] = floor(n*log2(n)
// + 0.5) MUST match numpy's (same double math; dlt_ltu_g_table exports it so
// tests compare every entry).
static const int kEntropyCap = 65536;

static const int64_t* ltu_g_table() {
    // thread-safe one-time init (magic static): the pthread batch drivers call
    // the scorer concurrently, so the fill must live INSIDE the initializer
    static const std::vector<int64_t> g = [] {
        std::vector<int64_t> t(kEntropyCap + 1, 0);
        for (int n = 2; n <= kEntropyCap; n++)
            t[n] = (int64_t)std::floor((double)n * std::log2((double)n) + 0.5);
        return t;
    }();
    return g.data();
}

// Host-authoritative override: the Python loader installs numpy's G table at
// load time so the host/native twin equality is unconditional -- libm log2 may
// differ from numpy's by 1 ULP on some platforms, which could flip a
// floor(x + 0.5) entry. Pure-C consumers without the override fall back to the
// locally computed table above (equal on every platform tested;
// dlt_ltu_g_table_entry lets them verify). First writer wins; the copy is
// intentionally leaked (lives for the process).
static std::atomic<const int64_t*> g_ltu_g_override{nullptr};

static inline const int64_t* ltu_g_active() {
    const int64_t* o = g_ltu_g_override.load(std::memory_order_acquire);
    return o ? o : ltu_g_table();
}

extern "C" int dlt_ltu_set_g_table(const int64_t* table, int len) {
    if (table == nullptr || len != kEntropyCap + 1) return -1;
    int64_t* copy = new (std::nothrow) int64_t[kEntropyCap + 1];
    if (copy == nullptr) return -1;
    std::memcpy(copy, table, sizeof(int64_t) * (size_t)(kEntropyCap + 1));
    const int64_t* expected = nullptr;
    if (!g_ltu_g_override.compare_exchange_strong(expected, copy,
                                                  std::memory_order_acq_rel)) {
        delete[] copy;  // already installed
    }
    return 0;
}

extern "C" int64_t dlt_ltu_g_table_entry(int n) {
    return (n >= 0 && n <= kEntropyCap) ? ltu_g_active()[n] : -1;
}

static int64_t ltu_entropy_term(const uint8_t* data, size_t len) {
    int n = (int)std::min<size_t>(len, (size_t)kEntropyCap);
    if (n <= 1) return 0;
    int64_t hist[256] = {0};
    for (int i = 0; i < n; i++) hist[data[i]]++;
    const int64_t* g = ltu_g_active();
    int64_t sum = 0;
    for (int c = 0; c < 256; c++) sum += g[hist[c]];
    int64_t raw = g[n] - sum;
    if (raw < 0) raw = 0;
    return (3 * raw) / 8;
}

extern "C" size_t dlt_ltu_estimate(const uint8_t* data, size_t len) {
    if (len < 4)
        return (size_t)kWeightScale * len + (size_t)ltu_entropy_term(data, len);
    size_t glen = len - 3;
    std::vector<uint32_t> g(glen);
    for (size_t i = 0; i < glen; i++)
        g[i] = (uint32_t)data[i] | ((uint32_t)data[i + 1] << 8)
             | ((uint32_t)data[i + 2] << 16) | ((uint32_t)data[i + 3] << 24);
    std::vector<uint8_t> w(glen, 0);
    const int n_off = (int)(sizeof(kOffsets) / sizeof(kOffsets[0]));
    for (int oi = n_off - 1; oi >= 0; oi--) {
        int k = kOffsets[oi];
        if ((size_t)k >= glen) continue;
        uint8_t wk = ltu_weight(k);
        for (size_t i = (size_t)k; i < glen; i++)
            if (g[i] == g[i - (size_t)k]) w[i] = wk;
    }
    size_t weighted = 0;
    for (size_t i = 0; i < glen; i++) weighted += w[i];
    return (size_t)kWeightScale * len - weighted
         + (size_t)ltu_entropy_term(data, len);
}


// ------------------------------------------------------------------ BC7 -------------
// Mode-aware transform (framework extension; see oracle/bc7.py for the layout):
// chunk-local (4096 blocks) stable counting sort by mode id + optional byte-plane
// split, with a packed 4-bit mode stream for the inverse.

static const size_t BC7_CHUNK = 4096;

static inline uint8_t bc7_mode(uint8_t b0) {
    return b0 ? (uint8_t)__builtin_ctz((unsigned)b0) : (uint8_t)8;
}

// BC6H grouping id (see oracle/bc6h.py): 2-bit modes -> 0,1; valid 5-bit two-region
// -> 2..9; one-region -> 10..13; reserved -> 14.
static inline uint8_t bc6h_mode(uint8_t b0) {
    unsigned two = b0 & 3u;
    if (two < 2) return (uint8_t)two;
    unsigned v = b0 & 31u;
    if (v & 1u) return (uint8_t)(10u + std::min(v >> 2, 4u));
    return (uint8_t)(2u + (v >> 2));
}

// Stable chunk-local counting-sort permutation: order[p] = source block of output p.
static void bc7_sort_order(const uint8_t* modes, size_t n, uint32_t* order) {
    for (size_t s = 0; s < n; s += BC7_CHUNK) {
        size_t c = std::min(BC7_CHUNK, n - s);
        size_t cnt[16] = {0};  // ids are 4-bit: bc7 uses 0..8, bc6h 0..14
        for (size_t j = 0; j < c; j++) cnt[modes[s + j] & 0xF]++;
        size_t offs[16], acc = 0;
        for (int m = 0; m < 16; m++) { offs[m] = acc; acc += cnt[m]; }
        for (size_t j = 0; j < c; j++)
            order[s + offs[modes[s + j] & 0xF]++] = (uint32_t)(s + j);
    }
}

// out must hold len + (sort ? (len/16 + 1) / 2 : 0) bytes (mode stream first).
static int modesort_transform(const uint8_t* in, uint8_t* out, size_t len,
                              int sort, int planes, uint8_t (*mode_fn)(uint8_t)) {
    if (len % 16) return -1;
    size_t n = len / 16;
    uint8_t* payload = out;
    std::vector<uint32_t> order(n);
    if (sort) {
        std::vector<uint8_t> modes(n);
        for (size_t i = 0; i < n; i++) modes[i] = mode_fn(in[16 * i]);
        size_t msl = (n + 1) / 2;
        for (size_t i = 0; i < msl; i++)
            out[i] = (uint8_t)(modes[2 * i] |
                               ((2 * i + 1 < n) ? (modes[2 * i + 1] << 4) : 0));
        payload = out + msl;
        bc7_sort_order(modes.data(), n, order.data());
    } else {
        for (size_t i = 0; i < n; i++) order[i] = (uint32_t)i;
    }
    if (planes) {
        for (int k = 0; k < 16; k++)
            for (size_t p = 0; p < n; p++)
                payload[(size_t)k * n + p] = in[16 * (size_t)order[p] + k];
    } else {
        for (size_t p = 0; p < n; p++)
            std::memcpy(payload + 16 * p, in + 16 * (size_t)order[p], 16);
    }
    return 0;
}

extern "C" int dlt_bc7_transform(const uint8_t* in, uint8_t* out, size_t len,
                                 int sort, int planes) {
    return modesort_transform(in, out, len, sort, planes, bc7_mode);
}

extern "C" int dlt_bc6h_transform(const uint8_t* in, uint8_t* out, size_t len,
                                  int sort, int planes) {
    return modesort_transform(in, out, len, sort, planes, bc6h_mode);
}

// in holds the transformed stream; out_len is the ORIGINAL payload size (16 * n).
// The inverse reads grouping ids from the mode stream, so it is format-agnostic.
extern "C" int dlt_bc7_untransform(const uint8_t* in, uint8_t* out, size_t out_len,
                                   int sort, int planes) {
    if (out_len % 16) return -1;
    size_t n = out_len / 16;
    const uint8_t* payload = in;
    std::vector<uint32_t> order(n);
    if (sort) {
        size_t msl = (n + 1) / 2;
        std::vector<uint8_t> modes(n);
        for (size_t i = 0; i < n; i++)
            modes[i] = (i & 1) ? (uint8_t)(in[i / 2] >> 4) : (uint8_t)(in[i / 2] & 0xF);
        payload = in + msl;
        bc7_sort_order(modes.data(), n, order.data());
    } else {
        for (size_t i = 0; i < n; i++) order[i] = (uint32_t)i;
    }
    if (planes) {
        for (int k = 0; k < 16; k++)
            for (size_t p = 0; p < n; p++)
                out[16 * (size_t)order[p] + k] = payload[(size_t)k * n + p];
    } else {
        for (size_t p = 0; p < n; p++)
            std::memcpy(out + 16 * (size_t)order[p], payload + 16 * p, 16);
    }
    return 0;
}

// ------------------------------------------------------ uncompressed RGB(A) ---------
// Channel-plane split + reversible r-g / b-g (mod 256) lifting (see oracle/rgb.py).
// size = bytes per pixel (3 or 4); ri/gi/bi = channel byte indices within a pixel.

extern "C" int dlt_rgb_transform(const uint8_t* in, uint8_t* out, size_t len,
                                 int size, int ri, int gi, int bi,
                                 int dec, int split) {
    if (size < 3 || size > 4 || len % (size_t)size) return -1;
    size_t n = len / (size_t)size;
    for (int k = 0; k < size; k++) {
        const uint8_t* src = in + k;
        uint8_t* dst = split ? out + (size_t)k * n : out + k;
        size_t stride = split ? 1 : (size_t)size;
        if (dec && (k == ri || k == bi)) {
            const uint8_t* g = in + gi;
            for (size_t i = 0; i < n; i++)
                dst[i * stride] = (uint8_t)(src[i * (size_t)size] - g[i * (size_t)size]);
        } else {
            for (size_t i = 0; i < n; i++)
                dst[i * stride] = src[i * (size_t)size];
        }
    }
    return 0;
}

extern "C" int dlt_rgb_untransform(const uint8_t* in, uint8_t* out, size_t len,
                                   int size, int ri, int gi, int bi,
                                   int dec, int split) {
    if (size < 3 || size > 4 || len % (size_t)size) return -1;
    size_t n = len / (size_t)size;
    // green first (r/b reconstruction needs it), then the rest
    for (int pass = 0; pass < 2; pass++) {
        for (int k = 0; k < size; k++) {
            if ((pass == 0) != (k == gi)) continue;
            const uint8_t* src = split ? in + (size_t)k * n : in + k;
            size_t stride = split ? 1 : (size_t)size;
            uint8_t* dst = out + k;
            if (dec && (k == ri || k == bi)) {
                const uint8_t* g = out + gi;  // already restored (pass 0)
                for (size_t i = 0; i < n; i++)
                    dst[i * (size_t)size] =
                        (uint8_t)(src[i * stride] + g[i * (size_t)size]);
            } else {
                for (size_t i = 0; i < n; i++)
                    dst[i * (size_t)size] = src[i * stride];
            }
        }
    }
    return 0;
}

extern "C" int dlt_bc6h_untransform(const uint8_t* in, uint8_t* out, size_t out_len,
                                    int sort, int planes) {
    return dlt_bc7_untransform(in, out, out_len, sort, planes);
}

// ------------------------------------------------- pluggable estimator vtable -------
// C analog of the reference's DltSizeEstimator (api-common/src/c_api/
// size_estimation.rs:17-125): callers plug any {context, max_size, estimate}
// triple into the auto-search. Only relative ordering of estimates matters.

extern "C" {

typedef struct DltSizeEstimator {
    void* context;
    // Optional (may be NULL): upper bound on the estimate buffer; unused here
    // because the C++ side owns its scratch, kept for ABI parity.
    size_t (*max_compressed_size)(void* context, size_t len);
    // Required. Returns 0 on success and writes the (relative) size to *out_size.
    int (*estimate_compressed_size)(void* context, const uint8_t* data, size_t len,
                                    size_t* out_size);
} DltSizeEstimator;

}  // extern "C"

static int vt_estimate(const DltSizeEstimator* est, const uint8_t* data, size_t len,
                       size_t* out) {
    if (!est || !est->estimate_compressed_size) return -1;
    return est->estimate_compressed_size(est->context, data, len, out);
}

// Built-in estimators exposed as vtables (so C callers can mix & match).
static size_t zstd_vt_max(void*, size_t len) { return ZSTD_compressBound(len); }
static int zstd_vt_estimate(void* ctx, const uint8_t* data, size_t len, size_t* out) {
    size_t r = dlt_zstd_estimate(data, len, (int)(intptr_t)ctx);
    if (r == (size_t)-1) return -1;
    *out = r;
    return 0;
}
static size_t ltu_vt_max(void*, size_t len) { return len; }
static int ltu_vt_estimate(void*, const uint8_t* data, size_t len, size_t* out) {
    *out = dlt_ltu_estimate(data, len);
    return 0;
}

extern "C" void dlt_estimator_zstd(DltSizeEstimator* out, int level) {
    out->context = (void*)(intptr_t)level;
    out->max_compressed_size = zstd_vt_max;
    out->estimate_compressed_size = zstd_vt_estimate;
}

extern "C" void dlt_estimator_ltu(DltSizeEstimator* out) {
    out->context = nullptr;
    out->max_compressed_size = ltu_vt_max;
    out->estimate_compressed_size = ltu_vt_estimate;
}

// --------------------------------------------------------- native auto-search -------
// Brute-force candidate search with a caller-supplied estimator; candidate sets and
// estimation regions match settings.py / ops/auto.py (reference:
// bc1/transform_auto.rs:200-270, bc2/transform_auto.rs:252-254). First minimum wins
// (ties resolve like jnp.argmin over the candidate order).

struct CandVS { int variant; int split; };

static const CandVS kBc12Fast[] = {{0, 0}, {0, 1}, {1, 0}, {1, 1}};
static const CandVS kBc12All[] = {{2, 0}, {0, 0}, {0, 1}, {3, 0},
                                  {3, 1}, {2, 1}, {1, 0}, {1, 1}};

typedef int (*transform_fn)(const uint8_t*, uint8_t*, size_t, int, int);

// Only our stateless builtin estimators are known thread-safe; a caller-supplied
// vtable gets the sequential path.
static bool vt_is_builtin(const DltSizeEstimator* est) {
    return est && (est->estimate_compressed_size == zstd_vt_estimate ||
                   est->estimate_compressed_size == ltu_vt_estimate);
}

// ---- region-only builders -----------------------------------------------------------
// The estimation region of a candidate is built straight from the input (colour
// stream extraction + SWAR decorrelate + optional split) instead of running the
// full transform: the indices/alpha stream moves -- most of the memory traffic --
// contribute nothing to the estimate and are skipped.

template <int V>
static void colour_region_t(const uint8_t* in, size_t stride, size_t coff,
                            uint8_t* region, size_t n, bool split) {
    if (split) {
        for (size_t i = 0; i < n; i++) {
            uint32_t p = ycocg_decorrelate_pair<V>(load32(in + stride * i + coff));
            store16(region + 2 * i, (uint16_t)p);
            store16(region + 2 * n + 2 * i, (uint16_t)(p >> 16));
        }
    } else {
        for (size_t i = 0; i < n; i++)
            store32(region + 4 * i,
                    ycocg_decorrelate_pair<V>(load32(in + stride * i + coff)));
    }
}

// stride 8 coff 0 = BC1; stride 16 coff 8 = BC2/BC3 colour words.
static void colour_region(const uint8_t* in, size_t stride, size_t coff,
                          uint8_t* region, size_t n, int variant, bool split) {
    switch (variant) {
        case 0: colour_region_t<0>(in, stride, coff, region, n, split); break;
        case 1: colour_region_t<1>(in, stride, coff, region, n, split); break;
        case 2: colour_region_t<2>(in, stride, coff, region, n, split); break;
        case 3: colour_region_t<3>(in, stride, coff, region, n, split); break;
    }
}

static void bc3_alpha_region(const uint8_t* in, uint8_t* region, size_t n,
                             bool split_alpha) {
    if (split_alpha) {
        for (size_t i = 0; i < n; i++) {
            region[i] = in[16 * i];
            region[n + i] = in[16 * i + 1];
        }
    } else {
        for (size_t i = 0; i < n; i++) {
            region[2 * i] = in[16 * i];
            region[2 * i + 1] = in[16 * i + 1];
        }
    }
}

// Task-parallel candidate loop: each worker builds one candidate's region(s) and
// estimates it; ties resolve to the first (candidate-order) minimum, matching
// jnp.argmin in ops/auto.py.
template <typename BuildEstimate>
static int auto_search_run(size_t count, const DltSizeEstimator* est,
                           BuildEstimate build_estimate, size_t* best_out) {
    std::vector<size_t> sizes(count, (size_t)-1);
    std::atomic<size_t> next(0);
    std::atomic<int> err(0);
    auto work = [&]() {
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= count || err.load()) break;
            size_t sz;
            int rc = build_estimate(i, &sz);
            if (rc) { err.store(rc); break; }
            sizes[i] = sz;
        }
    };
    unsigned hw = std::thread::hardware_concurrency();
    size_t nt = vt_is_builtin(est) ? std::min<size_t>(hw ? hw : 1, count) : 1;
    if (nt <= 1) {
        work();
    } else {
        std::vector<std::thread> pool;
        for (size_t t = 0; t < nt; t++) pool.emplace_back(work);
        for (auto& th : pool) th.join();
    }
    if (err.load()) return err.load();
    size_t best_i = 0, best_size = (size_t)-1;
    for (size_t i = 0; i < count; i++)
        if (sizes[i] < best_size) { best_size = sizes[i]; best_i = i; }
    *best_out = best_i;
    return 0;
}

static int transform_auto_vs(const uint8_t* in, uint8_t* out, size_t len,
                             const DltSizeEstimator* est, int use_all,
                             int* best_variant, int* best_split,
                             transform_fn tf, size_t stride, size_t coff) {
    const CandVS* cands = use_all ? kBc12All : kBc12Fast;
    size_t count = use_all ? 8 : 4;
    size_t n = len / stride;
    size_t region_len = 4 * n;  // colour endpoints: 4 bytes per block
    auto build_estimate = [&](size_t i, size_t* sz) -> int {
        std::vector<uint8_t> region(region_len);
        colour_region(in, stride, coff, region.data(), n, cands[i].variant,
                      cands[i].split != 0);
        return vt_estimate(est, region.data(), region_len, sz) ? -2 : 0;
    };
    size_t best_i = 0;
    int rc = auto_search_run(count, est, build_estimate, &best_i);
    if (rc) return rc;
    if (tf(in, out, len, cands[best_i].variant, cands[best_i].split)) return -1;
    if (best_variant) *best_variant = cands[best_i].variant;
    if (best_split) *best_split = cands[best_i].split;
    return 0;
}

// Estimation region: colour endpoints only -- BC1 first len/2 bytes, BC2 len/4
// bytes at offset len/2 (indices never compress well; alphas aren't transformed).
extern "C" int dlt_bc1_transform_auto(const uint8_t* in, uint8_t* out, size_t len,
                                      const DltSizeEstimator* est, int use_all,
                                      int* best_variant, int* best_split) {
    if (len % 8) return -1;
    return transform_auto_vs(in, out, len, est, use_all, best_variant, best_split,
                             dlt_bc1_transform, 8, 0);
}

extern "C" int dlt_bc2_transform_auto(const uint8_t* in, uint8_t* out, size_t len,
                                      const DltSizeEstimator* est, int use_all,
                                      int* best_variant, int* best_split) {
    if (len % 16) return -1;
    return transform_auto_vs(in, out, len, est, use_all, best_variant, best_split,
                             dlt_bc2_transform, 16, 8);
}

// BC3: 3 knobs; estimate = alpha endpoints (2 B/block) + colour endpoints
// (4 B/block), summed. Candidate orders mirror settings.py BC3_FAST/COMPREHENSIVE.
struct CandVAS { int variant; int split_alpha; int split_colour; };

static const CandVAS kBc3Fast[] = {
    {1, 1, 0}, {1, 1, 1}, {0, 1, 0}, {0, 0, 1},
    {0, 1, 1}, {1, 0, 1}, {0, 0, 0}, {1, 0, 0}};
static const CandVAS kBc3All[] = {
    {2, 1, 0}, {2, 1, 1}, {3, 1, 1}, {3, 1, 0}, {1, 1, 0}, {3, 0, 1},
    {1, 1, 1}, {2, 0, 1}, {2, 0, 0}, {3, 0, 0}, {0, 1, 0}, {0, 0, 1},
    {0, 1, 1}, {1, 0, 1}, {0, 0, 0}, {1, 0, 0}};

extern "C" int dlt_bc3_transform_auto(const uint8_t* in, uint8_t* out, size_t len,
                                      const DltSizeEstimator* est, int use_all,
                                      int* best_variant, int* best_split_alpha,
                                      int* best_split_colour) {
    if (len % 16) return -1;
    const CandVAS* cands = use_all ? kBc3All : kBc3Fast;
    size_t count = use_all ? 16 : 8;
    size_t n = len / 16;
    auto build_estimate = [&](size_t i, size_t* sz) -> int {
        std::vector<uint8_t> alpha(2 * n);
        bc3_alpha_region(in, alpha.data(), n, cands[i].split_alpha != 0);
        size_t sa;
        if (vt_estimate(est, alpha.data(), 2 * n, &sa)) return -2;
        std::vector<uint8_t> colour(4 * n);
        colour_region(in, 16, 8, colour.data(), n, cands[i].variant,
                      cands[i].split_colour != 0);
        size_t sc;
        if (vt_estimate(est, colour.data(), 4 * n, &sc)) return -2;
        *sz = sa + sc;
        return 0;
    };
    size_t best_i = 0;
    int rc = auto_search_run(count, est, build_estimate, &best_i);
    if (rc) return rc;
    if (dlt_bc3_transform(in, out, len, cands[best_i].variant,
                          cands[best_i].split_alpha, cands[best_i].split_colour))
        return -1;
    if (best_variant) *best_variant = cands[best_i].variant;
    if (best_split_alpha) *best_split_alpha = cands[best_i].split_alpha;
    if (best_split_colour) *best_split_colour = cands[best_i].split_colour;
    return 0;
}

// ------------------------------------------------------------ error strings ---------
// C analog of the reference's error-message API (bc1-api/src/c_api/error.rs:131).

extern "C" const char* dlt_error_message(int rc) {
    switch (rc) {
        case 0: return "success";
        case -1: return "invalid input (length not divisible by the block size, "
                        "or bad arguments)";
        case -2: return "size estimator returned an error";
        case -3: return "allocation failed";
        default: return "unknown error";
    }
}

// ---------------------------------------------------------- opaque builders ---------
// C analog of the reference's stable builder API (bc1-api/src/c_api/transform/
// auto_transform_builder.rs:63-190, manual_transform_builder.rs:86-323), covering
// BC1/BC2 like the reference plus BC3 (whose reference api crate is an empty stub).

extern "C" {

typedef struct DltManualBuilder {
    int format;       // 1/2/3 = BC1/BC2/BC3
    int variant;      // YCoCg variant 0..3
    int split_colour; // bool
    int split_alpha;  // bool (BC3 only)
} DltManualBuilder;

typedef struct DltAutoBuilder {
    int format;
    DltSizeEstimator estimator;
    int use_all;
} DltAutoBuilder;

}  // extern "C"

static DltManualBuilder* manual_new(int format) {
    DltManualBuilder* b = new (std::nothrow) DltManualBuilder();
    if (!b) return nullptr;
    b->format = format;
    b->variant = 1;       // default YCoCg1 + split (settings.rs:16-98 defaults)
    b->split_colour = 1;
    b->split_alpha = 1;
    return b;
}

extern "C" DltManualBuilder* dltbc1_new_ManualTransformBuilder(void) { return manual_new(1); }
extern "C" DltManualBuilder* dltbc2_new_ManualTransformBuilder(void) { return manual_new(2); }
extern "C" DltManualBuilder* dltbc3_new_ManualTransformBuilder(void) { return manual_new(3); }

extern "C" void dlt_free_ManualTransformBuilder(DltManualBuilder* b) { delete b; }

extern "C" void dlt_ManualTransformBuilder_SetDecorrelationMode(DltManualBuilder* b, int v) {
    if (b && v >= 0 && v <= 3) b->variant = v;
}
extern "C" void dlt_ManualTransformBuilder_SetSplitColourEndpoints(DltManualBuilder* b, int v) {
    if (b) b->split_colour = v ? 1 : 0;
}
extern "C" void dlt_ManualTransformBuilder_SetSplitAlphaEndpoints(DltManualBuilder* b, int v) {
    if (b) b->split_alpha = v ? 1 : 0;  // BC3 only; ignored elsewhere
}
extern "C" int dlt_ManualTransformBuilder_GetDecorrelationMode(const DltManualBuilder* b) {
    return b ? b->variant : -1;
}
extern "C" int dlt_ManualTransformBuilder_GetSplitColourEndpoints(const DltManualBuilder* b) {
    return b ? b->split_colour : -1;
}
extern "C" int dlt_ManualTransformBuilder_GetSplitAlphaEndpoints(const DltManualBuilder* b) {
    return b ? b->split_alpha : -1;
}

extern "C" int dlt_ManualTransformBuilder_Transform(const DltManualBuilder* b,
                                                    const uint8_t* in, uint8_t* out,
                                                    size_t len) {
    if (!b) return -1;
    switch (b->format) {
        case 1: return dlt_bc1_transform(in, out, len, b->variant, b->split_colour);
        case 2: return dlt_bc2_transform(in, out, len, b->variant, b->split_colour);
        case 3: return dlt_bc3_transform(in, out, len, b->variant, b->split_alpha,
                                         b->split_colour);
        default: return -1;
    }
}

extern "C" int dlt_ManualTransformBuilder_Untransform(const DltManualBuilder* b,
                                                      const uint8_t* in, uint8_t* out,
                                                      size_t len) {
    if (!b) return -1;
    switch (b->format) {
        case 1: return dlt_bc1_untransform(in, out, len, b->variant, b->split_colour);
        case 2: return dlt_bc2_untransform(in, out, len, b->variant, b->split_colour);
        case 3: return dlt_bc3_untransform(in, out, len, b->variant, b->split_alpha,
                                           b->split_colour);
        default: return -1;
    }
}

static DltAutoBuilder* auto_new(int format, const DltSizeEstimator* est) {
    if (!est) return nullptr;
    DltAutoBuilder* b = new (std::nothrow) DltAutoBuilder();
    if (!b) return nullptr;
    b->format = format;
    b->estimator = *est;
    b->use_all = 0;
    return b;
}

extern "C" DltAutoBuilder* dltbc1_new_AutoTransformBuilder(const DltSizeEstimator* est) {
    return auto_new(1, est);
}
extern "C" DltAutoBuilder* dltbc2_new_AutoTransformBuilder(const DltSizeEstimator* est) {
    return auto_new(2, est);
}
extern "C" DltAutoBuilder* dltbc3_new_AutoTransformBuilder(const DltSizeEstimator* est) {
    return auto_new(3, est);
}

extern "C" void dlt_free_AutoTransformBuilder(DltAutoBuilder* b) { delete b; }

extern "C" void dlt_AutoTransformBuilder_SetUseAllDecorrelationModes(DltAutoBuilder* b,
                                                                     int v) {
    if (b) b->use_all = v ? 1 : 0;
}

// Transform with the best found settings; writes the untransform recipe into
// `recipe` (the reference returns a ManualTransformBuilder the same way).
extern "C" int dlt_AutoTransformBuilder_Transform(const DltAutoBuilder* b,
                                                  const uint8_t* in, uint8_t* out,
                                                  size_t len,
                                                  DltManualBuilder* recipe) {
    if (!b) return -1;
    int variant = 0, sc = 0, sa = 0, rc = -1;
    switch (b->format) {
        case 1:
            rc = dlt_bc1_transform_auto(in, out, len, &b->estimator, b->use_all,
                                        &variant, &sc);
            break;
        case 2:
            rc = dlt_bc2_transform_auto(in, out, len, &b->estimator, b->use_all,
                                        &variant, &sc);
            break;
        case 3:
            rc = dlt_bc3_transform_auto(in, out, len, &b->estimator, b->use_all,
                                        &variant, &sa, &sc);
            break;
        default:
            return -1;
    }
    if (rc == 0 && recipe) {
        recipe->format = b->format;
        recipe->variant = variant;
        recipe->split_colour = sc;
        recipe->split_alpha = sa;
    }
    return rc;
}

// ------------------------------------------------------------- DDS C exports --------
// C analog of the reference's DDS exports (dds/src/dds/exports.rs:11-39); parsing
// semantics mirror formats/dds.py (itself mirroring dds/parse_dds.rs).

extern "C" {

typedef struct DltDdsInfo {
    int format;            // DdsFormat ids (formats/dds.py: BC1=2..BC5=11)
    uint32_t data_offset;
    uint32_t data_length;
} DltDdsInfo;

}  // extern "C"

static uint32_t dds_u32(const uint8_t* d, size_t off) { return load32(d + off); }

extern "C" int dlt_is_dds(const uint8_t* data, size_t len) {
    return len >= 0x80 && dds_u32(data, 0) == 0x20534444u;
}

static uint64_t mip_chain_blocks(uint32_t w, uint32_t h, uint32_t mips,
                                 uint64_t block_bytes, int blocked) {
    uint64_t total = 0;
    for (uint32_t i = 0; i < mips; i++) {
        uint64_t level = blocked
            ? (uint64_t)((w + 3) / 4) * ((h + 3) / 4) * block_bytes
            : (uint64_t)w * h * block_bytes;
        total += level;
        if (total > 0xFFFFFFFFull) total = 0xFFFFFFFFull;
        w = w > 1 ? w / 2 : 1;
        h = h > 1 ? h / 2 : 1;
    }
    return total;
}

extern "C" int dlt_parse_dds_ignore_magic(const uint8_t* data, size_t len,
                                          DltDdsInfo* out) {
    if (len < 0x80 || !out) return -1;
    uint32_t fourcc = dds_u32(data, 0x54);
    int fmt = 1;  // UNKNOWN
    uint32_t data_offset = 0x80;
    if (fourcc == 0x30315844u) {  // 'DX10'
        if (len < 0x80 + 20) return -1;
        data_offset = 0x80 + 20;
        uint32_t dxgi = dds_u32(data, 0x80);
        if (dxgi >= 70 && dxgi <= 72) fmt = 2;        // BC1
        else if (dxgi >= 73 && dxgi <= 75) fmt = 3;   // BC2
        else if (dxgi >= 76 && dxgi <= 78) fmt = 4;   // BC3
        else if (dxgi >= 79 && dxgi <= 81) fmt = 10;  // BC4
        else if (dxgi >= 82 && dxgi <= 84) fmt = 11;  // BC5
        else if (dxgi >= 94 && dxgi <= 96) fmt = 5;   // BC6H
        else if (dxgi >= 97 && dxgi <= 99) fmt = 6;   // BC7
        else if (dxgi >= 27 && dxgi <= 32) fmt = 7;   // RGBA8888
        else if (dxgi == 87 || dxgi == 90 || dxgi == 91) fmt = 8;  // BGRA8888
    } else {
        uint32_t pf = dds_u32(data, 0x50);
        if (pf & 0x4) {  // FOURCC
            switch (fourcc) {
                case 0x31545844u: fmt = 2; break;                    // DXT1
                case 0x32545844u: case 0x33545844u: fmt = 3; break;  // DXT2/3
                case 0x34545844u: case 0x35545844u: fmt = 4; break;  // DXT4/5
                case 0x55344342u: case 0x53344342u: case 0x31495441u:
                    fmt = 10; break;                                 // BC4U/S ATI1
                case 0x55354342u: case 0x53354342u: case 0x32495441u:
                    fmt = 11; break;                                 // BC5U/S ATI2
                default: fmt = 1;
            }
        } else if (pf & 0x40) {  // RGB masks
            uint32_t bits = dds_u32(data, 0x58);
            uint32_t r = dds_u32(data, 0x5C), g = dds_u32(data, 0x60);
            uint32_t b = dds_u32(data, 0x64), a = dds_u32(data, 0x68);
            if (bits == 24 && r == 0xFF0000u && g == 0xFF00u && b == 0xFFu && !a)
                fmt = 9;  // BGR888
            else if (bits == 32 && (pf & 0x1)) {
                if (r == 0xFFu && g == 0xFF00u && b == 0xFF0000u && a == 0xFF000000u)
                    fmt = 7;
                else if (r == 0xFF0000u && g == 0xFF00u && b == 0xFFu &&
                         a == 0xFF000000u)
                    fmt = 8;
            }
        }
    }
    uint32_t flags = dds_u32(data, 0x08);
    uint32_t height = dds_u32(data, 0x0C);
    uint32_t width = dds_u32(data, 0x10);
    uint32_t mips = (flags & 0x20000u) ? dds_u32(data, 0x1C) : 1;
    if (mips == 0) mips = 1;
    uint64_t length;
    switch (fmt) {
        case 2: case 10: length = mip_chain_blocks(width, height, mips, 8, 1); break;
        case 3: case 4: case 5: case 6: case 11:
            length = mip_chain_blocks(width, height, mips, 16, 1); break;
        case 7: case 8: length = mip_chain_blocks(width, height, mips, 4, 0); break;
        case 9: length = mip_chain_blocks(width, height, mips, 3, 0); break;
        default: length = 0;
    }
    // cubemap faces / array surfaces (formats/dds.py::_surface_count)
    uint64_t surfaces = 1;
    if (fourcc == 0x30315844u && len >= 0x80 + 20) {
        uint32_t arr = dds_u32(data, 0x8C);
        surfaces = arr ? arr : 1;
        if (dds_u32(data, 0x88) & 0x4) surfaces *= 6;
    } else {
        uint32_t caps2 = dds_u32(data, 0x70);
        if (caps2 & 0x200u) {
            uint32_t faces = caps2 & 0xFC00u;
            int nf = 0;
            while (faces) { nf += faces & 1; faces >>= 1; }
            surfaces = nf ? nf : 6;
        }
    }
    length *= surfaces;
    if (length > 0xFFFFFFFFull) length = 0xFFFFFFFFull;
    out->format = fmt;
    out->data_offset = data_offset;
    out->data_length = (uint32_t)length;
    return 0;
}

extern "C" int dlt_parse_dds(const uint8_t* data, size_t len, DltDdsInfo* out) {
    if (!dlt_is_dds(data, len)) return -1;
    return dlt_parse_dds_ignore_magic(data, len, out);
}

extern "C" int dlt_version(void) { return 3; }
