/* C consumer test: drive the BC1/BC2 auto-search with a CUSTOM estimator vtable.
 *
 * Mirrors the reference's C-API contract (api-common/src/c_api/
 * size_estimation.rs:17-125): a caller-owned {context, max_compressed_size,
 * estimate_compressed_size} struct plugged into the brute-force search.
 * Build + run: make -C . test  (exit 0 = pass).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct DltSizeEstimator {
    void* context;
    size_t (*max_compressed_size)(void* context, size_t len);
    int (*estimate_compressed_size)(void* context, const uint8_t* data, size_t len,
                                    size_t* out_size);
} DltSizeEstimator;

extern int dlt_bc1_transform_auto(const uint8_t* in, uint8_t* out, size_t len,
                                  const DltSizeEstimator* est, int use_all,
                                  int* best_variant, int* best_split);
extern int dlt_bc2_transform_auto(const uint8_t* in, uint8_t* out, size_t len,
                                  const DltSizeEstimator* est, int use_all,
                                  int* best_variant, int* best_split);
extern int dlt_bc1_transform(const uint8_t* in, uint8_t* out, size_t len,
                             int variant, int split);
extern int dlt_bc1_untransform(const uint8_t* in, uint8_t* out, size_t len,
                               int variant, int split);
extern int dlt_bc2_untransform(const uint8_t* in, uint8_t* out, size_t len,
                               int variant, int split);
extern void dlt_estimator_ltu(DltSizeEstimator* out);

/* round-3 C API additions */
typedef struct DltManualBuilder DltManualBuilder;
typedef struct DltAutoBuilder DltAutoBuilder;
typedef struct DltDdsInfo {
    int format;
    uint32_t data_offset;
    uint32_t data_length;
} DltDdsInfo;
extern const char* dlt_error_message(int rc);
extern DltManualBuilder* dltbc1_new_ManualTransformBuilder(void);
extern void dlt_free_ManualTransformBuilder(DltManualBuilder*);
extern void dlt_ManualTransformBuilder_SetDecorrelationMode(DltManualBuilder*, int);
extern void dlt_ManualTransformBuilder_SetSplitColourEndpoints(DltManualBuilder*, int);
extern int dlt_ManualTransformBuilder_GetDecorrelationMode(const DltManualBuilder*);
extern int dlt_ManualTransformBuilder_GetSplitColourEndpoints(const DltManualBuilder*);
extern int dlt_ManualTransformBuilder_Transform(const DltManualBuilder*,
                                                const uint8_t*, uint8_t*, size_t);
extern int dlt_ManualTransformBuilder_Untransform(const DltManualBuilder*,
                                                  const uint8_t*, uint8_t*, size_t);
extern DltAutoBuilder* dltbc1_new_AutoTransformBuilder(const DltSizeEstimator*);
extern void dlt_free_AutoTransformBuilder(DltAutoBuilder*);
extern void dlt_AutoTransformBuilder_SetUseAllDecorrelationModes(DltAutoBuilder*, int);
extern int dlt_AutoTransformBuilder_Transform(const DltAutoBuilder*, const uint8_t*,
                                              uint8_t*, size_t, DltManualBuilder*);
extern int dlt_bc3_transform_auto(const uint8_t*, uint8_t*, size_t,
                                  const DltSizeEstimator*, int, int*, int*, int*);
extern int dlt_is_dds(const uint8_t*, size_t);
extern int dlt_parse_dds(const uint8_t*, size_t, DltDdsInfo*);

/* Custom estimator: count byte-pair repeats at distance ctx->stride (a toy
 * LZ-ish proxy); also records how many times it was called. */
typedef struct {
    int calls;
    size_t stride;
} MyCtx;

static size_t my_max(void* ctx, size_t len) { (void)ctx; return len; }

static int my_estimate(void* vctx, const uint8_t* data, size_t len, size_t* out) {
    MyCtx* ctx = (MyCtx*)vctx;
    ctx->calls++;
    size_t matches = 0;
    for (size_t i = ctx->stride; i < len; i++)
        matches += (data[i] == data[i - ctx->stride]);
    *out = len - matches;
    return 0;
}

int main(void) {
    /* synthetic BC1 payload: gradient-ish colors + noisy indices */
    size_t n = 4096, len = 8 * n;
    uint8_t* in = (uint8_t*)malloc(len);
    uint8_t* out = (uint8_t*)malloc(len);
    uint8_t* back = (uint8_t*)malloc(len);
    unsigned s = 12345;
    for (size_t i = 0; i < n; i++) {
        uint16_t c0 = (uint16_t)((i / 7) * 33);
        uint16_t c1 = (uint16_t)(c0 + 700);
        memcpy(in + 8 * i, &c0, 2);
        memcpy(in + 8 * i + 2, &c1, 2);
        for (int k = 4; k < 8; k++) { s = s * 1103515245u + 12345u; in[8 * i + k] = (uint8_t)(s >> 16); }
    }

    MyCtx ctx = {0, 2};
    DltSizeEstimator est = {&ctx, my_max, my_estimate};
    int variant = -1, split = -1;

    if (dlt_bc1_transform_auto(in, out, len, &est, 1, &variant, &split)) return 1;
    if (ctx.calls != 8) { fprintf(stderr, "expected 8 estimator calls, got %d\n", ctx.calls); return 2; }
    if (variant < 0 || variant > 3 || split < 0 || split > 1) return 3;
    if (dlt_bc1_untransform(out, back, len, variant, split)) return 4;
    if (memcmp(in, back, len)) { fprintf(stderr, "bc1 roundtrip mismatch\n"); return 5; }

    /* builtin vtable path + bc2 */
    DltSizeEstimator ltu;
    dlt_estimator_ltu(&ltu);
    size_t len2 = 16 * (n / 2);
    if (dlt_bc2_transform_auto(in, out, len2, &ltu, 0, &variant, &split)) return 6;
    if (dlt_bc2_untransform(out, back, len2, variant, split)) return 7;
    if (memcmp(in, back, len2)) { fprintf(stderr, "bc2 roundtrip mismatch\n"); return 8; }

    /* estimator error propagation: a failing estimator must abort the search */
    DltSizeEstimator bad = {NULL, my_max, NULL};
    if (dlt_bc1_transform_auto(in, out, len, &bad, 0, &variant, &split) == 0) return 9;

    /* ---- round-3 additions: builders, error strings, BC3 auto, DDS ---- */

    /* error-message API */
    if (strcmp(dlt_error_message(0), "success") != 0) return 10;
    if (!strlen(dlt_error_message(-2))) return 11;

    /* auto builder -> manual recipe -> untransform, all through opaque handles */
    DltAutoBuilder* ab = dltbc1_new_AutoTransformBuilder(&ltu);
    if (!ab) return 12;
    dlt_AutoTransformBuilder_SetUseAllDecorrelationModes(ab, 1);
    DltManualBuilder* recipe = dltbc1_new_ManualTransformBuilder();
    if (!recipe) return 13;
    if (dlt_AutoTransformBuilder_Transform(ab, in, out, len, recipe)) return 14;
    if (dlt_ManualTransformBuilder_Untransform(recipe, out, back, len)) return 15;
    if (memcmp(in, back, len)) { fprintf(stderr, "builder roundtrip mismatch\n"); return 16; }
    dlt_free_AutoTransformBuilder(ab);

    /* manual builder configuration round-trips through getters */
    dlt_ManualTransformBuilder_SetDecorrelationMode(recipe, 3);
    dlt_ManualTransformBuilder_SetSplitColourEndpoints(recipe, 0);
    if (dlt_ManualTransformBuilder_GetDecorrelationMode(recipe) != 3) return 17;
    if (dlt_ManualTransformBuilder_GetSplitColourEndpoints(recipe) != 0) return 18;
    if (dlt_ManualTransformBuilder_Transform(recipe, in, out, len)) return 19;
    if (dlt_ManualTransformBuilder_Untransform(recipe, out, back, len)) return 20;
    if (memcmp(in, back, len)) return 21;
    dlt_free_ManualTransformBuilder(recipe);

    /* BC3 auto through the 3-knob entry point */
    int sa = -1, sc = -1;
    if (dlt_bc3_transform_auto(in, out, len2, &ltu, 0, &variant, &sa, &sc)) return 22;
    {
        extern int dlt_bc3_untransform(const uint8_t*, uint8_t*, size_t, int, int, int);
        if (dlt_bc3_untransform(out, back, len2, variant, sa, sc)) return 23;
        if (memcmp(in, back, len2)) { fprintf(stderr, "bc3 auto roundtrip mismatch\n"); return 24; }
    }

    /* DDS parse: synthesize a minimal legacy BC1 header */
    {
        uint8_t hdr[0x80 + 32];
        memset(hdr, 0, sizeof hdr);
        uint32_t magic = 0x20534444u, hsz = 124, flags = 0x21007u; /* CAPS|HEIGHT|WIDTH|PIXELFORMAT|MIPMAPCOUNT */
        uint32_t h = 8, w = 16, mips = 2, pfsize = 32, pfflags = 0x4, fourcc = 0x31545844u;
        memcpy(hdr + 0x00, &magic, 4);
        memcpy(hdr + 0x04, &hsz, 4);
        memcpy(hdr + 0x08, &flags, 4);
        memcpy(hdr + 0x0C, &h, 4);
        memcpy(hdr + 0x10, &w, 4);
        memcpy(hdr + 0x1C, &mips, 4);
        memcpy(hdr + 0x4C, &pfsize, 4);
        memcpy(hdr + 0x50, &pfflags, 4);
        memcpy(hdr + 0x54, &fourcc, 4);
        if (!dlt_is_dds(hdr, sizeof hdr)) return 25;
        DltDdsInfo info;
        if (dlt_parse_dds(hdr, sizeof hdr, &info)) return 26;
        /* mip0: 4x2 blocks * 8 = 64; mip1: 2x1 * 8 = 16 */
        if (info.format != 2 || info.data_offset != 0x80 || info.data_length != 80) {
            fprintf(stderr, "dds parse: fmt=%d off=%u len=%u\n", info.format,
                    info.data_offset, info.data_length);
            return 27;
        }
        hdr[0] = 'X';
        if (dlt_is_dds(hdr, sizeof hdr)) return 28;
    }

    printf("vtable + builder + dds C API ok (picked variant=%d split=%d)\n",
           variant, split);
    free(in); free(out); free(back);
    return 0;
}
