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

    printf("vtable auto-search ok (picked variant=%d split=%d)\n", variant, split);
    free(in); free(out); free(back);
    return 0;
}
