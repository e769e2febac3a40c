/* C stand-ins for the 9 yasm .asm files (yasm/nasm absent in this
 * environment). Each stub delegates to the _c twin from
 * aom_dsp_rtcd.h or re-implements the trivial kernel; semantics are
 * identical, only speed differs (noted in BASELINE.md). */
#include <stdint.h>
#include <stddef.h>
#include "EbDefinitions.h"
#include "aom_dsp_rtcd.h"

void RunEmms(void) {}

uint32_t Log2f_SSE2(uint32_t x) {
    uint32_t log = 0;
    while (x >>= 1) ++log;
    return log;
}

void PictureCopyKernel_SSE2(EbByte src, uint32_t src_stride, EbByte dst,
                            uint32_t dst_stride, uint32_t w, uint32_t h) {
    for (uint32_t j = 0; j < h; ++j)
        for (uint32_t i = 0; i < w; ++i)
            dst[j * dst_stride + i] = src[j * src_stride + i];
}

void PictureAverageKernel_SSE2(EbByte src0, uint32_t s0, EbByte src1,
                               uint32_t s1, EbByte dst, uint32_t ds,
                               uint32_t w, uint32_t h) {
    for (uint32_t j = 0; j < h; ++j)
        for (uint32_t i = 0; i < w; ++i)
            dst[j * ds + i] =
                (uint8_t)((src0[j * s0 + i] + src1[j * s1 + i] + 1) >> 1);
}

#define ZOC(name) \
    void name(int16_t *buf, uint32_t stride, uint32_t origin, \
              uint32_t w, uint32_t h) { \
        for (uint32_t j = 0; j < h; ++j) \
            for (uint32_t i = 0; i < w; ++i) \
                buf[origin + j * stride + i] = 0; \
    }
ZOC(ZeroOutCoeff4x4_SSE)
ZOC(ZeroOutCoeff8x8_SSE2)
ZOC(ZeroOutCoeff16x16_SSE2)
ZOC(ZeroOutCoeff32x32_SSE2)

#define PRED8(kind, n) \
    void aom_##kind##_predictor_##n##x##n##_sse2( \
        uint8_t *dst, ptrdiff_t stride, const uint8_t *above, \
        const uint8_t *left) { \
        aom_##kind##_predictor_##n##x##n##_c(dst, stride, above, left); \
    }
PRED8(dc, 4) PRED8(dc, 8) PRED8(dc, 16)
PRED8(dc_128, 4) PRED8(dc_128, 8) PRED8(dc_128, 16)
PRED8(dc_left, 4) PRED8(dc_left, 8) PRED8(dc_left, 16)
PRED8(dc_top, 4) PRED8(dc_top, 8) PRED8(dc_top, 16)
PRED8(h, 4) PRED8(h, 8) PRED8(h, 16)
PRED8(v, 4) PRED8(v, 8) PRED8(v, 16)

#define PRED16(kind, n) \
    void aom_highbd_##kind##_predictor_##n##x##n##_sse2( \
        uint16_t *dst, ptrdiff_t stride, const uint16_t *above, \
        const uint16_t *left, int32_t bd) { \
        aom_highbd_##kind##_predictor_##n##x##n##_c(dst, stride, above, \
                                                    left, bd); \
    }
PRED16(dc, 4) PRED16(dc, 8)
PRED16(v, 4) PRED16(v, 8)

#define HBVAR(n) \
    uint32_t aom_highbd_calc##n##x##n##var_sse2( \
        const uint16_t *src, int32_t src_stride, const uint16_t *ref, \
        int32_t ref_stride, uint32_t *sse, int32_t *sum) { \
        int64_t s = 0, ss = 0; \
        for (int j = 0; j < n; ++j) \
            for (int i = 0; i < n; ++i) { \
                const int d = src[j * src_stride + i] \
                    - ref[j * ref_stride + i]; \
                s += d; ss += (int64_t)d * d; \
            } \
        *sum = (int32_t)s; \
        *sse = (uint32_t)ss; \
        return (uint32_t)(ss - ((s * s) / (n * n))); \
    }
HBVAR(8)
HBVAR(16)
