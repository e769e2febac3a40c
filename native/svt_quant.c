/* Batched AV1 quantize+dequantize fast path.
 *
 * Bit-exact twin of svt_av1_tpu.ops.quant.quantize (the reference's
 * quantize_b_helper path, EbFullLoop.c:46): same zbin gate, Q16
 * reciprocal multiply, and normative dequant. The Python caller
 * pre-applies ROUND_POWER_OF_TWO(log_scale) to zbin/round.
 */

#include <stdint.h>
#include <stdlib.h>

/* coeff: [b, n] raster int32; scan: [n] raster positions in scan order.
 * Writes qcoeff/dqcoeff [b, n] raster and eob [b] (scan-order units,
 * 0 = all zero). Returns 0, or -1 on bad dims. */
int svt_quantize_b(const int32_t *coeff, int b, int n,
                   const int32_t *scan,
                   int zbin_dc, int zbin_ac, int rnd_dc, int rnd_ac,
                   int quant_dc, int quant_ac, int shift_dc, int shift_ac,
                   int deq_dc, int deq_ac, int log_scale,
                   int32_t *qcoeff, int32_t *dqcoeff, int32_t *eob) {
  if (b < 0 || n <= 0 || n > 64 * 64) return -1;
  const int rshift = 16 - log_scale;
  for (int i = 0; i < b; i++) {
    const int32_t *c = coeff + (int64_t)i * n;
    int32_t *q = qcoeff + (int64_t)i * n;
    int32_t *dq = dqcoeff + (int64_t)i * n;
    for (int j = 0; j < n; j++) {
      const int is_dc = (j == 0);
      const int zbin = is_dc ? zbin_dc : zbin_ac;
      const int64_t v = c[j];
      const int64_t a = v < 0 ? -v : v;
      int64_t t32 = 0;
      if (a >= zbin) {
        int64_t tmp = a + (is_dc ? rnd_dc : rnd_ac);
        if (tmp > 32767) tmp = 32767;
        const int64_t quant = is_dc ? quant_dc : quant_ac;
        const int64_t qsh = is_dc ? shift_dc : shift_ac;
        t32 = ((((tmp * quant) >> 16) + tmp) * qsh) >> rshift;
      }
      const int64_t deq = is_dc ? deq_dc : deq_ac;
      if (v < 0) {
        q[j] = (int32_t)(-t32);
        dq[j] = (int32_t)(-((t32 * deq) >> log_scale));
      } else {
        q[j] = (int32_t)t32;
        dq[j] = (int32_t)((t32 * deq) >> log_scale);
      }
    }
    int e = 0;
    for (int k = n - 1; k >= 0; k--) {
      if (q[scan[k]] != 0) { e = k + 1; break; }
    }
    eob[i] = e;
  }
  return 0;
}
