/* Native range coder + coefficient syntax emitter.
 *
 * TPU-native framework's serial entropy stage: the daala od_ec multi-symbol
 * range encoder with CDF adaptation (reference behavior:
 * EbBitstreamUnit.c:98-498), plus the transform-block coefficient writer
 * (Av1WriteCoeffsTxb1D, EbEntropyCoding.c:497-680) as a single C call per
 * txb. Context derivation mirrors the Python oracle in
 * svt_av1_tpu/entropy/coeff_ctx.py (which is itself tested against the spec
 * rules); the Python encoder must produce byte-identical streams through
 * either backend.
 *
 * The caller (Python/ctypes) passes CDF row/base pointers into its own
 * int32 numpy tables, so this file knows no table layouts.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define EC_PROB_SHIFT 6
#define EC_MIN_PROB 4
#define CDF_TOP 32768

#define NUM_BASE_LEVELS 2
#define COEFF_BASE_RANGE 12
#define BR_CDF_SIZE 4
#define COEFF_CONTEXT_BITS 6
#define COEFF_CONTEXT_MASK 63
#define SIG_COEF_CONTEXTS_2D 26

#define TX_CLASS_2D 0
#define TX_CLASS_HORIZ 1
#define TX_CLASS_VERT 2

typedef struct {
  uint64_t low;
  uint32_t rng;
  int cnt;
  uint16_t *precarry;
  int n;
  int cap;
  int err;
} SvtEc;

/* ------------------------- range encoder core ------------------------- */

SvtEc *svt_ec_create(int cap) {
  SvtEc *e = (SvtEc *)malloc(sizeof(SvtEc));
  if (!e) return NULL;
  e->low = 0;
  e->rng = 0x8000;
  e->cnt = -9;
  e->cap = cap > 64 ? cap : 64;
  e->precarry = (uint16_t *)malloc(sizeof(uint16_t) * e->cap);
  e->n = 0;
  e->err = e->precarry ? 0 : 1;
  return e;
}

void svt_ec_free(SvtEc *e) {
  if (e) {
    free(e->precarry);
    free(e);
  }
}

int svt_ec_tell_bits(const SvtEc *e) { return (e->cnt + 10) + e->n * 8; }

static inline void ec_push(SvtEc *e, uint16_t v) {
  if (e->n >= e->cap) {
    e->cap *= 2;
    uint16_t *p = (uint16_t *)realloc(e->precarry, sizeof(uint16_t) * e->cap);
    if (!p) {
      e->err = 1;
      return;
    }
    e->precarry = p;
  }
  e->precarry[e->n++] = v;
}

static inline void ec_norm(SvtEc *e, uint64_t low, uint32_t rng) {
  int d = 16 - (32 - __builtin_clz(rng));
  int c = e->cnt;
  int s = c + d;
  if (s >= 0) {
    c += 16;
    uint64_t m = (1ull << c) - 1;
    if (s >= 8) {
      ec_push(e, (uint16_t)((low >> c) & 0xFFFF));
      low &= m;
      c -= 8;
      m >>= 8;
    }
    ec_push(e, (uint16_t)((low >> c) & 0xFFFF));
    s = c + d - 24;
    low &= m;
  }
  e->low = (low << d) & 0xFFFFFFFFull;
  e->rng = rng << d;
  e->cnt = s;
}

static void cdf_update(int32_t *cdf, int val, int nsyms) {
  static const int speed[17] = {0, 0, 1, 1, 2, 2, 2, 2, 2,
                                2, 2, 2, 2, 2, 2, 2, 2};
  int count = cdf[nsyms];
  int rate = 3 + (count > 15) + (count > 31) + speed[nsyms];
  int tmp = CDF_TOP;
  for (int i = 0; i < nsyms - 1; i++) {
    int cur;
    if (i == val) tmp = 0;
    cur = cdf[i];
    if (tmp < cur)
      cdf[i] = cur - ((cur - tmp) >> rate);
    else
      cdf[i] = cur + ((tmp - cur) >> rate);
  }
  cdf[nsyms] = count + (count < 32);
}

static void ec_symbol_raw(SvtEc *e, int s, const int32_t *icdf, int nsyms) {
  uint32_t fl = s == 0 ? CDF_TOP : (uint32_t)icdf[s - 1];
  uint32_t fh = (uint32_t)icdf[s];
  uint64_t l = e->low;
  uint32_t r = e->rng;
  int n = nsyms - 1;
  if (fl < CDF_TOP) {
    uint32_t u = (((r >> 8) * (fl >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
                 EC_MIN_PROB * (n - (s - 1));
    uint32_t v = (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
                 EC_MIN_PROB * (n - s);
    l += r - u;
    r = u - v;
  } else {
    r -= (((r >> 8) * (fh >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) +
         EC_MIN_PROB * (n - s);
  }
  ec_norm(e, l, r);
}

void svt_ec_symbol(SvtEc *e, int s, int32_t *icdf, int nsyms, int update) {
  ec_symbol_raw(e, s, icdf, nsyms);
  if (update) cdf_update(icdf, s, nsyms);
}

void svt_ec_bool(SvtEc *e, int val, int f_q15) {
  uint64_t l = e->low;
  uint32_t r = e->rng;
  uint32_t v = (((r >> 8) * ((uint32_t)f_q15 >> EC_PROB_SHIFT)) >>
                (7 - EC_PROB_SHIFT)) + EC_MIN_PROB;
  if (val) {
    l += r - v;
    r = v;
  } else {
    r = r - v;
  }
  ec_norm(e, l, r);
}

void svt_ec_literal(SvtEc *e, int value, int nbits) {
  for (int i = nbits - 1; i >= 0; i--) svt_ec_bool(e, (value >> i) & 1, 16384);
}

/* Finalize; returns byte count written to out, or -1 on overflow/error. */
int svt_ec_done(SvtEc *e, uint8_t *out, int out_cap) {
  uint64_t l = e->low;
  int c = e->cnt;
  int s = 10 + c;
  uint64_t m = 0x3FFF;
  uint64_t eb = ((l + m) & ~m) | (m + 1);
  if (s > 0) {
    uint64_t nmask = (1ull << (c + 16)) - 1;
    for (;;) {
      ec_push(e, (uint16_t)((eb >> (c + 16)) & 0xFFFF));
      eb &= nmask;
      s -= 8;
      c -= 8;
      nmask >>= 8;
      if (s <= 0) break;
    }
  }
  if (e->err || e->n > out_cap) return -1;
  {
    uint32_t carry = 0;
    for (int i = e->n - 1; i >= 0; i--) {
      uint32_t v = (uint32_t)e->precarry[i] + carry;
      out[i] = (uint8_t)(v & 0xFF);
      carry = v >> 8;
    }
    if (carry) return -1;
  }
  return e->n;
}

/* --------------------- coefficient context helpers --------------------- */

static inline int lv_at(const uint8_t *lv, int tw, int th, int r, int c) {
  if (r >= th || c >= tw) return 0;
  return lv[r * tw + c];
}

static int nz_ctx(const uint8_t *lv, int tw, int th, int pos, int tx_class,
                  const uint8_t *off2d) {
  int r = pos / tw, c = pos % tw;
  int mag, ctx;
#define L3(dr, dc) \
  (lv_at(lv, tw, th, r + (dr), c + (dc)) > 3 ? 3 \
                                             : lv_at(lv, tw, th, r + (dr), c + (dc)))
  mag = L3(0, 1) + L3(1, 0);
  if (tx_class == TX_CLASS_2D)
    mag += L3(1, 1) + L3(0, 2) + L3(2, 0);
  else if (tx_class == TX_CLASS_VERT)
    mag += L3(2, 0) + L3(3, 0) + L3(4, 0);
  else
    mag += L3(0, 2) + L3(0, 3) + L3(0, 4);
#undef L3
  ctx = (mag + 1) >> 1;
  if (ctx > 4) ctx = 4;
  if (tx_class == TX_CLASS_2D) {
    if (pos == 0) return 0;
    return ctx + off2d[pos];
  }
  {
    int idx = tx_class == TX_CLASS_VERT ? r : c;
    if (idx > 2) idx = 2;
    return ctx + SIG_COEF_CONTEXTS_2D + 5 * idx;
  }
}

static int br_ctx(const uint8_t *lv, int tw, int th, int pos, int tx_class) {
  int r = pos / tw, c = pos % tw;
  int mag = lv_at(lv, tw, th, r, c + 1) + lv_at(lv, tw, th, r + 1, c);
  if (tx_class == TX_CLASS_2D)
    mag += lv_at(lv, tw, th, r + 1, c + 1);
  else if (tx_class == TX_CLASS_VERT)
    mag += lv_at(lv, tw, th, r + 2, c);
  else
    mag += lv_at(lv, tw, th, r, c + 2);
  mag = (mag + 1) >> 1;
  if (mag > 6) mag = 6;
  if (pos == 0) return mag;
  if (tx_class == TX_CLASS_2D) return mag + ((r < 2 && c < 2) ? 7 : 14);
  if (tx_class == TX_CLASS_VERT) return mag + (r == 0 ? 7 : 14);
  return mag + (c == 0 ? 7 : 14);
}

static void write_golomb(SvtEc *e, int level) {
  int x = level + 1;
  int length = 0, i = x;
  while (i) {
    i >>= 1;
    length++;
  }
  for (i = 0; i < length - 1; i++) svt_ec_bool(e, 0, 16384);
  for (i = length - 1; i >= 0; i--) svt_ec_bool(e, (x >> i) & 1, 16384);
}

static const int eob_group_start[12] = {0, 1,  2,  3,  5,   9,
                                        17, 33, 65, 129, 257, 513};
static const int eob_offset_bits[12] = {0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9};

/* ------------------------- txb coefficient writer -------------------------
 * Returns the entropy-context byte (cul_level | dc-sign field); the caller
 * updates neighbor arrays. qcoeff: [th*tw] raster (coded dims).
 */
int32_t svt_write_coeffs_txb(
    SvtEc *e, int update, const int32_t *qcoeff, int tw, int th,
    const int16_t *scan, int tx_class, const uint8_t *off2d,
    int32_t *txb_skip_cdf,                       /* row, 2 syms */
    int32_t *eob_pt_cdf, int eob_pt_nsyms,       /* row */
    int32_t *eob_extra_base,                     /* [12][3] by eob_pt */
    int32_t *coeff_base_eob_base,                /* [4][4] by ctx */
    int32_t *coeff_base_base,                    /* [ctx][5] */
    int32_t *coeff_br_base,                      /* [ctx][5] */
    int32_t *dc_sign_cdf,                        /* row, 2 syms */
    int32_t *tx_type_cdf, int tx_type_nsyms, int tx_type_sym) {
  int n = tw * th;
  int eob = 0;
  uint8_t lv[32 * 32];
  int c, i;

  /* coded dims are clamped to 32x32 by every caller (adjusted_tx_size);
   * reject anything larger to protect the fixed level buffer. */
  if (tw > 32 || th > 32 || n > 32 * 32) return -1;

  for (c = n - 1; c >= 0; c--) {
    if (qcoeff[scan[c]]) {
      eob = c + 1;
      break;
    }
  }

  svt_ec_symbol(e, eob == 0, txb_skip_cdf, 2, update);
  if (eob == 0) return 0;

  if (tx_type_cdf)
    svt_ec_symbol(e, tx_type_sym, tx_type_cdf, tx_type_nsyms, update);

  /* eob position token */
  {
    int eob_pt = 0, eob_extra, bits;
    for (i = 11; i >= 0; i--) {
      if (eob >= eob_group_start[i]) {
        eob_pt = i;
        break;
      }
    }
    eob_extra = eob - eob_group_start[eob_pt];
    svt_ec_symbol(e, eob_pt - 1, eob_pt_cdf, eob_pt_nsyms, update);
    bits = eob_offset_bits[eob_pt];
    if (bits > 0) {
      svt_ec_symbol(e, (eob_extra >> (bits - 1)) & 1,
                    eob_extra_base + eob_pt * 3, 2, update);
      for (i = 1; i < bits; i++)
        svt_ec_bool(e, (eob_extra >> (bits - 1 - i)) & 1, 16384);
    }
  }

  for (i = 0; i < n; i++) {
    int a = qcoeff[i] < 0 ? -qcoeff[i] : qcoeff[i];
    lv[i] = a > 127 ? 127 : a;
  }

  /* base levels, reverse scan */
  for (c = eob - 1; c >= 0; c--) {
    int pos = scan[c];
    int v = qcoeff[pos];
    int level = v < 0 ? -v : v;
    if (c == eob - 1) {
      int ctx = c == 0 ? 0 : (c <= n / 8 ? 1 : (c <= n / 4 ? 2 : 3));
      int s = (level < 3 ? level : 3) - 1;
      svt_ec_symbol(e, s, coeff_base_eob_base + ctx * 4, 3, update);
    } else {
      int ctx = nz_ctx(lv, tw, th, pos, tx_class, off2d);
      int s = level < 3 ? level : 3;
      svt_ec_symbol(e, s, coeff_base_base + ctx * 5, 4, update);
    }
    if (level > NUM_BASE_LEVELS) {
      int base_range = level - 1 - NUM_BASE_LEVELS;
      int bctx = br_ctx(lv, tw, th, pos, tx_class);
      int idx;
      for (idx = 0; idx < COEFF_BASE_RANGE; idx += BR_CDF_SIZE - 1) {
        int k = base_range - idx;
        if (k > BR_CDF_SIZE - 1) k = BR_CDF_SIZE - 1;
        svt_ec_symbol(e, k, coeff_br_base + bctx * 5, BR_CDF_SIZE, update);
        if (k < BR_CDF_SIZE - 1) break;
      }
    }
  }

  /* signs + golomb remainders, forward scan */
  {
    int32_t cul_level = 0;
    int dc = qcoeff[0];
    for (c = 0; c < eob; c++) {
      int pos = scan[c];
      int v = qcoeff[pos];
      int level = v < 0 ? -v : v;
      cul_level += level;
      if (level) {
        int sign = v < 0;
        if (c == 0)
          svt_ec_symbol(e, sign, dc_sign_cdf, 2, update);
        else
          svt_ec_bool(e, sign, 16384);
        if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
          write_golomb(e, level - COEFF_BASE_RANGE - 1 - NUM_BASE_LEVELS);
      }
    }
    if (cul_level > COEFF_CONTEXT_MASK) cul_level = COEFF_CONTEXT_MASK;
    if (dc < 0)
      cul_level |= 1 << COEFF_CONTEXT_BITS;
    else if (dc > 0)
      cul_level += 2 << COEFF_CONTEXT_BITS;
    return cul_level;
  }
}
