/* Native butterfly-network executor for the AV1 integer transforms.
 *
 * Runs the extracted stage tables (svt_av1_tpu/ops/data/txfm_networks.npz,
 * pre-resolved to literal weights by the Python side) over [batch, N]
 * int64 rows — the host-path counterpart of the reference's hand-written
 * per-size transform functions (EbTransforms.c av1_fdct*_new /
 * av1_idct*_new). Bit-exact with ops/txfm1d.exec_network: Round2 uses the
 * arithmetic right shift, kind-1 ops round by cos_bit, kind-2 ops clamp
 * to the stage range.
 *
 * Stage encoding (flattened, one entry per output lane per stage):
 *   a[k], b[k]   : input lane indices
 *   w0[k], w1[k] : resolved integer weights
 *   kind[k]      : 0 = linear, 1 = btf (round by cos_bit), 2 = clamp
 */

#include <stdint.h>
#include <string.h>

#define MAX_N 64

static inline int64_t round2(int64_t v, int bit) {
    return (v + ((int64_t)1 << (bit - 1))) >> bit;
}

/* x: [batch * n] row-major; stage tables flattened with n entries per
 * stage. Executes in place. */
void svt_txfm_exec(int64_t *x, int batch, int n, int nstages,
                   const int32_t *a, const int32_t *b,
                   const int64_t *w0, const int64_t *w1,
                   const int8_t *kind, int cos_bit, int clamp_bit) {
    int64_t tmp[MAX_N];
    const int64_t clo = -((int64_t)1 << (clamp_bit - 1));
    const int64_t chi = ((int64_t)1 << (clamp_bit - 1)) - 1;
    for (int r = 0; r < batch; ++r) {
        int64_t *row = x + (size_t)r * n;
        for (int s = 0; s < nstages; ++s) {
            const int32_t *sa = a + (size_t)s * n;
            const int32_t *sb = b + (size_t)s * n;
            const int64_t *s0 = w0 + (size_t)s * n;
            const int64_t *s1 = w1 + (size_t)s * n;
            const int8_t *sk = kind + (size_t)s * n;
            for (int j = 0; j < n; ++j) {
                int64_t t = s0[j] * row[sa[j]] + s1[j] * row[sb[j]];
                if (sk[j] == 1)
                    t = round2(t, cos_bit);
                else if (sk[j] == 2) {
                    if (t < clo) t = clo;
                    else if (t > chi) t = chi;
                }
                tmp[j] = t;
            }
            memcpy(row, tmp, (size_t)n * sizeof(int64_t));
        }
    }
}
