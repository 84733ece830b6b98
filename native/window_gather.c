/* Native batch window gather for the packed-int16 dataset.
 *
 * Rationale (SURVEY.md §2.0): the reference is 100% Python — it has NO
 * native components, so the rebuild owes no 1:1 ports.  This small C
 * library covers the one host-side hot path the TPU input pipeline has:
 * slicing B random windows out of the packed memmap into a contiguous
 * batch.  Doing it in C (a) removes the per-row Python/numpy dispatch and
 * (b) releases the GIL for the whole gather (see data/native.py), letting
 * the loader's producer thread overlap device compute cleanly.
 *
 * Build: cc -O3 -shared -fPIC -o libwindow_gather.so window_gather.c
 * (ae_wavenet_tpu.data.native builds it on demand and falls back to numpy
 * when no compiler is available.)
 */

#include <stdint.h>
#include <string.h>

void gather_windows_i16(
    const int16_t *data,      /* packed samples */
    const int64_t *offsets,   /* [n] window start indices */
    int64_t n,                /* batch size */
    int64_t w,                /* window length */
    int16_t *out              /* [n * w] output */
) {
    for (int64_t i = 0; i < n; ++i) {
        memcpy(out + i * w, data + offsets[i], (size_t)w * sizeof(int16_t));
    }
}

/* mu-law encode int16 PCM to uint8 ids on the host (optional CPU-side
 * fallback path; the on-device encoder is the default). */
#include <math.h>
void mu_encode_i16(const int16_t *x, int64_t n, uint8_t *out) {
    const double mu = 255.0;
    const double log1p_mu = log1p(mu);
    for (int64_t i = 0; i < n; ++i) {
        double v = (double)x[i] / 32768.0;
        double s = v < 0 ? -1.0 : 1.0;
        /* same op order as mu_encode_np (division, not reciprocal-multiply)
         * so results are bit-identical, not merely within 1 ulp */
        double y = s * (log1p(mu * fabs(v)) / log1p_mu);
        double q = (y + 1.0) * 0.5 * mu;
        /* round-to-nearest-even to stay bit-identical with the numpy
         * (np.rint) and jax (jnp.round) encoders on exact-tie inputs;
         * lround's half-away-from-zero differed by one class there. */
        long r = (long)rint(q);
        if (r < 0) r = 0;
        if (r > 255) r = 255;
        out[i] = (uint8_t)r;
    }
}
