/* Native FITS payload decoder.
 *
 * Decodes big-endian FITS payloads (BITPIX 8/16/32/64/-32/-64) to float32
 * with v = raw*bscale + bzero, and computes min/max/sum in the same pass.
 * This is the TPU build's replacement for the reference's streaming decoders
 * (reference: internal/fits/read.go:176-443) on the host ingest path, where
 * Python-side numpy needs two passes and an extra copy. OpenMP-parallel.
 *
 * Exposed with a plain C ABI and loaded via ctypes (no CPython API needed).
 */

#include <stdint.h>
#include <string.h>
#include <math.h>

#ifdef _OPENMP
#include <omp.h>
#endif

static inline uint16_t be16(const uint8_t *p) {
    return (uint16_t)((p[0] << 8) | p[1]);
}
static inline uint32_t be32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}
static inline uint64_t be64(const uint8_t *p) {
    return ((uint64_t)be32(p) << 32) | (uint64_t)be32(p + 4);
}

#define DECODE_LOOP(EXPR)                                                     \
    _Pragma("omp parallel for reduction(min:vmin) reduction(max:vmax) reduction(+:sum)") \
    for (long i = 0; i < n; i++) {                                            \
        float v = (EXPR) * bscale + bzero;                                    \
        out[i] = v;                                                           \
        if (v < vmin) vmin = v;                                               \
        if (v > vmax) vmax = v;                                               \
        sum += (double)v;                                                     \
    }

/* Returns 0 on success, -1 on unknown bitpix. stats = {min, max}; sump = sum. */
int nl_fits_decode(const uint8_t *raw, int bitpix, long n, float bscale, float bzero,
                   float *out, float *stats, double *sump) {
    float vmin = INFINITY, vmax = -INFINITY;
    double sum = 0.0;

    switch (bitpix) {
    case 8:
        DECODE_LOOP((float)raw[i])
        break;
    case 16:
        DECODE_LOOP((float)(int16_t)be16(raw + 2 * i))
        break;
    case 32:
        DECODE_LOOP((float)(int32_t)be32(raw + 4 * i))
        break;
    case 64:
        DECODE_LOOP((float)(int64_t)be64(raw + 8 * i))
        break;
    case -32: {
        _Pragma("omp parallel for reduction(min:vmin) reduction(max:vmax) reduction(+:sum)")
        for (long i = 0; i < n; i++) {
            uint32_t bits = be32(raw + 4 * i);
            float f;
            memcpy(&f, &bits, 4);
            float v = f * bscale + bzero;
            out[i] = v;
            if (v < vmin) vmin = v;
            if (v > vmax) vmax = v;
            sum += (double)v;
        }
        break;
    }
    case -64: {
        _Pragma("omp parallel for reduction(min:vmin) reduction(max:vmax) reduction(+:sum)")
        for (long i = 0; i < n; i++) {
            uint64_t bits = be64(raw + 8 * i);
            double f;
            memcpy(&f, &bits, 8);
            float v = (float)f * bscale + bzero;
            out[i] = v;
            if (v < vmin) vmin = v;
            if (v > vmax) vmax = v;
            sum += (double)v;
        }
        break;
    }
    default:
        return -1;
    }
    stats[0] = vmin;
    stats[1] = vmax;
    *sump = sum;
    return 0;
}

/* Encode float32 array to big-endian bytes, replacing NaNs with zeros
 * (reference: internal/fits/write.go:182-215). */
void nl_fits_encode(const float *data, long n, uint8_t *out) {
    _Pragma("omp parallel for")
    for (long i = 0; i < n; i++) {
        float v = data[i];
        if (isnan(v)) v = 0.0f;
        uint32_t bits;
        memcpy(&bits, &v, 4);
        out[4 * i + 0] = (uint8_t)(bits >> 24);
        out[4 * i + 1] = (uint8_t)(bits >> 16);
        out[4 * i + 2] = (uint8_t)(bits >> 8);
        out[4 * i + 3] = (uint8_t)bits;
    }
}
