/* Native fast path for the bit-packed wire transport (io/pack.py).
 *
 * The numpy packer runs ~70-230 MB/s on the 1-core host (BASELINE.md
 * round-5): each candidate scan, the delta+zigzag transform, the plane
 * packing, and the exception gather are separate full passes over a
 * multi-hundred-MB group, and on a wire-bound job that CPU shares the
 * single core with FITS decode, so only part of it hides behind uploads
 * draining. These two functions do the same work in a handful of
 * auto-vectorizable passes:
 *
 *   nl_pack_scan  — exception counts for all three candidate widths
 *                   (8/12/14) of BOTH transforms (identity,
 *                   row-delta+zigzag) over the valid rows.
 *   nl_pack_emit  — the low/high bit planes and the exception table for
 *                   the chosen (transform, width).
 *
 * Every hot loop is written without loop-carried dependencies (deltas
 * index row[j]-row[j-1] rather than carrying prev; zigzag is branchless
 * u16 algebra) so gcc -O3 vectorizes them. Bit layouts, zigzag semantics,
 * u16 wraparound deltas with absolute row heads, and row-major exception
 * order are EXACTLY io/pack.py's numpy path; tests pin byte equality.
 * Reference analog: none — the reference streams from local disk
 * (internal/fits/read.go); this transport subsystem is TPU-native.
 */
#include <stdint.h>
#include <stdlib.h>

/* branchless zigzag of the int16 reinterpretation of a u16 delta:
 * (s<<1) ^ (s>>15) with the arithmetic shift expressed as a sign mask */
static inline uint16_t zigzag16(uint16_t d) {
    uint16_t mask = (uint16_t)(0u - (d >> 15));
    return (uint16_t)((uint16_t)(d << 1) ^ mask);
}

void nl_pack_scan(const uint16_t *u, long valid, long p, long w,
                  long *counts_id, long *counts_dl) {
    long cid8 = 0, cid12 = 0, cid14 = 0, cdl8 = 0, cdl12 = 0, cdl14 = 0;
#pragma omp parallel for reduction(+:cid8,cid12,cid14,cdl8,cdl12,cdl14)
    for (long f = 0; f < valid; f++) {
        const uint16_t *fr = u + f * p;
        /* identity candidate: one vectorizable pass over the frame */
        uint32_t a8 = 0, a12 = 0, a14 = 0;
        for (long j = 0; j < p; j++) {
            uint16_t v = fr[j];
            a8 += v >= 256; a12 += v >= 4096; a14 += v >= 16384;
        }
        cid8 += a8; cid12 += a12; cid14 += a14;
        /* delta candidate: per row, head absolute + vectorizable body */
        for (long r = 0; r < p; r += w) {
            const uint16_t *row = fr + r;
            uint16_t zh = zigzag16(row[0]);
            uint32_t b8 = zh >= 256, b12 = zh >= 4096, b14 = zh >= 16384;
            for (long j = 1; j < w; j++) {
                uint16_t zz = zigzag16((uint16_t)(row[j] - row[j - 1]));
                b8 += zz >= 256; b12 += zz >= 4096; b14 += zz >= 16384;
            }
            cdl8 += b8; cdl12 += b12; cdl14 += b14;
        }
    }
    counts_id[0] = cid8; counts_id[1] = cid12; counts_id[2] = cid14;
    counts_dl[0] = cdl8; counts_dl[1] = cdl12; counts_dl[2] = cdl14;
}

/* Emit the packed byte stream (low plane then high plane, io/pack.py
 * _pack_planes layout) and the (index, code) exception list in row-major
 * order. kind: 0 identity, 1 row-delta+zigzag. Returns the exception
 * count, or -1 when it exceeds exc_cap / allocation fails (caller falls
 * back to the numpy path). `buf` must be zeroed and hold
 * n_low + n_hi (+1 pad) bytes. */
long nl_pack_emit(const uint16_t *u, long g, long p, long w,
                  int kind, int k, uint8_t *buf,
                  int32_t *exc_idx, int32_t *exc_val, long exc_cap) {
    long n_low = g * p;
    uint32_t lim = 1u << k;
    uint16_t *tmp = NULL;
    if (kind == 1) {
        tmp = (uint16_t *)malloc((size_t)p * sizeof(uint16_t));
        if (!tmp) return -1;
    }
    long n_exc = 0;
    for (long f = 0; f < g; f++) {
        const uint16_t *fr = u + f * p;
        const uint16_t *codes = fr;
        if (kind == 1) {
            for (long r = 0; r < p; r += w) {
                const uint16_t *row = fr + r;
                tmp[r] = zigzag16(row[0]);
                for (long j = 1; j < w; j++)
                    tmp[r + j] = zigzag16((uint16_t)(row[j] - row[j - 1]));
            }
            codes = tmp;
        }
        uint8_t *low = buf + f * p;
        for (long j = 0; j < p; j++)
            low[j] = (uint8_t)(codes[j] & 0xFF);
        if (k == 12) {
            uint8_t *hi = buf + n_low + f * (p / 2);
            for (long j = 0; j < p / 2; j++) {
                uint8_t h0 = (uint8_t)((codes[2 * j] >> 8) & 0xF);
                uint8_t h1 = (uint8_t)((codes[2 * j + 1] >> 8) & 0xF);
                hi[j] = (uint8_t)(h0 | (h1 << 4));
            }
        } else if (k == 14) {
            uint8_t *hi = buf + n_low + f * (3 * p / 4);
            for (long j = 0; j < p / 4; j++) {
                uint8_t h0 = (uint8_t)((codes[4 * j] >> 8) & 0x3F);
                uint8_t h1 = (uint8_t)((codes[4 * j + 1] >> 8) & 0x3F);
                uint8_t h2 = (uint8_t)((codes[4 * j + 2] >> 8) & 0x3F);
                uint8_t h3 = (uint8_t)((codes[4 * j + 3] >> 8) & 0x3F);
                uint8_t *o = hi + j * 3;
                o[0] = (uint8_t)(h0 | (h1 << 6));
                o[1] = (uint8_t)((h1 >> 2) | (h2 << 4));
                o[2] = (uint8_t)((h2 >> 4) | (h3 << 2));
            }
        }
        /* exceptions: rare, predictable branch over one load pass */
        for (long j = 0; j < p; j++) {
            uint16_t c = codes[j];
            if ((uint32_t)c >= lim) {
                if (n_exc >= exc_cap) { free(tmp); return -1; }
                exc_idx[n_exc] = (int32_t)(f * p + j);
                exc_val[n_exc] = (int32_t)c;
                n_exc++;
            }
        }
    }
    free(tmp);
    return n_exc;
}
