/* Scalar C chunking kernels, the fast path behind cdc/native.py.
 *
 * Semantics are a 1:1 port of cdc/naive.py (itself the transliterated
 * semantic oracle of the reference algorithms:
 *   fastcdc:  chunkers/fastcdc/fastcdc.go:225-253
 *   jc:       chunkers/jc/jc.go:205-244
 *   ultracdc: chunkers/ultracdc/ultracdc.go:101-240
 *   stadia:   chunkers/fastcdc4stadia/fastcdc4stadia.go:77-149
 * ), validated by the 126-case golden suite and the differential matrix vs
 * both naive.py and the numpy kernels. All arithmetic is uint64 with C's
 * natural mod-2^64 wraparound (Go semantics).
 *
 * Each split_* drives the whole stream (chunkers.go:160-232 loop: peek up
 * to max_size, cut, advance), writing chunk lengths into `out` (caller
 * allocates total/min_size + 2 slots) and returning the count.
 */

#include <stdint.h>
#include <string.h>

static inline int64_t imin64(int64_t a, int64_t b) { return a < b ? a : b; }

/* ---------------- FastCDC ---------------- */

static int64_t fastcdc_cut(const uint8_t *d, int64_t n, const uint64_t *g,
                           uint64_t mask_s, uint64_t mask_l,
                           int64_t min_size, int64_t normal_size,
                           int64_t max_size) {
    if (n <= min_size) return n;
    if (n >= max_size) n = max_size;
    else if (n <= normal_size) normal_size = n;
    uint64_t fp = 0, mask = mask_s;
    for (int64_t i = min_size; i < n; i++) {
        if (i == normal_size) mask = mask_l;
        fp = (fp << 1) + g[d[i]];
        if ((fp & mask) == 0) return i;
    }
    return n;
}

int64_t split_fastcdc(const uint8_t *data, int64_t total, const uint64_t *g,
                      uint64_t mask_s, uint64_t mask_l, int64_t min_size,
                      int64_t normal_size, int64_t max_size, int64_t *out) {
    int64_t cnt = 0, pos = 0;
    while (pos < total) {
        int64_t n = imin64(total - pos, max_size);
        int64_t cut = fastcdc_cut(data + pos, n, g, mask_s, mask_l, min_size,
                                  normal_size, max_size);
        out[cnt++] = cut;
        pos += cut;
    }
    return cnt;
}

/* ---------------- JC ---------------- */

static int64_t jc_cut(const uint8_t *d, int64_t n, const uint64_t *g,
                      uint64_t mask_c, uint64_t mask_j, int64_t min_size,
                      int64_t normal_size, int64_t max_size, int64_t jump,
                      int spec) {
    if (spec) {
        if (n >= max_size) n = max_size;
    } else if (n <= normal_size) {
        return n;
    } else if (n >= max_size) {
        n = max_size;
    }
    uint64_t fp = 0;
    int64_t i = min_size;
    while (i < n) {
        fp = (fp << 1) + g[d[i]];
        if ((fp & mask_j) == 0) {
            if ((fp & mask_c) == 0) return i;
            fp = 0;
            i += jump;
        } else {
            i++;
        }
    }
    return imin64(i, n);
}

int64_t split_jc(const uint8_t *data, int64_t total, const uint64_t *g,
                 uint64_t mask_c, uint64_t mask_j, int64_t min_size,
                 int64_t normal_size, int64_t max_size, int64_t jump,
                 int spec, int64_t *out) {
    int64_t cnt = 0, pos = 0;
    while (pos < total) {
        int64_t n = imin64(total - pos, max_size);
        int64_t cut = jc_cut(data + pos, n, g, mask_c, mask_j, min_size,
                             normal_size, max_size, jump, spec);
        out[cnt++] = cut;
        pos += cut;
    }
    return cnt;
}

/* ---------------- UltraCDC ---------------- */

static int64_t ultra_cut(const uint8_t *d, int64_t n, const uint8_t *lut,
                         int64_t min_size, int64_t normal_size,
                         int64_t max_size, uint64_t mask_s, uint64_t mask_l,
                         int64_t lest, int spec) {
    uint64_t mask = mask_s;
    if (n <= min_size) return n;
    if (n >= max_size) n = max_size;
    else if (n <= normal_size) normal_size = n;
    if (n < min_size + 8) return n;

    uint8_t out_win[8];
    memcpy(out_win, d + min_size, 8);
    int64_t dist = 0;
    for (int j = 0; j < 8; j++) dist += lut[out_win[j]];
    int64_t lec = 0;
    int64_t i = min_size + 8;
    while (i <= n - 8) {
        if (i >= normal_size) mask = mask_l;
        if (memcmp(d + i, out_win, 8) == 0) {
            lec++;
            if (lec >= lest) return i + 8;
            i += 8;
            continue;
        }
        lec = 0;
        for (int j = 0; j < 8; j++) {
            if (((uint64_t)dist & mask) == 0) return spec ? i + 8 : i + j;
            dist += (int64_t)lut[d[i + j]] - (int64_t)lut[d[i + j - 8]];
        }
        memcpy(out_win, d + i, 8);
        i += 8;
    }
    return n;
}

int64_t split_ultracdc(const uint8_t *data, int64_t total, const uint8_t *lut,
                       int64_t min_size, int64_t normal_size, int64_t max_size,
                       uint64_t mask_s, uint64_t mask_l, int64_t lest,
                       int spec, int64_t *out) {
    int64_t cnt = 0, pos = 0;
    while (pos < total) {
        int64_t n = imin64(total - pos, max_size);
        int64_t cut = ultra_cut(data + pos, n, lut, min_size, normal_size,
                                max_size, mask_s, mask_l, lest, spec);
        out[cnt++] = cut;
        pos += cut;
    }
    return cnt;
}

/* ---------------- FastCDC4Stadia ---------------- */

static int64_t stadia_cut(const uint8_t *d, int64_t n, const uint64_t *g64,
                          int64_t min_size, int64_t normal_size,
                          int64_t max_size) {
    uint64_t thresh = UINT64_MAX / (uint64_t)(normal_size - min_size + 1);
    if (n <= min_size) return n;
    if (n >= max_size) n = max_size;
    int64_t regression_len = n;
    uint64_t regression_mask = 0;
    uint64_t h = UINT64_MAX;
    int64_t i = (min_size > 64) ? min_size - 64 : 0;
    for (; i < min_size; i++) h = (h << 1) + g64[d[i]];
    for (; i < n; i++) {
        if ((h & regression_mask) == 0) {
            if (h <= thresh) return i;
            regression_len = i;
            regression_mask = UINT64_MAX;
            while (h & regression_mask) regression_mask <<= 1;
        }
        h = (h << 1) + g64[d[i]];
    }
    if (h & regression_mask) return regression_len;
    return i;
}

int64_t split_stadia(const uint8_t *data, int64_t total, const uint64_t *g64,
                     int64_t min_size, int64_t normal_size, int64_t max_size,
                     int64_t *out) {
    int64_t cnt = 0, pos = 0;
    while (pos < total) {
        int64_t n = imin64(total - pos, max_size);
        int64_t cut = stadia_cut(data + pos, n, g64, min_size, normal_size,
                                 max_size);
        out[cnt++] = cut;
        pos += cut;
    }
    return cnt;
}

/* ---------------- poly128 per-chunk digest ---------------- */
/* 128-bit polynomial chunk digest, the cheap non-cryptographic alternative
 * to per-chunk sha256 for the near-dup path (sha256 is 55-79% of total
 * chunking cost at 1 KB chunks; see tools/profile_kernels.py). Two
 * independent odd multipliers, Horner form seeded with 1 so length is
 * encoded:  H_p = p^L + sum_i d[i] * p^(L-1-i)   (mod 2^64).
 * The numpy fallback computes the identical closed form via a per-chunk
 * power-dot (kernels._poly128_numpy); differentially pinned. */
static inline uint64_t poly_step8(uint64_t h, const uint8_t *d,
                                  const uint64_t *pw /* p^1..p^8 */) {
    /* h*p^8 + d0*p^7 + ... + d6*p + d7: the multiplies are independent,
     * so the core pipelines them (the plain Horner loop is a serial
     * multiply chain at ~4 cycles/byte -- measured SLOWER than SHA-NI
     * sha256; this stride form is what makes poly128 worth having). */
    uint64_t acc = h * pw[7];
    acc += (uint64_t)d[0] * pw[6];
    acc += (uint64_t)d[1] * pw[5];
    acc += (uint64_t)d[2] * pw[4];
    acc += (uint64_t)d[3] * pw[3];
    acc += (uint64_t)d[4] * pw[2];
    acc += (uint64_t)d[5] * pw[1];
    acc += (uint64_t)d[6] * pw[0];
    return acc + (uint64_t)d[7];
}

void digest_poly128(const uint8_t *data, int64_t total,
                    const int64_t *lengths, int64_t n_chunks,
                    uint64_t p1, uint64_t p2, uint64_t *out) {
    int64_t pos = 0;
    (void)total;
    uint64_t pw1[8], pw2[8]; /* p^1 .. p^8 */
    pw1[0] = p1;
    pw2[0] = p2;
    for (int k = 1; k < 8; k++) {
        pw1[k] = pw1[k - 1] * p1;
        pw2[k] = pw2[k - 1] * p2;
    }
    for (int64_t c = 0; c < n_chunks; c++) {
        uint64_t h1 = 1, h2 = 1;
        const int64_t e = pos + lengths[c];
        int64_t i = pos;
        for (; i + 8 <= e; i += 8) {
            h1 = poly_step8(h1, data + i, pw1);
            h2 = poly_step8(h2, data + i, pw2);
        }
        for (; i < e; i++) {
            const uint64_t b = data[i];
            h1 = h1 * p1 + b;
            h2 = h2 * p2 + b;
        }
        out[2 * c] = h1;
        out[2 * c + 1] = h2;
        pos = e;
    }
}

/* ---- FLAC entropy fast path (operators/flac.py) ----------------------
   Rice-partition decode and LPC restore are the two genuinely sequential
   loops in FLAC decoding (everything else in operators/flac.py is numpy).
   Semantics are a 1:1 port of the pure-Python reference in flac.py
   (_read_residual's per-code loop and _undo_lpc), which stays as the
   differentially-tested fallback. */

/* Decode n rice(k) codes -- unary quotient (a run of 0 bits terminated
   by a 1) then k fixed bits, zigzag-mapped to signed -- starting at bit
   offset pos of an MSB-first stream holding nbits valid bits. Returns
   the new bit position, or -1 on truncation. */
int64_t rice_decode(const uint8_t *buf, int64_t nbits, int64_t pos,
                    int k, int64_t n, int64_t *out) {
    for (int64_t i = 0; i < n; i++) {
        int64_t q = 0;
        for (;;) {
            if (pos >= nbits) return -1;
            if ((pos & 7) == 0) { /* skip whole zero bytes */
                while (pos + 8 <= nbits && buf[pos >> 3] == 0) {
                    pos += 8;
                    q += 8;
                }
                if (pos >= nbits) return -1;
            }
            int bit = (buf[pos >> 3] >> (7 - (pos & 7))) & 1;
            pos++;
            if (bit) break;
            q++;
        }
        uint64_t v = (uint64_t)q << k;
        if (k) {
            if (pos + k > nbits) return -1;
            uint64_t r = 0;
            int64_t p = pos;
            int rem = k;
            while (rem > 0) {
                int off = (int)(p & 7);
                int take = 8 - off;
                if (take > rem) take = rem;
                uint8_t byte = buf[p >> 3];
                r = (r << take)
                    | (uint64_t)((byte >> (8 - off - take))
                                 & (uint8_t)((1u << take) - 1u));
                p += take;
                rem -= take;
            }
            pos = p;
            v |= r;
        }
        out[i] = (int64_t)(v >> 1) ^ -((int64_t)(v & 1)); /* zigzag */
    }
    return pos;
}

/* In-place LPC restore: out[0..order-1] carries the warmup and
   out[order+i] the residual; coefs_rev is the coefficient vector
   reversed so it aligns with out[i..i+order-1]. gcc's >> on int64 is
   arithmetic, matching Python's floor-shift semantics. */
void lpc_restore(int64_t *out, int64_t n_res, int order,
                 const int64_t *coefs_rev, int shift) {
    for (int64_t i = 0; i < n_res; i++) {
        int64_t acc = 0;
        const int64_t *w = out + i;
        for (int j = 0; j < order; j++)
            acc += w[j] * coefs_rev[j];
        out[order + i] += acc >> shift;
    }
}

/* Table-driven CRC over a byte range (FLAC frame CRC-8 poly 0x07 /
   CRC-16 poly 0x8005; the table is built in Python -- flac.py
   _crc_table -- and passed in, so C holds no codec constants). */
uint32_t crc_bytes(const uint8_t *data, int64_t n, const uint32_t *tab,
                   int width, uint32_t init) {
    uint32_t c = init;
    uint32_t mask = (width >= 32) ? 0xFFFFFFFFu : ((1u << width) - 1u);
    if (width == 8) {
        for (int64_t i = 0; i < n; i++)
            c = tab[(c ^ data[i]) & 0xFFu];
    } else {
        for (int64_t i = 0; i < n; i++)
            c = (tab[((c >> (width - 8)) ^ data[i]) & 0xFFu]
                 ^ (c << 8)) & mask;
    }
    return c & mask;
}
