/* lz4t_native: host-side native helpers for the tpu-lz4 framework.
 *
 * Fast XXH32/XXH64 (one-shot) used for frame checksums on the host path
 * (CLI, fixture generation, bench verification).  Implemented from the
 * public xxHash algorithm definition; validated bit-exactly against the
 * Python oracle and the reference library in tests.
 *
 * Built as a plain shared library (no Python.h) and bound via ctypes, so
 * it needs no Python dev headers.
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

#define P32_1 2654435761u
#define P32_2 2246822519u
#define P32_3 3266489917u
#define P32_4 668265263u
#define P32_5 374761393u

#define P64_1 11400714785074694791ull
#define P64_2 14029467366897019727ull
#define P64_3 1609587929392839161ull
#define P64_4 9650029242287828579ull
#define P64_5 2870177450012600261ull

static inline uint32_t rotl32(uint32_t x, int r) {
    return (x << r) | (x >> (32 - r));
}
static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}
static inline uint32_t read32(const uint8_t *p) {
    uint32_t v;
    memcpy(&v, p, 4);
    return v; /* little-endian hosts only (x86-64/arm64) */
}
static inline uint64_t read64(const uint8_t *p) {
    uint64_t v;
    memcpy(&v, p, 8);
    return v;
}

uint32_t lz4t_xxh32(const uint8_t *p, size_t len, uint32_t seed) {
    const uint8_t *end = p + len;
    uint32_t h;
    if (len >= 16) {
        uint32_t v1 = seed + P32_1 + P32_2;
        uint32_t v2 = seed + P32_2;
        uint32_t v3 = seed;
        uint32_t v4 = seed - P32_1;
        const uint8_t *lim = end - 16;
        do {
            v1 = rotl32(v1 + read32(p) * P32_2, 13) * P32_1; p += 4;
            v2 = rotl32(v2 + read32(p) * P32_2, 13) * P32_1; p += 4;
            v3 = rotl32(v3 + read32(p) * P32_2, 13) * P32_1; p += 4;
            v4 = rotl32(v4 + read32(p) * P32_2, 13) * P32_1; p += 4;
        } while (p <= lim);
        h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
    } else {
        h = seed + P32_5;
    }
    h += (uint32_t)len;
    while (p + 4 <= end) {
        h = rotl32(h + read32(p) * P32_3, 17) * P32_4;
        p += 4;
    }
    while (p < end) {
        h = rotl32(h + (*p) * P32_5, 11) * P32_1;
        p++;
    }
    h ^= h >> 15; h *= P32_2;
    h ^= h >> 13; h *= P32_3;
    h ^= h >> 16;
    return h;
}

uint64_t lz4t_xxh64(const uint8_t *p, size_t len, uint64_t seed) {
    const uint8_t *end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + P64_1 + P64_2;
        uint64_t v2 = seed + P64_2;
        uint64_t v3 = seed;
        uint64_t v4 = seed - P64_1;
        const uint8_t *lim = end - 32;
        do {
            v1 = rotl64(v1 + read64(p) * P64_2, 31) * P64_1; p += 8;
            v2 = rotl64(v2 + read64(p) * P64_2, 31) * P64_1; p += 8;
            v3 = rotl64(v3 + read64(p) * P64_2, 31) * P64_1; p += 8;
            v4 = rotl64(v4 + read64(p) * P64_2, 31) * P64_1; p += 8;
        } while (p <= lim);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h = (h ^ (rotl64(v1 * P64_2, 31) * P64_1)) * P64_1 + P64_4;
        h = (h ^ (rotl64(v2 * P64_2, 31) * P64_1)) * P64_1 + P64_4;
        h = (h ^ (rotl64(v3 * P64_2, 31) * P64_1)) * P64_1 + P64_4;
        h = (h ^ (rotl64(v4 * P64_2, 31) * P64_1)) * P64_1 + P64_4;
    } else {
        h = seed + P64_5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h = (rotl64(h ^ (rotl64(read64(p) * P64_2, 31) * P64_1), 27)
             * P64_1) + P64_4;
        p += 8;
    }
    if (p + 4 <= end) {
        h = (rotl64(h ^ (read32(p) * P64_1), 23) * P64_2) + P64_3;
        p += 4;
    }
    while (p < end) {
        h = rotl64(h ^ ((*p) * P64_5), 11) * P64_1;
        p++;
    }
    h ^= h >> 33; h *= P64_2;
    h ^= h >> 29; h *= P64_3;
    h ^= h >> 32;
    return h;
}
