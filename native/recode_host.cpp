// Native host kernels for pyrecode_tpu.
//
// TPU-native framework counterpart of the reference's CPython extension
// `c_recode` (pyrecode/pyrecode.cpp + c_extensions/reader.h): the decode and
// bit-packing hot loops that run on the *host* side of the pipeline (the
// device side is Pallas/XLA).  Fresh implementation, word-oriented instead of
// the reference's per-bit loops:
//
//  * unpack_frame_sparse: scan the bit-packed binary map 64 bits at a time,
//    using count-trailing-zeros to jump between set bits; intensities are
//    extracted with unaligned 64-bit window reads.
//  * bit_pack_u16 / bit_unpack_u64: LSB-first b-bit streams via a 64-bit
//    shift register (one store per 8 output bytes instead of per bit).
//
// Wire format identical to reader.h:10-140 (LSB-first everywhere).
//
// Build: g++ -O3 -march=native -shared -fPIC recode_host.cpp -o librecode_host.so

#include <cstdint>
#include <cstring>

#if defined(_MSC_VER)
#include <intrin.h>
static inline int ctz64(uint64_t x) { unsigned long i; _BitScanForward64(&i, x); return (int)i; }
#else
static inline int ctz64(uint64_t x) { return __builtin_ctzll(x); }
#endif

static inline uint64_t load_le64(const uint8_t *p) {
    uint64_t v;
    std::memcpy(&v, p, sizeof(v));
    return v;  // little-endian hosts only (x86/arm64)
}

extern "C" {

// Decode one frame's packed streams into sparse (row, col, value) u64 triplets.
// bitmap: ceil(n_pixels/8) bytes, row-major LSB-first.
// pixvals: bit_depth-bit LSB-first stream (may be null for levels 2-4, where
// the emitted value is 1, matching reader.h:39-41).
// out: capacity >= 3 * n_foreground u64.  Returns the foreground count.
int64_t unpack_frame_sparse(uint32_t ny, uint32_t nx, uint8_t bit_depth,
                            const uint8_t *bitmap, const uint8_t *pixvals,
                            uint64_t *out, int32_t reduction_level) {
    const uint64_t n_pixels = (uint64_t)ny * nx;
    const uint64_t n_words = n_pixels / 64;
    const uint64_t mask_val = bit_depth >= 64 ? ~0ULL : ((1ULL << bit_depth) - 1);
    const int with_values = (reduction_level == 1) && pixvals != nullptr;

    uint64_t n_fg = 0;
    uint64_t *o = out;

    auto emit_range = [&](uint64_t word, uint64_t base) {
        while (word) {
            const int bit = ctz64(word);
            word &= word - 1;
            const uint64_t idx = base + (uint64_t)bit;
            uint64_t value = 1;
            if (with_values) {
                const uint64_t bitpos = n_fg * bit_depth;
                // unaligned 64-bit window covers any <=57-bit value at any
                // bit offset; bit_depth <= 56 guaranteed by the container
                const uint64_t window = load_le64(pixvals + (bitpos >> 3));
                value = (window >> (bitpos & 7)) & mask_val;
            }
            o[0] = idx / nx;
            o[1] = idx % nx;
            o[2] = value;
            o += 3;
            ++n_fg;
        }
    };

    uint64_t w = 0;
    for (; w < n_words; ++w) {
        const uint64_t word = load_le64(bitmap + w * 8);
        if (word) emit_range(word, w * 64);
    }
    // tail (< 64 pixels): assemble the remaining bytes
    const uint64_t tail_pixels = n_pixels - n_words * 64;
    if (tail_pixels) {
        uint64_t word = 0;
        const uint64_t tail_bytes = (tail_pixels + 7) / 8;
        for (uint64_t b = 0; b < tail_bytes; ++b)
            word |= (uint64_t)bitmap[n_words * 8 + b] << (8 * b);
        if (tail_pixels < 64) word &= (1ULL << tail_pixels) - 1;
        if (word) emit_range(word, n_words * 64);
    }
    return (int64_t)n_fg;
}

// Pack n u16 values into a bit_depth-bit LSB-first stream.
// out must hold ceil(n * bit_depth / 8) bytes (zero-fill not required).
void bit_pack_u16(const uint16_t *vals, uint64_t n, uint8_t bit_depth, uint8_t *out) {
    uint64_t reg = 0;   // shift register, LSB = next output bit
    uint32_t fill = 0;  // bits currently in the register
    uint8_t *p = out;
    const uint64_t vmask = (bit_depth >= 16) ? 0xFFFFULL : ((1ULL << bit_depth) - 1);
    for (uint64_t i = 0; i < n; ++i) {
        reg |= ((uint64_t)vals[i] & vmask) << fill;
        fill += bit_depth;
        while (fill >= 8) {
            *p++ = (uint8_t)reg;
            reg >>= 8;
            fill -= 8;
        }
    }
    if (fill) *p++ = (uint8_t)reg;
}

// Unpack n bit_depth-bit values from an LSB-first stream into u64s.
void bit_unpack_u64(const uint8_t *packed, uint64_t n, uint8_t bit_depth, uint64_t *out) {
    const uint64_t mask_val = bit_depth >= 64 ? ~0ULL : ((1ULL << bit_depth) - 1);
    for (uint64_t i = 0; i < n; ++i) {
        const uint64_t bitpos = i * bit_depth;
        const uint64_t window = load_le64(packed + (bitpos >> 3));
        out[i] = (window >> (bitpos & 7)) & mask_val;
    }
}

// Pack a 0/1 byte mask into bits (LSB-first per byte).
void pack_mask(const uint8_t *mask, uint64_t n_pixels, uint8_t *out) {
    const uint64_t n_bytes = (n_pixels + 7) / 8;
    for (uint64_t b = 0; b < n_bytes; ++b) {
        uint8_t byte = 0;
        const uint64_t base = b * 8;
        const uint32_t lim = (uint32_t)((n_pixels - base) < 8 ? (n_pixels - base) : 8);
        for (uint32_t k = 0; k < lim; ++k)
            byte |= (mask[base + k] != 0) << k;
        out[b] = byte;
    }
}

}  // extern "C"
