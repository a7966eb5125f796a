// Native host-side helpers for the TPU encode engine.
//
// The TPU produces compacted entropy bit-streams (uint32 words, MSB-first)
// plus exact bit counts; everything after that is byte shuffling on the
// host: 0xFF stuffing, barrel-shift merging of shard streams, and final
// scan assembly.  These passes are memory-bound and sit on the serving
// path, so they are implemented natively (the Python/NumPy fallbacks in
// sjpeg_tpu.bitio remain for environments without a C++ toolchain).
//
// Build: `make -C native` (produces libsjpeg_native.so, loaded via ctypes).

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// Expand a raw byte stream with JPEG 0xFF byte stuffing.  `out` must hold
// at least in_size * 2 bytes.  Returns the number of bytes written.
size_t sjpeg_stuff_bytes(const uint8_t* in, size_t in_size, uint8_t* out) {
  size_t o = 0;
  size_t i = 0;
  // fast path: scan for 0xFF in word-sized gulps, memcpy clean runs
  while (i < in_size) {
    size_t run = i;
    while (run + 8 <= in_size) {
      uint64_t w;
      memcpy(&w, in + run, 8);
      // detect any 0xFF byte: (w & 0x80...) of (w + 0x0101..) trick is for
      // zero bytes; for 0xFF test ~w for zero bytes.
      uint64_t x = ~w;
      if ((x - 0x0101010101010101ULL) & ~x & 0x8080808080808080ULL) break;
      run += 8;
    }
    while (run < in_size && in[run] != 0xFF) ++run;
    memcpy(out + o, in + i, run - i);
    o += run - i;
    i = run;
    if (i < in_size) {          // in[i] == 0xFF
      out[o++] = 0xFF;
      out[o++] = 0x00;
      ++i;
    }
  }
  return o;
}

// Convert big-endian uint32 words into a byte stream with final '1'-bit
// padding and 0xFF stuffing, all in one pass.  `total_bits` is the exact
// stream length; `out` must hold at least (total_bits / 8 + 2) * 2 bytes.
// Returns bytes written.
size_t sjpeg_words_to_scan(const uint32_t* words, size_t total_bits,
                           uint8_t* out) {
  const size_t n_bytes = (total_bits + 7) / 8;
  size_t o = 0;
  for (size_t b = 0; b < n_bytes; ++b) {
    uint32_t w = words[b / 4];
    uint8_t byte = (uint8_t)(w >> (24 - 8 * (b % 4)));
    if (b == n_bytes - 1) {
      const unsigned pad = (unsigned)(8 - (total_bits % 8)) % 8;
      byte |= (uint8_t)((1u << pad) - 1);
    }
    out[o++] = byte;
    if (byte == 0xFF) out[o++] = 0x00;
  }
  return o;
}

// Merge S bit streams (each: words[i] = big-endian uint32 chunk stream,
// bit_lens[i] bits long, stride `words_stride` uint32s apart) into `out`
// (uint32 words, caller-zeroed, large enough for the sum of lengths).
// Returns the total bit count.
uint64_t sjpeg_merge_streams(const uint32_t* words, size_t words_stride,
                             const int32_t* bit_lens, size_t n_streams,
                             uint32_t* out) {
  uint64_t pos = 0;
  for (size_t s = 0; s < n_streams; ++s) {
    const uint32_t* src = words + s * words_stride;
    const int64_t len = bit_lens[s];
    const unsigned shift = (unsigned)(pos & 31);
    size_t q = (size_t)(pos >> 5);
    const size_t n_words = (size_t)((len + 31) / 32);
    if (shift == 0) {
      for (size_t j = 0; j < n_words; ++j) out[q + j] |= src[j];
    } else {
      for (size_t j = 0; j < n_words; ++j) {
        const uint32_t w = src[j];
        out[q + j] |= w >> shift;
        out[q + j + 1] |= w << (32 - shift);
      }
    }
    pos += (uint64_t)len;
  }
  return pos;
}


// Huffman merge: code lengths from symbol frequencies, mirroring
// sjpeg_tpu.huffman.build_optimal_table's Python merge loop exactly
// (sorted-key list with tie-breaking indices, a fake lowest-frequency
// symbol at index `size` for the forbidden all-ones code, subtree-member
// traversal on every merge).  Only the O(n^2)-ish merge runs natively;
// the bits histogram / counting sort / <=16-bit rebalance stay in Python.
// freq: uint64[size]; codesizes: int32[size + 1] (zero-initialized here).
void sjpeg_huffman_codesizes(const uint64_t* freq, int size,
                             int32_t* codesizes) {
  // keys sorted decreasing; key = (freq << 9) | index
  uint64_t keys[258];
  int nb = 0;
  for (int i = 0; i < size; ++i) {
    if (freq[i] > 0) keys[nb++] = (freq[i] << 9) | (uint64_t)i;
  }
  // insertion sort, decreasing (n <= 257 — fine)
  for (int i = 1; i < nb; ++i) {
    uint64_t k = keys[i];
    int j = i - 1;
    while (j >= 0 && keys[j] < k) { keys[j + 1] = keys[j]; --j; }
    keys[j + 1] = k;
  }
  keys[nb++] = (1ULL << 9) | (uint64_t)size;   // fake all-ones symbol

  // subtree member lists as singly linked chains per slot index
  int head[257], tail[257], nxt[257];
  for (int i = 0; i <= size; ++i) {
    head[i] = tail[i] = i;
    nxt[i] = -1;
    codesizes[i] = 0;
  }

  while (nb > 1) {
    uint64_t s1 = keys[nb - 2];
    uint64_t s2 = keys[nb - 1];
    int i = (int)(s1 & 0x1FF);
    int j = (int)(s2 & 0x1FF);
    nxt[tail[i]] = head[j];
    tail[i] = tail[j];
    for (int leaf = head[i]; leaf != -1; leaf = nxt[leaf]) {
      codesizes[leaf] += 1;
    }
    uint64_t merged = s1 + (s2 & ~0x1FFULL);
    nb -= 1;
    int k = nb - 1;
    while (k > 0 && keys[k - 1] < merged) {
      keys[k] = keys[k - 1];
      --k;
    }
    keys[k] = merged;
  }
}

}  // extern "C"
