"""Host-side bit emission utilities.

The production encode path packs entropy-coded bits on the TPU (see
`sjpeg_tpu.ops.pack`); this module provides the host-side equivalents used by
the NumPy specification oracle, the header writers, and the final stitch:

- `BitWriter`: MSB-first accumulator with JPEG 0xFF byte-stuffing
  (behavioral contract of reference src/bit_writer.h:99-139, bit_writer.cc:98-107)
- `stuff_bytes`: vectorized 0xFF -> 0xFF 0x00 expansion of an already-packed
  entropy segment.
"""

import numpy as np


class BitWriter:
    """MSB-first bit writer with 0xFF byte-stuffing on the entropy stream."""

    def __init__(self):
        self._bytes = bytearray()
        self._acc = 0       # accumulator holding (nbits) pending bits
        self._nbits = 0

    def put_bits(self, bits: int, n: int) -> None:
        """Append the low `n` bits of `bits` (n <= 24)."""
        if n == 0:
            return
        self._acc = (self._acc << n) | (bits & ((1 << n) - 1))
        self._nbits += n
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self._bytes.append(b)
            if b == 0xFF:          # JPEG byte-stuffing
                self._bytes.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def put_packed_code(self, packed: int) -> None:
        """Append a `(code << 16) | length` packed Huffman code."""
        self.put_bits(packed >> 16, packed & 0xFF)

    def flush(self) -> None:
        """Pad with '1' bits to the next byte boundary."""
        pad = (-self._nbits) & 7
        if pad:
            self.put_bits((1 << pad) - 1, pad)
        assert self._nbits == 0

    def get_bytes(self) -> bytes:
        assert self._nbits == 0, "flush() before reading bytes"
        return bytes(self._bytes)

    @property
    def bit_count(self) -> int:
        return 8 * len(self._bytes) + self._nbits


def stuff_bytes(raw: np.ndarray) -> bytes:
    """Insert a 0x00 after every 0xFF byte of `raw` (uint8 array)."""
    raw = np.asarray(raw, dtype=np.uint8)
    ff = raw == 0xFF
    n_ff = int(np.count_nonzero(ff))
    if n_ff == 0:
        return raw.tobytes()
    out = np.zeros(raw.size + n_ff, dtype=np.uint8)
    # destination index of each source byte: shifted down by the number of
    # 0xFF bytes seen before it
    dst = np.arange(raw.size, dtype=np.int64) + np.cumsum(ff) - ff
    out[dst] = raw
    return out.tobytes()


def pack_bits_to_bytes(words: np.ndarray, total_bits: int) -> np.ndarray:
    """Convert a uint32 MSB-first word stream into its uint8 byte stream.

    `words` hold the entropy bits MSB-first; `total_bits` is the exact bit
    length.  Trailing bits up to the next byte boundary must already contain
    the '1' padding (or be dealt with by the caller).
    """
    n_bytes = (total_bits + 7) // 8
    b = words.astype('>u4').view(np.uint8)
    return b[:n_bytes]
