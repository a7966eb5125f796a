"""Native C++ host helpers vs NumPy fallbacks."""

import numpy as np
import pytest

from sjpeg_tpu import native
from sjpeg_tpu.bitio import stuff_bytes as py_stuff


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        if not native.build_native():
            pytest.skip("no C++ toolchain available")


def test_stuff_bytes_matches():
    rng = np.random.RandomState(0)
    for _ in range(20):
        raw = rng.randint(0, 256, rng.randint(1, 5000), dtype=np.uint8)
        raw[rng.rand(raw.size) < 0.2] = 0xFF     # force many stuffings
        assert native.stuff_bytes(raw) == py_stuff(raw)


def test_words_to_scan_matches_bitio():
    rng = np.random.RandomState(1)
    for total_bits in [1, 7, 8, 31, 32, 33, 1000, 4096, 4101]:
        n_words = (total_bits + 31) // 32
        words = rng.randint(0, 1 << 32, n_words, dtype=np.uint64).astype(
            np.uint32)
        # zero the bits past total_bits like the device does
        rem = total_bits % 32
        if rem:
            words[-1] &= np.uint32(0xFFFFFFFF) << (32 - rem)
        got = native.words_to_scan(words, total_bits)
        # fallback path
        lib, native._LIB = native._LIB, None
        want = native.words_to_scan(words, total_bits)
        native._LIB = lib
        assert got == want


def test_merge_streams_matches_fallback():
    rng = np.random.RandomState(2)
    S, W = 9, 16
    words = rng.randint(0, 1 << 32, (S, W), dtype=np.uint64).astype(np.uint32)
    lens = rng.randint(0, W * 32, S).astype(np.int32)
    for s in range(S):
        L = int(lens[s])
        full = L // 32
        words[s, full + 1:] = 0
        rem = L % 32
        if full < W:
            if rem:
                words[s, full] &= np.uint32(0xFFFFFFFF) << (32 - rem)
            else:
                words[s, full] = 0
    got, total = native.merge_streams(words, lens)
    want = native._py_merge(words, lens)
    assert total == int(lens.sum())
    n = total // 32 + 1
    np.testing.assert_array_equal(got[:n], want[:n])
