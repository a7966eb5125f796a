"""ctypes bindings for the native host helpers (with NumPy fallbacks).

The native library (`native/libsjpeg_native.so`, built by `make -C native`)
accelerates the host-side byte passes of the serving path: 0xFF stuffing,
device-word -> scan-segment conversion (padding + stuffing fused), and
barrel-shift merging of shard bit streams.  If the library is absent every
entry point transparently falls back to the NumPy implementations.
"""

import ctypes
import pathlib

import numpy as np

from .bitio import stuff_bytes as _py_stuff_bytes

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = pathlib.Path(__file__).resolve().parent.parent
    for cand in (root / "native" / "libsjpeg_native.so",
                 pathlib.Path("/usr/local/lib/libsjpeg_native.so")):
        if cand.exists():
            try:
                lib = ctypes.CDLL(str(cand))
            except OSError:
                continue
            lib.sjpeg_stuff_bytes.restype = ctypes.c_size_t
            lib.sjpeg_stuff_bytes.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.sjpeg_words_to_scan.restype = ctypes.c_size_t
            lib.sjpeg_words_to_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p]
            lib.sjpeg_merge_streams.restype = ctypes.c_uint64
            lib.sjpeg_merge_streams.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.c_size_t, ctypes.c_void_p]
            try:
                lib.sjpeg_huffman_codesizes.restype = None
                lib.sjpeg_huffman_codesizes.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
            except AttributeError:   # older library build
                pass
            try:
                lib.sjpeg_analyse_histo_nodes.restype = None
                lib.sjpeg_analyse_histo_nodes.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                    ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            except AttributeError:   # older library build
                pass
            _LIB = lib
            break
    return _LIB


def huffman_codesizes(freq: np.ndarray, size: int):
    """Huffman-merge code lengths (the hot loop of
    huffman.build_optimal_table); returns int32[size + 1] or None when the
    native library is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "sjpeg_huffman_codesizes"):
        return None
    f = np.ascontiguousarray(freq[:size], dtype=np.uint64)
    out = np.zeros(size + 1, dtype=np.int32)
    lib.sjpeg_huffman_codesizes(f.ctypes.data_as(ctypes.c_void_p), size,
                                out.ctypes.data_as(ctypes.c_void_p))
    return out


def available() -> bool:
    return _load() is not None


def analyse_histo_nodes(histos: np.ndarray, quants: np.ndarray,
                        min_quant: np.ndarray, qdelta_max: int,
                        weight: np.ndarray, n_threads: int = 0):
    """Native batched adaptive-quant node fit: [B, 64, 128] int64 histos x
    [K, 64] uint8 candidate matrices -> [B, K, 64] uint8 tuned matrices,
    bit-identical to adaptive._analyse_histo_nodes_chunk.  Returns None
    when the native library (or the symbol) is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "sjpeg_analyse_histo_nodes"):
        return None
    h = np.ascontiguousarray(histos, dtype=np.int64)
    q = np.ascontiguousarray(quants, dtype=np.uint8)
    mq = np.ascontiguousarray(min_quant, dtype=np.uint8)
    w = np.ascontiguousarray(weight, dtype=np.float64)
    B, K = h.shape[0], q.shape[0]
    out = np.empty((B, K, 64), dtype=np.uint8)
    if n_threads <= 0:
        import os
        n_threads = min(os.cpu_count() or 1, 8)
    lib.sjpeg_analyse_histo_nodes(
        h.ctypes.data_as(ctypes.c_void_p), B,
        q.ctypes.data_as(ctypes.c_void_p), K,
        mq.ctypes.data_as(ctypes.c_void_p), int(qdelta_max),
        w.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), int(n_threads))
    return out


def stuff_bytes(raw: np.ndarray) -> bytes:
    lib = _load()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    if lib is None:
        return _py_stuff_bytes(raw)
    out = np.empty(raw.size * 2, dtype=np.uint8)
    n = lib.sjpeg_stuff_bytes(raw.tobytes(), raw.size,
                              out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].tobytes()


def words_to_scan(words: np.ndarray, total_bits: int) -> bytes:
    """Big-endian device words -> final stuffed, '1'-padded scan segment."""
    lib = _load()
    if lib is None:
        from .bitio import pack_bits_to_bytes
        raw = np.array(pack_bits_to_bytes(
            np.ascontiguousarray(words), total_bits))
        pad = (-total_bits) % 8
        if pad and raw.size:
            raw[-1] |= (1 << pad) - 1
        return _py_stuff_bytes(raw)
    # words carry value semantics: bit 31 of word 0 is the stream's first bit
    host_words = np.ascontiguousarray(words, dtype=np.uint32)
    out = np.empty((total_bits // 8 + 2) * 2, dtype=np.uint8)
    n = lib.sjpeg_words_to_scan(host_words.ctypes.data_as(ctypes.c_void_p),
                                total_bits,
                                out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].tobytes()


def merge_streams(words: np.ndarray, bit_lens: np.ndarray):
    """Merge [S, W] big-endian-word streams of bit_lens[i] bits each.

    Returns (merged uint32 words ('=u4', host order, big-endian byte
    layout), total_bits).
    """
    lib = _load()
    words = np.ascontiguousarray(words)
    bit_lens = np.ascontiguousarray(bit_lens, dtype=np.int32)
    total = int(bit_lens.astype(np.int64).sum())
    if lib is None:
        return _py_merge(words, bit_lens), total
    src = np.ascontiguousarray(words, dtype=np.uint32)
    out = np.zeros(total // 32 + 2, dtype=np.uint32)
    lib.sjpeg_merge_streams(src.ctypes.data_as(ctypes.c_void_p),
                            words.shape[1],
                            bit_lens.ctypes.data_as(ctypes.c_void_p),
                            words.shape[0],
                            out.ctypes.data_as(ctypes.c_void_p))
    return out, total


def _py_merge(words: np.ndarray, bit_lens: np.ndarray) -> np.ndarray:
    """NumPy barrel-shift merge fallback ('=u4' output, value semantics)."""
    total = int(bit_lens.astype(np.int64).sum())
    out = np.zeros(total // 32 + 2, dtype=np.uint64)
    pos = 0
    for s in range(words.shape[0]):
        L = int(bit_lens[s])
        if L <= 0:
            continue
        nw = (L + 31) // 32
        src = words[s, :nw].astype(np.uint64)
        shift = pos & 31
        q = pos >> 5
        if shift == 0:
            out[q:q + nw] |= src
        else:
            out[q:q + nw] |= src >> shift
            out[q + 1:q + nw + 1] |= (src << (32 - shift)) & 0xFFFFFFFF
        pos += L
    return out.astype(np.uint32)


def build_native() -> bool:
    """Compile the native library in place; returns availability."""
    import subprocess
    root = pathlib.Path(__file__).resolve().parent.parent / "native"
    try:
        subprocess.run(["make", "-C", str(root)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _TRIED
    _TRIED = False
    return available()
