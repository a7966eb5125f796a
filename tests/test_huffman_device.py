"""Device-side Huffman table construction vs the host implementation.

ops.huffman_device must reproduce huffman.build_optimal_table +
build_code_lut bit-for-bit (themselves byte-exact vs the reference's
BuildOptimalTable/BuildHuffmanTable, src/enc.cc:1311-1487, :433-463)
so a search pass can build its rate tables without leaving the device.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sjpeg_tpu.huffman import build_code_lut, build_optimal_table
from sjpeg_tpu.ops import huffman_device as hd


def _host(freq, size, lut_size):
    t = build_optimal_table(freq, size)
    return build_code_lut(t, lut_size), t


def _check_batch(freqs, size, lut_size, W):
    fr = np.zeros((len(freqs), W), np.int32)
    for i, f in enumerate(freqs):
        fr[i, :len(f)] = np.minimum(f, (1 << 31) - 1)
    luts, bits, nbs = hd.optimal_code_luts(jnp.asarray(fr), size, lut_size)
    luts, bits, nbs = map(np.asarray, (luts, bits, nbs))
    for i, f in enumerate(freqs):
        want, t = _host(f, size, lut_size)
        np.testing.assert_array_equal(luts[i], want, err_msg=f"case {i}")
        wb = np.zeros(16, np.int64)
        wb[:len(t.bits)] = t.bits
        np.testing.assert_array_equal(bits[i], wb, err_msg=f"case {i}")
        assert nbs[i] == t.nb_syms, i


def test_device_huffman_random_ac():
    rng = np.random.RandomState(5)
    freqs = []
    for _ in range(25):
        f = np.zeros(257, np.int64)
        n = rng.randint(1, 257)
        idx = rng.choice(256, n, replace=False)
        f[idx] = rng.randint(1, 100, n) * rng.choice(
            [1, 2, 10, 1000, 1 << 20], n)
        freqs.append(f)
    # freq-1-heavy cases stress the unsorted-fake first merge
    for _ in range(15):
        f = np.zeros(257, np.int64)
        n = rng.randint(2, 60)
        idx = rng.choice(256, n, replace=False)
        f[idx] = 1
        extra = rng.choice(idx, min(3, n), replace=False)
        f[extra] = rng.randint(1, 4, len(extra))
        freqs.append(f)
    f = np.zeros(257, np.int64)
    f[77] = 5
    freqs.append(f)                       # single-symbol table
    _check_batch(freqs, 256, 256, 320)


def test_device_huffman_random_dc():
    rng = np.random.RandomState(6)
    freqs = []
    for _ in range(25):
        f = np.zeros(13, np.int64)
        n = rng.randint(1, 12)
        idx = rng.choice(12, n, replace=False)
        f[idx] = rng.randint(1, 1 << 24, n)
        freqs.append(f)
    f = np.zeros(13, np.int64)
    f[0] = 1
    freqs.append(f)
    _check_batch(freqs, 12, 16, 16)


def test_device_huffman_real_engine_freqs():
    """Frequencies from an actual batched encode: device LUTs must equal
    the engine's host-built per-image LUTs."""
    from conftest import make_test_image

    import jax
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import engine
    from sjpeg_tpu.huffman import optimal_tables_from_freqs
    from sjpeg_tpu.params import EncoderParam

    rng = np.random.RandomState(3)
    imgs = np.stack([make_test_image(64, 48, seed=s) for s in range(3)])
    imgs[1] //= 5
    param = EncoderParam(quality=80, yuv_mode=C.YUV_420)
    qms = [None, None]
    from sjpeg_tpu import spec
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[g], minq[g],
                                      param.quantization_bias)
           for g in range(2)]
    iq, ib = engine._quant_device_arrays(qms)
    iq3 = jnp.broadcast_to(iq[None], (3,) + iq.shape)
    ib3 = jnp.broadcast_to(ib[None], (3,) + ib.shape)
    coeffs, _ = engine._stage_batch_coeffs(
        jax.device_put(imgs), yuv_mode=C.YUV_420, width=64, height=48,
        with_histo=False, n_images=3, src_kind="rgb")
    _, freqs = engine._stage_batch_quantize(
        coeffs, iq3, ib3, with_stats=True, nb_blocks=(4, 1, 1),
        n_images=3, per_image_stats=True)
    fdc = np.asarray(freqs[0]).astype(np.int64).reshape(3, 2, 12)
    fac = np.asarray(freqs[1]).astype(np.int64).reshape(3, 2, 256)

    dcl, acl, nbs = hd.luts_from_freqs(
        jnp.asarray(fdc.astype(np.int32)),
        jnp.asarray(fac.astype(np.int32)), 2)
    dcl, acl, nbs = map(np.asarray, (dcl, acl, nbs))
    for i in range(3):
        tabs = optimal_tables_from_freqs(fdc[i], fac[i], 2)
        want_dc, want_ac = engine._host_luts(tabs)
        np.testing.assert_array_equal(dcl[i], want_dc, err_msg=f"img {i}")
        np.testing.assert_array_equal(acl[i], want_ac, err_msg=f"img {i}")
        want_nb = [tabs[0].nb_syms, tabs[1].nb_syms,
                   tabs[2].nb_syms, tabs[3].nb_syms]
        np.testing.assert_array_equal(nbs[i], want_nb, err_msg=f"img {i}")


def test_device_table_desc_matches_host_tables():
    """The device DHT description (bits + symbol order + nb_syms) must
    reconstruct exactly the host-built HuffmanTables."""
    rng = np.random.RandomState(11)
    from sjpeg_tpu.huffman import optimal_tables_from_freqs

    B = 6
    fdc = np.zeros((B, 2, 12), np.int64)
    fac = np.zeros((B, 2, 256), np.int64)
    for i in range(B):
        for g in range(2):
            n = rng.randint(1, 12)
            fdc[i, g, rng.choice(12, n, replace=False)] = rng.randint(
                1, 1 << 20, n)
            n = rng.randint(2, 200)
            idx = rng.choice(256, n, replace=False)
            fac[i, g, idx] = rng.randint(1, 50, n) * rng.choice(
                [1, 1, 7, 1000], n)
    dcl, acl, nbs, desc = hd.luts_and_desc_from_freqs(
        jnp.asarray(fdc.astype(np.int32)),
        jnp.asarray(fac.astype(np.int32)), 2)
    nbs_np = np.asarray(nbs)
    desc_np = tuple(np.asarray(d) for d in desc)
    for i in range(B):
        want = optimal_tables_from_freqs(fdc[i], fac[i], 2)
        got = hd.tables_from_desc(nbs_np, desc_np, i, 2)
        for t in range(4):
            np.testing.assert_array_equal(
                got[t].bits, np.pad(want[t].bits,
                                    (0, 16 - len(want[t].bits))),
                err_msg=f"img {i} table {t} bits")
            np.testing.assert_array_equal(
                got[t].syms, want[t].syms[:want[t].nb_syms],
                err_msg=f"img {i} table {t} syms")
            assert got[t].nb_syms == want[t].nb_syms
