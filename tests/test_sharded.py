"""Sharded (dp x sp mesh) encode vs serial oracle, on a virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sjpeg_tpu import constants as C
from sjpeg_tpu import spec
from sjpeg_tpu.engine import _device_luts, _quant_device_arrays
from sjpeg_tpu.huffman import k3_default_tables
from sjpeg_tpu.params import EncoderParam
from sjpeg_tpu.parallel import shard as pshard

from conftest import make_test_image


def _mesh(dp, sp):
    devs = np.array(jax.devices()[: dp * sp]).reshape(dp, sp)
    return Mesh(devs, ("dp", "sp"))


def _quant_setup(quality=75):
    p = EncoderParam(quality=quality)
    qmats = p.resolved_quant_matrices()
    minq = p.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      p.quantization_bias) for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _device_luts(k3_default_tables())
    return iq, ib, dc_luts, ac_luts


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 8), (4, 2)])
def test_sharded_stream_matches_oracle(dp, sp):
    if len(jax.devices()) < dp * sp:
        pytest.skip("not enough devices")
    mesh = _mesh(dp, sp)
    H, W = 16 * sp * 2, 64       # two MCU rows per stripe
    B = dp * 2
    imgs = np.stack([make_test_image(W, H, seed=i) for i in range(B)])
    iq, ib, dc_luts, ac_luts = _quant_setup()

    enc = pshard.make_sharded_encode(mesh, C.YUV_420, H, W, (4, 1, 1))
    s, t, hl, hc, fd, fa = enc(jnp.asarray(imgs), iq, ib, dc_luts, ac_luts)
    s = np.asarray(s)            # [B, S, Nw]
    t = np.asarray(t)            # [B, S]

    from sjpeg_tpu import EncoderParam as EP, host_encode_rgb
    for b in range(B):
        words, total = pshard.stitch_shard_streams(
            jnp.asarray(s[b]), jnp.asarray(t[b]))
        total = int(total)
        from sjpeg_tpu.engine import _finalize_scan_bytes
        scan = _finalize_scan_bytes(np.asarray(words), total)
        p = EP(quality=75, yuv_mode=C.YUV_420, huffman_compress=False,
               adaptive_quantization=False)
        ref = host_encode_rgb(imgs[b], p)
        # extract the entropy segment: between SOS payload and EOI
        sos = ref.find(bytes([0xFF, 0xDA]))
        seg_len = (ref[sos + 2] << 8) | ref[sos + 3]
        ref_scan = ref[sos + 2 + seg_len: -2]
        assert scan == ref_scan, f"image {b} scan mismatch"


def test_sharded_histo_and_freq_match_serial():
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    mesh = _mesh(2, 4)
    H, W = 128, 48
    B = 4
    imgs = np.stack([make_test_image(W, H, seed=10 + i) for i in range(B)])
    iq, ib, dc_luts, ac_luts = _quant_setup()
    enc = pshard.make_sharded_encode(mesh, C.YUV_420, H, W, (4, 1, 1))
    _, _, hl, hc, fd, fa = enc(jnp.asarray(imgs), iq, ib, dc_luts, ac_luts)

    for b in range(B):
        layout_blocks = []
        from sjpeg_tpu import pipeline
        layout = pipeline.component_layout(C.YUV_420, W, H)
        blocks = pipeline.rgb_to_component_blocks(imgs[b], layout)
        coeffs = [spec.fdct_blocks(bl) for bl in blocks]
        want_hl = spec.store_histo(coeffs[0])
        want_hc = spec.store_histo(coeffs[1]) + spec.store_histo(coeffs[2])
        np.testing.assert_array_equal(np.asarray(hl)[b], want_hl)
        np.testing.assert_array_equal(np.asarray(hc)[b], want_hc)

        p = EncoderParam(quality=75)
        qmats = p.resolved_quant_matrices()
        minq = p.resolved_min_quant_matrices()
        qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                          p.quantization_bias)
               for i in range(2)]
        freq_dc = np.zeros((2, 12), np.int64)
        freq_ac = np.zeros((2, 256), np.int64)
        for c in range(3):
            g = 0 if c == 0 else 1
            qb = spec.quantize_blocks(coeffs[c], qms[g])
            rl = spec.block_run_levels(qb)
            dcc = spec.dc_diff_codes(qb[:, 0])
            a, d = spec.entropy_stats(rl, dcc)
            freq_dc[g] += a
            freq_ac[g] += d
        np.testing.assert_array_equal(np.asarray(fd)[b], freq_dc)
        np.testing.assert_array_equal(np.asarray(fa)[b], freq_ac)
