"""Device kernels vs the NumPy spec oracle, bit-for-bit (CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sjpeg_tpu import constants as C
from sjpeg_tpu import spec
from sjpeg_tpu.ops import colorspace, fdct, pack, quantize, vlc
from sjpeg_tpu.params import EncoderParam


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(123)


def test_fdct_matches_oracle(rng):
    blocks = rng.randint(-128, 128, (256, 64)).astype(np.int32)
    want = spec.fdct_blocks(blocks)
    got = np.asarray(fdct.fdct_blocks(jnp.asarray(blocks)))
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_color_420_matches_oracle(rng):
    rgb = rng.randint(0, 256, (64, 48, 3), dtype=np.uint8)
    y_w, u_w, v_w = spec.rgb_to_yuv420(rgb)
    y_g, u_g, v_g = colorspace.rgb_to_yuv420_planes(jnp.asarray(rgb))
    np.testing.assert_array_equal(np.asarray(y_g), y_w)
    np.testing.assert_array_equal(np.asarray(u_g), u_w)
    np.testing.assert_array_equal(np.asarray(v_g), v_w)


def test_color_444_matches_oracle(rng):
    rgb = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
    want = spec.rgb_to_yuv444(rgb)
    got = colorspace.rgb_to_yuv444_planes(jnp.asarray(rgb))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_quantize_matches_oracle(rng):
    coeffs = rng.randint(-30000, 30000, (128, 64)).astype(np.int32)
    qm = spec.finalize_quant_matrix(
        np.full(64, 16, np.uint8), np.ones(64, np.uint8), C.DEFAULT_BIAS)
    want = spec.quantize_blocks(coeffs, qm)
    got = quantize.quantize_blocks(
        jnp.asarray(coeffs),
        jnp.asarray(qm["iquant"].astype(np.int32)),
        jnp.asarray(qm["bias"].astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_quantize_q1_special_case(rng):
    """quant == 1 uses the saturated multiplier path."""
    coeffs = rng.randint(-32768, 32767, (64, 64)).astype(np.int32)
    qm = spec.finalize_quant_matrix(
        np.ones(64, np.uint8), np.ones(64, np.uint8), C.DEFAULT_BIAS)
    want = spec.quantize_blocks(coeffs, qm)
    got = quantize.quantize_blocks(
        jnp.asarray(coeffs),
        jnp.asarray(qm["iquant"].astype(np.int32)),
        jnp.asarray(qm["bias"].astype(np.int32)))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_run_levels_and_dc(rng):
    q = rng.randint(-5, 6, (64, 64)).astype(np.int32)
    q[rng.rand(64, 64) < 0.8] = 0
    want = spec.block_run_levels(q)
    got = jax.tree.map(np.asarray, vlc.run_levels(jnp.asarray(q)))
    np.testing.assert_array_equal(got["nz"], want["nz"])
    np.testing.assert_array_equal(got["run"][got["nz"]],
                                  want["run"][want["nz"]])
    np.testing.assert_array_equal(got["size"][got["nz"]],
                                  want["size"][want["nz"]])
    np.testing.assert_array_equal(got["code"][got["nz"]],
                                  want["code"][want["nz"]])
    np.testing.assert_array_equal(got["last"], want["last"])
    dc_w = spec.dc_diff_codes(q[:, 0])
    dc_g = np.asarray(vlc.dc_diff_codes(jnp.asarray(q[:, 0])))
    np.testing.assert_array_equal(dc_g.astype(np.uint16), dc_w)


def test_entropy_stats_match(rng):
    q = rng.randint(-40, 40, (96, 64)).astype(np.int32)
    q[rng.rand(96, 64) < 0.85] = 0
    rl_w = spec.block_run_levels(q)
    dc_w = spec.dc_diff_codes(q[:, 0])
    fdc_w, fac_w = spec.entropy_stats(rl_w, dc_w)
    rl_g = vlc.run_levels(jnp.asarray(q))
    dc_g = vlc.dc_diff_codes(jnp.asarray(q[:, 0]))
    fdc_g, fac_g = vlc.entropy_stats(rl_g, dc_g)
    np.testing.assert_array_equal(np.asarray(fdc_g), fdc_w)
    np.testing.assert_array_equal(np.asarray(fac_g), fac_w)


def test_store_histo_matches(rng):
    coeffs = rng.randint(-1000, 1000, (200, 64)).astype(np.int32)
    want = spec.store_histo(coeffs)
    got = np.asarray(quantize.store_histo(jnp.asarray(coeffs)))
    np.testing.assert_array_equal(got, want)


def test_pack_roundtrip_vs_bitwriter(rng):
    """Pack random entry streams and compare against serial BitWriter."""
    from sjpeg_tpu.bitio import BitWriter
    N, E = 17, 23
    lens = rng.randint(0, 28, (N, E)).astype(np.int32)
    lens[rng.rand(N, E) < 0.3] = 0
    vals = np.zeros((N, E), dtype=np.uint64)
    for n in range(N):
        for e in range(E):
            if lens[n, e]:
                vals[n, e] = rng.randint(0, 1 << int(lens[n, e]))
    words, bl = pack.pack_block_entries(
        jnp.asarray(vals.astype(np.uint32)), jnp.asarray(lens))
    stream, total = pack.concat_block_streams(words, bl)
    total = int(total)

    w = BitWriter()
    for n in range(N):
        for e in range(E):
            if lens[n, e]:
                w.put_bits(int(vals[n, e]), int(lens[n, e]))
    # compare bit-level prefix
    got_words = np.asarray(stream[: (total + 31) // 32])
    got_bytes = got_words.astype(">u4").view(np.uint8)[: (total + 7) // 8]
    w_pad = w  # replicate padding
    w_pad.flush()
    want = np.frombuffer(w.get_bytes(), dtype=np.uint8)
    # BitWriter stuffs 0xFF; undo for comparison
    unstuffed = []
    i = 0
    while i < len(want):
        unstuffed.append(want[i])
        if want[i] == 0xFF:
            i += 1   # skip the stuffed 0x00
        i += 1
    want = np.array(unstuffed, dtype=np.uint8)
    # mask the padding bits of the final byte
    nfull = total // 8
    np.testing.assert_array_equal(got_bytes[:nfull], want[:nfull])
    rem = total % 8
    if rem:
        m = 0xFF << (8 - rem) & 0xFF
        assert (int(got_bytes[nfull]) & m) == (int(want[nfull]) & m)


def test_average_extra_luma_matches(rng):
    for (w, h) in [(100, 100), (97, 65), (40, 17), (24, 24)]:
        rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        layout_w = (w + 15) // 16
        layout_h = (h + 15) // 16
        img = spec.pad_edge(rgb, 16, 16)
        y, _, _ = spec.rgb_to_yuv420(img)
        yb = spec.blockize_420_luma(y)
        want = spec.average_extra_luma(yb, layout_w, layout_h, w, h)
        got = np.asarray(colorspace.average_extra_luma(
            jnp.asarray(yb), layout_w, layout_h, w, h))
        np.testing.assert_array_equal(got, want)


def test_device_encode_matches_oracle_end_to_end(rng):
    from sjpeg_tpu import host_encode_rgb
    from sjpeg_tpu.engine import encode_rgb as dev_encode
    rgb = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    for mode in (C.YUV_420, C.YUV_444, C.YUV_400):
        for hc, aq in [(False, False), (True, True)]:
            p = EncoderParam(quality=80, yuv_mode=mode, huffman_compress=hc,
                             adaptive_quantization=aq)
            assert dev_encode(rgb, p) == host_encode_rgb(rgb, p)


def test_encode_batch_optimized_shared_stats(rng):
    """Batched two-pass Huffman + adaptive encode (share_statistics=True
    knob): streams stay valid JPEG, rate close to per-image encoding."""
    import io
    from PIL import Image
    from sjpeg_tpu import host_encode_rgb
    from sjpeg_tpu.engine import encode_batch
    imgs = rng.randint(0, 256, (3, 48, 32, 3), dtype=np.uint8)
    p = EncoderParam(quality=80, yuv_mode=C.YUV_420)
    outs = encode_batch(imgs, p, share_statistics=True)
    for i, j in enumerate(outs):
        dec = np.asarray(Image.open(io.BytesIO(j)).convert("RGB"))
        assert dec.shape == imgs[i].shape
        ref = host_encode_rgb(imgs[i], p)       # per-image statistics
        assert len(j) < len(ref) * 1.15         # shared tables cost < 15%


@pytest.mark.parametrize("huff,adapt,mode", [
    (True, True, C.YUV_420),    # method 4 (reference default)
    (True, True, C.YUV_444),
    (True, True, C.YUV_400),
    (True, False, C.YUV_420),   # method 1: two-pass Huffman only
    (False, True, C.YUV_420),   # method 3: adaptive only, default tables
])
def test_encode_batch_per_image_byte_identical(rng, huff, adapt, mode):
    """Default batched optimized encode = per-image optimization:
    byte-identical to encoding each image alone (src/enc.cc:1517-1580
    per-image semantics)."""
    from sjpeg_tpu.engine import encode_batch, encode_rgb
    imgs = rng.randint(0, 256, (3, 48, 40, 3), dtype=np.uint8)
    # mix content so per-image tables genuinely differ
    imgs[1] //= 4
    imgs[2] = np.minimum(255, imgs[2] // 8 + 200)
    p = EncoderParam(quality=83, yuv_mode=mode, huffman_compress=huff,
                     adaptive_quantization=adapt)
    outs = encode_batch(imgs, p)
    for i in range(len(imgs)):
        single = encode_rgb(imgs[i], p)
        assert outs[i] == single, (huff, adapt, mode, i)


def test_pallas_quant_pack_matches_xla_interpret(rng):
    """Fused quantize+zigzag+run/level+VLC+pack kernel (interpret mode)
    vs the XLA formulation, over mixed-group interleaved blocks."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.engine import (_device_luts, _interleave_coeffs,
                                  _interleave_quantized,
                                  _quant_device_arrays)
    from sjpeg_tpu.huffman import k3_default_tables
    from sjpeg_tpu.ops import pallas_quant_pack as pqp

    n_mcu, nb = 12, (4, 1, 1)
    from sjpeg_tpu.params import quant_matrices_for_quality
    qmats = quant_matrices_for_quality(75.0)
    qm = [spec.finalize_quant_matrix(qmats[i], np.ones(64, np.uint8),
                                     C.DEFAULT_BIAS) for i in range(2)]
    iq, ib = _quant_device_arrays(qm)
    dc_luts, ac_luts = _device_luts(k3_default_tables())

    # realistic + extreme coefficients (x16-scaled int16 range)
    coeffs = []
    for c, n in enumerate(nb):
        co = rng.randint(-3000, 3000, (n_mcu * n, 64))
        co[rng.rand(*co.shape) < 0.7] = 0
        co[0, :] = 32767            # extreme magnitudes
        co[-1, 1] = -32768
        coeffs.append(jnp.asarray(co.astype(np.int32)))

    rl, dc_codes, group = _interleave_quantized(coeffs, iq, ib, nb)
    from sjpeg_tpu.ops import vlc as vlc_mod
    vals, lens = vlc_mod.block_entries_grouped(rl, dc_codes, dc_luts,
                                               ac_luts, group)
    want_w, want_t = pack.pack_block_entries(vals, lens)

    cinter, dc2, group2 = _interleave_coeffs(coeffs, iq, ib, nb)
    np.testing.assert_array_equal(np.asarray(dc2), np.asarray(dc_codes))
    np.testing.assert_array_equal(np.asarray(group2), np.asarray(group))

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        got_w, got_t = pqp.quant_vlc_pack_pallas.__wrapped__(
            cinter, dc2, group2, iq, ib, dc_luts, ac_luts, tile=24)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    for n in range(cinter.shape[0]):
        nw = (int(want_t[n]) + 31) // 32
        np.testing.assert_array_equal(np.asarray(got_w)[n, :nw],
                                      np.asarray(want_w)[n, :nw])


def test_pallas_vlc_pack_per_image_luts_interpret(rng):
    """Per-image-LUT VLC+pack (tiles_per_img path, interpret mode) vs
    running the XLA grouped path image-by-image with its own tables."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.engine import (_device_luts, _interleave_quantized,
                                  _quant_device_arrays)
    from sjpeg_tpu.huffman import (k3_default_tables,
                                   optimal_tables_from_freqs)
    from sjpeg_tpu.ops import pallas_vlc_pack as pv
    from sjpeg_tpu.ops import vlc as vlc_mod
    from sjpeg_tpu.params import quant_matrices_for_quality

    B, n_mcu, nb = 2, 8, (4, 1, 1)
    tile, tiles_per_img = 16, 3         # per_img=48 rows = 3 tiles
    qmats = quant_matrices_for_quality(75.0)
    qm = [spec.finalize_quant_matrix(qmats[i], np.ones(64, np.uint8),
                                     C.DEFAULT_BIAS) for i in range(2)]
    iq, ib = _quant_device_arrays(qm)

    coeffs = []
    for c, n in enumerate(nb):
        co = rng.randint(-2000, 2000, (B * n_mcu * n, 64))
        co[rng.rand(*co.shape) < 0.7] = 0
        coeffs.append(jnp.asarray(co.astype(np.int32)))
    rl, dc_codes, group = _interleave_quantized(coeffs, iq, ib, nb,
                                                n_images=B)

    # two genuinely different LUT sets: defaults + optimal-for-image-1
    from sjpeg_tpu.engine import _grouped_stats
    fdc, fac = _grouped_stats(rl, dc_codes, group, n_images=B)
    t0 = k3_default_tables()
    t1 = optimal_tables_from_freqs(np.asarray(fdc)[1].astype(np.int64),
                                   np.asarray(fac)[1].astype(np.int64), 2)
    per_tables = [t0, t1]
    dc_np = np.zeros((B, 2, 16), np.uint32)
    ac_np = np.zeros((B, 2, 256), np.uint32)
    for i, t in enumerate(per_tables):
        d, a = _device_luts(t)
        dc_np[i], ac_np[i] = np.asarray(d), np.asarray(a)

    # expected: XLA grouped path per image with that image's tables
    per_img = group.shape[0] // B
    want_w, want_t = [], []
    for i in range(B):
        sl = slice(i * per_img, (i + 1) * per_img)
        rl_i = {k: v[sl] for k, v in rl.items()}
        d, a = _device_luts(per_tables[i])
        vals, lens = vlc_mod.block_entries_grouped(
            rl_i, dc_codes[sl], d, a, group[sl])
        w, t = pack.pack_block_entries(vals, lens)
        want_w.append(np.asarray(w))
        want_t.append(np.asarray(t))
    want_w = np.concatenate(want_w)
    want_t = np.concatenate(want_t)

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        got_w, got_t = pv.vlc_pack_pallas.__wrapped__(
            rl["run"], rl["size"], rl["code"], dc_codes, group,
            jnp.asarray(dc_np), jnp.asarray(ac_np), tile=tile,
            tiles_per_img=tiles_per_img)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_t), want_t)
    for n in range(group.shape[0]):
        nw = (int(want_t[n]) + 31) // 32
        np.testing.assert_array_equal(np.asarray(got_w)[n, :nw],
                                      want_w[n, :nw])


def test_pallas_tree_concat_matches_xla_interpret(rng):
    """Parallel log-tree concat (interpret mode) vs the XLA formulation,
    incl. non-pow2 per-image block counts and zero-length blocks."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.ops import pallas_tree_concat as ptc
    n_images, per_img = 2, 700
    N = n_images * per_img
    lens = rng.randint(0, 300, N).astype(np.int32)
    lens[rng.rand(N) < 0.1] = 0
    words = np.zeros((N, 64), np.uint32)
    for n in range(N):
        L = int(lens[n])
        for j in range((L + 31) // 32):
            bits = min(32, L - 32 * j)
            w = (rng.randint(0, 1 << bits) << (32 - bits)
                 if bits < 32 else rng.randint(0, 1 << 32))
            words[n, j] = w
    bucket = 8192
    want, wt = pack.concat_block_streams_batched(
        jnp.asarray(words), jnp.asarray(lens), n_images, bucket)
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        got, gt = ptc.concat_block_streams_tree.__wrapped__(
            jnp.asarray(words), jnp.asarray(lens), n_images=n_images,
            bucket=bucket)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(wt))
    for b in range(n_images):
        nw = (int(wt[b]) + 31) // 32
        np.testing.assert_array_equal(np.asarray(got)[b, :nw],
                                      np.asarray(want)[b, :nw])


def test_pallas_tree_concat_sliced_overflow_flag(rng):
    """A burst of near-full blocks overflows a truncated merge frame:
    that image's totals become INT32_MAX (engine fallback trigger) while
    other images stay byte-exact; sliced=False stays exact for all."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.ops import pallas_tree_concat as ptc
    n_images, per_img = 2, 64
    N = n_images * per_img
    lens = rng.randint(10, 200, N).astype(np.int32)
    # image 1: four adjacent almost-full blocks -> 4x~2000 bits, beyond
    # the 4096-bit sliced level-0 output frame
    lens[per_img + 8: per_img + 12] = 2000
    words = np.zeros((N, 64), np.uint32)
    for n in range(N):
        L = int(lens[n])
        for j in range((L + 31) // 32):
            bits = min(32, L - 32 * j)
            w = (rng.randint(0, 1 << bits) << (32 - bits)
                 if bits < 32 else rng.randint(0, 1 << 32))
            words[n, j] = w
    bucket = 8192
    want, wt = pack.concat_block_streams_batched(
        jnp.asarray(words), jnp.asarray(lens), n_images, bucket)
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        # threshold injected to 0: truncation engages even on this tiny
        # batch, exercising the overflow->INT32_MAX flag path
        got, gt = ptc.concat_block_streams_tree.__wrapped__(
            jnp.asarray(words), jnp.asarray(lens), n_images=n_images,
            bucket=bucket, sliced_min_units=0)
        got_s, gt_s = ptc.concat_block_streams_tree.__wrapped__(
            jnp.asarray(words), jnp.asarray(lens), n_images=n_images,
            bucket=bucket, sliced=False)
    finally:
        pl.pallas_call = orig
    assert int(gt[1]) == 0x7FFFFFFF            # flagged for fallback
    nw = (int(wt[0]) + 31) // 32
    assert int(gt[0]) == int(wt[0])            # clean image exact
    np.testing.assert_array_equal(np.asarray(got)[0, :nw],
                                  np.asarray(want)[0, :nw])
    np.testing.assert_array_equal(np.asarray(gt_s), np.asarray(wt))
    for b in range(n_images):
        nw = (int(wt[b]) + 31) // 32
        np.testing.assert_array_equal(np.asarray(got_s)[b, :nw],
                                      np.asarray(want)[b, :nw])


@pytest.mark.slow
def test_pallas_tree_concat_sliced_overflow_default_threshold(rng):
    """At >= SLICED_MIN_UNITS units the DEFAULT config truncates; a dense
    burst overflows a truncated frame and flags exactly that image."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.ops import pallas_tree_concat as ptc
    n_images = 2
    per_img = ptc.SLICED_MIN_UNITS // n_images     # level-0 units == min
    N = n_images * per_img
    lens = rng.randint(10, 200, N).astype(np.int32)
    # image 1: four adjacent almost-full blocks -> ~8000 bits, beyond the
    # 4096-bit truncated level-0 output frame
    lens[per_img + 8: per_img + 12] = 2000
    words = np.zeros((N, 64), np.uint32)
    for n in range(N):
        L = int(lens[n])
        for j in range((L + 31) // 32):
            bits = min(32, L - 32 * j)
            w = (rng.randint(0, 1 << bits) << (32 - bits)
                 if bits < 32 else rng.randint(0, 1 << 32))
            words[n, j] = w
    bucket = 1 << max(int(lens.reshape(n_images, -1).sum(1).max()).bit_length(),
                      13)
    want, wt = pack.concat_block_streams_batched(
        jnp.asarray(words), jnp.asarray(lens), n_images, bucket)
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        got, gt = ptc.concat_block_streams_tree.__wrapped__(
            jnp.asarray(words), jnp.asarray(lens), n_images=n_images,
            bucket=bucket)
    finally:
        pl.pallas_call = orig
    assert int(gt[1]) == 0x7FFFFFFF            # flagged for fallback
    assert int(gt[0]) == int(wt[0])            # clean image exact
    nw = (int(wt[0]) + 31) // 32
    np.testing.assert_array_equal(np.asarray(got)[0, :nw],
                                  np.asarray(want)[0, :nw])


def _mixed_mode_batch(rng):
    """Batch whose images decide different AUTO modes: gray -> 400,
    smooth gradient -> 420, saturated checker -> 444/sharp."""
    h, w = 48, 40
    g = rng.randint(90, 150, (h, w), dtype=np.uint8)
    gray = np.stack([g, g, g], axis=-1)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([xx * 3 % 256, yy * 3 % 256,
                       (xx + yy) % 256], axis=-1).astype(np.uint8)
    checker = np.zeros((h, w, 3), np.uint8)
    checker[(yy // 2 + xx // 2) % 2 == 0] = (255, 0, 0)
    checker[(yy // 2 + xx // 2) % 2 == 1] = (0, 0, 255)
    return np.stack([gray, smooth, checker])


def test_encode_batch_auto_mode_per_image(rng):
    """yuv_mode=AUTO in a batch decides per image (reference semantics,
    src/enc.cc:2132-2154) and is byte-identical to per-image encoding."""
    from sjpeg_tpu.engine import encode_batch, encode_rgb
    from sjpeg_tpu.riskiness import auto_yuv_mode
    imgs = _mixed_mode_batch(rng)
    modes = {auto_yuv_mode(im) for im in imgs}
    assert len(modes) > 1          # the corpus genuinely mixes modes
    p = EncoderParam(quality=80, yuv_mode=C.YUV_AUTO)
    outs = encode_batch(imgs, p)
    for i in range(len(imgs)):
        assert outs[i] == encode_rgb(imgs[i], p), i


def test_encode_batch_sharp_byte_identical(rng):
    """Batched sharp-YUV encode = per-image sharp encode, both device."""
    from sjpeg_tpu.engine import encode_batch, encode_rgb
    imgs = rng.randint(0, 256, (2, 40, 48, 3), dtype=np.uint8)
    for huff in (False, True):
        p = EncoderParam(quality=84, yuv_mode=C.YUV_SHARP,
                         huffman_compress=huff,
                         adaptive_quantization=huff)
        outs = encode_batch(imgs, p)
        for i in range(len(imgs)):
            assert outs[i] == encode_rgb(imgs[i], p), (huff, i)


def test_encode_batch_relay_fused_byte_identical(rng, monkeypatch):
    """The relay-mode fused programs (front-end recompute, no resident
    coefficients) produce the same bytes as the staged path."""
    from sjpeg_tpu import engine
    imgs = rng.randint(0, 256, (3, 48, 40, 3), dtype=np.uint8)
    imgs[1] //= 3
    for mode, share in ((C.YUV_420, False), (C.YUV_444, False),
                        (C.YUV_420, True), (C.YUV_400, False)):
        p = EncoderParam(quality=82, yuv_mode=mode)
        want = engine.encode_batch(imgs, p, share_statistics=share)
        monkeypatch.setattr(engine, "_relay_backend", lambda: True)
        got = engine.encode_batch(imgs, p, share_statistics=share)
        monkeypatch.undo()
        assert got == want, (mode, share)


def test_pallas_fdct_matches_xla_interpret(rng):
    """In-kernel MXU fDCT (pallas_fdct, interpret mode) vs the XLA fDCT,
    which is itself oracle-pinned, plus the collapsed DC chain."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.ops import pallas_fdct

    blocks = rng.randint(-128, 128, (300, 64)).astype(np.int32)
    blocks[0, :] = 127
    blocks[1, :] = -128
    want = np.asarray(fdct.fdct_blocks(jnp.asarray(blocks)))

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        got = np.asarray(pallas_fdct.fdct_blocks_pallas.__wrapped__(
            jnp.asarray(blocks), tile=64))
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(got, want)

    dc = np.asarray(pallas_fdct.fdct_dc(jnp.asarray(blocks)))
    np.testing.assert_array_equal(dc, want[:, 0])


def test_pallas_sample_pack_matches_interpret(rng):
    """Samples-in fused kernel (fDCT in VMEM, interpret mode) ==
    coefficients-in kernel on the same blocks."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.engine import (_device_luts, _interleave_coeffs,
                                  _interleave_samples,
                                  _quant_device_arrays)
    from sjpeg_tpu.huffman import k3_default_tables
    from sjpeg_tpu.ops import pallas_quant_pack as pqp

    n_mcu, nb = 8, (4, 1, 1)
    from sjpeg_tpu.params import quant_matrices_for_quality
    qmats = quant_matrices_for_quality(75.0)
    qm = [spec.finalize_quant_matrix(qmats[i], np.ones(64, np.uint8),
                                     C.DEFAULT_BIAS) for i in range(2)]
    iq, ib = _quant_device_arrays(qm)
    dc_luts, ac_luts = _device_luts(k3_default_tables())

    blocks = []
    for c, n in enumerate(nb):
        b = rng.randint(-128, 128, (n_mcu * n, 64)).astype(np.int32)
        blocks.append(jnp.asarray(b))
    coeffs = [fdct.fdct_blocks(b) for b in blocks]

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        cinter, dc1, group1 = _interleave_coeffs(coeffs, iq, ib, nb)
        want_w, want_t = pqp.quant_vlc_pack_pallas.__wrapped__(
            cinter, dc1, group1, iq, ib, dc_luts, ac_luts, tile=16)
        sinter, dc2, group2 = _interleave_samples(blocks, iq, ib, nb)
        np.testing.assert_array_equal(np.asarray(dc2), np.asarray(dc1))
        got_w, got_t = pqp.sample_vlc_pack_pallas.__wrapped__(
            sinter, dc2, group2, iq, ib, dc_luts, ac_luts, tile=16)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(want_w))


def test_pallas_sample_pack_per_image_interpret(rng):
    """Per-image samples kernel (fDCT + per-image quantizers + per-image
    LUTs, interpret mode) == running the shared kernel image-by-image."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.engine import (_device_luts, _interleave_samples,
                                  _quant_device_arrays)
    from sjpeg_tpu.huffman import k3_default_tables, HuffmanTable
    from sjpeg_tpu.ops import pallas_quant_pack as pqp
    from sjpeg_tpu.params import quant_matrices_for_quality

    n_mcu, nb, B = 4, (4, 1, 1), 2
    per_img_mcu = n_mcu // B
    qms_a = [spec.finalize_quant_matrix(
        quant_matrices_for_quality(70.0)[i], np.ones(64, np.uint8),
        C.DEFAULT_BIAS) for i in range(2)]
    qms_b = [spec.finalize_quant_matrix(
        quant_matrices_for_quality(88.0)[i], np.ones(64, np.uint8),
        C.DEFAULT_BIAS) for i in range(2)]
    iqa, iba = _quant_device_arrays(qms_a)
    iqb, ibb = _quant_device_arrays(qms_b)
    defaults = k3_default_tables()
    # second image: a shuffled-codes variant of the default tables
    alt = [HuffmanTable(t.bits, t.syms[::-1]) if t else None
           for t in defaults]
    dcl_a, acl_a = _device_luts(defaults)
    dcl_b, acl_b = _device_luts(alt)

    blocks = [jnp.asarray(rng.randint(-128, 128, (n_mcu * n, 64))
                          .astype(np.int32)) for n in nb]

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    iq3 = jnp.stack([iqa, iqb])
    ib3 = jnp.stack([iba, ibb])
    dcl3 = jnp.stack([dcl_a, dcl_b])
    acl3 = jnp.stack([acl_a, acl_b])
    pl.pallas_call = patched
    try:
        sinter, dc2, group2 = _interleave_samples(blocks, iq3, ib3, nb,
                                                  n_images=B)
        got_w, got_t = pqp.sample_vlc_pack_pallas.__wrapped__(
            sinter, dc2, group2, iq3, ib3, dcl3, acl3, tile=12,
            tiles_per_img=1)
        # reference: each image through the shared-table kernel alone
        per = sinter.shape[0] // B
        for i, (iq, ib, dcl, acl) in enumerate(
                [(iqa, iba, dcl_a, acl_a), (iqb, ibb, dcl_b, acl_b)]):
            img_blocks = [b.reshape(B, -1, 64)[i] for b in blocks]
            s1, d1, g1 = _interleave_samples(img_blocks, iq, ib, nb)
            np.testing.assert_array_equal(
                np.asarray(d1), np.asarray(dc2[i * per:(i + 1) * per]))
            w1, t1 = pqp.sample_vlc_pack_pallas.__wrapped__(
                s1, d1, g1, iq, ib, dcl, acl, tile=12)
            np.testing.assert_array_equal(
                np.asarray(got_t[i * per:(i + 1) * per]), np.asarray(t1))
            np.testing.assert_array_equal(
                np.asarray(got_w[i * per:(i + 1) * per]), np.asarray(w1))
    finally:
        pl.pallas_call = orig


def test_sample_pack_saturated_chroma_wrap(rng):
    """RGB-derived chroma reaches exactly +128 (pure blue -> U, pure red
    -> V; the reference keeps unclamped int16 samples, colors_rgb.cc
    ToU/ToUV), which wraps to -128 in the int8 transport encoding.  The
    fused TPU path (int8 blocks + in-kernel fDCT, chroma_wrap=True) must
    match the exact int32 coefficient path bit-for-bit."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.engine import (_device_luts, _interleave_coeffs,
                                  _interleave_samples,
                                  _quant_device_arrays)
    from sjpeg_tpu.huffman import k3_default_tables
    from sjpeg_tpu.ops import pallas_quant_pack as pqp
    from sjpeg_tpu.params import quant_matrices_for_quality

    h = w = 32
    rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    rgb[:16, :16] = [0, 0, 255]     # pure blue: U = +128
    rgb[16:, 16:] = [255, 0, 0]     # pure red:  V = +128
    nb = (4, 1, 1)
    # exact int32 path vs the int8 transport the TPU engine uses
    blocks32 = colorspace.rgb_to_blocks(jnp.asarray(rgb), C.YUV_420, w, h)
    blocks8 = colorspace.rgb_to_blocks(jnp.asarray(rgb), C.YUV_420, w, h,
                                       out_dtype=jnp.int8)
    u8 = np.asarray(blocks8[1])
    assert (np.asarray(blocks32[1]) == 128).any(), "setup: no saturated U"
    assert (u8 == -128).any(), "setup: int8 transport did not wrap"

    qmats = quant_matrices_for_quality(75.0)
    qm = [spec.finalize_quant_matrix(qmats[i], np.ones(64, np.uint8),
                                     C.DEFAULT_BIAS) for i in range(2)]
    iq, ib = _quant_device_arrays(qm)
    dc_luts, ac_luts = _device_luts(k3_default_tables())

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        coeffs = [fdct.fdct_blocks(b) for b in blocks32]
        cinter, dc1, group1 = _interleave_coeffs(coeffs, iq, ib, nb)
        want_w, want_t = pqp.quant_vlc_pack_pallas.__wrapped__(
            cinter, dc1, group1, iq, ib, dc_luts, ac_luts, tile=16)
        sinter, dc2, group2 = _interleave_samples(blocks8, iq, ib, nb,
                                                  chroma_wrap=True)
        np.testing.assert_array_equal(np.asarray(dc2), np.asarray(dc1))
        got_w, got_t = pqp.sample_vlc_pack_pallas.__wrapped__(
            sinter, dc2, group2, iq, ib, dc_luts, ac_luts, tile=16,
            chroma_wrap=True)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_w), np.asarray(want_w))


def test_stage_batch_freqs_fused_matches_staged(rng):
    """The relay-only fused freqs program (per-component, no interleave)
    must produce the same per-image frequencies as the staged
    quantize+stats path."""
    from sjpeg_tpu import engine
    from sjpeg_tpu.params import quant_matrices_for_quality

    b, h, w = 3, 48, 32
    rgbs = jnp.asarray(rng.randint(0, 256, (b, h, w, 3)).astype(np.uint8))
    qm = [spec.finalize_quant_matrix(quant_matrices_for_quality(80.0)[i],
                                     np.ones(64, np.uint8), C.DEFAULT_BIAS)
          for i in range(2)]
    iq, ib = engine._quant_device_arrays(qm)
    got = engine._stage_batch_freqs_fused(
        rgbs, iq, ib, yuv_mode=C.YUV_420, width=w, height=h,
        nb_blocks=(4, 1, 1), n_images=b, stats_images=b, src_kind="rgb")
    coeffs, _ = engine._stage_batch_coeffs(
        rgbs, yuv_mode=C.YUV_420, width=w, height=h, with_histo=False,
        n_images=b, src_kind="rgb")
    _, want = engine._stage_batch_quantize(
        coeffs, iq, ib, with_stats=True, nb_blocks=(4, 1, 1), n_images=b,
        per_image_stats=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    # per-image matrices variant
    iq3 = jnp.broadcast_to(iq, (b,) + iq.shape)
    ib3 = jnp.broadcast_to(ib, (b,) + ib.shape)
    got3 = engine._stage_batch_freqs_fused(
        rgbs, iq3, ib3, yuv_mode=C.YUV_420, width=w, height=h,
        nb_blocks=(4, 1, 1), n_images=b, stats_images=b, src_kind="rgb")
    np.testing.assert_array_equal(np.asarray(got3[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got3[1]), np.asarray(want[1]))


def test_pallas_finisher_matches_xla_scan_interpret(rng):
    """Dynamic-store Pallas finisher vs the XLA scan finisher on
    random wide units (incl. zero-length and phase/rotation edges)."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.ops import pallas_tree_concat as ptc
    for (n_images, k, w, bucket) in [(2, 4, 256, 2048), (3, 8, 128, 1024),
                                     (1, 2, 512, 700)]:
        M = n_images * k
        lens = rng.randint(0, w * 32 // 2, M).astype(np.int32)
        lens[rng.rand(M) < 0.2] = 0
        units = np.zeros((M, w), np.uint32)
        for n in range(M):
            L = int(lens[n])
            for j in range((L + 31) // 32):
                bits = min(32, L - 32 * j)
                v = (rng.randint(0, 1 << bits, dtype=np.int64)
                     << (32 - bits) if bits < 32
                     else rng.randint(0, 1 << 32, dtype=np.int64))
                units[n, j] = np.uint32(v)
        want, wt = ptc._finish_units(jnp.asarray(units), jnp.asarray(lens),
                                     n_images, bucket)
        orig = pl.pallas_call

        def patched(*a, **kk):
            kk["interpret"] = True
            kk.pop("compiler_params", None)
            return orig(*a, **kk)

        pl.pallas_call = patched
        try:
            got, gt = ptc._finish_units_pallas(
                jnp.asarray(units), jnp.asarray(lens), n_images, bucket)
        finally:
            pl.pallas_call = orig
        np.testing.assert_array_equal(np.asarray(wt), np.asarray(gt))
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_pallas_units_kernel_matches_tree_interpret(rng):
    """Fused pack+first-two-merge-levels kernel + concat_units_tree
    (interpret mode) == the plain sample kernel + full block tree, incl.
    per-image pad blocks (group=2) and multi-image batches."""
    from jax.experimental import pallas as pl
    from sjpeg_tpu.engine import (_device_luts, _interleave_samples,
                                  _quant_device_arrays)
    from sjpeg_tpu.huffman import k3_default_tables
    from sjpeg_tpu.ops import pallas_quant_pack as pqp
    from sjpeg_tpu.ops import pallas_tree_concat as ptc
    from sjpeg_tpu.params import quant_matrices_for_quality

    B, n_mcu, nb = 2, 10, (4, 1, 1)       # 60 blocks/img
    tile = 16
    qmats = quant_matrices_for_quality(75.0)
    qm = [spec.finalize_quant_matrix(qmats[i], np.ones(64, np.uint8),
                                     C.DEFAULT_BIAS) for i in range(2)]
    iq, ib = _quant_device_arrays(qm)
    dc_luts, ac_luts = _device_luts(k3_default_tables())

    blocks = [jnp.asarray(rng.randint(-128, 128,
                                      (B * n_mcu * n, 64)).astype(np.int32))
              for n in nb]
    sinter, dc2, group2 = _interleave_samples(blocks, iq, ib, nb, B)
    per_img = group2.shape[0] // B
    padded = -(-per_img // tile) * tile
    pad = padded - per_img

    def padrows(x, gval=0):
        x2 = x.reshape((B, per_img) + x.shape[1:])
        cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x2, cfg, constant_values=gval).reshape(
            (-1,) + x.shape[1:])

    bucket = 4096
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        want_w, want_t = pqp.sample_vlc_pack_pallas.__wrapped__(
            sinter, dc2, group2, iq, ib, dc_luts, ac_luts, tile=tile)
        want_o, want_tot = ptc.concat_block_streams_tree.__wrapped__(
            want_w, want_t, n_images=B, bucket=bucket)
        units, ulens = pqp.sample_vlc_pack_units_pallas.__wrapped__(
            padrows(sinter), padrows(dc2), padrows(group2, 2),
            iq, ib, dc_luts, ac_luts, tile=tile)
        got_o, got_tot = ptc.concat_units_tree.__wrapped__(
            units, ulens, n_images=B, bucket=bucket)
    finally:
        pl.pallas_call = orig
    np.testing.assert_array_equal(np.asarray(got_tot), np.asarray(want_tot))
    for b in range(B):
        nw = (int(want_tot[b]) + 31) // 32
        np.testing.assert_array_equal(np.asarray(got_o)[b, :nw],
                                      np.asarray(want_o)[b, :nw])
