"""Trellis quantization (methods 7/8) vs the reference, byte-exact."""

import numpy as np
import pytest

from sjpeg_tpu import EncoderParam, host_encode_rgb
from sjpeg_tpu import constants as C

from conftest import make_test_image, write_ppm, reference_encode


@pytest.mark.parametrize("quality", [40, 75, 90])
@pytest.mark.parametrize("size", [(48, 48), (33, 17)])
def test_trellis_byte_exact(reference_bin, ppm_dir, quality, size):
    w, h = size
    rgb = make_test_image(w, h, seed=quality + w)
    ppm = ppm_dir / f"tr_{w}x{h}.ppm"
    write_ppm(ppm, rgb)
    ref = reference_encode(reference_bin, ppm,
                           ppm_dir / f"tr_{w}x{h}_{quality}.jpg",
                           "-q", str(quality), "-yuv_mode", "1", "-trellis")
    p = EncoderParam(quality=quality, yuv_mode=C.YUV_420, use_trellis=True)
    assert host_encode_rgb(rgb, p) == ref


def test_device_trellis_kernel_matches_oracle():
    """ops.trellis (vectorized lax.scan Viterbi) is bit-exact vs the
    per-block host oracle across qualities and both table groups."""
    import jax.numpy as jnp
    from sjpeg_tpu import spec
    from sjpeg_tpu.huffman import build_code_lut, k3_default_tables
    from sjpeg_tpu.ops import trellis as dtr

    rng = np.random.RandomState(11)
    defaults = k3_default_tables()
    luts = [build_code_lut(defaults[2], 256),
            build_code_lut(defaults[3], 256)]
    lens = np.stack([l & 0xFF for l in luts]).astype(np.int32)

    for quality in (25, 75, 92):
        param = EncoderParam(quality=quality)
        qmats = param.resolved_quant_matrices()
        minq = param.resolved_min_quant_matrices()
        qms = [spec.finalize_quant_matrix(qmats[g], minq[g],
                                          param.quantization_bias)
               for g in range(2)]
        N = 64
        coeffs = (rng.randint(-40, 40, (N, 64))
                  * rng.choice([0, 1, 1, 1, 16, 64], (N, 64))
                  ).astype(np.int32)
        coeffs[:8] = rng.randint(-16384, 16384, (8, 64))
        coeffs[8:10] = 0
        group = rng.randint(0, 2, N).astype(np.int32)

        want = np.empty((N, 64), np.int32)
        for n in range(N):
            g = int(group[n])
            want[n] = spec.trellis_quantize_block(
                coeffs[n], qms[g], qms[g]["quant"], luts[g])

        sel = lambda k: np.where(group[:, None] == 0, qms[0][k][None],
                                 qms[1][k][None]).astype(np.int32)
        qq = np.where(group[:, None] == 0, qms[0]["quant"][None],
                      qms[1]["quant"][None]).astype(np.int32)
        lt = dtr.ac_len_table(jnp.asarray(lens), jnp.asarray(group))
        got = np.asarray(dtr.trellis_quantize_blocks_jax(
            jnp.asarray(coeffs), jnp.asarray(sel("iquant")),
            jnp.asarray(sel("bias")), jnp.asarray(qq), lt))
        np.testing.assert_array_equal(got, want, err_msg=f"q={quality}")


@pytest.mark.parametrize("mode", [C.YUV_420, C.YUV_444, C.YUV_400])
def test_device_trellis_encode_matches_host(mode):
    """engine.encode_rgb method 7 (device trellis path) is
    byte-identical to the host orchestrator (itself byte-exact vs the
    reference binary, test_trellis_byte_exact)."""
    from sjpeg_tpu.engine import encode_rgb
    rgb = make_test_image(49, 35, seed=5)
    p = EncoderParam(quality=78, yuv_mode=mode, use_trellis=True)
    assert encode_rgb(rgb, p) == host_encode_rgb(rgb, p), mode


def test_encode_batch_trellis_byte_identical():
    """Batched trellis encode = per-image trellis encode, byte-exact."""
    from sjpeg_tpu.engine import encode_batch, encode_rgb
    rng = np.random.RandomState(9)
    imgs = rng.randint(0, 256, (3, 48, 40, 3), dtype=np.uint8)
    imgs[1] //= 4
    imgs[2] = np.minimum(255, imgs[2] // 8 + 180)
    p = EncoderParam(quality=83, yuv_mode=C.YUV_420, use_trellis=True)
    outs = encode_batch(imgs, p)
    for i in range(len(imgs)):
        assert outs[i] == encode_rgb(imgs[i], p), i


def test_trellis_improves_rate_distortion():
    """Trellis should not produce larger files at matched settings."""
    rgb = make_test_image(64, 64, seed=3)
    base = host_encode_rgb(rgb, EncoderParam(quality=75, yuv_mode=C.YUV_420))
    tr = host_encode_rgb(rgb, EncoderParam(quality=75, yuv_mode=C.YUV_420,
                                           use_trellis=True))
    assert len(tr) <= len(base) * 1.02


@pytest.mark.parametrize("target", ["size", "psnr"])
def test_device_trellis_search_byte_exact(reference_bin, ppm_dir, target):
    """Multi-pass trellis search (method 7 + -size/-psnr) runs through the
    device search path (engine._encode_search_device with evolving trellis
    rate tables, reference src/dichotomy.cc:83-85,144) and must stay
    byte-identical to the reference binary."""
    from sjpeg_tpu import engine

    w, h = 64, 48
    rgb = make_test_image(w, h, seed=7)
    ppm = ppm_dir / "trs.ppm"
    write_ppm(ppm, rgb)
    if target == "size":
        flags = ("-size", "900", "-pass", "5")
    else:
        flags = ("-psnr", "33", "-pass", "5")
    ref = reference_encode(reference_bin, ppm, ppm_dir / f"trs_{target}.jpg",
                           "-q", "75", "-yuv_mode", "1", "-trellis", *flags)
    p = EncoderParam(quality=75, yuv_mode=C.YUV_420, use_trellis=True)
    if target == "size":
        p.set_target_size(900, passes=5)
    else:
        p.set_target_psnr(33.0, passes=5)
    assert engine.encode_rgb(rgb, p) == ref


def test_batch_trellis_search_matches_single(reference_bin, ppm_dir):
    """encode_batch with trellis + target-size routes through per-image
    device searches; results must equal per-image encode_rgb (and the
    reference binary)."""
    from sjpeg_tpu import engine

    w, h = 48, 32
    imgs = np.stack([make_test_image(w, h, seed=s) for s in (1, 2)])
    p = EncoderParam(quality=75, yuv_mode=C.YUV_420, use_trellis=True)
    p.set_target_size(700, passes=4)
    got = engine.encode_batch(imgs, p)
    for i in range(2):
        assert got[i] == engine.encode_rgb(imgs[i], p)
        ppm = ppm_dir / f"btr{i}.ppm"
        write_ppm(ppm, imgs[i])
        ref = reference_encode(reference_bin, ppm, ppm_dir / f"btr{i}.jpg",
                               "-q", "75", "-yuv_mode", "1", "-trellis",
                               "-size", "700", "-pass", "4")
        assert got[i] == ref


def test_pallas_trellis_kernel_matches_scan_interpret():
    """ops.pallas_trellis (VMEM-resident lattice, the TPU serving path
    routed through ops.trellis._trellis_tile) is bit-exact vs the XLA
    scan formulation, shared-table and per-image-table modes, in
    interpret mode."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from sjpeg_tpu import spec
    from sjpeg_tpu.huffman import build_code_lut, k3_default_tables
    from sjpeg_tpu.ops import pallas_trellis as ptr
    from sjpeg_tpu.ops import trellis as dtr

    rng = np.random.RandomState(17)
    N = 96
    coeffs = (rng.randint(-40, 40, (N, 64))
              * rng.choice([0, 1, 1, 1, 16, 64], (N, 64))).astype(np.int32)
    coeffs[:8] = rng.randint(-16384, 16385, (8, 64))  # max-magnitude rows
    coeffs[8:10] = 0
    group = rng.randint(0, 2, N).astype(np.int32)

    defaults = k3_default_tables()
    luts = [build_code_lut(defaults[2], 256),
            build_code_lut(defaults[3], 256)]
    lens = np.stack([l & 0xFF for l in luts]).astype(np.int32)
    param = EncoderParam(quality=75)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[g], minq[g],
                                      param.quantization_bias)
           for g in range(2)]
    sel = lambda k: np.where(group[:, None] == 0, qms[0][k][None],
                             qms[1][k][None]).astype(np.int32)
    iq, ib, qq = sel("iquant"), sel("bias"), sel("quant")

    lt = dtr.ac_len_table(jnp.asarray(lens), jnp.asarray(group))
    want = np.asarray(dtr.trellis_quantize_blocks_jax(
        jnp.asarray(coeffs), jnp.asarray(iq), jnp.asarray(ib),
        jnp.asarray(qq), lt))

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        got = np.asarray(ptr.trellis_quantize_pallas.__wrapped__(
            jnp.asarray(coeffs), jnp.asarray(iq), jnp.asarray(ib),
            jnp.asarray(qq), jnp.asarray(group), jnp.asarray(lens),
            tile=64, tiles_per_img=0))
        np.testing.assert_array_equal(got, want)

        # per-image evolving rate tables (batched dichotomy mode)
        B, per = 3, N // 3
        lens3 = np.stack([lens, lens[::-1],
                          np.minimum(lens + 1, 16)]).astype(np.int32)
        want2 = []
        for i in range(B):
            sl = slice(i * per, (i + 1) * per)
            lt_i = dtr.ac_len_table(jnp.asarray(lens3[i]),
                                    jnp.asarray(group[sl]))
            want2.append(np.asarray(dtr.trellis_quantize_blocks_jax(
                jnp.asarray(coeffs[sl]), jnp.asarray(iq[sl]),
                jnp.asarray(ib[sl]), jnp.asarray(qq[sl]), lt_i)))
        got2 = np.asarray(ptr.trellis_quantize_pallas.__wrapped__(
            jnp.asarray(coeffs), jnp.asarray(iq), jnp.asarray(ib),
            jnp.asarray(qq), jnp.asarray(group), jnp.asarray(lens3),
            tile=16, tiles_per_img=2))
        np.testing.assert_array_equal(got2, np.concatenate(want2, 0))
    finally:
        pl.pallas_call = orig
