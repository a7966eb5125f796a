"""Golden tests: host (NumPy) encoder vs the reference binary, byte-for-byte,
plus decodability / PSNR sanity via Pillow."""

import io

import numpy as np
import pytest

from sjpeg_tpu import EncoderParam, host_encode_rgb, host_encode_gray
from sjpeg_tpu import constants as C

from conftest import (make_test_image, make_smooth_image, write_ppm,
                      reference_encode)

MODES = [(C.YUV_420, "1"), (C.YUV_444, "3"), (C.YUV_400, "4")]
METHODS = {
    0: ["-no_adapt", "-no_optim"],
    1: ["-no_adapt"],
    3: ["-no_optim"],
    4: [],
}


def _param(method, quality, yuv_mode):
    return EncoderParam(quality=quality, yuv_mode=yuv_mode,
                        huffman_compress=(method in (1, 4)),
                        adaptive_quantization=(method in (3, 4)))


@pytest.mark.parametrize("size", [(64, 64), (97, 65), (8, 8), (129, 17)])
@pytest.mark.parametrize("method", [0, 1, 3, 4])
@pytest.mark.parametrize("mode_flag", MODES)
def test_byte_exact_vs_reference(reference_bin, ppm_dir, size, method,
                                 mode_flag):
    mode, flag = mode_flag
    w, h = size
    rgb = make_test_image(w, h)
    ppm = ppm_dir / f"img_{w}x{h}.ppm"
    write_ppm(ppm, rgb)
    ref = reference_encode(reference_bin, ppm,
                           ppm_dir / f"ref_{w}x{h}_{flag}_{method}.jpg",
                           "-q", "75", "-yuv_mode", flag, *METHODS[method])
    ours = host_encode_rgb(rgb, _param(method, 75, mode))
    assert ours == ref


@pytest.mark.parametrize("quality", [10, 30, 50, 75, 90, 93, 95, 100])
def test_byte_exact_quality_sweep(reference_bin, ppm_dir, quality):
    rgb = make_test_image(120, 88, seed=7)
    ppm = ppm_dir / "sweep.ppm"
    write_ppm(ppm, rgb)
    ref = reference_encode(reference_bin, ppm, ppm_dir / f"q{quality}.jpg",
                           "-q", str(quality), "-yuv_mode", "1")
    ours = host_encode_rgb(rgb, _param(4, quality, C.YUV_420))
    assert ours == ref


@pytest.mark.parametrize("size", [(40, 24), (33, 9)])
def test_smooth_image_eob_runs(reference_bin, ppm_dir, size):
    w, h = size
    rgb = make_smooth_image(w, h)
    ppm = ppm_dir / f"smooth_{w}x{h}.ppm"
    write_ppm(ppm, rgb)
    ref = reference_encode(reference_bin, ppm,
                           ppm_dir / f"smooth_{w}x{h}.jpg",
                           "-q", "90", "-yuv_mode", "1")
    ours = host_encode_rgb(rgb, _param(4, 90, C.YUV_420))
    assert ours == ref


def test_decodable_and_psnr():
    from PIL import Image
    rgb = make_test_image(256, 192)
    out = host_encode_rgb(rgb, _param(4, 90, C.YUV_444))
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == rgb.shape
    mse = np.mean((dec.astype(np.float64) - rgb) ** 2)
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 30.0


def test_gray_encode_decodable():
    from PIL import Image
    gray = make_test_image(100, 60)[:, :, 1].copy()
    out = host_encode_gray(gray, EncoderParam(quality=85,
                                              yuv_mode=C.YUV_400))
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("L"))
    assert dec.shape == gray.shape
    mse = np.mean((dec.astype(np.float64) - gray) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 30.0


def test_metadata_segments_roundtrip():
    from sjpeg_tpu import dimensions
    rgb = make_test_image(32, 32)
    exif = b"\x49\x49\x2a\x00" + b"\x00" * 16
    icc = bytes(range(256)) * 300     # forces multi-chunk ICC
    param = _param(4, 75, C.YUV_420)
    param.exif = exif
    param.iccp = icc
    out = host_encode_rgb(rgb, param)
    assert b"Exif\x00\x00" in out
    assert out.count(b"ICC_PROFILE") == 2   # 76800 bytes -> 2 chunks
    dims = dimensions(out)
    assert dims == (32, 32, True)


def test_psnr_at_matched_size_equals_reference(reference_bin, ppm_dir):
    """BASELINE promise: PSNR >= sjpeg at matched file size across the
    quality range.  Streams are byte-identical, so sizes and PSNR match
    exactly — assert that explicitly over a sweep."""
    import io
    from PIL import Image
    rgb = make_test_image(96, 96, seed=5)
    ppm = ppm_dir / "rd.ppm"
    write_ppm(ppm, rgb)
    for q in (10, 25, 50, 75, 95):
        ref = reference_encode(reference_bin, ppm, ppm_dir / f"rd{q}.jpg",
                               "-q", str(q), "-yuv_mode", "1")
        ours = host_encode_rgb(rgb, _param(4, q, C.YUV_420))
        assert len(ours) == len(ref)
        dec_o = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
        dec_r = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB"))
        np.testing.assert_array_equal(dec_o, dec_r)
