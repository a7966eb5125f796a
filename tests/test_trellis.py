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


def test_trellis_improves_rate_distortion():
    """Trellis should not produce larger files at matched settings."""
    rgb = make_test_image(64, 64, seed=3)
    base = host_encode_rgb(rgb, EncoderParam(quality=75, yuv_mode=C.YUV_420))
    tr = host_encode_rgb(rgb, EncoderParam(quality=75, yuv_mode=C.YUV_420,
                                           use_trellis=True))
    assert len(tr) <= len(base) * 1.02
