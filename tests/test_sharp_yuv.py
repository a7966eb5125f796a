"""Sharp YUV 4:2:0 conversion vs the reference, plane- and byte-exact."""

import subprocess

import numpy as np
import pytest

from sjpeg_tpu import EncoderParam, host_encode_rgb
from sjpeg_tpu import constants as C
from sjpeg_tpu.sharp_yuv import sharp_rgb_to_yuv420

from conftest import REFERENCE_BUILD, make_test_image, write_ppm, \
    reference_encode


@pytest.fixture(scope="module")
def sharp_dumper(reference_bin, tmp_path_factory):
    """Builds a tiny harness around the reference lib to dump Y/U/V planes."""
    d = tmp_path_factory.mktemp("sharp")
    src = d / "dump_sharp.cc"
    src.write_text(r"""
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <vector>
namespace sjpeg {
void ApplySharpYUVConversion(const uint8_t* const rgb, int W, int H,
                             int stride, uint8_t* y, uint8_t* u, uint8_t* v);
}
int main(int argc, char** argv) {
  int W = atoi(argv[1]), H = atoi(argv[2]);
  std::vector<uint8_t> rgb(W * H * 3);
  if (fread(rgb.data(), 1, rgb.size(), stdin) != rgb.size()) return 1;
  int uvw = (W + 1) / 2, uvh = (H + 1) / 2;
  std::vector<uint8_t> y(W * H), u(uvw * uvh), v(uvw * uvh);
  sjpeg::ApplySharpYUVConversion(rgb.data(), W, H, 3 * W, y.data(),
                                 u.data(), v.data());
  fwrite(y.data(), 1, y.size(), stdout);
  fwrite(u.data(), 1, u.size(), stdout);
  fwrite(v.data(), 1, v.size(), stdout);
  return 0;
}
""")
    exe = d / "dump_sharp"
    lib = REFERENCE_BUILD / "libsjpeg.a"
    if not lib.exists():
        pytest.skip("reference static lib not available")
    subprocess.run(["g++", "-O2", "-o", str(exe), str(src), str(lib)],
                   check=True)
    return exe


@pytest.mark.parametrize("size", [(64, 64), (97, 65), (16, 16), (5, 9)])
def test_planes_match_reference(sharp_dumper, size):
    w, h = size
    rgb = make_test_image(w, h, seed=w * h)
    out = subprocess.run([str(sharp_dumper), str(w), str(h)],
                         input=rgb.tobytes(), capture_output=True).stdout
    uvw, uvh = (w + 1) // 2, (h + 1) // 2
    ry = np.frombuffer(out[:w * h], np.uint8).reshape(h, w)
    ru = np.frombuffer(out[w * h:w * h + uvw * uvh], np.uint8).reshape(uvh,
                                                                       uvw)
    rv = np.frombuffer(out[w * h + uvw * uvh:], np.uint8).reshape(uvh, uvw)
    y, u, v = sharp_rgb_to_yuv420(rgb)
    np.testing.assert_array_equal(y, ry)
    np.testing.assert_array_equal(u, ru)
    np.testing.assert_array_equal(v, rv)


@pytest.mark.parametrize("size", [(64, 64), (97, 65), (4, 7)])
@pytest.mark.parametrize("method", [0, 4])
def test_sharp_encode_byte_exact(reference_bin, ppm_dir, size, method):
    w, h = size
    rgb = make_test_image(w, h, seed=7 * w + h)
    ppm = ppm_dir / f"sharp_{w}x{h}.ppm"
    write_ppm(ppm, rgb)
    flags = ["-no_adapt", "-no_optim"] if method == 0 else []
    ref = reference_encode(reference_bin, ppm,
                           ppm_dir / f"sharp_{w}x{h}_{method}.jpg",
                           "-q", "80", "-yuv_mode", "2", *flags)
    p = EncoderParam(quality=80, yuv_mode=C.YUV_SHARP,
                     huffman_compress=(method == 4),
                     adaptive_quantization=(method == 4))
    assert host_encode_rgb(rgb, p) == ref


def test_device_sharp_matches_oracle():
    """JAX sharp conversion is plane-exact vs the NumPy oracle."""
    import numpy as np
    from sjpeg_tpu.sharp_yuv import sharp_rgb_to_yuv420
    from sjpeg_tpu.sharp_yuv_device import sharp_rgb_to_yuv420_device
    rng = np.random.RandomState(11)
    for (h, w) in [(64, 64), (97, 65), (33, 48), (4, 10), (128, 96)]:
        rgb = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        yo, uo, vo = sharp_rgb_to_yuv420(rgb)
        yd, ud, vd = [np.asarray(x)
                      for x in sharp_rgb_to_yuv420_device(rgb)]
        np.testing.assert_array_equal(yd, yo)
        np.testing.assert_array_equal(ud, uo)
        np.testing.assert_array_equal(vd, vo)


def test_device_sharp_encode_end_to_end():
    """encode_rgb(SHARP) through the device engine = host oracle bytes."""
    import numpy as np
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import host_encode_rgb
    from sjpeg_tpu.engine import encode_rgb
    from sjpeg_tpu.params import EncoderParam
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (56, 40, 3), dtype=np.uint8)
    p = EncoderParam(quality=80, yuv_mode=C.YUV_SHARP)
    assert encode_rgb(rgb, p) == host_encode_rgb(rgb, p)
