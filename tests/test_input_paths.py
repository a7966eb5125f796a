"""Planar YUV / NV12 / grayscale input paths vs the reference C API."""

import subprocess

import numpy as np
import pytest

from sjpeg_tpu import EncoderParam, host_encode_gray, host_encode_yuv
from sjpeg_tpu import constants as C
from sjpeg_tpu.host_encoder import encode_nv12, encode_nv21

from conftest import REFERENCE_BUILD, REFERENCE_SRC, make_test_image


@pytest.fixture(scope="module")
def yuv_harness(reference_bin, tmp_path_factory):
    """Harness around the reference lib for the YUV-input C++ APIs."""
    d = tmp_path_factory.mktemp("yuvapi")
    src = d / "encode_yuv.cc"
    src.write_text(r"""
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include "sjpeg.h"
// argv: mode W H quality  (mode: 444, 420, nv12, nv21, gray)
int main(int argc, char** argv) {
  const std::string mode = argv[1];
  const int W = atoi(argv[2]), H = atoi(argv[3]);
  const float q = atof(argv[4]);
  sjpeg::EncoderParam param(q);
  param.yuv_mode = (mode == "444") ? SJPEG_YUV_444 : SJPEG_YUV_420;
  const int uvw = (W + 1) / 2, uvh = (H + 1) / 2;
  std::string out;
  auto sink = sjpeg::MakeByteSink(&out);
  bool ok = false;
  if (mode == "gray") {
    std::vector<uint8_t> y(W * H);
    if (fread(y.data(), 1, y.size(), stdin) != y.size()) return 1;
    ok = sjpeg::EncodeGray(y.data(), W, H, W, param, &out);
  } else if (mode == "444") {
    std::vector<uint8_t> y(W * H), u(W * H), v(W * H);
    fread(y.data(), 1, y.size(), stdin);
    fread(u.data(), 1, u.size(), stdin);
    fread(v.data(), 1, v.size(), stdin);
    ok = sjpeg::EncodeYUV444(y.data(), W, u.data(), W, v.data(), W,
                             W, H, param, sink.get());
  } else if (mode == "420") {
    std::vector<uint8_t> y(W * H), u(uvw * uvh), v(uvw * uvh);
    fread(y.data(), 1, y.size(), stdin);
    fread(u.data(), 1, u.size(), stdin);
    fread(v.data(), 1, v.size(), stdin);
    ok = sjpeg::EncodeYUV420(y.data(), W, u.data(), uvw, v.data(), uvw,
                             W, H, param, sink.get());
  } else {
    std::vector<uint8_t> y(W * H), uv(2 * uvw * uvh);
    fread(y.data(), 1, y.size(), stdin);
    fread(uv.data(), 1, uv.size(), stdin);
    ok = (mode == "nv12")
        ? sjpeg::EncodeNV12(y.data(), W, uv.data(), 2 * uvw, W, H, param,
                            sink.get())
        : sjpeg::EncodeNV21(y.data(), W, uv.data(), 2 * uvw, W, H, param,
                            sink.get());
  }
  if (!ok) return 1;
  fwrite(out.data(), 1, out.size(), stdout);
  return 0;
}
""")
    exe = d / "encode_yuv"
    lib = REFERENCE_BUILD / "libsjpeg.a"
    if not lib.exists():
        pytest.skip("reference static lib not available")
    subprocess.run(["g++", "-O2", "-I", str(REFERENCE_SRC / "src"),
                    "-o", str(exe), str(src), str(lib)], check=True)
    return exe


def _planes(w, h, seed):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (h, w), dtype=np.uint8)
    uvw, uvh = (w + 1) // 2, (h + 1) // 2
    u = rng.randint(0, 256, (uvh, uvw), dtype=np.uint8)
    v = rng.randint(0, 256, (uvh, uvw), dtype=np.uint8)
    return y, u, v


@pytest.mark.parametrize("size", [(64, 48), (33, 17)])
def test_yuv420_planar_matches_reference(yuv_harness, size):
    w, h = size
    y, u, v = _planes(w, h, 1)
    payload = y.tobytes() + u.tobytes() + v.tobytes()
    ref = subprocess.run([str(yuv_harness), "420", str(w), str(h), "80"],
                         input=payload, capture_output=True, check=True
                         ).stdout
    ours = host_encode_yuv(y, u, v, is_420=True,
                           param=EncoderParam(quality=80,
                                              yuv_mode=C.YUV_420))
    assert ours == ref


@pytest.mark.parametrize("size", [(64, 48), (31, 9)])
def test_yuv444_planar_matches_reference(yuv_harness, size):
    w, h = size
    rng = np.random.RandomState(2)
    y, u, v = (rng.randint(0, 256, (h, w), dtype=np.uint8) for _ in range(3))
    payload = y.tobytes() + u.tobytes() + v.tobytes()
    ref = subprocess.run([str(yuv_harness), "444", str(w), str(h), "85"],
                         input=payload, capture_output=True, check=True
                         ).stdout
    ours = host_encode_yuv(y, u, v, is_420=False,
                           param=EncoderParam(quality=85,
                                              yuv_mode=C.YUV_444))
    assert ours == ref


@pytest.mark.parametrize("kind", ["nv12", "nv21"])
def test_nv12_matches_reference(yuv_harness, kind):
    w, h = 64, 48
    y, u, v = _planes(w, h, 3)
    uv = np.stack([u, v] if kind == "nv12" else [v, u], axis=-1)
    payload = y.tobytes() + np.ascontiguousarray(uv).tobytes()
    ref = subprocess.run([str(yuv_harness), kind, str(w), str(h), "80"],
                         input=payload, capture_output=True, check=True
                         ).stdout
    fn = encode_nv12 if kind == "nv12" else encode_nv21
    ours = fn(y, uv, EncoderParam(quality=80, yuv_mode=C.YUV_420))
    assert ours == ref


def test_gray_matches_reference(yuv_harness):
    w, h = 60, 44
    y = make_test_image(w, h)[:, :, 0].copy()
    ref = subprocess.run([str(yuv_harness), "gray", str(w), str(h), "75"],
                         input=y.tobytes(), capture_output=True, check=True
                         ).stdout
    ours = host_encode_gray(y, EncoderParam(quality=75,
                                            yuv_mode=C.YUV_400))
    assert ours == ref


# ---- batched device input paths (one program per batch) ----

def _batched(planes, n=3):
    """Stack `n` seeded variants of each plane into a batch."""
    rng = np.random.RandomState(9)
    outs = []
    for p in planes:
        variants = [p]
        for _ in range(n - 1):
            q = p.astype(np.int32) + rng.randint(-9, 9, p.shape)
            variants.append(np.clip(q, 0, 255).astype(np.uint8))
        outs.append(np.stack(variants))
    return outs


@pytest.mark.parametrize("optimized", [False, True])
def test_encode_batch_yuv_matches_host(optimized):
    from sjpeg_tpu import encode_batch_yuv
    w, h = 40, 24
    y, u, v = _planes(w, h, 11)
    yb, ub, vb = _batched([y, u, v])
    param = EncoderParam(quality=77, yuv_mode=C.YUV_420,
                         huffman_compress=optimized,
                         adaptive_quantization=optimized)
    got = encode_batch_yuv(yb, ub, vb, True, param)
    for i in range(yb.shape[0]):
        want = host_encode_yuv(yb[i], ub[i], vb[i], True, param)
        assert got[i] == want, (optimized, i)


def test_encode_batch_yuv444_matches_host():
    from sjpeg_tpu import encode_batch_yuv
    w, h = 32, 16
    rng = np.random.RandomState(12)
    y, u, v = (rng.randint(0, 256, (h, w), dtype=np.uint8)
               for _ in range(3))
    yb, ub, vb = _batched([y, u, v])
    param = EncoderParam(quality=88, yuv_mode=C.YUV_444,
                         huffman_compress=False,
                         adaptive_quantization=False)
    got = encode_batch_yuv(yb, ub, vb, False, param)
    for i in range(yb.shape[0]):
        want = host_encode_yuv(yb[i], ub[i], vb[i], False, param)
        assert got[i] == want, i


def test_encode_batch_gray_matches_host():
    from sjpeg_tpu import encode_batch_gray
    w, h = 40, 24
    y = make_test_image(w, h)[:, :, 1].copy()
    (yb,) = _batched([y])
    param = EncoderParam(quality=75, yuv_mode=C.YUV_400,
                         huffman_compress=False,
                         adaptive_quantization=False)
    got = encode_batch_gray(yb, param)
    for i in range(yb.shape[0]):
        assert got[i] == host_encode_gray(yb[i], param), i


@pytest.mark.parametrize("kind", ["nv12", "nv21"])
def test_encode_batch_nv_matches_host(kind):
    from sjpeg_tpu import encode_batch_nv12, encode_batch_nv21
    w, h = 40, 24
    y, u, v = _planes(w, h, 13)
    uv = np.stack([u, v] if kind == "nv12" else [v, u], axis=-1)
    yb, uvb0, uvb1 = _batched([y, uv[..., 0], uv[..., 1]])
    uvb = np.stack([uvb0, uvb1], axis=-1)
    param = EncoderParam(quality=80, yuv_mode=C.YUV_420,
                         huffman_compress=False,
                         adaptive_quantization=False)
    fn_b = encode_batch_nv12 if kind == "nv12" else encode_batch_nv21
    fn_h = encode_nv12 if kind == "nv12" else encode_nv21
    got = fn_b(yb, uvb, param)
    for i in range(yb.shape[0]):
        assert got[i] == fn_h(yb[i], uvb[i], param), i


def test_encode_many_mixed_shapes():
    from sjpeg_tpu import engine
    rng = np.random.RandomState(31)
    imgs = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for (h, w) in [(24, 40), (40, 24), (24, 40), (17, 33)]]
    param = EncoderParam(quality=75, yuv_mode=C.YUV_420)
    got = engine.encode_many(imgs, param)
    for i, img in enumerate(imgs):
        assert got[i] == engine.encode_rgb(img, param), i


def test_encode_pipelined_matches_encode_batch():
    """encode_pipelined (double-buffered serving wrapper) yields exactly
    encode_batch's bytes for every batch, in order."""
    import numpy as np
    from sjpeg_tpu import EncoderParam, constants as C
    from sjpeg_tpu.engine import encode_batch, encode_pipelined

    rng = np.random.RandomState(4)
    batches = [rng.randint(0, 256, (2, 40, 48, 3), dtype=np.uint8)
               for _ in range(4)]
    param = EncoderParam(quality=77, yuv_mode=C.YUV_420)
    want = [encode_batch(b, param) for b in batches]
    got = list(encode_pipelined(iter(batches), param, depth=2))
    assert got == want
