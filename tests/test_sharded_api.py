"""encode_batch_sharded vs the serial engine: byte-identical JPEGs."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from sjpeg_tpu import constants as C
from sjpeg_tpu.params import EncoderParam
from sjpeg_tpu.parallel.api import encode_batch_sharded

from conftest import make_test_image


def _mesh(dp, sp):
    if len(jax.devices()) < dp * sp:
        pytest.skip("not enough devices")
    devs = np.array(jax.devices()[: dp * sp]).reshape(dp, sp)
    return Mesh(devs, ("dp", "sp"))


def _imgs(b, h, w, seed0=0):
    return np.stack([make_test_image(w, h, seed=seed0 + i)
                     for i in range(b)])


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 8)])
@pytest.mark.parametrize("huff,adapt,mode", [
    (False, False, C.YUV_420),  # method 0: fixed tables, fused
    (True, True, C.YUV_420),    # method 4 (reference default)
    (True, True, C.YUV_444),
    (True, False, C.YUV_400),   # method 1: two-pass only, gray
])
def test_sharded_byte_identical(dp, sp, huff, adapt, mode):
    mesh = _mesh(dp, sp)
    h = 16 * sp * 2             # two MCU rows per stripe
    imgs = _imgs(dp * 2, h, 72)
    p = EncoderParam(quality=78, yuv_mode=mode, huffman_compress=huff,
                     adaptive_quantization=adapt)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_rgb
    for i in range(len(imgs)):
        assert got[i] == encode_rgb(imgs[i], p), (huff, adapt, mode, i)


def test_sharded_share_statistics_valid():
    """share_statistics knob: one table/matrix set from psummed batch
    statistics; streams decode and match the unsharded shared path."""
    mesh = _mesh(2, 4)
    imgs = _imgs(4, 128, 48, seed0=9)
    p = EncoderParam(quality=85, yuv_mode=C.YUV_420)
    got = encode_batch_sharded(imgs, p, mesh=mesh, share_statistics=True)
    from sjpeg_tpu.engine import encode_batch
    want = encode_batch(imgs, p, share_statistics=True)
    assert got == want


def test_sharded_ragged_tiny():
    """Fewer MCU rows than stripes (40px -> 3 rows on sp=8): most stripes
    are all-padding and must contribute zero bits/statistics."""
    mesh = _mesh(1, 8)
    imgs = _imgs(2, 40, 40)     # 40px -> 3 luma MCU rows, not % 8
    p = EncoderParam(quality=75, yuv_mode=C.YUV_420)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_rgb
    for i in range(len(imgs)):
        assert got[i] == encode_rgb(imgs[i], p)


@pytest.mark.parametrize("h,w,mode,m4", [
    (120, 176, C.YUV_420, False),   # partial last MCU row (sub_h=8), rows%sp==0
    (97, 65, C.YUV_420, False),     # ragged rows + partial row + x-clip
    (97, 65, C.YUV_420, True),      # same with adaptive + two-pass tables
    (100, 52, C.YUV_444, True),     # 444: 13 8px rows on sp=4 + partial
    (270, 120, C.YUV_420, False),   # 1080p-like: 17 MCU rows on sp=4
])
def test_sharded_ragged_byte_identical(h, w, mode, m4):
    """Ragged stripe geometry (VERDICT r2 item 5): images whose MCU rows
    don't divide by sp — including a partial last MCU row with the
    AverageExtraLuma flatten — take the sharded fast path and stay
    byte-identical to the serial engine."""
    mesh = _mesh(2, 4)
    imgs = _imgs(4, h, w, seed0=3)
    p = EncoderParam(quality=80, yuv_mode=mode, huffman_compress=m4,
                     adaptive_quantization=m4)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_rgb
    for i in range(len(imgs)):
        assert got[i] == encode_rgb(imgs[i], p), (h, w, mode, m4, i)


def test_sharded_ragged_batch():
    """B not divisible by dp: padded with dummy images, outputs dropped."""
    mesh = _mesh(2, 4)
    imgs = _imgs(3, 64, 48, seed0=5)
    p = EncoderParam(quality=75, yuv_mode=C.YUV_420)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    assert len(got) == 3
    from sjpeg_tpu.engine import encode_rgb
    for i in range(3):
        assert got[i] == encode_rgb(imgs[i], p)


@pytest.mark.parametrize("shape", [(64, 64), (100, 52)])
def test_sharded_trellis_byte_identical(shape):
    """Method 7 (trellis) on the (dp, sp) mesh: stripes are block
    -independent so the trellis quantizer shards; bytes must equal the
    serial engine, incl. ragged stripe geometry."""
    h, w = shape
    mesh = _mesh(2, 4)
    imgs = _imgs(2, h, w, seed0=9)
    p = EncoderParam(quality=79, yuv_mode=C.YUV_420, use_trellis=True)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_rgb
    for i in range(len(imgs)):
        assert got[i] == encode_rgb(imgs[i], p), (shape, i)


@pytest.mark.parametrize("target,m4", [("size", True), ("psnr", True),
                                       ("size", False)])
def test_sharded_search_byte_identical(target, m4):
    """Multi-pass target-size / target-PSNR dichotomies run sharded
    (stripe-sharded passes, device tables, one eval fetch per pass) and
    must match the serial per-image search byte-for-byte."""
    mesh = _mesh(2, 4)
    imgs = _imgs(2, 64, 48, seed0=21)
    p = EncoderParam(quality=75, yuv_mode=C.YUV_420, huffman_compress=m4,
                     adaptive_quantization=m4)
    if target == "size":
        p.set_target_size(900, passes=5)
    else:
        p.set_target_psnr(33, passes=5)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_rgb
    for i in range(len(imgs)):
        assert got[i] == encode_rgb(imgs[i], p), (target, m4, i)


def test_sharded_sharp_byte_identical():
    """Sharp YUV shards: mesh conversion (dp-parallel iterative
    refinement) + planes-in stripe pipeline == the serial engine
    (reference EncoderSharp420, src/enc.cc:2100-2127)."""
    mesh = _mesh(2, 4)
    imgs = _imgs(4, 128, 64, seed0=21)
    p = EncoderParam(quality=75, yuv_mode=C.YUV_SHARP)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_rgb
    for i in range(len(imgs)):
        assert got[i] == encode_rgb(imgs[i], p), i


def test_sharded_mixed_auto_byte_identical():
    """A mixed-AUTO batch (444 + 400 + sharp decisions in one call)
    shards per resolved-mode group instead of delegating
    (src/enc.cc:2132-2154 per-image semantics)."""
    mesh = _mesh(2, 4)
    h = w = 128
    rng = np.random.RandomState(0)
    noisy = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    gray = np.repeat(rng.randint(0, 256, (h, w, 1)).astype(np.uint8),
                     3, axis=2)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack([xx * 2 % 256, yy * 2 % 256,
                     (xx + yy) % 256], -1).astype(np.uint8)
    imgs = np.stack([noisy, gray, grad,
                     rng.randint(0, 256, (h, w, 3)).astype(np.uint8)])
    p = EncoderParam(quality=75, yuv_mode=C.YUV_AUTO)
    from sjpeg_tpu.ops import riskiness as dev_risk
    ss, cc, gg = jax.device_get(dev_risk.risk_stats(imgs))
    modes = {dev_risk.finish_riskiness(ss[i], cc[i], gg[i], w, h)[0]
             for i in range(4)}
    assert len(modes) > 1, modes            # the batch must really mix
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_batch
    want = encode_batch(imgs, p)
    assert got == want


@pytest.mark.parametrize("target_mode", ["size", "psnr"])
def test_sharded_trellis_search_byte_identical(target_mode):
    """Trellis dichotomies shard: per-pass stripe trellis with evolving
    per-image rate tables (src/dichotomy.cc:83-104) == serial engine."""
    mesh = _mesh(2, 4)
    imgs = _imgs(2, 64, 48, seed0=31)
    p = EncoderParam(yuv_mode=C.YUV_420, use_trellis=True)
    if target_mode == "size":
        p.set_target_size(1500, passes=4)
    else:
        p.set_target_psnr(34.0, passes=3)
    got = encode_batch_sharded(imgs, p, mesh=mesh)
    from sjpeg_tpu.engine import encode_batch
    want = encode_batch(imgs, p)
    assert got == want
