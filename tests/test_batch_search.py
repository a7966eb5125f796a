"""Batched target-size / target-PSNR dichotomy vs the single-image search."""

import numpy as np
import pytest

from sjpeg_tpu import EncoderParam
from sjpeg_tpu import constants as C
from sjpeg_tpu import engine
from sjpeg_tpu.params import TARGET_PSNR, TARGET_SIZE

from conftest import make_test_image


def _batch(n=3, w=48, h=40):
    rng = np.random.RandomState(21)
    base = make_test_image(w, h)
    imgs = [base]
    for _ in range(n - 1):
        v = base.astype(np.int32) + rng.randint(-40, 40, base.shape)
        imgs.append(np.clip(v, 0, 255).astype(np.uint8))
    return np.stack(imgs)


@pytest.mark.parametrize("optimized", [False, True])
def test_batch_size_search_matches_single(optimized):
    imgs = _batch()
    param = EncoderParam(quality=90, yuv_mode=C.YUV_420,
                         huffman_compress=optimized,
                         adaptive_quantization=optimized,
                         target_mode=TARGET_SIZE, target_value=900.0,
                         passes=5, tolerance=2.0)
    got = engine.encode_batch(imgs, param)
    for i in range(imgs.shape[0]):
        want = engine.encode_rgb(imgs[i], param)
        assert got[i] == want, (optimized, i)
        assert abs(len(got[i]) - 900) < 300


def test_batch_psnr_search_matches_single():
    imgs = _batch()
    param = EncoderParam(quality=40, yuv_mode=C.YUV_420,
                         huffman_compress=True,
                         adaptive_quantization=True,
                         target_mode=TARGET_PSNR, target_value=33.0,
                         passes=6, tolerance=1.0)
    got = engine.encode_batch(imgs, param)
    for i in range(imgs.shape[0]):
        want = engine.encode_rgb(imgs[i], param)
        assert got[i] == want, i


def test_batch_search_planar_gray():
    imgs = _batch()
    y = imgs[:, :, :, 0].copy()
    param = EncoderParam(quality=85, yuv_mode=C.YUV_400,
                         target_mode=TARGET_SIZE, target_value=700.0,
                         passes=4, tolerance=2.0)
    got = engine.encode_batch_gray(y, param)
    for i in range(y.shape[0]):
        want = engine.encode_gray(y[i], param)
        assert got[i] == want, i


def test_batch_search_bucket_overflow_falls_back():
    imgs = _batch(n=2)
    param = EncoderParam(quality=90, yuv_mode=C.YUV_420,
                         huffman_compress=False,
                         adaptive_quantization=False,
                         target_mode=TARGET_SIZE, target_value=4000.0,
                         passes=3, tolerance=2.0)
    # a tiny bits-per-pixel budget forces the shared bucket to overflow
    got = engine._encode_batch_src(imgs, "rgb", C.YUV_420,
                                   imgs.shape[2], imgs.shape[1], param,
                                   bits_per_pixel_budget=0.0001)
    for i in range(imgs.shape[0]):
        want = engine.encode_rgb(imgs[i], param)
        assert got[i] == want, i


@pytest.mark.parametrize("tm_tv", [(TARGET_SIZE, 900.0),
                                   (TARGET_PSNR, 33.0)])
def test_method0_single_search_matches_host(tm_tv):
    """Regression: method-0 (fixed tables) + target search must run the
    dichotomy, not the fixed fast path (reference LoopScan runs for any
    method when passes > 1, src/enc.cc:2298-2305)."""
    from sjpeg_tpu import host_encode_rgb
    tm, tv = tm_tv
    img = make_test_image(48, 40)
    p = EncoderParam(quality=90, yuv_mode=C.YUV_420,
                     huffman_compress=False, adaptive_quantization=False,
                     target_mode=tm, target_value=tv, passes=5,
                     tolerance=2.0)
    assert engine.encode_rgb(img, p) == host_encode_rgb(img, p)


def test_sharded_api_delegates_search():
    """encode_batch_sharded with passes > 1 must produce search results
    identical to the per-image engine search (delegation path)."""
    from sjpeg_tpu.parallel.api import default_mesh, encode_batch_sharded
    imgs = _batch(n=2)
    param = EncoderParam(quality=90, yuv_mode=C.YUV_420,
                         target_mode=TARGET_SIZE, target_value=1200.0,
                         passes=4, tolerance=2.0)
    got = encode_batch_sharded(imgs, param, mesh=default_mesh())
    for i in range(imgs.shape[0]):
        assert got[i] == engine.encode_rgb(imgs[i], param), i


def test_batch_search_auto_mode_groups():
    """AUTO yuv mode: per-image mode decisions then grouped searches."""
    rng = np.random.RandomState(5)
    colorful = _batch(n=2)[0]
    gray_rgb = np.repeat(rng.randint(0, 256, (40, 48, 1), dtype=np.uint8),
                         3, axis=2)
    imgs = np.stack([colorful, gray_rgb])
    param = EncoderParam(quality=90, yuv_mode=C.YUV_AUTO,
                         target_mode=TARGET_SIZE, target_value=1000.0,
                         passes=4, tolerance=2.0)
    got = engine.encode_batch(imgs, param)
    for i in range(imgs.shape[0]):
        assert got[i] == engine.encode_rgb(imgs[i], param), i
