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
