"""Opt-in real-hardware parity sweep (SJPEG_TEST_TPU=1).

The regular suite runs the device engine on a virtual CPU mesh; this sweep
exercises the Pallas kernels on the actual chip and asserts byte-parity
with the host oracle across modes, methods, and edge geometries.
"""

import os

import numpy as np
import pytest

if not os.environ.get("SJPEG_TEST_TPU"):
    pytest.skip("set SJPEG_TEST_TPU=1 to run the hardware sweep",
                allow_module_level=True)

from sjpeg_tpu import constants as C
from sjpeg_tpu import host_encode_rgb
from sjpeg_tpu.engine import encode_rgb
from sjpeg_tpu.params import EncoderParam

from conftest import make_test_image


@pytest.mark.parametrize("size", [(64, 64), (97, 65), (129, 17)])
@pytest.mark.parametrize("mode", [C.YUV_420, C.YUV_444, C.YUV_400])
@pytest.mark.parametrize("method", [0, 4, 7])
def test_device_matches_oracle_on_hardware(size, mode, method):
    w, h = size
    img = make_test_image(w, h, seed=w * h)
    p = EncoderParam(quality=75, yuv_mode=mode,
                     huffman_compress=(method != 0),
                     adaptive_quantization=(method != 0),
                     use_trellis=(method == 7))
    assert encode_rgb(img, p) == host_encode_rgb(img, p)


@pytest.mark.parametrize("method", [0, 4, 7])
def test_batched_matches_per_image_on_hardware(method):
    from sjpeg_tpu.engine import encode_batch
    rng = np.random.RandomState(31)
    imgs = rng.randint(0, 256, (4, 80, 72, 3), dtype=np.uint8)
    imgs[1] //= 4
    imgs[2] = np.minimum(255, imgs[2] // 8 + 180)
    p = EncoderParam(quality=80, yuv_mode=C.YUV_420,
                     huffman_compress=(method != 0),
                     adaptive_quantization=(method != 0),
                     use_trellis=(method == 7))
    outs = encode_batch(imgs, p)
    for i in range(len(imgs)):
        assert outs[i] == encode_rgb(imgs[i], p), i


def test_extreme_content_on_hardware():
    """Sparse blocks (long zero runs, escapes, early EOB) and saturated
    blocks (max-size levels) stress the grouped Huffman lookups, the
    escape cond-path and the word loop's dynamic bounds."""
    cases = []
    sparse = np.zeros((80, 96, 3), np.uint8)
    sparse[::17, ::23] = 255
    cases.append(sparse)
    checker = (np.indices((80, 96)).sum(0) % 2 * 255).astype(np.uint8)
    cases.append(np.stack([checker, 255 - checker, checker], -1))
    flat = np.full((80, 96, 3), 128, np.uint8)
    cases.append(flat)
    for q in (10, 75, 98):
        p = EncoderParam(quality=q, yuv_mode=C.YUV_420,
                         huffman_compress=False,
                         adaptive_quantization=False)
        for i, img in enumerate(cases):
            assert encode_rgb(img, p) == host_encode_rgb(img, p), (q, i)
