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


def test_sharded_pallas_branch_1x1_mesh():
    """On real hardware the shard_map body routes the bitstream through
    the Pallas vlc+pack / tree-concat kernels; a 1x1 mesh must reproduce
    the unsharded fused engine's stream bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from sjpeg_tpu import spec
    from sjpeg_tpu.engine import (_default_luts_cached,
                                  _quant_device_arrays, encode_core)
    from sjpeg_tpu.parallel import shard as pshard

    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "sp"))
    H, W = 64, 96
    img = make_test_image(W, H, seed=5)
    param = EncoderParam(quality=75)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dcl, acl = _default_luts_cached()

    enc = pshard.make_sharded_encode(mesh, C.YUV_420, H, W, (4, 1, 1))
    out = enc(jnp.asarray(img[None]), iq, ib, dcl, acl)
    total = int(np.asarray(out[1]).reshape(-1)[0])
    stream = np.asarray(out[0]).reshape(-1)

    w2, t2 = encode_core(jnp.asarray(img), iq, ib, dcl, acl,
                         yuv_mode=C.YUV_420, width=W, height=H,
                         nb_blocks=(4, 1, 1))
    assert int(t2) == total
    nw = (total + 31) // 32
    np.testing.assert_array_equal(stream[:nw], np.asarray(w2)[:nw])


def test_batched_search_on_hardware():
    """Batched dichotomy through the relay-fused per-pass programs."""
    from sjpeg_tpu.engine import encode_batch
    from sjpeg_tpu.params import TARGET_PSNR, TARGET_SIZE
    rng = np.random.RandomState(7)
    imgs = rng.randint(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    imgs[1] //= 3
    for tm, tv in ((TARGET_SIZE, 2600.0), (TARGET_PSNR, 30.0)):
        p = EncoderParam(quality=85, yuv_mode=C.YUV_420,
                         target_mode=tm, target_value=tv, passes=5,
                         tolerance=2.0)
        outs = encode_batch(imgs, p)
        for i in range(len(imgs)):
            assert outs[i] == host_encode_rgb(imgs[i], p), (tm, i)


def test_batched_planar_nv12_on_hardware():
    from sjpeg_tpu.engine import (encode_batch_gray, encode_batch_nv12,
                                  encode_batch_yuv)
    from sjpeg_tpu.host_encoder import (encode_gray, encode_nv12,
                                        encode_yuv)
    rng = np.random.RandomState(13)
    b, h, w = 3, 72, 80
    y = rng.randint(0, 256, (b, h, w), dtype=np.uint8)
    u = rng.randint(0, 256, (b, h // 2, w // 2), dtype=np.uint8)
    v = rng.randint(0, 256, (b, h // 2, w // 2), dtype=np.uint8)
    p = EncoderParam(quality=75, yuv_mode=C.YUV_420)
    outs = encode_batch_yuv(y, u, v, True, p)
    for i in range(b):
        assert outs[i] == encode_yuv(y[i], u[i], v[i], True, p), i
    uv = np.stack([u, v], axis=-1)
    outs = encode_batch_nv12(y, uv, p)
    for i in range(b):
        assert outs[i] == encode_nv12(y[i], uv[i], p), i
    pg = EncoderParam(quality=75, yuv_mode=C.YUV_400)
    outs = encode_batch_gray(y, pg)
    for i in range(b):
        assert outs[i] == encode_gray(y[i], pg), i
