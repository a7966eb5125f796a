"""Micro-profile of the tree concat: per-level merge cost + finisher.

    python scripts/profile_concat.py [batch] [size]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sjpeg_tpu import constants as C
from sjpeg_tpu.engine import (_default_luts_cached, _interleave_coeffs,
                              _quant_device_arrays, _stage_batch_coeffs)
from sjpeg_tpu import pipeline, spec
from sjpeg_tpu.ops import pallas_quant_pack, pallas_tree_concat as ptc
from sjpeg_tpu.params import EncoderParam


def _force(r):
    leaf = jax.tree.leaves(r)[-1]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, reps=8):
    _force(fn())
    t0 = time.perf_counter()
    _force(fn())
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    _force(r)
    t_n = time.perf_counter() - t0
    return max((t_n - t_one) / (reps - 1), t_n / reps)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    w = h = size
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    rgb = img.astype(np.uint8)
    dev = jax.device_put(np.broadcast_to(rgb, (batch, h, w, 3)).copy())

    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False, yuv_mode=C.YUV_420)
    layout = pipeline.component_layout(C.YUV_420, w, h)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _default_luts_cached()
    nb = tuple(layout.nb_blocks)
    bucket = max(4096, int(w * h * 4.0 / 32))

    coeffs, _ = _stage_batch_coeffs(dev, yuv_mode=C.YUV_420, width=w,
                                    height=h, with_histo=False)

    @jax.jit
    def prep(coeffs):
        cinter, dc2, group2 = _interleave_coeffs(coeffs, iq, ib, nb, batch)
        return pallas_quant_pack.quant_vlc_pack_pallas(
            cinter, dc2, group2, iq, ib, dc_luts, ac_luts)

    words, bit_lens = jax.block_until_ready(prep(coeffs))
    print("blocks:", words.shape[0], " mean bits:",
          float(jnp.mean(bit_lens)), " max bits:", float(jnp.max(bit_lens)))

    # tree levels only (stop before finisher)
    @functools.partial(jax.jit, static_argnames=("n_images", "sliced"))
    def tree_only(words, bit_lens, n_images, sliced=True):
        N, W = words.shape
        per_img = N // n_images
        u = 1 << max(per_img - 1, 1).bit_length()
        if u < per_img:
            u <<= 1
        pad = u - per_img
        if pad:
            words = jnp.pad(words.reshape(n_images, per_img, W),
                            ((0, 0), (0, pad), (0, 0))).reshape(-1, W)
            bit_lens = jnp.pad(bit_lens.reshape(n_images, per_img),
                               ((0, 0), (0, pad))).reshape(-1)
        units = words
        lens = bit_lens.astype(jnp.int32)
        ww = W
        n_units = n_images * u
        level = 0
        while n_units > n_images and ww < ptc.W_STOP:
            per = n_units // n_images
            radix = (4 if per % 4 == 0 and per >= 4
                     and ww * 4 <= ptc.W_STOP else 2)
            rows = n_units // radix
            units = units.reshape(rows, radix * ww)
            lens = lens.reshape(rows, radix)
            out_w = radix * ww
            if sliced and radix == 4 and level < ptc.SLICED_LEVELS:
                out_w = 2 * ww
            units, lens_row = ptc._merge_level(units, lens, ww, radix,
                                               out_w)
            ww = out_w
            n_units = rows
            lens = lens_row.reshape(-1)
            level += 1
        return units.reshape(-1, ww), lens.reshape(-1)

    t_tree = timeit(lambda: tree_only(words, bit_lens, batch))
    print(f"tree levels : {t_tree*1e3:8.2f} ms")

    units, lens = jax.block_until_ready(tree_only(words, bit_lens, batch))
    print("post-tree units:", units.shape)

    @functools.partial(jax.jit, static_argnames=("n_images", "bucket"))
    def fin(units, lens, n_images, bucket):
        return ptc._finish_units(units, lens, n_images, bucket)

    t_fin = timeit(lambda: fin(units, lens, batch, bucket))
    print(f"finisher    : {t_fin*1e3:8.2f} ms")

    t_full = timeit(lambda: ptc.concat_block_streams_tree(
        words, bit_lens, n_images=batch, bucket=bucket))
    print(f"full concat : {t_full*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
