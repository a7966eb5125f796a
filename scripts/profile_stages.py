"""Per-stage device timing of the flagship encode path (bench config).

axon-relay quirk: `jax.block_until_ready` may return without waiting, so
every measurement queues `reps` executions back-to-back and forces
completion with one small host fetch at the end; the fixed fetch latency
(~35 ms tunnel RPC) is measured separately and subtracted.

    python scripts/profile_stages.py [batch] [size]
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
from sjpeg_tpu import pipeline, spec
from sjpeg_tpu.engine import (_default_luts_cached, _quant_device_arrays,
                              _stage_batch_coeffs, _stage_batch_quantize,
                              encode_batch_core)
from sjpeg_tpu.ops import pack
from sjpeg_tpu.params import EncoderParam


def _force(r):
    """Force completion via a real (tiny) host fetch."""
    leaf = jax.tree.leaves(r)[-1]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, reps=8):
    _force(fn())                       # warm (compile + first run)
    t0 = time.perf_counter()
    _force(fn())
    t_one = time.perf_counter() - t0   # 1 exec + fetch
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    _force(r)
    t_n = time.perf_counter() - t0     # reps execs + fetch
    # subtract the fetch+dispatch overhead measured by the single-run probe
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
    batch_np = np.broadcast_to(rgb, (batch, h, w, 3)).copy()
    dev = jax.device_put(batch_np)

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
    px = batch * w * h

    t_full = timeit(lambda: encode_batch_core(
        dev, iq, ib, dc_luts, ac_luts, yuv_mode=C.YUV_420, width=w,
        height=h, nb_blocks=nb, bucket=bucket))
    print(f"full fused       : {t_full*1e3:8.2f} ms   "
          f"{px/t_full/1e6:8.1f} Mpx/s")

    t_coef = timeit(lambda: _stage_batch_coeffs(
        dev, yuv_mode=C.YUV_420, width=w, height=h, with_histo=False))
    print(f"coeffs (col+dct) : {t_coef*1e3:8.2f} ms")

    coeffs, _ = _stage_batch_coeffs(dev, yuv_mode=C.YUV_420, width=w,
                                    height=h, with_histo=False)
    jax.block_until_ready(coeffs)

    t_q = timeit(lambda: _stage_batch_quantize(
        coeffs, iq, ib, with_stats=False, nb_blocks=nb, n_images=batch))
    print(f"quant+rl+dc      : {t_q*1e3:8.2f} ms")

    (vlc_state, _) = _stage_batch_quantize(coeffs, iq, ib, with_stats=False,
                                           nb_blocks=nb, n_images=batch)
    jax.block_until_ready(vlc_state)
    rl, dc_codes, group = vlc_state

    if jax.default_backend() != "cpu":
        from sjpeg_tpu.engine import _interleave_coeffs
        from sjpeg_tpu.ops import pallas_quant_pack, pallas_tree_concat

        @functools.partial(jax.jit, static_argnames=())
        def inter(coeffs):
            return _interleave_coeffs(coeffs, iq, ib, nb, batch)

        t_int = timeit(lambda: inter(coeffs))
        print(f"interleave+dc    : {t_int*1e3:8.2f} ms")
        cinter, dc2, group2 = jax.block_until_ready(inter(coeffs))

        @jax.jit
        def qp(cinter, dc2, group2):
            return pallas_quant_pack.quant_vlc_pack_pallas(
                cinter, dc2, group2, iq, ib, dc_luts, ac_luts)

        t_qp = timeit(lambda: qp(cinter, dc2, group2))
        print(f"pallas quant_pack: {t_qp*1e3:8.2f} ms")
        words, bit_lens = jax.block_until_ready(qp(cinter, dc2, group2))

        @jax.jit
        def cc(words, bit_lens):
            return pallas_tree_concat.concat_block_streams_tree(
                words, bit_lens, n_images=batch, bucket=bucket)

        t_cc = timeit(lambda: cc(words, bit_lens))
        print(f"tree concat      : {t_cc*1e3:8.2f} ms")
        rest = t_full - t_coef - t_int - t_qp - t_cc
        print(f"unattributed     : {rest*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
