"""Split pallas quant_pack cost into LUT-loop / word-loop / fixed parts.

Runs the kernel on synthetic coefficient distributions that pin the
dynamic loop bounds (smax, wmax):
  zero    : all-zero ACs           -> smax=0, wmax~1   (fixed overhead)
  tiny    : size-1 ACs everywhere  -> smax=1, wmax big (word loop only)
  real    : bench-image-like       -> realistic smax+wmax
  big     : size-8 ACs everywhere  -> smax=8, wmax big (LUT 8 iters)

    python scripts/profile_quant_pack.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sjpeg_tpu.engine import _default_luts_cached
from sjpeg_tpu.ops import pallas_quant_pack

N = 393216          # 16 x 1024^2 4:2:0 block count


def _force(r):
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])


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
    from sjpeg_tpu import spec
    from sjpeg_tpu.engine import _quant_device_arrays
    from sjpeg_tpu.params import EncoderParam

    rng = np.random.RandomState(0)
    dc = rng.randint(0, 1 << 10, N).astype(np.int32)
    group = np.tile(np.array([0, 0, 0, 0, 1, 1], np.int32), N // 6)
    param = EncoderParam(quality=75)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    quant = qms[0]["quant"].astype(np.int32).reshape(64)  # luma steps
    dcl, acl = _default_luts_cached()

    # coefficient planes (raster order, x16 fdct scale)
    cases = {}
    cases["zero"] = np.zeros((N, 64), np.int32)
    t = np.zeros((N, 64), np.int32)
    t[:, 1:] = quant[None, 1:] * 16                  # level 1 everywhere
    cases["tiny"] = t
    b = np.zeros((N, 64), np.int32)
    b[:, 1:] = quant[None, 1:] * 16 * 200            # size-8 levels
    cases["big"] = b
    r = (rng.randint(-3, 4, (N, 64)) * quant[None, :] * 16).astype(np.int32)
    r[:, 32:] = 0                                    # sparse-ish tail
    cases["real"] = r

    dcj = jnp.asarray(dc)
    gj = jnp.asarray(group)
    tiles = [int(t) for t in sys.argv[1:]] or [512]
    for name, coef in cases.items():
        cj = jax.device_put(coef)
        for tile in tiles:
            fn = lambda: pallas_quant_pack.quant_vlc_pack_pallas(
                cj, dcj, gj, iq, ib, dcl, acl, tile=tile)
            dt = timeit(fn)
            w, tot = fn()
            tot0 = int(np.asarray(tot[:1])[0])
            print(f"{name:6s} tile {tile:5d}: {dt*1e3:8.2f} ms   "
                  f"(block0 bits {tot0})")


if __name__ == "__main__":
    main()
