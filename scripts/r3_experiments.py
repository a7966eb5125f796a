"""Round-3 on-chip experiment battery.

    python scripts/r3_experiments.py [step...]

Steps (default: kernel):
  kernel  - sample_vlc_pack tile/knob sweep with slope timing
  program - full encode_batch_core slope timing (the bench config)

Slope timing: the dev-environment chip tunnel costs ~35-90 ms per host
fetch RPC, so per-rep sync poisons wall-clock measurements.  We time a
queue of R dispatches + one force, then 2R + one force; the difference
is R pure executions — the fixed RPC cost cancels exactly.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r2_experiments import _kernel_inputs, make_rgb, _force


def slope_time(fn, reps=8, trials=3):
    """Steady-state seconds per call via the 2R-R slope; returns
    (median, spread) over `trials`."""
    _force(fn())                       # compile + warm
    est = []
    for _ in range(trials):
        t0 = time.perf_counter()
        r = None
        for _ in range(reps):
            r = fn()
        _force(r)
        t_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2 * reps):
            r = fn()
        _force(r)
        t_2r = time.perf_counter() - t0
        est.append((t_2r - t_r) / reps)
    est.sort()
    return est[len(est) // 2], est[-1] - est[0]


def step_kernel():
    from sjpeg_tpu.ops import pallas_quant_pack as pqp

    sinter, dc_codes, group, iq, ib, dcl, acl = _kernel_inputs()
    n = sinter.shape[0]
    for tile in (512, 1024, 2048, 4096):
        try:
            fn = lambda: pqp.sample_vlc_pack_pallas(
                sinter, dc_codes, group, iq, ib, dcl, acl, tile=tile,
                chroma_wrap=True)
            dt, spread = slope_time(fn)
            steps = n // tile
            print(f"kernel tile={tile}: {dt*1e3:7.2f} ms +-{spread*1e3:.2f} "
                  f"({dt/steps*1e6:5.1f} us/step, {steps} steps)")
        except Exception as e:
            print(f"kernel tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


def step_program():
    import jax
    from sjpeg_tpu import constants as C
    from sjpeg_tpu import spec
    from sjpeg_tpu.engine import (_default_luts_cached,
                                  _quant_device_arrays, encode_batch_core)
    from sjpeg_tpu.params import EncoderParam

    size, batch = 1024, 16
    rgb = make_rgb(size, size)
    dev = jax.device_put(np.broadcast_to(rgb, (batch, size, size, 3)).copy())
    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _default_luts_cached()
    bucket = max(4096, int(size * size * 4.0 / 32))
    fn = lambda: encode_batch_core(dev, iq, ib, dc_luts, ac_luts,
                                   yuv_mode=C.YUV_420, width=size,
                                   height=size, nb_blocks=(4, 1, 1),
                                   bucket=bucket)
    dt, spread = slope_time(fn)
    px = batch * size * size
    print(f"program 420x16: {dt*1e3:7.2f} ms +-{spread*1e3:.2f} "
          f"= {px/dt/1e6:6.1f} Mpx/s")


def main():
    steps = sys.argv[1:] or ["kernel", "program"]
    for s in steps:
        print(f"==== {s} ====")
        globals()[f"step_{s}"]()


if __name__ == "__main__":
    main()
