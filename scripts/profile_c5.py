"""Stage profile of the device-resident batched search (bench config 5).

Runs one warmed search with SJPEG_TRACE_STAGES=1 (per-stage wall clock on
stderr), then slope-times the two device programs: the pass-independent
prep and the all-passes-in-one search loop.

    python scripts/profile_c5.py [batch] [size] [target]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SJPEG_TRACE_STAGES", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench import make_image, slope_time
from sjpeg_tpu import constants as C, engine
from sjpeg_tpu.engine import encode_batch
from sjpeg_tpu.params import EncoderParam


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    target = int(sys.argv[3]) if len(sys.argv) > 3 else 100000
    rgb = make_image(size, size)
    param = EncoderParam(yuv_mode=C.YUV_420)
    param.set_target_size(target, passes=6)
    dev = jax.device_put(
        np.broadcast_to(rgb, (batch, size, size, 3)).copy())

    cap = {}
    orig = engine._stage_search_loop_size

    def spy(*args, **kw):
        cap["args"], cap["kw"] = args, kw
        return orig(*args, **kw)

    engine._stage_search_loop_size = spy
    try:
        encode_batch(dev, param)                    # warm + trace capture
        t0 = time.perf_counter()
        encode_batch(dev, param)
        print(f"one-shot e2e: {time.perf_counter() - t0:.3f}s",
              file=sys.stderr)
    finally:
        engine._stage_search_loop_size = orig

    t_l, _ = slope_time(lambda: orig(*cap["args"], **cap["kw"])[0], reps=2)
    t_p, _ = slope_time(lambda: engine._stage_search_prep(
        dev, yuv_mode=C.YUV_420, width=size, height=size,
        nb_blocks=(4, 1, 1), n_images=batch, src_kind="rgb",
        with_histo=True)["coeffs"][0], reps=2)
    print(f"search loop (all passes): {t_l*1e3:.1f} ms")
    print(f"prep (coeffs+samples+histos): {t_p*1e3:.1f} ms")


if __name__ == "__main__":
    main()
