"""xplane trace of the fused batched encode: per-op device time table.

    python scripts/trace_fused.py [batch] [size] [yuv444]
"""

import glob
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sjpeg_tpu import constants as C
from sjpeg_tpu import pipeline, spec
from sjpeg_tpu.engine import (_default_luts_cached, _quant_device_arrays,
                              encode_batch_core)
from sjpeg_tpu.params import EncoderParam


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    mode = C.YUV_444 if "444" in sys.argv[3:] else C.YUV_420
    w = h = size
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    rgb = img.astype(np.uint8)
    dev = jax.device_put(np.broadcast_to(rgb, (batch, h, w, 3)).copy())

    param = EncoderParam(quality=75, huffman_compress=False,
                         adaptive_quantization=False, yuv_mode=mode)
    layout = pipeline.component_layout(mode, w, h)
    qmats = param.resolved_quant_matrices()
    minq = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _default_luts_cached()
    nb = tuple(layout.nb_blocks)
    bucket = max(4096, int(w * h * 4.0 / 32))

    run = lambda: encode_batch_core(dev, iq, ib, dc_luts, ac_luts,
                                    yuv_mode=mode, width=w, height=h,
                                    nb_blocks=nb, bucket=bucket)
    r = run()
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])   # warm through relay

    tdir = "/tmp/fused_trace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for _ in range(3):
        r = run()
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])
    jax.profiler.stop_trace()

    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {tdir}"
    pd = jax.profiler.ProfileData.from_file(files[0])
    agg = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns / 1e6
    total = sum(agg.values())
    print(f"-- device op time over 3 runs ({total:.1f} ms total) --")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms/3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
