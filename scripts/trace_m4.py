"""xplane trace of the full batched method-4 encode path.

    python scripts/trace_m4.py [batch] [size]
"""

import glob
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sjpeg_tpu import constants as C
from sjpeg_tpu import engine
from sjpeg_tpu.params import EncoderParam


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
    src = jax.device_put(np.broadcast_to(rgb, (batch, h, w, 3)).copy())
    param = EncoderParam(quality=75, yuv_mode=C.YUV_420)

    engine.encode_batch(src, param)          # warm

    tdir = "/tmp/m4_trace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    engine.encode_batch(src, param)
    jax.profiler.stop_trace()

    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    pd = jax.profiler.ProfileData.from_file(files[0])
    agg = defaultdict(float)
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                agg[ev.name] += ev.duration_ns / 1e6
    total = sum(agg.values())
    print(f"-- device op time, one m4 batch ({total:.1f} ms listed) --")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:22]:
        print(f"{ms:9.2f} ms  {name[:105]}")


if __name__ == "__main__":
    main()
