"""Quick e2e + sustained timing of bench config 5 (batched size search)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from sjpeg_tpu import constants as C
from sjpeg_tpu import engine
from sjpeg_tpu.params import EncoderParam

SIZE, BATCH = 1024, 16


def make_image(w, h, seed=42):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    return img.astype(np.uint8)


def main():
    rgb = make_image(SIZE, SIZE)
    param = EncoderParam(yuv_mode=C.YUV_420)
    param.set_target_size(100000, passes=6)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, SIZE, SIZE, 3)).copy())
    px = BATCH * SIZE * SIZE

    t0 = time.perf_counter()
    jpegs = engine.encode_batch(dev, param)
    print(f"compile+first: {time.perf_counter()-t0:.1f} s "
          f"({len(jpegs[0])} bytes)")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        engine.encode_batch(dev, param)
        ts.append(time.perf_counter() - t0)
    e2e = min(ts)
    print(f"e2e: {e2e*1e3:.0f} ms = {px/e2e/1e6:.1f} Mpx/s")

    # sustained via encode_pipelined
    k, depth = 4, 2
    devs = []
    for i in range(k):
        r = np.roll(rgb, 17 * i, axis=0)
        devs.append(jax.device_put(
            np.broadcast_to(r, (BATCH, SIZE, SIZE, 3)).copy()))
    for d in devs:
        engine.encode_batch(d, param)     # warm every shape/content
    t0 = time.perf_counter()
    for _ in engine.encode_pipelined(iter(devs), param, depth=depth):
        pass
    dt = time.perf_counter() - t0
    print(f"sustained: {dt/k*1e3:.0f} ms/batch = "
          f"{px*k/dt/1e6:.1f} Mpx/s")


if __name__ == "__main__":
    main()
