"""TPU parity + timing check for the reworked batched search: device
search bytes must equal the host oracle's, and e2e/sustained must move."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax

from sjpeg_tpu import constants as C
from sjpeg_tpu import engine, host_encoder
from sjpeg_tpu.params import EncoderParam

SIZE = int(os.environ.get("CHECK_SIZE", "256"))
BATCH = int(os.environ.get("CHECK_BATCH", "4"))


def make_image(w, h, seed):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    return img.astype(np.uint8)


def run_case(name, param, imgs):
    batch = np.stack(imgs)
    jpegs = engine.encode_batch(batch, param)
    ok = True
    for i, img in enumerate(imgs):
        ref = host_encoder.encode_rgb(img, param)
        if jpegs[i] != ref:
            ok = False
            print(f"  MISMATCH {name}[{i}]: {len(jpegs[i])} vs "
                  f"{len(ref)} bytes")
    print(f"{name}: {'OK' if ok else 'FAIL'} "
          f"sizes={[len(j) for j in jpegs]}")
    return ok


def main():
    imgs = [make_image(SIZE, SIZE, 40 + i) for i in range(BATCH)]
    allok = True

    # size search, method 4 (device-resident loop path)
    p = EncoderParam(yuv_mode=C.YUV_420)
    p.set_target_size(SIZE * SIZE // 12, passes=6)
    allok &= run_case("size m4 p6", p, imgs)

    # size search, method 0 (no optimize_size/adaptive)
    p = EncoderParam(yuv_mode=C.YUV_420, huffman_compress=False,
                     adaptive_quantization=False)
    p.set_target_size(SIZE * SIZE // 10, passes=4)
    allok &= run_case("size m0 p4", p, imgs)

    # psnr search (final-pass path preserved)
    p = EncoderParam(yuv_mode=C.YUV_420)
    p.set_target_psnr(33.0, passes=5)
    allok &= run_case("psnr m4 p5", p, imgs)

    # 444 size search
    p = EncoderParam(yuv_mode=C.YUV_444)
    p.set_target_size(SIZE * SIZE // 8, passes=6)
    allok &= run_case("size m4 444", p, imgs)

    # grayscale size search
    p = EncoderParam(yuv_mode=C.YUV_420)
    p.set_target_size(SIZE * SIZE // 14, passes=3)
    gray = [np.asarray(i)[:, :, 0] for i in imgs]
    jj = engine.encode_batch_gray(np.stack(gray), p)
    ok = True
    for i, g in enumerate(gray):
        ref = host_encoder.encode_gray(g, p)
        if jj[i] != ref:
            ok = False
    print(f"gray size p3: {'OK' if ok else 'FAIL'}")
    allok &= ok

    print("ALL OK" if allok else "FAILURES")
    sys.exit(0 if allok else 1)


if __name__ == "__main__":
    main()
