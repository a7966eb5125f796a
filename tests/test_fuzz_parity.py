"""Randomized byte-parity fuzz: host oracle vs the reference binary.

Deterministic (seeded) random sweep over image content, geometry, quality,
pinned yuv modes and method flags — every emitted stream must be byte
-identical to the reference CLI's output for the matching flags.  The
structured suites pin known-interesting configs; this catches interaction
bugs between dimensions nobody thought to pair.
"""

import subprocess

import numpy as np
import pytest

from sjpeg_tpu import EncoderParam
from sjpeg_tpu import constants as C
from sjpeg_tpu.host_encoder import encode_rgb as host_encode_rgb

# (yuv_mode ours, reference -yuv_mode value)
_MODES = [(C.YUV_420, "1"), (C.YUV_SHARP, "2"), (C.YUV_444, "3"),
          (C.YUV_400, "4")]
# (huffman_compress, adaptive_quantization, use_trellis) — valid presets
_METHODS = [(False, False, False),   # 0
            (True, False, False),    # 1
            (False, True, False),    # 3
            (True, True, False),     # 4
            (True, True, True)]      # 7


def _rand_image(rng):
    w = int(rng.randint(9, 70))
    h = int(rng.randint(9, 70))
    kind = rng.randint(3)
    if kind == 0:
        img = rng.randint(0, 256, (h, w, 3))
    elif kind == 1:                      # smooth gradient + noise
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([xx * 255 // max(w - 1, 1),
                        yy * 255 // max(h - 1, 1),
                        (xx + yy) % 256], -1)
        img = img + rng.randint(-15, 15, img.shape)
    else:                                # blocky low-detail
        img = np.repeat(np.repeat(
            rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8, 3)),
            8, axis=0), 8, axis=1)[:h, :w]
    return np.clip(img, 0, 255).astype(np.uint8)


def _reference_encode(bin_, rgb, args, tmp_path, tag):
    ppm = tmp_path / f"in_{tag}.ppm"
    out = tmp_path / f"out_{tag}.jpg"
    with open(ppm, "wb") as f:
        f.write(f"P6\n{rgb.shape[1]} {rgb.shape[0]}\n255\n".encode())
        f.write(rgb.tobytes())
    subprocess.run([str(bin_), str(ppm), "-o", str(out), "-quiet",
                    "-no_metadata", *args], check=True,
                   capture_output=True)
    return out.read_bytes()


@pytest.mark.parametrize("seed", range(32))
def test_fuzz_host_matches_reference(reference_bin, tmp_path, seed):
    rng = np.random.RandomState(1000 + seed)
    rgb = _rand_image(rng)
    quality = int(rng.randint(8, 100))
    mode, mode_flag = _MODES[rng.randint(len(_MODES))]
    huff, adapt, trellis = _METHODS[rng.randint(len(_METHODS))]
    if trellis and not (huff and adapt):
        huff = adapt = True

    args = ["-q", str(quality), "-yuv_mode", mode_flag]
    if not huff:
        args.append("-no_optim")
    if not adapt:
        args.append("-no_adapt")
    if trellis:
        args.append("-trellis")

    param = EncoderParam(quality=quality, yuv_mode=mode,
                         huffman_compress=huff,
                         adaptive_quantization=adapt,
                         use_trellis=trellis)
    want = _reference_encode(reference_bin, rgb, args, tmp_path, seed)
    got = host_encode_rgb(rgb, param)
    assert got == want, (rgb.shape, quality, mode, huff, adapt, trellis)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_search_matches_reference(reference_bin, tmp_path, seed):
    """Random target-size / target-PSNR searches."""
    rng = np.random.RandomState(2000 + seed)
    rgb = _rand_image(rng)
    passes = int(rng.randint(2, 7))
    if seed % 2 == 0:
        target = int(rgb.size * (0.2 + 0.3 * rng.rand()))
        args = ["-size", str(target), "-pass", str(passes)]
        param = EncoderParam(quality=75, yuv_mode=C.YUV_420,
                             target_mode=1, target_value=float(target),
                             passes=passes)
    else:
        psnr = float(np.round(28 + 10 * rng.rand(), 1))
        args = ["-psnr", str(psnr), "-pass", str(passes)]
        param = EncoderParam(quality=75, yuv_mode=C.YUV_420,
                             target_mode=2, target_value=psnr,
                             passes=passes)
    args += ["-yuv_mode", "1"]
    want = _reference_encode(reference_bin, rgb, args, tmp_path,
                             f"s{seed}")
    got = host_encode_rgb(rgb, param)
    assert got == want, (rgb.shape, args)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_recompression_matches_reference(reference_bin, tmp_path,
                                              seed):
    """Random JPEG-in recompression: -r reduction with/without quant
    limiting vs the reference recipe (examples/sjpeg.cc:262-292)."""
    from sjpeg_tpu import find_quantizer
    rng = np.random.RandomState(3000 + seed)
    rgb = _rand_image(rng)
    q0 = int(rng.randint(40, 95))
    src_jpeg = _reference_encode(reference_bin, rgb, ["-q", str(q0)],
                                 tmp_path, f"r{seed}src")
    jin = tmp_path / f"r{seed}.jpg"
    jin.write_bytes(src_jpeg)
    out = tmp_path / f"r{seed}out.jpg"

    reduction = float(np.round(30 + 69 * rng.rand(), 1))
    no_limit = bool(rng.randint(2))
    args = [str(jin), "-o", str(out), "-quiet", "-no_metadata",
            "-r", str(reduction)]
    if no_limit:
        args.append("-no_limit")
    subprocess.run([str(reference_bin), *args], check=True,
                   capture_output=True)
    want = out.read_bytes()

    # decode the source the same way the reference CLI does (libjpeg);
    # PIL uses libjpeg too — pixel-identical for baseline streams
    import io
    from PIL import Image
    decoded = np.asarray(Image.open(io.BytesIO(src_jpeg)).convert("RGB"))

    _, mats = find_quantizer(src_jpeg)
    param = EncoderParam(quality=75)
    param.set_quantization(mats, reduction)
    if not no_limit:
        param.set_limit_quantization(True)
    got = host_encode_rgb(decoded, param)
    assert got == want, (rgb.shape, q0, reduction, no_limit)
