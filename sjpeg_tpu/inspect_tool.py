"""Static encode inspector — the vjpeg-equivalent for headless TPU pods.

The reference ships an OpenGL viewer (examples/vjpeg.cc) with interactive
re-encode, error maps and per-block riskiness maps.  A TPU pod has no
display, so this tool renders the same diagnostics to image files /
arrays instead:

- `error_map`: per-pixel absolute reconstruction error of an encode
- `risk_map`: per-8x8-block riskiness scores (BlockRiskinessScore analog)
- `quality_sweep`: (size, PSNR) curve across qualities
- `inspect`: write all of the above next to the output file

CLI: python -m sjpeg_tpu.inspect_tool input.png -o report_dir/
"""

import io
import json
import pathlib
import sys

import numpy as np

from . import constants as C
from .host_encoder import encode_rgb
from .params import EncoderParam
from .riskiness import block_riskiness


def _decode(jpeg: bytes) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))


def error_map(rgb: np.ndarray, quality: float = 75,
              yuv_mode: int = C.YUV_420) -> np.ndarray:
    """Per-pixel max-channel absolute error of an encode at `quality`."""
    jpeg = encode_rgb(rgb, EncoderParam(quality=quality, yuv_mode=yuv_mode))
    dec = _decode(jpeg)
    return np.abs(dec.astype(np.int16) - rgb.astype(np.int16)).max(axis=-1)


def risk_map(rgb: np.ndarray) -> np.ndarray:
    """[mb_h, mb_w] per-block riskiness (0..100)."""
    h, w = rgb.shape[:2]
    mh, mw = h // 8, w // 8
    out = np.zeros((mh, mw), dtype=np.float32)
    for j in range(mh):
        for i in range(mw):
            out[j, i], _ = block_riskiness(
                rgb[8 * j: 8 * j + 8, 8 * i: 8 * i + 8])
    return out


def quality_sweep(rgb: np.ndarray, qualities=range(10, 96, 5),
                  yuv_mode: int = C.YUV_420):
    """[(quality, bytes, psnr_db)] across the quality range."""
    rows = []
    for q in qualities:
        jpeg = encode_rgb(rgb, EncoderParam(quality=float(q),
                                            yuv_mode=yuv_mode))
        dec = _decode(jpeg)
        mse = np.mean((dec.astype(np.float64) - rgb) ** 2)
        psnr = 10 * np.log10(255 ** 2 / mse) if mse > 0 else 99.0
        rows.append((int(q), len(jpeg), round(psnr, 2)))
    return rows


def inspect(input_path: str, out_dir: str, quality: float = 75) -> dict:
    from PIL import Image
    rgb = np.asarray(Image.open(input_path).convert("RGB"))
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    emap = error_map(rgb, quality)
    Image.fromarray((np.clip(emap * 4, 0, 255)).astype(np.uint8)).save(
        out / "error_map.png")
    rmap = risk_map(rgb)
    Image.fromarray((rmap * 2.55).astype(np.uint8)).save(
        out / "risk_map.png")
    sweep = quality_sweep(rgb)
    report = {
        "input": str(input_path),
        "max_error_at_q%d" % int(quality): int(emap.max()),
        "mean_block_risk": round(float(rmap.mean()), 2),
        "quality_sweep": sweep,
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    return report


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m sjpeg_tpu.inspect_tool input -o outdir "
              "[-q quality]", file=sys.stderr)
        return 1
    inp = argv[0]
    outdir = "inspect_out"
    quality = 75.0
    i = 1
    while i < len(argv):
        if argv[i] == "-o":
            outdir = argv[i + 1]
            i += 2
        elif argv[i] == "-q":
            quality = float(argv[i + 1])
            i += 2
        else:
            i += 1
    report = inspect(inp, outdir, quality)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
