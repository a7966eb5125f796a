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


_INTERACTIVE_HELP = """\
interactive inspector (vjpeg HandleKey analog, examples/vjpeg.cc:452-522):
  + / -      quality up / down (shift by 1, 10 with ++/--)
  0..4       yuv_mode (0 auto, 1 420, 2 sharp, 3 444, 4 gray)
  o a b l t  toggle size-optimize / adaptive-quant / adaptive-bias /
             quant-limit / trellis
  e          write error map for current settings -> error_map.png
  r          write riskiness map -> risk_map.png
  m          print current quantization matrices
  i          print info (riskiness, estimated quality)
  w          write the current encode -> out.jpg
  h          this help
  q          quit
Every change re-encodes and prints (size, PSNR)."""


def interactive(input_path: str, out_dir: str, quality: float = 75,
                stdin=None, stdout=None):
    """Terminal re-encode loop: the vjpeg viewer's keyboard protocol
    over stdin, with views written to files (headless pods have no GL
    surface; the decode-and-display half is the caller's terminal image
    viewer of choice).  Reads one command per line; returns the final
    report dict."""
    from PIL import Image
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout
    rgb = np.asarray(Image.open(input_path).convert("RGB"))
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    state = dict(quality=float(quality), yuv_mode=C.YUV_AUTO,
                 huffman_compress=True, adaptive_quantization=True,
                 adaptive_bias=False, use_trellis=False)
    limit = False
    last = {}

    def param():
        return EncoderParam(**state)

    def reencode():
        from .params import TARGET_NONE  # noqa: F401  (parity of import)
        jpeg = encode_rgb(rgb, param())
        dec = _decode(jpeg)
        mse = np.mean((dec.astype(np.float64) - rgb) ** 2)
        psnr = 10 * np.log10(255 ** 2 / mse) if mse > 0 else 99.0
        last.update(jpeg=jpeg, psnr=psnr)
        print(f"q={state['quality']:.1f} mode={state['yuv_mode']} "
              f"optim={int(state['huffman_compress'])}"
              f" adapt={int(state['adaptive_quantization'])}"
              f" bias={int(state['adaptive_bias'])}"
              f" trellis={int(state['use_trellis'])} limit={int(limit)}"
              f" -> {len(jpeg)} bytes, {psnr:.2f} dB", file=stdout)

    print(_INTERACTIVE_HELP, file=stdout)
    reencode()
    for line in stdin:
        cmd = line.strip()
        if not cmd:
            continue
        if cmd == "q":
            break
        elif cmd in ("+", "-", "++", "--"):
            step = 10.0 if len(cmd) == 2 else 1.0
            delta = step if cmd[0] == "+" else -step
            state["quality"] = float(np.clip(state["quality"] + delta,
                                             0, 100))
            reencode()
        elif cmd in ("0", "1", "2", "3", "4"):
            state["yuv_mode"] = int(cmd)
            reencode()
        elif cmd == "o":
            state["huffman_compress"] = not state["huffman_compress"]
            reencode()
        elif cmd == "a":
            state["adaptive_quantization"] = \
                not state["adaptive_quantization"]
            reencode()
        elif cmd == "b":
            state["adaptive_bias"] = not state["adaptive_bias"]
            reencode()
        elif cmd == "l":
            limit = not limit
            print(f"limit quantization: {limit}", file=stdout)
        elif cmd == "t":
            state["use_trellis"] = not state["use_trellis"]
            reencode()
        elif cmd == "e":
            emap = error_map(rgb, state["quality"],
                             state["yuv_mode"]
                             if state["yuv_mode"] not in
                             (C.YUV_AUTO, C.YUV_SHARP) else C.YUV_420)
            Image.fromarray(np.clip(emap * 4, 0, 255).astype(
                np.uint8)).save(out / "error_map.png")
            print(f"error map (max {int(emap.max())}) -> "
                  f"{out / 'error_map.png'}", file=stdout)
        elif cmd == "r":
            rmap = risk_map(rgb)
            Image.fromarray((rmap * 2.55).astype(np.uint8)).save(
                out / "risk_map.png")
            print(f"risk map (mean {rmap.mean():.1f}) -> "
                  f"{out / 'risk_map.png'}", file=stdout)
        elif cmd == "m":
            p = param()
            qm = p.resolved_quant_matrices()
            for g, name in enumerate(("luma", "chroma")):
                print(f"{name}:", file=stdout)
                for r in range(8):
                    print(" ".join(f"{v:3d}" for v in
                                   qm[g][8 * r: 8 * r + 8]), file=stdout)
        elif cmd == "i":
            from .riskiness import riskiness
            from .tools import estimate_quality
            mode, score = riskiness(rgb)
            print(f"riskiness {score:.1f} -> mode {mode}; estimated "
                  f"quality of current matrices "
                  f"{estimate_quality(param().resolved_quant_matrices()[0]):.0f}",
                  file=stdout)
        elif cmd == "w":
            (out / "out.jpg").write_bytes(last["jpeg"])
            print(f"wrote {out / 'out.jpg'} "
                  f"({len(last['jpeg'])} bytes)", file=stdout)
        elif cmd == "h":
            print(_INTERACTIVE_HELP, file=stdout)
        else:
            print(f"? (h for help): {cmd!r}", file=stdout)
    return {"quality": state["quality"], "bytes": len(last["jpeg"]),
            "psnr": round(float(last["psnr"]), 2)}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m sjpeg_tpu.inspect_tool input -o outdir "
              "[-q quality] [--interactive]", file=sys.stderr)
        return 1
    inp = argv[0]
    outdir = "inspect_out"
    quality = 75.0
    inter = False
    i = 1
    while i < len(argv):
        if argv[i] == "-o":
            outdir = argv[i + 1]
            i += 2
        elif argv[i] == "-q":
            quality = float(argv[i + 1])
            i += 2
        elif argv[i] == "--interactive":
            inter = True
            i += 1
        else:
            i += 1
    if inter:
        report = interactive(inp, outdir, quality)
    else:
        report = inspect(inp, outdir, quality)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
