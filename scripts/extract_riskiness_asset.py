"""Regenerate sjpeg_tpu/assets/sharpness_score.npz from the reference's
generated table (src/score_7.cc:23-24, table DATA like the Annex-K
quantization/Huffman constants).  Run when the reference updates."""
import re
import sys
from pathlib import Path

import numpy as np

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
OUT = Path(__file__).resolve().parent.parent / "sjpeg_tpu" / "assets"


def main():
    src = (REF / "src" / "score_7.cc").read_text()
    body = src.split("kSharpnessScore[] = {", 1)[1].split("};", 1)[0]
    body = re.sub(r"//[^\n]*", "", body)
    vals = np.array([int(x) for x in re.findall(r"\d+", body)],
                    dtype=np.uint8)
    assert vals.shape[0] == 7 ** 6, vals.shape
    OUT.mkdir(exist_ok=True)
    np.savez_compressed(OUT / "sharpness_score.npz", table=vals)
    print(f"wrote {OUT / 'sharpness_score.npz'} ({vals.shape[0]} entries)")


if __name__ == "__main__":
    main()
