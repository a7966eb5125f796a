"""Riskiness scoring / automatic YUV-mode selection.

The pair-score table is our own perceptual model (not the reference's
generated table), so these tests assert decision agreement with the
reference binary on clearly-separated content and structural properties of
the score, not bit-identical risk percentages.
"""

import re
import subprocess

import numpy as np
import pytest

from sjpeg_tpu import constants as C
from sjpeg_tpu import riskiness as R

from conftest import write_ppm


def _corpus():
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:128, 0:128]
    red = np.zeros((128, 128, 3), np.uint8)
    red[:, :, 0] = 220
    blue = np.zeros((128, 128, 3), np.uint8)
    blue[:, :, 2] = 220
    ct = red.copy()
    ct[:, ::4] = blue[:, ::4]
    soft = np.zeros((128, 128, 3), np.uint8)
    soft[:, :, 0] = 128 + 40 * np.sin(xx / 10)
    soft[:, :, 1] = 128
    soft[:, :, 2] = 128 - 40 * np.sin(yy / 13)
    yy5, xx5 = np.mgrid[0:512, 0:512]
    return {
        # gray detection needs (w-1)(h-1)/(wh) > 0.995, i.e. large images
        "gray": np.repeat(((xx5 + yy5) % 256)[..., None], 3, -1).astype(
            np.uint8),
        # the same content at 128x128 stays YUV420: the scan covers only
        # (w-1)(h-1) pixels, so the gray fraction caps at 0.984 < 0.995
        "gray_small": np.repeat(((xx + yy) % 256)[..., None], 3, -1).astype(
            np.uint8),
        "noise": rng.randint(0, 256, (128, 128, 3), np.uint8),
        "chromatext": ct,
        "chromahalf": np.concatenate([red[:, :64], blue[:, :64]], 1),
        "lumedge": np.broadcast_to(
            np.where((xx < 64)[..., None], 240, 20),
            (128, 128, 3)).astype(np.uint8),
        "softchroma": soft,
        "grad": np.stack([xx * 2, yy * 2, (xx + yy)], -1).astype(np.uint8),
    }


EXPECTED = {
    "gray": C.YUV_400,
    "gray_small": C.YUV_420,
    "noise": C.YUV_444,
    "chromatext": C.YUV_444,
    "chromahalf": C.YUV_420,      # isolated edge: below 1% coverage
    "lumedge": C.YUV_420,
    "softchroma": C.YUV_SHARP,
    "grad": C.YUV_SHARP,
}


def test_decisions_on_corpus():
    for name, img in _corpus().items():
        mode, risk = R.riskiness(img)
        assert mode == EXPECTED[name], (name, mode, risk)


def test_decisions_match_reference(reference_bin, ppm_dir):
    names = {"YUV420": C.YUV_420, "SharpYUV420": C.YUV_SHARP,
             "YUV444": C.YUV_444, "Gray": C.YUV_400,
             "YUV400": C.YUV_400}
    for name, img in _corpus().items():
        ppm = ppm_dir / f"risk_{name}.ppm"
        write_ppm(ppm, img)
        out = subprocess.run([str(reference_bin), str(ppm), "-i"],
                             capture_output=True, text=True).stdout
        m = re.search(r"recommended yuv_mode: (\w+)", out)
        ref_mode = names[m.group(1)]
        mode, _ = R.riskiness(img)
        assert mode == ref_mode, (name, mode, ref_mode)


def test_table_structure():
    tab = R.sharpness_table().reshape(R.KRGB3, R.KRGB3)
    # zero diagonal: identical colors carry no risk
    assert (np.diag(tab) == 0).all()
    # pure luma differences carry no chroma risk
    for y1 in range(7):
        for y2 in range(7):
            assert tab[y1, y2] == 0
    # risk grows with chroma distance at fixed luma
    i0 = 0
    prev = -1
    for v in range(7):
        idx = v * 49
        assert tab[i0, idx] >= prev
        prev = tab[i0, idx]


def test_index_arithmetic_matches_reference_formula():
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, (16, 16, 3), np.uint8)
    idx = R.rgb_to_risk_index(rgb)
    assert idx.max() < R.KRGB3
    # gray pixels map near the gray index
    gray_img = np.full((4, 4, 3), 128, np.uint8)
    gidx = R.rgb_to_risk_index(gray_img)
    gray = (R.KRGB // 2) * (1 + R.KRGB) * R.KRGB
    assert (np.abs(gidx.astype(int) - gray) < R.KRGB).all()


def test_block_riskiness_runs():
    rng = np.random.RandomState(2)
    block = rng.randint(0, 256, (8, 8, 3), np.uint8)
    risk, scores = R.block_riskiness(block)
    assert 0.0 <= risk <= 100.0
    assert scores.shape == (8, 8)


def test_exact_riskiness_table_matches_reference(reference_bin, ppm_dir):
    """With the exact-table flag, risk percentages (CLI -i output) are
    bit-identical to the reference binary's printed riskiness."""
    import re
    import subprocess
    from conftest import make_test_image, write_ppm
    from sjpeg_tpu import riskiness as R

    R.use_exact_table(True)
    try:
        for seed in (1, 5, 9):
            rgb = make_test_image(56, 40, seed=seed)
            ppm = ppm_dir / f"exr{seed}.ppm"
            write_ppm(ppm, rgb)
            out = subprocess.run(
                [str(reference_bin), str(ppm), "-o",
                 str(ppm_dir / f"exr{seed}.jpg"), "-i"],
                capture_output=True, text=True, check=True)
            m = re.search(r"Riskiness:\s*([0-9.]+)", out.stdout)
            assert m, out.stdout
            want = float(m.group(1))
            mode, risk = R.riskiness(rgb)
            assert abs(risk - want) < 0.05, (seed, risk, want)
    finally:
        R.use_exact_table(False)
