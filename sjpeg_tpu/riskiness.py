"""Riskiness scoring for automatic YUV mode selection (placeholder).

Full implementation (sharpness-score table + row scoring, reference
src/jpeg_tools.cc:166-284, src/score_7.cc) lands with milestone M4; until
then AUTO resolves to plain 4:2:0 (grayscale inputs should use YUV_400
explicitly).
"""

import numpy as np

from . import constants as C


def auto_yuv_mode(rgb: np.ndarray) -> int:
    # TODO(M4): riskiness score -> {400, 420, SHARP, 444} decision
    return C.YUV_420
