"""Device riskiness scoring (automatic YUV-mode selection).

TPU-native version of the reference's SjpegRiskiness reduction
(src/jpeg_tools.cc:174-223): instead of gathering pair scores from the
343x343 sharpness table (XLA gathers serialize at ~10 ns/element), the
table's generating model is evaluated closed-form per pixel pair.  The
host table (riskiness.sharpness_table) is round(f) of

    f = (w_du * |du| + w_dv * |dv|) * (vis[y1] + vis[y2]) / 2 * mask[|dy|]

with two-decimal model constants; scaling by 100 makes every factor an
integer, so the whole score is an exact int32 rational n / 2e6 rounded
half-to-even — bit-identical to the float64 host table for all 117,649
pairs (tests/test_riskiness_device.py), with zero gathers: the 7-entry
vis/mask tables unroll into one-hot selects on the VPU.

The decision thresholds and surrounding arithmetic mirror the host
`riskiness.riskiness`, which itself follows the reference's structure.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..riskiness import (KRGB, KRGB3, NOISE_LEVEL, THRESH_GRAY,
                         THRESH_SHARP, THRESH_YUV420, _MASK_DY, _VIS_Y,
                         _W_DU, _W_DV)

_VIS100 = tuple(int(v) for v in np.round(_VIS_Y * 100).astype(np.int64))
_MASK100 = tuple(int(v) for v in np.round(_MASK_DY * 100).astype(np.int64))
_W_DU100 = int(round(_W_DU * 100))
_W_DV100 = int(round(_W_DV * 100))
_DEN = 2 * 100 * 100 * 100      # pair-average 2 x weight, vis, mask scales


def _lut7(levels, table):
    """Unrolled one-hot select of a 7-entry int table (no gather)."""
    out = jnp.zeros_like(levels)
    for k, val in enumerate(table):
        out = jnp.where(levels == k, val, out)
    return out


def _risk_levels(rgb):
    """[..., 3] uint8 RGB -> (y, u, v) int32 7-quantized levels.

    Exact arithmetic of the reference row converter
    (src/colors_rgb.cc:625-667); matches riskiness.rgb_to_risk_index.
    """
    r = rgb[..., 0].astype(jnp.int32)
    g = rgb[..., 1].astype(jnp.int32)
    b = rgb[..., 2].astype(jnp.int32)
    half = C.YUV_HALF
    y = (19595 * r + 38469 * g + 7471 * b + half) >> C.YUV_FRAC
    u = jnp.clip(128 + ((-11059 * r - 21709 * g + 32768 * b + half)
                        >> C.YUV_FRAC), 0, 255)
    v = jnp.clip(128 + ((32768 * r - 27439 * g - 5329 * b + half)
                        >> C.YUV_FRAC), 0, 255)

    def conv(x):
        return (x * (0x0101 * (KRGB - 1))) >> 16

    return conv(y), conv(u), conv(v)


def _pair_score(l0, l1):
    """Exact uint8 sharpness-table value for two (y, u, v) level triples."""
    y0, u0, v0 = l0
    y1, u1, v1 = l1
    du = jnp.abs(u0 - u1)
    dv = jnp.abs(v0 - v1)
    dy = jnp.abs(y0 - y1)
    n = ((_W_DU100 * du + _W_DV100 * dv)
         * (_lut7(y0, _VIS100) + _lut7(y1, _VIS100))
         * _lut7(dy, _MASK100))
    t = n // _DEN
    r2 = 2 * (n - t * _DEN)
    up = (r2 > _DEN) | ((r2 == _DEN) & (t % 2 == 1))
    return jnp.clip(t + up.astype(jnp.int32), 0, 255)


@jax.jit
def risk_stats(rgb):
    """[..., H, W, 3] uint8 -> (score_sum, count, gray_count) int32/float
    reductions over leading batch dims (scalars for a single image).

    Per interior position the three neighbor pairs (right, down,
    diagonal) are scored; sums/counts ignore scores <= noise level.
    """
    levels = _risk_levels(rgb)
    l0 = tuple(x[..., :-1, :-1] for x in levels)
    l1 = tuple(x[..., :-1, 1:] for x in levels)
    l2 = tuple(x[..., 1:, :-1] for x in levels)
    score = _pair_score(l0, l1) + _pair_score(l0, l2) + _pair_score(l1, l2)
    mask = score > NOISE_LEVEL
    count = mask.sum(axis=(-1, -2), dtype=jnp.int32)
    ssum = jnp.where(mask, score, 0).sum(axis=(-1, -2), dtype=jnp.int32)
    idx0 = l0[0] + KRGB * l0[1] + KRGB * KRGB * l0[2]
    gray = (KRGB // 2) * (1 + KRGB) * KRGB
    gray_count = (jnp.abs(idx0 - gray) < KRGB).sum(axis=(-1, -2),
                                                   dtype=jnp.int32)
    return ssum, count, gray_count


def finish_riskiness(ssum, count, gray_count, width: int, height: int):
    """Host epilogue: fold the three reductions into (mode, risk%).

    Same decision logic as riskiness.riskiness (reference
    src/jpeg_tools.cc:212-222)."""
    count = int(count)
    total_score = float(ssum) / count if count else 0.0
    frac = 100.0 * count / (width * height)
    if frac < 1.0:
        total_score = 0.0
    total_score = (100.0 if total_score > 25.0
                   else total_score * 100.0 / 25.0)
    if float(gray_count) / (width * height) > THRESH_GRAY:
        mode = C.YUV_400
    elif total_score < THRESH_YUV420:
        mode = C.YUV_420
    elif total_score < THRESH_SHARP:
        mode = C.YUV_SHARP
    else:
        mode = C.YUV_444
    return mode, total_score


def riskiness_device(rgb):
    """(recommended_mode, risk_percent) computed on the accelerator.

    `rgb` may already live on device; only three scalars come back."""
    h, w = rgb.shape[-3:-1]
    ssum, count, gray_count = jax.device_get(risk_stats(jnp.asarray(rgb)))
    return finish_riskiness(ssum, count, gray_count, w, h)
