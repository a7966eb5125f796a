"""Adaptive quantization: histogram-driven quant-matrix tuning.

Given per-position histograms of |DCT coefficient| >> HSHIFT, pick a per
position quantizer delta that optimizes distortion + lambda * rate, where
lambda is estimated by a Gaussian-weighted least-squares fit of the
(delta, distortion) and (delta, size) clouds around the current matrix
(reference: src/enc.cc:993-1182).

The histogram reduction runs on device (summed across shards via psum); this
fit is a tiny O(64 * 25 * 128) per-image problem solved on the host.  All
inner sums are integer-valued and exact in float64, so vectorizing them does
not change results; the cross-delta/position accumulators follow the
reference's sequential order to stay bit-identical.
"""

import numpy as np

from . import constants as C
from .spec import calc_log2


def analyse_histo(histo: np.ndarray, quant: np.ndarray, min_quant: np.ndarray,
                  qdelta_max: int) -> np.ndarray:
    """Return the tuned quant matrix for one channel.

    `histo`: [64, MAX_HISTO_DCT_COEFF] counts; `quant`/`min_quant`: uint8[64]
    (quant already clamped to min_quant); `qdelta_max`: max positive delta
    (12 for luma, 1 for chroma by default).
    """
    assert C.QDELTA_MAX >= qdelta_max
    delta_max = qdelta_max - C.QDELTA_MIN
    assert delta_max < C.QSIZE

    sizes = np.zeros((64, C.QSIZE), dtype=np.float32)
    distortions = np.full((64, C.QSIZE), np.finfo(np.float32).max,
                          dtype=np.float32)
    num = 0.0
    den = 0.0
    omit = C.OMITTED_CHANNELS
    bias = 1 << C.FP_BITS >> 1

    bins = np.arange(C.MAX_HISTO_DCT_COEFF, dtype=np.int64)
    v = (bins << C.HSHIFT) + C.HHALF         # [128] bin centroids

    # ---- fully vectorized (pos, delta, bin) evaluation ----
    # Every per-(pos,delta) sum is integer-valued, hence exact in float64 and
    # independent of summation order; only the small cross-delta/position
    # least-squares accumulators below keep the reference's sequential order.
    h = histo.astype(np.int64)                               # [64, 128]
    dq = (quant.astype(np.int64)[:, None]
          + np.arange(C.QSIZE, dtype=np.int64)[None, :]
          + C.QDELTA_MIN)                                    # [64, 25]
    valid = (dq >= min_quant.astype(np.int64)[:, None]) & (dq <= 255)
    dq_safe = np.maximum(dq, 1)
    idq = ((1 << C.FP_BITS) + dq_safe - 1) // dq_safe
    qv = (v[None, None, :] * idq[:, :, None] + bias) >> C.FP_BITS
    bits = np.where(qv > 0, calc_log2(np.maximum(qv, 1)), 0)
    dqv = qv * dq_safe[:, :, None]
    err = np.where(qv > 0, (v[None, None, :] - dqv) ** 2,
                   (v * v)[None, None, :])
    bsum = (h[:, None, :] * bits).sum(axis=2).astype(np.float64)  # [64, 25]
    dsum = (h[:, None, :] * err).sum(axis=2).astype(np.float64)

    # density filter inputs
    hist_nz = h > 0
    last_all = np.where(hist_nz.any(axis=1),
                        C.MAX_HISTO_DCT_COEFF - np.argmax(hist_nz[:, ::-1],
                                                          axis=1), 0)
    total_all = h.sum(axis=1)

    xs = np.arange(C.QSIZE, dtype=np.float64) + C.QDELTA_MIN
    ws = C.HISTO_WEIGHT

    # float32 rounding of the stored clouds, vectorized
    distortions[valid] = dsum[valid].astype(np.float32)
    sizes[valid] = bsum[valid].astype(np.float32)

    dsum_l = dsum.tolist()         # plain floats: fast exact sequential math
    bsum_l = bsum.tolist()
    valid_l = valid.tolist()
    ws_l = ws.tolist()
    xs_l = xs.tolist()
    total_l = total_all.tolist()
    last_l = last_all.tolist()

    for pos in range(64):
        if omit & (1 << pos):
            continue
        if total_l[pos] < C.DENSITY_THRESHOLD * last_l[pos]:
            omit |= 1 << pos
            continue

        sw = sx = sxx = syy1 = 0.0
        sy1 = sxy1 = sy2 = sxy2 = 0.0
        dp, bp, vp = dsum_l[pos], bsum_l[pos], valid_l[pos]
        for delta in range(C.QSIZE):
            if not vp[delta]:
                continue     # distortions stays FLT_MAX, sizes stays 0
            w = ws_l[delta]
            if w > 0.0:
                ds = dp[delta]
                bs = bp[delta]
                x = xs_l[delta]
                sw += w
                sx += w * x
                sxx += w * x * x
                sy1 += w * ds
                syy1 += w * ds * ds
                sy2 += w * bs
                sxy1 += w * ds * x
                sxy2 += w * bs * x

        cov_xy1 = sw * sxy1 - sx * sy1
        if (cov_xy1 * cov_xy1 <
                C.CORRELATION_THRESHOLD * (sw * sxx - sx * sx)
                * (sw * syy1 - sy1 * sy1)):
            omit |= 1 << pos
            continue
        num += cov_xy1
        den += sw * sxy2 - sx * sy2

    lam = float(C.HLAMBDA)
    if num > 1000.0 and den < -10.0:
        lam = max(-num / den, 1.0)

    new_quant = quant.astype(np.int64).copy()
    flt_max = float(np.finfo(np.float32).max)
    dist_l = distortions.astype(np.float64).tolist()
    sizes_l = sizes.astype(np.float64).tolist()
    for pos in range(64):
        if omit & (1 << pos):
            continue
        best_score = flt_max
        best_dq = 0
        dl, sl = dist_l[pos], sizes_l[pos]
        for delta in range(delta_max + 1):
            if dl[delta] < flt_max:
                # the reference computes and compares `score` in float32
                score = float(np.float32(dl[delta] + lam * sl[delta]))
                if score < best_score:
                    best_score = score
                    best_dq = delta + C.QDELTA_MIN
        new_quant[pos] += best_dq
        assert new_quant[pos] >= 1
    return new_quant.astype(np.uint8)
