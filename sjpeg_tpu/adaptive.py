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
    v_all = (bins << C.HSHIFT) + C.HHALF     # bin centroids

    for pos in range(64):
        if omit & (1 << pos):
            continue
        h = histo[pos].astype(np.int64)
        nz = np.nonzero(h)[0]
        last = int(nz[-1]) + 1 if nz.size else 0
        total = int(h.sum())
        if total < C.DENSITY_THRESHOLD * last:
            omit |= 1 << pos
            continue

        dq0 = int(quant[pos])
        min_dq0 = int(min_quant[pos])
        hv = h[:last]
        v = v_all[:last]

        sw = sx = sxx = syy1 = 0.0
        sy1 = sxy1 = sy2 = sxy2 = 0.0
        for delta in range(C.QSIZE):
            dq = dq0 + delta + C.QDELTA_MIN
            if not (min_dq0 <= dq <= 255):
                continue     # distortions stays FLT_MAX, sizes stays 0
            idq = ((1 << C.FP_BITS) + dq - 1) // dq
            qv = (v * idq + bias) >> C.FP_BITS
            bits = np.where(qv > 0, calc_log2(np.maximum(qv, 1)), 0)
            dqv = qv * dq
            err = np.where(qv > 0, (v - dqv) ** 2, v * v)
            bsum = float((hv * bits).sum())     # exact: integer-valued
            dsum = float((hv * err).sum())
            distortions[pos, delta] = np.float32(dsum)
            sizes[pos, delta] = np.float32(bsum)
            w = float(C.HISTO_WEIGHT[delta])
            if w > 0.0:
                x = float(delta + C.QDELTA_MIN)
                sw += w
                sx += w * x
                sxx += w * x * x
                sy1 += w * dsum
                syy1 += w * dsum * dsum
                sy2 += w * bsum
                sxy1 += w * dsum * x
                sxy2 += w * bsum * x

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
    flt_max = np.finfo(np.float32).max
    for pos in range(64):
        if omit & (1 << pos):
            continue
        best_score = flt_max
        best_dq = 0
        for delta in range(delta_max + 1):
            if distortions[pos, delta] < flt_max:
                score = float(distortions[pos, delta]) + lam * float(
                    sizes[pos, delta])
                if score < best_score:
                    best_score = np.float32(score)
                    best_dq = delta + C.QDELTA_MIN
        new_quant[pos] += best_dq
        assert new_quant[pos] >= 1
    return new_quant.astype(np.uint8)
