"""Sharp (iterative, gamma-aware) RGB -> YUV 4:2:0 conversion.

Minimizes luma reconstruction error of the subsampled image: RGB is held as
W (gray) + chroma residuals in SFIX=2 fixed point; each iteration upsamples
the current chroma with a 9-3-3-1 half-pel filter, measures the luma drift
in *linear light* (gamma <-> linear via interpolated LUTs), and feeds the
error back into Y and chroma.  Behavioral contract: reference
src/yuv_convert.cc (SFIX/TFIX precision :32-37, gamma tables :113-153,
9-3-3-1 interpolation :513-542, linear-light W :468-476, 2x2 gamma-correct
chroma downscale :449-466, 4-iteration loop with divergence exit :581-668,
final NN-chroma reconstruction :544-576, small-image fallback :675-696).

This NumPy implementation is the host oracle; `sharp_yuv_device.py`
runs the same arithmetic on the accelerator (plane-exact, tested).
"""

import functools

import numpy as np

SFIX = 2
SHALF = 1 << SFIX >> 1
MAX_Y_T = (256 << SFIX) - 1
YUV_FIX = 16
TFIX = YUV_FIX + SFIX
TROUNDER = 1 << TFIX >> 1
GAMMA_TABLE_SIZE = 32
GAMMA_TO_LINEAR_BITS = 14
NUM_ITERATIONS = 4
MIN_DIMENSION = 4


@functools.lru_cache(maxsize=1)
def _gamma_tables():
    a = 0.099
    thresh = 0.018
    gamma = 1.0 / 0.45
    final_scale = 1 << GAMMA_TO_LINEAR_BITS

    v = np.arange(MAX_Y_T + 1, dtype=np.float64)
    g = v / MAX_Y_T
    lin = np.where(g <= thresh * 4.5, g / 4.5,
                   ((g + a) / (1.0 + a)) ** gamma)
    gamma_to_linear = np.floor(lin * final_scale + 0.5).astype(np.uint32)

    v = np.arange(GAMMA_TABLE_SIZE + 1, dtype=np.float64)
    g = v / GAMMA_TABLE_SIZE
    gam = np.where(g <= thresh, 4.5 * g,
                   (1.0 + a) * g ** (1.0 / gamma) - a)
    lin_to_gamma = (np.floor(MAX_Y_T * gam).astype(np.uint32)
                    + (1 << GAMMA_TO_LINEAR_BITS >> 1))
    lin_to_gamma = np.concatenate([lin_to_gamma, lin_to_gamma[-1:]])
    return gamma_to_linear, lin_to_gamma


def _gamma_to_linear(v):
    return _gamma_tables()[0][v]


def _linear_to_gamma(value):
    """Interpolated linear -> gamma; value in Q14, result in Y_T domain."""
    tab = _gamma_tables()[1].astype(np.uint64)
    v = value.astype(np.uint64) * GAMMA_TABLE_SIZE
    pos = v >> GAMMA_TO_LINEAR_BITS
    x = v - (pos << GAMMA_TO_LINEAR_BITS)
    v0 = tab[pos]
    v1 = tab[pos + 1]
    return (v0 + (((v1 - v0) * x) >> GAMMA_TO_LINEAR_BITS)).astype(np.int64)


def _rgb_to_gray(r, g, b):
    return (13933 * r.astype(np.int64) + 46871 * g.astype(np.int64)
            + 4732 * b.astype(np.int64) + (1 << YUV_FIX >> 1)) >> YUV_FIX


def _clip_y(v):
    return np.clip(v, 0, MAX_Y_T)


def _clip8(v):
    return np.clip(v, 0, 255).astype(np.uint8)


def _update_w(rgb_fix):
    """[..., 3] SFIX rgb -> gamma-domain gray of linear-light mean."""
    r = _gamma_to_linear(rgb_fix[..., 0])
    g = _gamma_to_linear(rgb_fix[..., 1])
    b = _gamma_to_linear(rgb_fix[..., 2])
    return _linear_to_gamma(_rgb_to_gray(r, g, b).astype(np.uint32))


def _scale_down(a, b, c, d):
    s = (_gamma_to_linear(a).astype(np.int64) + _gamma_to_linear(b)
         + _gamma_to_linear(c) + _gamma_to_linear(d) + 2) >> 2
    return _linear_to_gamma(s.astype(np.uint32))


def _update_chroma(row_pair):
    """[2, H.., W, 3] SFIX rgb row pairs -> [.., W/2, 3] chroma residuals."""
    r = _scale_down(row_pair[0, ..., ::2, 0], row_pair[0, ..., 1::2, 0],
                    row_pair[1, ..., ::2, 0], row_pair[1, ..., 1::2, 0])
    g = _scale_down(row_pair[0, ..., ::2, 1], row_pair[0, ..., 1::2, 1],
                    row_pair[1, ..., ::2, 1], row_pair[1, ..., 1::2, 1])
    b = _scale_down(row_pair[0, ..., ::2, 2], row_pair[0, ..., 1::2, 2],
                    row_pair[1, ..., ::2, 2], row_pair[1, ..., 1::2, 2])
    w = _rgb_to_gray(r, g, b)
    return np.stack([r - w, g - w, b - w], axis=-1).astype(np.int64)


def _upsample_row(A, B, best_y_row, w):
    """One full-res row from chroma rows A (own) and B (vertical neighbor)
    via the 9-3-3-1 half-pel filter, added to the row's W values.

    A, B: [..., uv_w, 3]; best_y_row: [..., w]; returns [..., w, 3].
    """
    uv_w = A.shape[-2]
    out = np.empty(best_y_row.shape + (3,), dtype=np.int64)
    out[..., 0, :] = (A[..., 0, :] * 3 + B[..., 0, :] + 2) >> 2
    length = (w - 1) >> 1
    i = np.arange(length)
    # odd pixels x = 2i+1: 9*A[i] + 3*A[i+1] + 3*B[i] + B[i+1]
    out[..., 1:1 + 2 * length:2, :] = (
        A[..., i, :] * 9 + A[..., i + 1, :] * 3 + B[..., i, :] * 3
        + B[..., i + 1, :] + 8) >> 4
    # even pixels x = 2i+2: 9*A[i+1] + 3*A[i] + 3*B[i+1] + B[i]
    xe = 2 * i + 2
    xe = xe[xe < w]
    ie = (xe - 2) // 2
    out[..., xe, :] = (A[..., ie + 1, :] * 9 + A[..., ie, :] * 3
                       + B[..., ie + 1, :] * 3 + B[..., ie, :] + 8) >> 4
    if w % 2 == 0:
        out[..., w - 1, :] = (A[..., uv_w - 1, :] * 3 + B[..., uv_w - 1, :]
                              + 2) >> 2
    return _clip_y(best_y_row[..., None] + out)


def sharp_rgb_to_yuv420(rgb: np.ndarray):
    """RGB uint8 [H, W, 3] -> (y [H, W], u, v [ceil(H/2), ceil(W/2)]) uint8.

    The returned planes feed the planar-YUV 4:2:0 encode path.
    """
    rgb = np.asarray(rgb, dtype=np.uint8)
    height, width = rgb.shape[:2]
    if width <= MIN_DIMENSION or height <= MIN_DIMENSION:
        return _simple_yuv420(rgb)

    w = (width + 1) & ~1
    h = (height + 1) & ~1
    uv_w = w >> 1

    # Import: SFIX uplift with edge replication to even dimensions.
    src = ((rgb.astype(np.int64) << SFIX) | SHALF)
    if w != width:
        src = np.concatenate([src, src[:, -1:]], axis=1)
    if h != height:
        src = np.concatenate([src, src[-1:]], axis=0)

    best_y = _rgb_to_gray(src[..., 0], src[..., 1], src[..., 2])
    target_y = _update_w(src)
    target_uv = _update_chroma(src.reshape(h // 2, 2, w, 3)
                               .transpose(1, 0, 2, 3))
    best_uv = target_uv.copy()

    diff_threshold = int(3.0 * w * h)
    prev_diff = np.iinfo(np.uint64).max
    uv_h = h // 2
    for it in range(NUM_ITERATIONS):
        # Sequential row-pair sweep: the reference updates best_uv in place,
        # so pair k's interpolation sees the *already updated* row k-1
        # (Gauss-Seidel); rows k and k+1 are still the old values.
        diff_sum = 0
        for k in range(uv_h):
            prev_row = best_uv[k - 1] if k > 0 else best_uv[0]
            cur_row = best_uv[k]
            next_row = best_uv[k + 1] if k < uv_h - 1 else best_uv[k]
            est1 = _upsample_row(cur_row, prev_row, best_y[2 * k], w)
            est2 = _upsample_row(cur_row, next_row, best_y[2 * k + 1], w)
            est = np.stack([est1, est2])          # [2, w, 3]
            new_y = _update_w(est)                # [2, w]
            new_uv = _update_chroma(est[:, None])  # [1, w/2, 3]
            diff_y = target_y[2 * k:2 * k + 2] - new_y
            best_y[2 * k:2 * k + 2] = _clip_y(best_y[2 * k:2 * k + 2]
                                              + diff_y)
            best_uv[k] = best_uv[k] + (target_uv[k] - new_uv[0])
            diff_sum += int(np.abs(diff_y).sum())
        if it > 0 and (diff_sum < diff_threshold or diff_sum > prev_diff):
            break
        prev_diff = diff_sum

    # Final reconstruction: NN chroma upsample + fixed-point YUV convert.
    uvr = np.repeat(np.repeat(best_uv, 2, axis=0), 2, axis=1)[:h, :w]
    wv = best_y
    r = uvr[..., 0] + wv
    g = uvr[..., 1] + wv
    b = uvr[..., 2] + wv
    y_plane = _clip8((19595 * r + 38469 * g + 7471 * b + TROUNDER)
                     >> TFIX)[:height, :width]
    ur = best_uv[..., 0]
    ug = best_uv[..., 1]
    ub = best_uv[..., 2]
    u_plane = _clip8(128 + ((-11058 * ur - 21709 * ug + 32768 * ub
                             + TROUNDER) >> TFIX))
    v_plane = _clip8(128 + ((32768 * ur - 27439 * ug - 5328 * ub
                             + TROUNDER) >> TFIX))
    uv_wo = (width + 1) >> 1
    uv_ho = (height + 1) >> 1
    return y_plane, u_plane[:uv_ho, :uv_wo], v_plane[:uv_ho, :uv_wo]


def _simple_yuv420(rgb):
    """Small-image fallback: plain row-pair averaging conversion."""
    height, width = rgb.shape[:2]
    x = rgb.astype(np.int64)
    y_plane = _clip8((19595 * x[..., 0] + 38469 * x[..., 1]
                      + 7471 * x[..., 2] + (1 << YUV_FIX >> 1)) >> YUV_FIX)
    # pad to even dims by replication (odd columns double the last sample,
    # odd rows reuse the same row)
    if width % 2:
        x = np.concatenate([x, x[:, -1:]], axis=1)
    if height % 2:
        x = np.concatenate([x, x[-1:]], axis=0)
    q = x.reshape(x.shape[0] // 2, 2, x.shape[1] // 2, 2, 3).sum(axis=(1, 3))
    r, g, b = q[..., 0], q[..., 1], q[..., 2]
    u = _clip8(128 + ((-11058 * r - 21709 * g + 32768 * b + TROUNDER)
                      >> TFIX))
    v = _clip8(128 + ((32768 * r - 27439 * g - 5328 * b + TROUNDER)
                      >> TFIX))
    return y_plane, u, v
