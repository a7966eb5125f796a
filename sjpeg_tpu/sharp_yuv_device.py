"""Device (JAX) sharp RGB -> YUV 4:2:0 conversion, plane-exact vs the
host oracle in sharp_yuv.py.

Same behavioral contract as the oracle (reference src/yuv_convert.cc:
SFIX/TFIX fixed point :32-37, gamma tables :113-153, 9-3-3-1
interpolation :513-542, linear-light W :468-476, gamma-correct 2x2 chroma
downscale :449-466, 4-iteration Gauss-Seidel loop with divergence exit
:581-668, final NN-chroma reconstruction :544-576), mapped to the TPU:

- Gamma LUT lookups use exact one-hot matmul decomposition (v = 32*hi+lo;
  two [*, 32] one-hot products) instead of gathers — XLA's gather lowering
  costs ~10 ns/element on TPU, the one-hot form runs on the VPU/MXU and is
  exact because every table entry fits f32's 2^24 integer range.
- The in-place row-pair sweep (row k reads row k-1's *updated* chroma) is
  a lax.scan carrying the previously updated row.
- The early-exit iteration loop is a lax.while_loop; the |diff| sum
  accumulates in (hi, lo) uint32 halves so images past 2048x2048 cannot
  overflow int32 (the oracle uses Python ints).

All arithmetic is int32 with the oracle's exact shift orders; outputs are
bit-identical planes (test_sharp_yuv.py device cases).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sharp_yuv import (GAMMA_TO_LINEAR_BITS, MAX_Y_T, MIN_DIMENSION,
                        NUM_ITERATIONS, SFIX, SHALF, TFIX, TROUNDER,
                        YUV_FIX, _gamma_tables)

GAMMA_TABLE_SIZE = 32


@functools.lru_cache(maxsize=1)
def _device_tables():
    # NumPy constants (NOT jnp): a cached jnp array created inside one jit
    # trace leaks its tracer into later traces.
    g2l, l2g = _gamma_tables()
    # g2l [1024] as [32 (hi), 32 (lo)] -> transposed [lo, hi] f32
    t2 = g2l.reshape(32, 32).astype(np.float32).T.copy()
    l2g = l2g.astype(np.float32)
    return t2, l2g[:33].copy(), l2g[1:34].copy()


def _g2l(v):
    """gamma_to_linear LUT: int32 in [0, 1023] -> int32 Q14 (exact)."""
    t2, _, _ = _device_tables()
    lo = (v & 31)[..., None]
    hi = (v >> 5)[..., None]
    i32 = jnp.arange(32, dtype=jnp.int32)
    oh_lo = (lo == i32).astype(jnp.float32)
    picked = jnp.einsum("...l,lh->...h", oh_lo, t2,
                        preferred_element_type=jnp.float32)
    oh_hi = (hi == i32).astype(jnp.float32)
    return jnp.sum(picked * oh_hi, axis=-1).astype(jnp.int32)


def _l2g(value):
    """linear_to_gamma with interpolation; value int32 Q14 in [0, 16384]."""
    _, t0, t1 = _device_tables()
    v = value * GAMMA_TABLE_SIZE
    pos = (v >> GAMMA_TO_LINEAR_BITS)[..., None]
    x = v - ((v >> GAMMA_TO_LINEAR_BITS) << GAMMA_TO_LINEAR_BITS)
    i33 = jnp.arange(33, dtype=jnp.int32)
    oh = (pos == i33).astype(jnp.float32)
    v0 = jnp.einsum("...p,p->...", oh, t0,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    v1 = jnp.einsum("...p,p->...", oh, t1,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    return v0 + (((v1 - v0) * x) >> GAMMA_TO_LINEAR_BITS)


def _rgb_to_gray(r, g, b):
    return (13933 * r + 46871 * g + 4732 * b + (1 << YUV_FIX >> 1)) \
        >> YUV_FIX


def _clip_y(v):
    return jnp.clip(v, 0, MAX_Y_T)


def _clip8(v):
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def _update_w(rgb_fix):
    """[..., 3] SFIX rgb -> gamma-domain gray of linear-light mean."""
    r = _g2l(rgb_fix[..., 0])
    g = _g2l(rgb_fix[..., 1])
    b = _g2l(rgb_fix[..., 2])
    return _l2g(_rgb_to_gray(r, g, b))


def _scale_down(a, b, c, d):
    s = (_g2l(a) + _g2l(b) + _g2l(c) + _g2l(d) + 2) >> 2
    return _l2g(s)


def _update_chroma(row_pair):
    """[2, ..., W, 3] SFIX rgb -> [..., W/2, 3] chroma residuals."""
    r = _scale_down(row_pair[0, ..., ::2, 0], row_pair[0, ..., 1::2, 0],
                    row_pair[1, ..., ::2, 0], row_pair[1, ..., 1::2, 0])
    g = _scale_down(row_pair[0, ..., ::2, 1], row_pair[0, ..., 1::2, 1],
                    row_pair[1, ..., ::2, 1], row_pair[1, ..., 1::2, 1])
    b = _scale_down(row_pair[0, ..., ::2, 2], row_pair[0, ..., 1::2, 2],
                    row_pair[1, ..., ::2, 2], row_pair[1, ..., 1::2, 2])
    w = _rgb_to_gray(r, g, b)
    return jnp.stack([r - w, g - w, b - w], axis=-1)


def _upsample_row(A, B, best_y_row, w: int):
    """9-3-3-1 half-pel upsample of chroma rows A (own) / B (neighbor),
    added to the row's W values.  A, B: [uv_w, 3]; returns [w, 3]."""
    uv_w = A.shape[-2]
    length = (w - 1) >> 1
    first = (A[0:1] * 3 + B[0:1] + 2) >> 2                      # x = 0
    Ai, Ai1 = A[:length], A[1:length + 1]
    Bi, Bi1 = B[:length], B[1:length + 1]
    odd = (Ai * 9 + Ai1 * 3 + Bi * 3 + Bi1 + 8) >> 4            # x = 2i+1
    even = (Ai1 * 9 + Ai * 3 + Bi1 * 3 + Bi + 8) >> 4           # x = 2i+2
    inter = jnp.stack([odd, even], axis=1).reshape(2 * length, 3)
    parts = [first, inter]
    if w % 2 == 0:
        parts.append((A[uv_w - 1:uv_w] * 3 + B[uv_w - 1:uv_w] + 2) >> 2)
    else:
        inter = inter[: w - 1]
        parts = [first, inter]
    out = jnp.concatenate(parts, axis=0)[:w]
    return _clip_y(best_y_row[:, None] + out)


def _sharp_iteration(best_y, best_uv, target_y, target_uv, w: int):
    """One Gauss-Seidel sweep over row pairs; returns updated planes and
    the |diff_y| sum as (hi, lo) uint32."""
    uv_h = best_uv.shape[0]
    next_rows = jnp.concatenate([best_uv[1:], best_uv[-1:]], axis=0)
    y_pairs = best_y.reshape(uv_h, 2, w)
    ty_pairs = target_y.reshape(uv_h, 2, w)

    def step(carry, xs):
        prev_updated, dhi, dlo = carry
        cur, nxt, y2, ty2, tuv = xs
        est1 = _upsample_row(cur, prev_updated, y2[0], w)
        est2 = _upsample_row(cur, nxt, y2[1], w)
        est = jnp.stack([est1, est2])               # [2, w, 3]
        new_y = _update_w(est)                      # [2, w]
        new_uv = _update_chroma(est[:, None])[0]    # [w/2, 3]
        diff_y = ty2 - new_y
        y_out = _clip_y(y2 + diff_y)
        uv_out = cur + (tuv - new_uv)
        d = jnp.sum(jnp.abs(diff_y)).astype(jnp.uint32)
        nlo = dlo + d
        dhi = dhi + (nlo < dlo).astype(jnp.uint32)
        return (uv_out, dhi, nlo), (y_out, uv_out)

    init = (best_uv[0], jnp.uint32(0), jnp.uint32(0))
    (_, dhi, dlo), (y_rows, uv_rows) = jax.lax.scan(
        step, init, (best_uv, next_rows, y_pairs, ty_pairs, target_uv))
    return y_rows.reshape(-1, w), uv_rows, dhi, dlo


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _sharp_core(rgb, width: int, height: int):
    w = (width + 1) & ~1
    h = (height + 1) & ~1

    src = (rgb.astype(jnp.int32) << SFIX) | SHALF
    if w != width:
        src = jnp.concatenate([src, src[:, -1:]], axis=1)
    if h != height:
        src = jnp.concatenate([src, src[-1:]], axis=0)

    best_y = _rgb_to_gray(src[..., 0], src[..., 1], src[..., 2])
    target_y = _update_w(src)
    target_uv = _update_chroma(
        src.reshape(h // 2, 2, w, 3).transpose(1, 0, 2, 3))
    best_uv = target_uv

    thr = 3 * w * h
    thr_hi, thr_lo = thr >> 32, thr & 0xFFFFFFFF

    def cond(state):
        it, _, _, prev, diff, done = state
        return (it < NUM_ITERATIONS) & ~done

    def body(state):
        it, y, uv, prev, _, done = state
        y2, uv2, dhi, dlo = _sharp_iteration(y, uv, target_y, target_uv, w)
        # compare (dhi, dlo) against threshold and prev as 64-bit pairs
        phi, plo = prev
        lt_thr = (dhi < thr_hi) | ((dhi == thr_hi)
                                   & (dlo < jnp.uint32(thr_lo)))
        gt_prev = (dhi > phi) | ((dhi == phi) & (dlo > plo))
        stop = (it > 0) & (lt_thr | gt_prev)
        nprev = (jnp.where(stop, phi, dhi), jnp.where(stop, plo, dlo))
        return (it + 1, y2, uv2, nprev, (dhi, dlo), stop)

    prev0 = (jnp.uint32(0xFFFFFFFF), jnp.uint32(0xFFFFFFFF))
    state0 = (jnp.int32(0), best_y, best_uv, prev0,
              (jnp.uint32(0), jnp.uint32(0)), jnp.bool_(False))
    _, best_y, best_uv, _, _, _ = jax.lax.while_loop(cond, body, state0)

    uvr = jnp.repeat(jnp.repeat(best_uv, 2, axis=0), 2, axis=1)[:h, :w]
    r = uvr[..., 0] + best_y
    g = uvr[..., 1] + best_y
    b = uvr[..., 2] + best_y
    y_plane = _clip8((19595 * r + 38469 * g + 7471 * b + TROUNDER)
                     >> TFIX)[:height, :width]
    ur, ug, ub = best_uv[..., 0], best_uv[..., 1], best_uv[..., 2]
    u_plane = _clip8(128 + ((-11058 * ur - 21709 * ug + 32768 * ub
                             + TROUNDER) >> TFIX))
    v_plane = _clip8(128 + ((32768 * ur - 27439 * ug - 5328 * ub
                             + TROUNDER) >> TFIX))
    uv_wo = (width + 1) >> 1
    uv_ho = (height + 1) >> 1
    return y_plane, u_plane[:uv_ho, :uv_wo], v_plane[:uv_ho, :uv_wo]


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _simple_core(rgb, width: int, height: int):
    x = rgb.astype(jnp.int32)
    y_plane = _clip8((19595 * x[..., 0] + 38469 * x[..., 1]
                      + 7471 * x[..., 2] + (1 << YUV_FIX >> 1)) >> YUV_FIX)
    if width % 2:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
    if height % 2:
        x = jnp.concatenate([x, x[-1:]], axis=0)
    q = x.reshape(x.shape[0] // 2, 2, x.shape[1] // 2, 2, 3).sum(axis=(1, 3))
    r, g, b = q[..., 0], q[..., 1], q[..., 2]
    u = _clip8(128 + ((-11058 * r - 21709 * g + 32768 * b + TROUNDER)
                      >> TFIX))
    v = _clip8(128 + ((32768 * r - 27439 * g - 5328 * b + TROUNDER)
                      >> TFIX))
    return y_plane, u, v


def sharp_rgb_to_yuv420_device(rgb):
    """Device path: RGB uint8 [H, W, 3] -> (y, u, v) device arrays.

    Plane-exact vs sharp_yuv.sharp_rgb_to_yuv420 (the host oracle)."""
    height, width = rgb.shape[:2]
    dev = jnp.asarray(rgb)
    if width <= MIN_DIMENSION or height <= MIN_DIMENSION:
        return _simple_core(dev, width, height)
    return _sharp_core(dev, width, height)
