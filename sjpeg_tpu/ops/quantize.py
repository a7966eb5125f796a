"""Device quantization kernels.

Bias/coring quantizer with 16-bit reciprocal multiply, quantize-error
evaluation (PSNR search), and coefficient histograms (adaptive quant).
Semantics follow the reference's production SIMD path (src/enc.cc:510-548):
saturating |c|+bias add into 16 bits, unsigned 16x16 high-half multiply,
then the AC_BITS shift.  Matches the spec oracle bit-for-bit over the full
int16 coefficient range.
"""

import jax.numpy as jnp

from .. import constants as C


def quantize_blocks(coeffs, iquant, bias):
    """[N, 64] int32 coeffs -> [N, 64] int32 signed quantized values.

    `iquant`, `bias`: int32[64] (uint16 ranges) from finalize_quant_matrix.
    """
    c = coeffs.astype(jnp.int32)
    mag = jnp.abs(c)
    # (|c| + bias) * iquant fits 32 unsigned bits over the whole int16 range,
    # so a uint32 multiply reproduces the oracle's wide-integer result.
    t = (mag + bias[None, :]).astype(jnp.uint32)
    q = ((t * iquant.astype(jnp.uint32)[None, :]) >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    return jnp.where(c < 0, -q, q)


def quantize_error(coeffs, iquant, bias, quant):
    """Per-block sum of squared reconstruction error, in (c >> 4) units.

    Returns [N] int32 exact per-block sums (each coefficient error is
    <= (2048 + 255)^2 and a block has 64 of them, so the per-block sum
    fits int32 with margin); the caller folds them into an exact uint64
    with `sum_u64` for PSNR evaluation (reference src/enc.cc:851-863
    accumulates into uint64).
    """
    c = jnp.abs(coeffs.astype(jnp.int32))
    t = (c + bias[None, :]).astype(jnp.uint32)
    q = ((t * iquant.astype(jnp.uint32)[None, :]) >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    deq = quant[None, :] * q
    v0 = c >> C.AC_BITS
    err = (v0 - deq) * (v0 - deq)
    return jnp.sum(err, axis=1)


def sum_u64(x, hi=None, lo=None):
    """Exact uint64 sum of nonnegative int32 [N] without x64: pairwise
    fold with carry propagation in (hi, lo) uint32 halves.  Optional
    (hi, lo) accumulate a running total across calls.  Returns uint32
    scalars (hi, lo)."""
    xlo = x.astype(jnp.uint32)
    xhi = jnp.zeros_like(xlo)
    while xlo.shape[0] > 1:
        n = xlo.shape[0]
        if n % 2:
            xlo = jnp.pad(xlo, (0, 1))
            xhi = jnp.pad(xhi, (0, 1))
            n += 1
        h = n // 2
        s_lo = xlo[:h] + xlo[h:]
        carry = (s_lo < xlo[:h]).astype(jnp.uint32)
        xhi = xhi[:h] + xhi[h:] + carry
        xlo = s_lo
    shi, slo = xhi[0], xlo[0]
    if hi is not None:
        nlo = lo + slo
        carry = (nlo < lo).astype(jnp.uint32)
        return hi + shi + carry, nlo
    return shi, slo


def store_histo(coeffs, n_images: int = 1):
    """[N, 64] coeffs -> [64, MAX_HISTO_DCT_COEFF] int32 histogram
    (or [B, 64, bins] segmented per image when n_images > 1; rows must
    be image-major with equal block counts).

    Bins |c| >> HSHIFT, dropping overflows past the last bin (the C
    reference semantics; the analysis never reads the overflow slot).
    """
    mag = jnp.abs(coeffs.astype(jnp.int32)) >> C.HSHIFT
    nbins = C.MAX_HISTO_DCT_COEFF
    pos = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None, :],
                           mag.shape)
    slot = pos.reshape(-1)
    if n_images > 1:
        per_img = mag.shape[0] // n_images
        img = jnp.arange(mag.shape[0], dtype=jnp.int32) // per_img
        slot = slot + jnp.repeat(img * 64, 64)
    flat = slot * nbins + mag.reshape(-1)
    drop = n_images * 64 * nbins
    flat = jnp.where(mag.reshape(-1) < nbins, flat, drop)  # drop slot
    hist = jnp.zeros(drop + 1, dtype=jnp.int32)
    hist = hist.at[flat].add(1)
    hist = hist[:-1]
    if n_images > 1:
        return hist.reshape(n_images, 64, nbins)
    return hist.reshape(64, nbins)
