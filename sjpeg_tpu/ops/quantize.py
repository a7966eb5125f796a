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
    """Sum of squared reconstruction error over blocks, in (c >> 4) units.

    Returns a scalar uint64-safe float64/int64 sum for PSNR evaluation
    (reference src/enc.cc:851-863).
    """
    c = jnp.abs(coeffs.astype(jnp.int32))
    t = (c + bias[None, :]).astype(jnp.uint32)
    q = ((t * iquant.astype(jnp.uint32)[None, :]) >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    deq = quant[None, :] * q
    v0 = c >> C.AC_BITS
    err = (v0 - deq) * (v0 - deq)
    return jnp.sum(err.astype(jnp.int64))


def store_histo(coeffs):
    """[N, 64] coeffs -> [64, MAX_HISTO_DCT_COEFF] int32 histogram.

    Bins |c| >> HSHIFT, dropping overflows past the last bin (the C
    reference semantics; the analysis never reads the overflow slot).
    """
    mag = jnp.abs(coeffs.astype(jnp.int32)) >> C.HSHIFT
    nbins = C.MAX_HISTO_DCT_COEFF
    pos = jnp.broadcast_to(jnp.arange(64, dtype=jnp.int32)[None, :],
                           mag.shape)
    flat = pos.reshape(-1) * nbins + mag.reshape(-1)
    flat = jnp.where(mag.reshape(-1) < nbins, flat, nbins * 64)  # drop slot
    hist = jnp.zeros(64 * nbins + 1, dtype=jnp.int32)
    hist = hist.at[flat].add(1)
    return hist[:-1].reshape(64, nbins)
