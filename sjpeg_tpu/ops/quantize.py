"""Device quantization kernels.

Bias/coring quantizer with 16-bit reciprocal multiply, quantize-error
evaluation (PSNR search), and coefficient histograms (adaptive quant).
Semantics follow the reference's production SIMD path (src/enc.cc:510-548):
saturating |c|+bias add into 16 bits, unsigned 16x16 high-half multiply,
then the AC_BITS shift.  Matches the spec oracle bit-for-bit over the full
int16 coefficient range.
"""

import jax
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


def sum_u64_rows(x):
    """Row-wise exact uint64 sums of nonnegative int32 [B, N]: the
    pairwise carry fold of `sum_u64` vectorized over a batch axis.
    Returns ([B] hi, [B] lo) uint32."""
    xlo = x.astype(jnp.uint32)
    xhi = jnp.zeros_like(xlo)
    while xlo.shape[1] > 1:
        n = xlo.shape[1]
        if n % 2:
            xlo = jnp.pad(xlo, ((0, 0), (0, 1)))
            xhi = jnp.pad(xhi, ((0, 0), (0, 1)))
            n += 1
        h = n // 2
        s_lo = xlo[:, :h] + xlo[:, h:]
        carry = (s_lo < xlo[:, :h]).astype(jnp.uint32)
        xhi = xhi[:, :h] + xhi[:, h:] + carry
        xlo = s_lo
    return xhi[:, 0], xlo[:, 0]


def store_histo(coeffs, n_images: int = 1, valid=None):
    """[N, 64] coeffs -> [64, MAX_HISTO_DCT_COEFF] int32 histogram
    (or [B, 64, bins] segmented per image when n_images > 1; rows must
    be image-major with equal block counts).  `valid`: optional [N] bool
    mask — blocks with False contribute nothing (sharded ragged stripes
    exclude their out-of-image padding blocks).

    Bins |c| >> HSHIFT, dropping overflows past the last bin (the C
    reference semantics; the analysis never reads the overflow slot).

    Histogram-as-matmul: the 7-bit bin index splits into hi (3 bits) and
    lo (4 bits) halves whose one-hot encodings contract on the MXU —
    counts[b, p, hi, lo] = sum_n E_hi * E_lo — instead of an XLA scatter
    (which serializes at ~10 ns/element and dominated the adaptive-quant
    stage).  int8 operands, int32 accumulation: exact.
    """
    mag = jnp.abs(coeffs.astype(jnp.int32)) >> C.HSHIFT
    nbins = C.MAX_HISTO_DCT_COEFF
    n_hi = nbins >> 4
    per = mag.shape[0] // n_images
    m3 = mag.reshape(n_images, per, 64)
    v3 = (None if valid is None
          else valid.reshape(n_images, per, 1, 1))
    hi_iota = jnp.arange(n_hi, dtype=jnp.int32)
    lo_iota = jnp.arange(16, dtype=jnp.int32)
    chunks = []
    for p0 in range(0, 64, 8):       # position chunks bound the one-hot
        m = m3[:, :, p0:p0 + 8]      # operands to ~17 MB each
        e_hi = (((m >> 4)[..., None] == hi_iota)
                & (m < nbins)[..., None]).astype(jnp.int8)
        if v3 is not None:
            e_hi = e_hi * v3.astype(jnp.int8)
        e_lo = ((m & 15)[..., None] == lo_iota).astype(jnp.int8)
        cnt = jax.lax.dot_general(
            e_hi, e_lo, (((1,), (1,)), ((0, 2), (0, 2))),
            preferred_element_type=jnp.int32)      # [B, 8, n_hi, 16]
        chunks.append(cnt.reshape(n_images, 8, nbins))
    hist = jnp.concatenate(chunks, axis=1)
    if n_images > 1:
        return hist
    return hist.reshape(64, nbins)
