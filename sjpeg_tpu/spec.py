"""Bit-exact NumPy specification of the baseline-JPEG encode pipeline.

This module is the *oracle*: a vectorized, integer-exact statement of every
fixed-point kernel in the engine.  The TPU path (`sjpeg_tpu.engine`,
`sjpeg_tpu.ops.*`) must match it bit-for-bit, and it in turn matches the
reference encoder (webmproject/sjpeg) byte-for-byte on the supported methods
(verified in tests against the reference binary).

Behavioral contracts reproduced (reference file:line):
- RGB->YUV 4:4:4 / 4:2:0 / 4:0:0 fixed point     src/colors_rgb.cc:17-31,505-603
- edge replication + extra-luma flattening        src/enc.cc:1703-1754
- 8x8 fDCT, output scaled x16                     src/fdct.cc:67-209,596-609
- bias/coring quantizer with reciprocal multiply  src/enc.cc:327-361,598-630
- DC prediction + size-category coding            src/enc.cc:466-499
- run/level + Huffman VLC + EOB/escapes           src/enc.cc:882-911
- quantize-error (PSNR) evaluation                src/enc.cc:851-863
- coefficient histograms                          src/enc.cc:945-975
"""

import numpy as np

from . import constants as C
from .bitio import BitWriter
from .huffman import build_code_lut

# ---------------------------------------------------------------------------
# Geometry helpers
# ---------------------------------------------------------------------------


def blockize(plane: np.ndarray) -> np.ndarray:
    """[H, W] -> [H//8 * W//8, 64] in raster block order (rows of blocks)."""
    h, w = plane.shape
    assert h % 8 == 0 and w % 8 == 0
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 64))


def blockize_420_luma(plane: np.ndarray) -> np.ndarray:
    """[H, W] -> [n_mcu * 4, 64]: per MCU the four 8x8 luma blocks in
    row-major 2x2 sub-order (the JPEG interleave order for 2x2 sampling)."""
    h, w = plane.shape
    assert h % 16 == 0 and w % 16 == 0
    return (plane.reshape(h // 16, 2, 8, w // 16, 2, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(-1, 64))


def pad_edge(img: np.ndarray, block_w: int, block_h: int) -> np.ndarray:
    """Replicate the last row/column up to a multiple of the MCU size."""
    h, w = img.shape[:2]
    ph = (-h) % block_h
    pw = (-w) % block_w
    if ph == 0 and pw == 0:
        return img
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad, mode="edge")

# ---------------------------------------------------------------------------
# Color conversion (BT.601 full-range fixed point, FRAC = 16)
# ---------------------------------------------------------------------------


def rgb_to_yuv444(rgb: np.ndarray):
    """[H, W, 3] uint8 -> three [H, W] int32 planes, centered on 0."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = (19595 * r + 38469 * g + 7471 * b + C.ROUND_Y) >> C.YUV_FRAC
    u = (-11059 * r - 21709 * g + 32768 * b + C.YUV_HALF) >> C.YUV_FRAC
    v = (32768 * r - 27439 * g - 5329 * b + C.YUV_HALF) >> C.YUV_FRAC
    return (y.astype(np.int32), u.astype(np.int32), v.astype(np.int32))


def rgb_to_y(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    y = (19595 * r + 38469 * g + 7471 * b + C.ROUND_Y) >> C.YUV_FRAC
    return y.astype(np.int32)


def rgb_to_yuv420(rgb: np.ndarray):
    """[H, W, 3] uint8 (H, W multiples of 2) -> (y [H, W], u, v [H/2, W/2]).

    Chroma is computed from the *sum* of each 2x2 RGB quad (not from averaged
    Y), with ROUND_UV rounding and a FRAC+2 shift.
    """
    y = rgb_to_y(rgb)
    q = rgb.astype(np.int64).reshape(rgb.shape[0] // 2, 2,
                                     rgb.shape[1] // 2, 2, 3)
    s = q.sum(axis=(1, 3))     # [H/2, W/2, 3] sums of 4 RGB triplets
    r, g, b = s[..., 0], s[..., 1], s[..., 2]
    u = (-11059 * r - 21709 * g + 32768 * b + C.ROUND_UV) >> (C.YUV_FRAC + 2)
    v = (32768 * r - 27439 * g - 5329 * b + C.ROUND_UV) >> (C.YUV_FRAC + 2)
    return y, u.astype(np.int32), v.astype(np.int32)

# ---------------------------------------------------------------------------
# Extra-luma flattening at clipped edges (420 only)
# ---------------------------------------------------------------------------


def _block_average(block64: np.ndarray) -> np.ndarray:
    """Rounded mean of an 8x8 block: (sum + 32) >> 6."""
    return (block64.sum(axis=-1) + 32) >> 6


def average_extra_luma(y_blocks: np.ndarray, mb_w: int, mb_h: int,
                       width: int, height: int) -> np.ndarray:
    """Flatten fully-out-of-frame luma blocks of clipped 4:2:0 MCUs.

    `y_blocks` is [mb_h * mb_w * 4, 64] in MCU-nested order (2x2 row-major
    per MCU).  Blocks entirely outside the image are set flat to the average
    value of the preceding block, improving compressibility exactly like the
    reference's AverageExtraLuma (src/enc.cc:1703-1738).
    """
    y_blocks = y_blocks.reshape(mb_h, mb_w, 4, 64).copy()
    mb_x_max = width // 16    # MCU column index at which x-clipping starts
    mb_y_max = height // 16
    # Only the last MCU column/row can be clipped, and only when the image
    # size is not a multiple of 16 in that direction.
    clipped = []
    if mb_x_max < mb_w:
        clipped += [(my, mb_x_max) for my in range(mb_h)]
    if mb_y_max < mb_h:
        clipped += [(mb_y_max, mx) for mx in range(mb_w) if mx != mb_x_max]

    for (my, mx) in clipped:
        sub_w = width - mx * 16
        sub_h = height - my * 16
        blk = y_blocks[my, mx]              # [4, 64]
        dc = _block_average(blk[0])
        if sub_w <= 8:
            blk[1, :] = dc
        if sub_h <= 8:
            if sub_w > 8:
                dc = _block_average(blk[1])
            blk[2, :] = dc
            blk[3, :] = dc
        elif sub_w <= 8:
            blk[3, :] = _block_average(blk[2])

    return y_blocks.reshape(-1, 64)

# ---------------------------------------------------------------------------
# Forward DCT (integer-exact; output scaled x16)
# ---------------------------------------------------------------------------


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Integer-exact 8x8 fDCT over [N, 64] int blocks; output scaled by 16.

    Column pass: butterfly network with Q15 tangent constants and a final
    LSB-correction; row pass: cosine-table multiply-accumulate with >>16
    descale.  All intermediate arithmetic matches 32-bit C semantics for the
    valid input range; stores truncate to int16.
    """
    x = blocks.reshape(-1, 8, 8).astype(np.int64)
    N = x.shape[0]
    out = np.empty((N, 8, 8), dtype=np.int64)

    def mult(a, b):
        return (a * b) >> 16

    # ---- column pass (operates on columns; vectorized over N and col) ----
    m0 = x[:, 0, :].copy()
    m1 = x[:, 1, :].copy()
    m2 = x[:, 2, :].copy()
    m3 = x[:, 3, :].copy()
    m4 = x[:, 4, :].copy()
    m5 = x[:, 5, :].copy()
    m6 = x[:, 6, :].copy()
    m7 = x[:, 7, :].copy()

    def butterfly(a, b):
        # {a, b} <- {a - b, a + b}
        return a - b, a + b

    m0, m7 = butterfly(m0, m7)
    m2, m5 = butterfly(m2, m5)
    m3, m4 = butterfly(m3, m4)
    m1, m6 = butterfly(m1, m6)
    m7, m4 = butterfly(m7, m4)
    m6, m5 = butterfly(m6, m5)

    m4 = m4 << 3
    m5 = m5 << 3
    m4, m5 = butterfly(m4, m5)
    col0 = m5
    col4 = m4

    m7 = m7 << 3
    m6 = m6 << 3
    m3 = m3 << 3
    m0 = m0 << 3

    t4 = mult(np.int64(C.FDCT_K_TAN2), m7)
    t5 = mult(np.int64(C.FDCT_K_TAN2), m6)
    t4 = t4 - m6
    t5 = t5 + m7
    col2 = t5
    col6 = t4

    m2 = m2 << 4
    m1 = m1 << 4
    m1, m2 = butterfly(m1, m2)
    m2 = mult(m2, np.int64(C.FDCT_K_2SQRT2))
    m1 = mult(m1, np.int64(C.FDCT_K_2SQRT2))
    m3, m1 = butterfly(m3, m1)
    m0, m2 = butterfly(m0, m2)

    t7 = m3
    t6 = m1
    m3 = mult(m3, np.int64(C.FDCT_K_TAN3M1))
    m1 = mult(m1, np.int64(C.FDCT_K_TAN1))
    m3 = m3 + t7
    m1 = m1 + m2
    m1 = m1 + 1          # CORRECT_LSB
    m3 = m3 + 1          # CORRECT_LSB
    t4b = mult(np.int64(C.FDCT_K_TAN3M1), m0)
    t5b = mult(np.int64(C.FDCT_K_TAN1), m2)
    t4b = t4b + m0
    s0 = m0 - m3
    t7 = t7 + t4b
    t5c = t5b - t6

    col1 = m1
    col3 = s0
    col5 = t7
    col7 = t5c

    # STORE16: truncate to int16
    cols = np.stack([col0, col1, col2, col3, col4, col5, col6, col7], axis=1)
    cols = cols.astype(np.int16).astype(np.int64)   # [N, 8(row), 8(col)]

    # ---- row pass ----
    tables = C.FDCT_ROW_TABLES   # [8, 7]
    r = cols                       # row pass operates on each row of 8
    a0 = r[:, :, 0] + r[:, :, 7]
    b0 = r[:, :, 0] - r[:, :, 7]
    a1 = r[:, :, 1] + r[:, :, 6]
    b1 = r[:, :, 1] - r[:, :, 6]
    a2 = r[:, :, 2] + r[:, :, 5]
    b2 = r[:, :, 2] - r[:, :, 5]
    a3 = r[:, :, 3] + r[:, :, 4]
    b3 = r[:, :, 3] - r[:, :, 4]

    C1 = tables[None, :, 0]
    C2 = tables[None, :, 1]
    C3 = tables[None, :, 2]
    C4 = tables[None, :, 3]
    C5 = tables[None, :, 4]
    C6 = tables[None, :, 5]
    C7 = tables[None, :, 6]

    c0 = a0 + a3
    c1 = a0 - a3
    c2 = a1 + a2
    c3 = a1 - a2

    out[:, :, 0] = (C4 * (c0 + c2)) >> 16
    out[:, :, 4] = (C4 * (c0 - c2)) >> 16
    out[:, :, 2] = (C2 * c1 + C6 * c3) >> 16
    out[:, :, 6] = (C6 * c1 - C2 * c3) >> 16
    out[:, :, 1] = (C1 * b0 + C3 * b1 + C5 * b2 + C7 * b3) >> 16
    out[:, :, 3] = (C3 * b0 - C7 * b1 - C1 * b2 - C5 * b3) >> 16
    out[:, :, 5] = (C5 * b0 - C1 * b1 + C7 * b2 + C3 * b3) >> 16
    out[:, :, 7] = (C7 * b0 - C5 * b1 + C3 * b2 - C1 * b3) >> 16

    return out.astype(np.int16).reshape(-1, 64)

# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


def finalize_quant_matrix(quant: np.ndarray, min_quant: np.ndarray,
                          q_bias: int):
    """Derive reciprocal multipliers / biases / thresholds from a matrix.

    Returns dict with uint8[64] `quant` (clamped), uint16[64] `iquant`,
    `bias`, `qthresh`.  quant==1 uses a saturated multiplier 0xFFFF with a
    re-tuned bias 0x80, which is bit-exact over the working range.
    """
    q = np.maximum(quant.astype(np.int64), min_quant.astype(np.int64))
    is_one = q == 1
    iquant = np.where(is_one, 0xFFFF, ((1 << C.FP_BITS) + q // 2) // q)
    pos = np.arange(64)
    bias = np.where(is_one, 0x80, np.where(pos == 0, C.BIAS_DC, q_bias))
    ibias = (((bias * q) << C.AC_BITS) + 128) >> 8
    qthresh = ((1 << (C.FP_BITS + C.AC_BITS)) + iquant - 1) // iquant - ibias
    return {
        "quant": q.astype(np.uint8),
        "iquant": iquant.astype(np.uint16),
        "bias": ibias.astype(np.uint16),
        "qthresh": qthresh.astype(np.uint16),
    }


def quantize_blocks(coeffs: np.ndarray, qm: dict) -> np.ndarray:
    """[N, 64] fDCT coeffs (x16) -> [N, 64] signed quantized values.

    value = sign(c) * ((|c| + bias) * iquant >> 16) >> 4, in raster order.
    """
    c = coeffs.astype(np.int64)
    mag = np.abs(c)
    iquant = qm["iquant"].astype(np.int64)
    bias = qm["bias"].astype(np.int64)
    q = ((mag + bias) * iquant >> C.FP_BITS) >> C.AC_BITS
    return np.where(c < 0, -q, q).astype(np.int32)


def quantize_error(coeffs: np.ndarray, qm: dict) -> np.ndarray:
    """Per-block squared reconstruction error in (coeff >> 4) units.

    err = sum_j ((|c_j| >> 4) - quant_j * Q(|c_j|))^2   (src/enc.cc:851-863)
    """
    c = np.abs(coeffs.astype(np.int64))
    iquant = qm["iquant"].astype(np.int64)
    bias = qm["bias"].astype(np.int64)
    quant = qm["quant"].astype(np.int64)
    qv = ((c + bias) * iquant >> C.FP_BITS) >> C.AC_BITS
    deq = quant * qv
    v0 = c >> C.AC_BITS
    return ((v0 - deq) ** 2).sum(axis=-1).astype(np.uint64)


def store_histo(coeffs: np.ndarray) -> np.ndarray:
    """[N, 64] coeffs -> [64, MAX_HISTO_DCT_COEFF] histogram of |c| >> HSHIFT."""
    mag = (np.abs(coeffs.astype(np.int64)) >> C.HSHIFT)
    hist = np.zeros((64, C.MAX_HISTO_DCT_COEFF), dtype=np.int64)
    for j in range(64):
        valid = mag[:, j] < C.MAX_HISTO_DCT_COEFF
        hist[j] = np.bincount(mag[valid, j],
                              minlength=C.MAX_HISTO_DCT_COEFF)
    return hist

def trellis_quantize_block(coeffs64: np.ndarray, qm: dict,
                           quant_u8: np.ndarray,
                           ac_lut: np.ndarray) -> np.ndarray:
    """Rate-distortion (Viterbi) quantization of one block.

    `coeffs64`: [64] int fDCT coefficients (x16, raster order); `quant_u8`:
    the clamped quant matrix; `ac_lut`: packed (code << 16 | len) AC Huffman
    LUT supplying bit costs.  Returns the [64] signed quantized block in
    raster order (DC quantized with the plain bias quantizer).

    Per zigzag position two candidate levels (the bias-quantized value and
    the largest value one bit shorter) open trellis nodes; each searches all
    previous nodes for the best predecessor under score = distortion +
    lambda * bits with lambda = (quant << 4)^2 / 32, with uint32 modular
    score arithmetic like the reference (src/enc.cc:692-761).
    """
    M32 = 1 << 32
    iquant = qm["iquant"].astype(np.int64)
    bias = qm["bias"].astype(np.int64)
    esc_len = int(ac_lut[0xF0]) & 0xFF

    zz = C.ZIGZAG
    # nodes: list of dicts
    sink = {"score": 0, "disto": 0, "pos": 0, "rank": 0, "nbits": 0,
            "run": 0, "code": 0, "prev": None}
    nodes = [sink]
    disto0 = np.zeros(64, dtype=np.int64)
    acc = 0
    kmax = 0xFFFFFFFF

    for i in range(1, 64):
        j = int(zz[i])
        q = (int(quant_u8[j]) << C.AC_BITS)
        lam = (q * q // 32) % M32
        V0 = int(coeffs64[j])
        mask = -1 if V0 < 0 else 0
        V = abs(V0)
        acc += V * V
        disto0[i] = acc
        v = int(((V + bias[j]) * iquant[j] >> C.FP_BITS) >> C.AC_BITS)
        if v == 0:
            continue
        nbits = int(calc_log2(v))
        for _ in range(2):
            err = V - v * q
            cand = {"code": (v ^ mask) & ((1 << nbits) - 1), "pos": i,
                    "disto": (err * err) % M32, "nbits": nbits,
                    "score": kmax, "prev": None, "rank": 0, "run": 0}
            base_disto = (cand["disto"] + disto0[i - 1]) % M32
            found = False
            for cur in reversed(nodes):
                run = i - 1 - cur["pos"]
                if run < 0:
                    continue
                bits = nbits + (run >> 4) * esc_len
                sym = ((run & 15) << 4) | nbits
                bits += int(ac_lut[sym]) & 0xFF
                disto = (base_disto - disto0[cur["pos"]]) % M32
                score = (disto + lam * bits + cur["score"]) % M32
                if score < cand["score"]:
                    cand.update(score=score, disto=disto, prev=cur,
                                rank=cur["rank"] + 1, run=run, bits=bits)
                    found = True
            if found:
                nodes.append(cand)
            nbits -= 1
            if nbits <= 0:
                break
            v = (1 << nbits) - 1

    # backward: add the tail distortion and pick the best end node.  The
    # reference's post-decrement loop includes the sink, so "emit no AC at
    # all" (tail = the whole block energy) competes too.
    best = sink
    if len(nodes) > 1:
        best_score = kmax
        for nd in reversed(nodes):
            tail = (disto0[63] - disto0[nd["pos"]]) % M32
            nd["disto"] = (nd["disto"] + tail) % M32
            nd["score"] = (nd["score"] + tail) % M32
            if nd["score"] < best_score:
                best = nd
                best_score = nd["score"]

    out = np.zeros(64, dtype=np.int32)
    nd = best
    while nd is not None and nd["pos"] > 0:
        j = int(zz[nd["pos"]])
        n = nd["nbits"]
        code = nd["code"]
        # undo the suffix coding: recover the signed level
        if code >> (n - 1) & 1:
            level = code
        else:
            level = -((code ^ ((1 << n) - 1)))
        out[j] = level
        nd = nd["prev"]

    # DC: plain bias quantization
    dc_mag = int(((abs(int(coeffs64[0])) + bias[0]) * iquant[0]
                  >> C.FP_BITS) >> C.AC_BITS)
    out[0] = -dc_mag if coeffs64[0] < 0 else dc_mag
    return out


def trellis_quantize_blocks(coeffs: np.ndarray, qm: dict,
                            quant_u8: np.ndarray,
                            ac_lut: np.ndarray) -> np.ndarray:
    """Trellis quantization over [N, 64] blocks (host loop)."""
    out = np.empty_like(coeffs, dtype=np.int32)
    for n in range(coeffs.shape[0]):
        out[n] = trellis_quantize_block(coeffs[n], qm, quant_u8, ac_lut)
    return out


# ---------------------------------------------------------------------------
# VLC preparation (vectorized run/level/size computation)
# ---------------------------------------------------------------------------


def calc_log2(v: np.ndarray) -> np.ndarray:
    """Bit length of v (v >= 1): floor(log2(v)) + 1.

    Implemented with frexp (exact for integers below 2^53): the returned
    binary exponent of v is exactly its bit length.
    """
    v = np.asarray(v)
    return np.frexp(v.astype(np.float64))[1].astype(np.int64)


def dc_diff_codes(dc: np.ndarray) -> np.ndarray:
    """Per-component DC-predictor differencing + size-category coding.

    `dc` is [N] signed quantized DC values in component scan order; the
    predictor starts at 0.  Returns uint16 codes `n | (suffix << 4)`.
    """
    diff = dc.astype(np.int64).copy()
    diff[1:] -= dc[:-1]
    n = np.where(diff == 0, 0, calc_log2(np.abs(diff)))
    suff = np.where(diff < 0, (diff - 1) & ((1 << n) - 1), diff)
    return np.where(diff == 0, 0, (n | (suff << 4))).astype(np.uint16)


def block_run_levels(qblocks: np.ndarray):
    """Vectorized run/level extraction for [N, 64] quantized blocks (raster).

    Returns dict of [N, 64] arrays in *zigzag position* layout (position 0 is
    DC and always reported as not-coded here):
      nz:    bool, AC coefficient at this zigzag position is nonzero
      run:   zero-run length preceding it (valid where nz)
      size:  bit length n of |value| (valid where nz)
      code:  n-bit two's-complement-style suffix bits (valid where nz)
      last:  [N] zigzag index of the last nonzero AC (0 if none)
    """
    zz = qblocks[:, C.ZIGZAG]                    # [N, 64] in zigzag order
    v = zz.astype(np.int64)
    nz = np.zeros_like(v, dtype=bool)
    nz[:, 1:] = v[:, 1:] != 0
    mag = np.abs(v)
    size = np.where(nz, calc_log2(np.maximum(mag, 1)), 0)
    mask = np.where(v < 0, -1, 0)
    code = (mag ^ mask) & ((1 << size) - 1)
    # run-length: distance to previous nonzero (or to position 0)
    idx = np.arange(64)[None, :].repeat(v.shape[0], axis=0)
    prev_nz = np.where(nz, idx, 0)
    prev_nz = np.maximum.accumulate(prev_nz, axis=1)
    # previous nonzero position *strictly before* i:
    prev_before = np.zeros_like(prev_nz)
    prev_before[:, 1:] = prev_nz[:, :-1]
    run = idx - prev_before - 1
    run = np.where(nz, run, 0)
    last = prev_nz[:, -1]
    return {"nz": nz, "run": run.astype(np.int32),
            "size": size.astype(np.int32), "code": code.astype(np.int64),
            "last": last.astype(np.int32)}


def entropy_stats(rl: dict, dc_codes: np.ndarray):
    """Symbol frequencies for Huffman optimization.

    Returns (freq_dc [12], freq_ac [256]) for one component group.
    """
    nz = rl["nz"]
    run = rl["run"][nz]
    size = rl["size"][nz]
    freq_ac = np.zeros(257, dtype=np.int64)
    np.add.at(freq_ac, ((run & 15) << 4) | size, 1)
    freq_ac[0xF0] += int((run >> 4).sum())
    freq_ac[0x00] += int((rl["last"] < 63).sum())
    freq_dc = np.bincount(dc_codes & 0x0F, minlength=12).astype(np.int64)
    return freq_dc[:12], freq_ac[:256]

# ---------------------------------------------------------------------------
# Component assembly + serial pack (oracle bit emission)
# ---------------------------------------------------------------------------


def code_scan(writer: BitWriter, order, comp_rl, comp_dc_codes, comp_q_idx,
              dc_luts, ac_luts) -> None:
    """Emit the entropy-coded scan.

    `order` is a list of (component, block_index) in MCU-interleaved scan
    order; `comp_rl[c]` / `comp_dc_codes[c]` hold that component's run/level
    dict and DC codes; `comp_q_idx[c]` selects the luma/chroma table pair.
    """
    for (comp, bi) in order:
        q_idx = comp_q_idx[comp]
        rl = comp_rl[comp]
        dc_code = int(comp_dc_codes[comp][bi])
        dc_len = dc_code & 0x0F
        writer.put_packed_code(int(dc_luts[q_idx][dc_len]))
        if dc_len > 0:
            writer.put_bits(dc_code >> 4, dc_len)
        nzpos = np.nonzero(rl["nz"][bi])[0]
        ac_lut = ac_luts[q_idx]
        esc = int(ac_lut[0xF0])
        for i in nzpos:
            run = int(rl["run"][bi][i])
            while run >= 16:
                writer.put_packed_code(esc)
                run -= 16
            n = int(rl["size"][bi][i])
            writer.put_packed_code(int(ac_lut[(run << 4) | n]))
            writer.put_bits(int(rl["code"][bi][i]), n)
        if rl["last"][bi] < 63:
            writer.put_packed_code(int(ac_lut[0x00]))
