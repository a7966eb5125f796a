"""In-kernel 8x8 forward DCT for Pallas TPU: MXU matmuls + int32 fixups.

Bit-identical to ops/fdct.py (and thus to the reference fixed-point fDCT,
src/fdct.cc:67-209) but shaped for a TPU kernel: every linear sub-network
of the butterfly graph (adds/subs/shifts, whose values stay well under
2^24 and are therefore exact in float32) becomes one [T, 64] @ [64, 64]
MXU matmul, and only the nonlinear points — the Q15 truncating multiplies
`(a * k) >> 16`, the +1 LSB corrections, and the int16 store emulation —
run as elementwise int32 VPU ops, where int32 wraparound matches the
reference exactly.

Lane layouts (T blocks per tile, 64 lanes):
  raster    lane = 8 * row + col            (kernel input/output)
  col-slots lane = 8 * col + k              (column pass intermediates)
  row-slots lane = 8 * row + j              (row pass intermediates)
Cross-slot combines use circular `pltpu.roll` over the lane axis; every
rolled value is consumed within its own 8-lane group, and the final
permutation matmuls read only the designated slots, so wrap-around
contamination never reaches the output.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

# column-pass slot indices (lane = 8*col + k)
_K_COL0, _K_COL4, _K_L1, _K_L2, _K_L5, _K_L6, _K_L7, _K_L8 = range(8)
# col-slot k -> which DCT row its final value belongs to
_COL_SLOT_ROW = [0, 4, 2, 6, 1, 3, 5, 7]
# row-pass slot j -> which output column its final value belongs to
_ROW_SLOT_COL = [0, 4, 2, 6, 1, 3, 5, 7]


@functools.lru_cache(maxsize=4)
def fdct_matrices(zigzag_out: bool = False, paired: bool = False):
    """Constant operands: (A, PCB, PO, KV) — float32 [64, 64] matrices and
    KV int32 [8, 64] per-lane multiplier vectors.

    PCB = PC @ B folds the column-slot -> raster permutation into the row
    -pass combo matrix (one matmul instead of two); PO maps row slots to
    raster output, or — with `zigzag_out` — straight to zigzag order
    (PO @ ZZ), letting the fused encode kernel quantize in zigzag domain
    and skip a separate permutation matmul.  All entries are small
    integers (|v| <= 32), exactly representable in bfloat16, which is
    what makes the 2-pass hi/lo matmul scheme in `_imatmul` exact.

    `paired`: two-blocks-per-row [*, 128] layout — matrices become
    kron(I2, M) [128, 128] block-diagonals and KV tiles to [8, 128], so
    one MXU pass transforms both blocks of a row (the 64-wide matrices
    would otherwise use a quarter of the 128x128 systolic array)."""
    # ---- A: raster -> column-pass linear combos (slot layout 8c + k) ----
    # per-column combos over x_r; rows of `cf` are coefficient vectors
    e = np.eye(8, dtype=np.int64)
    m0, m7p = e[0] - e[7], e[0] + e[7]
    m2, m5p = e[2] - e[5], e[2] + e[5]
    m3, m4p = e[3] - e[4], e[3] + e[4]
    m1, m6p = e[1] - e[6], e[1] + e[6]
    m7q, m4q = m7p - m4p, m7p + m4p
    m6q, m5q = m6p - m5p, m6p + m5p
    cf = np.zeros((8, 8), dtype=np.int64)
    cf[_K_COL0] = 8 * (m4q + m5q)
    cf[_K_COL4] = 8 * (m4q - m5q)
    cf[_K_L1] = 8 * m7q
    cf[_K_L2] = 8 * m6q
    cf[_K_L5] = 8 * m3
    cf[_K_L6] = 8 * m0
    cf[_K_L7] = 16 * (m1 - m2)
    cf[_K_L8] = 16 * (m1 + m2)
    A = np.zeros((64, 64), dtype=np.float32)
    for c in range(8):
        for k in range(8):
            for r in range(8):
                A[8 * r + c, 8 * c + k] = cf[k, r]

    # ---- PC: col-slot (8c + k) -> raster (8 * dct_row + c) ----
    PC = np.zeros((64, 64), dtype=np.float32)
    for c in range(8):
        for k in range(8):
            PC[8 * c + k, 8 * _COL_SLOT_ROW[k] + c] = 1.0

    # ---- B: raster -> row-pass combos (slot layout 8r + j) ----
    rf = np.zeros((8, 8), dtype=np.int64)
    a0, b0 = e[0] + e[7], e[0] - e[7]
    a1, b1 = e[1] + e[6], e[1] - e[6]
    a2, b2 = e[2] + e[5], e[2] - e[5]
    a3, b3 = e[3] + e[4], e[3] - e[4]
    rf[0] = a0 + a3 + a1 + a2          # c0 + c2   (o0)
    rf[1] = a0 + a3 - a1 - a2          # c0 - c2   (o4)
    rf[2] = a0 - a3                    # c1        (o2/o6)
    rf[3] = a1 - a2                    # c3        (o2/o6)
    rf[4], rf[5], rf[6], rf[7] = b0, b1, b2, b3
    B = np.zeros((64, 64), dtype=np.float32)
    for r in range(8):
        for j in range(8):
            for cc in range(8):
                B[8 * r + cc, 8 * r + j] = rf[j, cc]

    # ---- PO: row-slot (8r + j) -> raster (8r + out_col) ----
    PO = np.zeros((64, 64), dtype=np.float32)
    for r in range(8):
        for j in range(8):
            PO[8 * r + j, 8 * r + _ROW_SLOT_COL[j]] = 1.0

    # ---- KV: per-lane int32 multiplier vectors ----
    tab = np.asarray(C.FDCT_ROW_TABLES, dtype=np.int64)   # [8 rows, 7]
    C1, C2, C3, C4 = tab[:, 0], tab[:, 1], tab[:, 2], tab[:, 3]
    C5, C6, C7 = tab[:, 4], tab[:, 5], tab[:, 6]
    KV = np.zeros((8, 64), dtype=np.int64)
    # row 0: column-pass Q15 multipliers (slot layout 8c + k)
    for c in range(8):
        KV[0, 8 * c + _K_L1] = C.FDCT_K_TAN2
        KV[0, 8 * c + _K_L2] = C.FDCT_K_TAN2
        KV[0, 8 * c + _K_L7] = C.FDCT_K_2SQRT2
        KV[0, 8 * c + _K_L8] = C.FDCT_K_2SQRT2
    # rows 1-7: row-pass multipliers (slot layout 8r + j)
    for r in range(8):
        KV[1, 8 * r + 0] = C4[r]
        KV[1, 8 * r + 1] = C4[r]
        KV[2, 8 * r + 2], KV[2, 8 * r + 3] = C2[r], C6[r]
        KV[3, 8 * r + 2], KV[3, 8 * r + 3] = C6[r], C2[r]
        KV[4, 8 * r + 4:8 * r + 8] = [C1[r], C3[r], C5[r], C7[r]]
        KV[5, 8 * r + 4:8 * r + 8] = [C3[r], -C7[r], -C1[r], -C5[r]]
        KV[6, 8 * r + 4:8 * r + 8] = [C5[r], -C1[r], C7[r], C3[r]]
        KV[7, 8 * r + 4:8 * r + 8] = [C7[r], -C5[r], C3[r], -C1[r]]
    # int32 wraparound semantics are the reference's own
    KV = ((KV + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)

    PCB = (PC.astype(np.int64) @ B.astype(np.int64)).astype(np.float32)
    if zigzag_out:
        ZZ = np.zeros((64, 64), dtype=np.float32)
        for j, src in enumerate(C.ZIGZAG):
            ZZ[src, j] = 1.0
        PO = (PO.astype(np.int64) @ ZZ.astype(np.int64)).astype(np.float32)
    if paired:
        eye2 = np.eye(2, dtype=np.float32)
        A = np.kron(eye2, A)
        PCB = np.kron(eye2, PCB)
        PO = np.kron(eye2, PO)
        KV = np.tile(KV, (1, 2))
    return A, PCB, PO, KV


def _sext16(x):
    return ((x & 0xFFFF) ^ 0x8000) - 0x8000


def _dot(x, m):
    """One default-precision MXU pass.  The TPU MXU truncates f32 inputs
    to bf16; callers guarantee every operand is an integer in [-256, 256]
    (bf16-exact), so products are exact and the f32 accumulation is exact
    below 2^24."""
    return jnp.dot(x, m, preferred_element_type=jnp.float32)


def _imatmul(x, m_ref, input_bits: int = 16):
    """Exact int32 matmul using 1-2 default-precision MXU passes.

    The constant matrices all have small-integer entries (bf16-exact).
    `input_bits <= 8`: x itself is bf16-exact -> a single pass.  Wider x
    splits into hi/lo 8-bit halves (lo in [0, 255], hi = x >> 8 in
    [-2^(b-9), 2^(b-9))) -> two passes recombined in int32.  This replaces
    precision=HIGHEST (6 passes per matmul), which was the kernel's
    dominant fixed cost: exactness is identical because every bf16
    product and every partial sum stays integral below 2^24."""
    if input_bits <= 8:
        return _dot(x.astype(jnp.float32), m_ref[:]).astype(jnp.int32)
    lo = x & 0xFF
    hi = x >> 8                      # arithmetic: x == (hi << 8) + lo
    m = m_ref[:]
    out_hi = _dot(hi.astype(jnp.float32), m).astype(jnp.int32)
    out_lo = _dot(lo.astype(jnp.float32), m).astype(jnp.int32)
    return (out_hi << 8) + out_lo


def _roll(x, s):
    return pltpu.roll(x, shift=s % x.shape[-1], axis=1)


def fdct_body(x, a_ref, pcb_ref, po_ref, kv_ref, roll=_roll):
    """[T, 64] int32 raster samples (8-bit range, i.e. [-128, 127]) ->
    [T, 64] int32 coeffs (x16 scale) in raster order — or zigzag order
    when `po_ref` holds the fdct_matrices(zigzag_out=True) variant.
    With the fdct_matrices(paired=True) operands the same body handles
    the [T/2, 128] two-blocks-per-row layout: every roll distance is
    consumed within its own 8-lane group, so circular rolls over 128
    lanes are equivalent to per-64-half rolls.

    `roll(x, s)` must satisfy roll(x, s)[:, l] == x[:, l - s (mod L)];
    tests pass jnp.roll, kernels the pltpu lane roll.
    """
    T = x.shape[0]
    L = x.shape[1]

    # ---- column pass (samples are 8-bit: single-pass matmul) ----
    w = _imatmul(x, a_ref, input_bits=8)       # col-slot combos
    kvp = kv_ref[0:1, :]
    p = (w * kvp) >> 16                        # Q15 mults at L1/L2/L7/L8
    d = w - roll(p, _K_L5 - _K_L7)             # [k4]=m3', [k5]=m0'
    s = w + roll(p, _K_L5 - _K_L7)             # [k4]=m1''', [k5]=m2'''
    q1 = (s * jnp.int32(C.FDCT_K_TAN1)) >> 16
    q2 = (d * jnp.int32(C.FDCT_K_TAN3M1)) >> 16
    ee = q2 + d                                # [k4]=m3f-1, [k5]=t4b
    a1c = w + roll(p, _K_L1 - _K_L2)           # [k2] = col2
    a2c = roll(p, _K_L2 - _K_L1) - w           # [k3] = col6
    a3c = q1 + roll(s, _K_L5 - _K_L6) + 1      # [k4] = col1
    a4c = d - roll(ee, _K_L6 - _K_L5) - 1      # [k5] = col3
    a5c = roll(d, _K_L7 - _K_L5) + roll(ee, _K_L7 - _K_L6)   # [k6] = col5
    a6c = roll(q1, _K_L8 - _K_L6) - roll(s, _K_L8 - _K_L5)   # [k7] = col7

    slot = jax.lax.broadcasted_iota(jnp.int32, (T, L), 1) & 7
    cols = jnp.where(slot <= _K_COL4, w,
                     jnp.where(slot == _K_L1, a1c,
                               jnp.where(slot == _K_L2, a2c,
                                         jnp.where(slot == _K_L5, a3c,
                                                   jnp.where(slot == _K_L6,
                                                             a4c, a5c)))))
    cols = jnp.where(slot == _K_L8, a6c, cols)

    # ---- row pass (PC @ B folded: int16 store + relayout + combos) ----
    v = _imatmul(_sext16(cols), pcb_ref)       # row-slot combos
    u0 = (v * kv_ref[1:2, :]) >> 16        # o0 @ j0, o4 @ j1
    w2 = v * kv_ref[2:3, :]
    w3 = v * kv_ref[3:4, :]
    o2 = (w2 + roll(w2, -1)) >> 16             # @ j2
    o6 = (roll(w3, 1) - w3) >> 16              # @ j3

    def odd(kv_row):
        m = v * kv_ref[kv_row:kv_row + 1, :]
        t = m + roll(m, -2)
        return (t + roll(t, -1)) >> 16         # @ j4

    o1 = odd(4)
    o3 = roll(odd(5), 1)                       # @ j5
    o5 = roll(odd(6), 2)                       # @ j6
    o7 = roll(odd(7), 3)                       # @ j7

    out = jnp.where(slot <= 1, u0,
                    jnp.where(slot == 2, o2,
                              jnp.where(slot == 3, o6,
                                        jnp.where(slot == 4, o1,
                                                  jnp.where(slot == 5, o3,
                                                            o5)))))
    out = jnp.where(slot == 7, o7, out)
    return _imatmul(_sext16(out), po_ref)


def _fdct_kernel(x_ref, a_ref, pcb_ref, po_ref, kv_ref, out_ref):
    out_ref[:] = fdct_body(x_ref[:], a_ref, pcb_ref, po_ref, kv_ref)


@functools.partial(jax.jit, static_argnames=("tile",))
def fdct_blocks_pallas(blocks, tile: int = 512):
    """Standalone [N, 64] -> [N, 64] wrapper (tests / staged paths)."""
    N = blocks.shape[0]
    rem = (-N) % tile
    if rem:
        blocks = jnp.pad(blocks, ((0, rem), (0, 0)))
    NP = N + rem
    A, PCB, PO, KV = fdct_matrices()
    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fdct_kernel,
        grid=(NP // tile,),
        in_specs=[spec64, cspec((64, 64)), cspec((64, 64)),
                  cspec((64, 64)), cspec((8, 64))],
        out_specs=spec64,
        out_shape=jax.ShapeDtypeStruct((NP, 64), jnp.int32),
    )(blocks.astype(jnp.int32), jnp.asarray(A), jnp.asarray(PCB),
      jnp.asarray(PO), jnp.asarray(KV))
    return out[:N]


def fdct_dc(blocks):
    """Exact DC lane of the fDCT, [N, 64] -> [N] int32, via the collapsed
    butterfly chain: col0(c) = (sum_r x[r, c]) << 3, then
    dc = sext16((C4_row0 * sum_c sext16(col0(c))) >> 16).  Cheap XLA ops —
    the engine needs only the DC ahead of the kernel (predictor diffs are
    a cross-block chain), everything else stays in the Pallas kernel."""
    x = blocks.reshape(-1, 8, 8).astype(jnp.int32)
    col0 = _sext16(jnp.sum(x, axis=1) << 3)            # [N, 8]
    c4 = int(C.FDCT_ROW_TABLES[0][3])
    return _sext16((jnp.int32(c4) * jnp.sum(col0, axis=1)) >> 16)
