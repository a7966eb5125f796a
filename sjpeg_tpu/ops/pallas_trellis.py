"""Pallas TPU kernel: VMEM-resident trellis (R-D Viterbi) quantization.

Same lattice semantics as ops.trellis.trellis_quantize_blocks_jax (the
vectorized form of the reference's per-block node search,
src/enc.cc:692-761) but with the whole 63-step dynamic program resident
in VMEM: the XLA `lax.scan` formulation re-materializes its [N, 2, 128]
score tensors and [N, 128] carries through HBM on every step (~183 ms
for a 16x1024^2 batch); here one grid step holds a TILE-block slice of
the lattice (scores, validity, packed prev|level) in VMEM scratch for
the entire forward pass AND the backtrace, so HBM traffic is just the
per-block inputs and the [64] output row.

Layout: transposed.  Zigzag positions ride the sublane axis ([64, N]
inputs, read one row per step), blocks ride the lane axis, and the
lattice is [128, T] — node slot k on sublanes, exactly the reversed
-append lane order of the XLA version (ascending k = the reference's
`for cur in reversed(nodes)` visit order, so first-match min-index
reproduces its strict-< tie-breaking).

Unsigned-order trick: the reference scores are uint32 with wraparound.
All scores here are stored BIASED by 2^31 (score_u + 0x80000000 mod
2^32, i.e. XOR of the sign bit): adding deltas commutes with the bias,
and SIGNED int32 comparisons on biased values give exactly the unsigned
order, so the kernel never needs uint32 min/compare.  KMAX (0xFFFFFFFF)
biases to INT32_MAX.

Rate lookups ride the MXU: the per-(candidate, predecessor) AC code
length lt[group, (run & 15) << 4 | size] factors into two exact bf16
one-hot matmuls per step — M = onehot(run15) @ Lm gives every node row
its 24 (group, size) lengths at once, then M @ onehot(group*11+size-1)
selects each block's column (lengths <= 16 and 0/1 one-hots are
bf16-exact; the f32 dot accumulates <= 16-term integer sums exactly).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .trellis import _bit_length

LANE = 128
_SINK = 126
_IMAX = np.int32(0x7FFFFFFF)           # biased uint32 KMAX
_IMIN = np.int32(-0x80000000)          # biased uint32 0
DEFAULT_TILE = 1024
_NCOL = 24                             # 2 groups x 11 sizes (+2 pad)


def _row(ref, i):
    """Dynamic sublane row read: [R, T] ref -> [1, T]."""
    return ref[pl.ds(i, 1), :]


def _trellis_kernel(packa_ref, packb_ref, lam_ref, disto_ref, d_ref,
                    esc_ref, lm_ref, out_ref, s_ref, valid_ref, pv_ref):
    T = out_ref.shape[1]
    kcol = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
    c24 = jax.lax.broadcasted_iota(jnp.int32, (_NCOL, 1), 0)

    # --- per-tile init -----------------------------------------------
    esc_row = esc_ref[0:1, :]                            # sym 0xF0 length
    Lm = lm_ref[:]                                       # [16, 24] bf16
    s_ref[:] = jnp.full((LANE, T), _IMIN)                # biased 0
    valid_ref[:] = jnp.where(kcol == _SINK, 1, 0) * jnp.ones(
        (1, T), jnp.int32)
    pv_ref[:] = jnp.full((LANE, T), 2048)                # prev 0, level 0
    out_ref[:] = jnp.zeros((64, T), jnp.int32)

    # --- forward pass -------------------------------------------------
    # Step i only ever touches lattice rows >= 126-2i (new nodes at
    # 126-2i/127-2i, valid predecessors at >= 128-2i, sink at 126), so
    # the DP runs in four tiers that each restrict every lattice-wide op
    # to the live bottom slab — mean row count 80 instead of 128.
    def make_fwd(lo):
        R = LANE - lo
        krow = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + lo
        pos_k = jnp.where(krow <= 125, (127 - krow) // 2, 0)   # [R, 1]
        r16 = jax.lax.broadcasted_iota(jnp.int32, (R, 16), 1)
        k16 = jax.lax.broadcasted_iota(jnp.int32, (R, 16), 0) + lo
        pos16 = jnp.where(k16 <= 125, (127 - k16) // 2, 0)

        def fwd(i, _):
            a = _row(packa_ref, i)
            v0 = a & 0x7FF
            any_v0 = jnp.max(v0)

            @pl.when(any_v0 > 0)
            def _():
                nb0 = (a >> 11) & 0xF
                neg = (a >> 15) & 1
                g1 = (a >> 16) & 1
                b = _row(packb_ref, i)
                V = b & 0x7FFF
                q16 = b >> 15
                lam = _row(lam_ref, i)
                d0p = _row(disto_ref, i - 1)
                ok = valid_ref[lo:LANE, :] > 0
                # lanes below 128-2i were never written (valid==0 from
                # init), so `ok` alone is the full predecessor mask

                run = (i - 1) - pos_k                    # [R, 1]
                ohf = ((((i - 1) - pos16) & 15) == r16).astype(
                    jnp.bfloat16)                        # [R, 16]
                # all node rows' (group, size) lengths at this run: MXU
                M = jax.lax.dot_general(
                    ohf, Lm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)                   # [R, 24]
                # escape cost (run >> 4 copies of the 0xF0 code) and the
                # predecessor base, hoisted out of the candidate loop:
                # lam distributes over bits mod 2^32 exactly
                SDE = (s_ref[lo:LANE, :] - d_ref[lo:LANE, :]
                       + (run >> 4) * (lam * esc_row))   # [R, T]
                idx0 = g1 * 11 + nb0 - 1                 # [1, T] column id

                nb1 = nb0 - 1
                v1 = (jnp.int32(1) << jnp.maximum(nb1, 0)) - 1
                cands = ((v0, nb0, v0 > 0, idx0),
                         (v1, nb1, (v0 > 0) & (nb0 > 1), idx0 - 1))
                results = []
                for vc, nbc, exist, idx in cands:
                    err = V - vc * q16
                    base2 = err * err + d0p + lam * nbc  # [1, T] wrap
                    # per-block column select as an exact one-hot matmul
                    # (idx < 0 or candidate-invalid columns select zero /
                    # garbage rate; those nodes are marked invalid below)
                    ohB = (c24 == idx).astype(jnp.bfloat16)   # [24, T]
                    mm = jax.lax.dot_general(
                        M, ohB, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32).astype(
                            jnp.int32)                   # [R, T]
                    score = SDE + lam * mm + base2
                    score = jnp.where(ok, score, _IMAX)
                    best = jnp.min(score, axis=0, keepdims=True)
                    # smallest row index achieving `best` (argmin axis 0)
                    arg = jnp.min(jnp.where(score == best, krow, LANE),
                                  axis=0, keepdims=True)
                    newv = (exist & (best < _IMAX)).astype(jnp.int32)
                    lvl = jnp.where(neg > 0, -vc, vc)
                    results.append((best, (arg << 12) | (lvl + 2048),
                                    newv))

                # both candidates searched the step-entry lattice; the
                # two new nodes live on adjacent rows 126-2i (cand 1)
                # and 127-2i (cand 0).  Mosaic vector stores need an
                # 8-aligned sublane base, and the even pair never
                # straddles an 8-row boundary: read-modify-write the
                # aligned 8-row slab (1/16 of a full-lattice write)
                (b0, p0, n0), (b1, p1, n1) = results
                base_row = 126 - 2 * i
                q8 = base_row // 8
                off = base_row - q8 * 8
                rs = pl.ds(q8 * 8, 8)
                sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                m1r = sub == off
                m0r = sub == off + 1

                def rmw(ref, x0, x1):
                    ref[rs, :] = jnp.where(
                        m0r, x0, jnp.where(m1r, x1, ref[rs, :]))

                rmw(s_ref, b0, b1)
                rmw(pv_ref, p0, p1)
                rmw(valid_ref, n0, n1)
            return 0

        return fwd

    # Data-dependent step bound: positions past the tile's last nonzero
    # quantized coefficient create no nodes (their pl.when bodies would
    # skip), so the tier loops stop at imax + 1 — typical q75 tiles top
    # out around position 25-45, nearly halving the sequential DP.
    av = packa_ref[:, :] & 0x7FF
    colmax = jnp.max(av, axis=1, keepdims=True)            # [64, 1]
    imax = jnp.max(jnp.where(colmax > 0, jcol, 0))
    ub = imax + 1

    def clamp(lo, hi):
        return jnp.minimum(jnp.maximum(ub, lo), hi)

    jax.lax.fori_loop(1, clamp(1, 16), make_fwd(96), 0)
    jax.lax.fori_loop(16, clamp(16, 32), make_fwd(64), 0)
    jax.lax.fori_loop(32, clamp(32, 48), make_fwd(32), 0)
    jax.lax.fori_loop(48, clamp(48, 64), make_fwd(0), 0)

    # --- best end node -------------------------------------------------
    d63 = _row(disto_ref, 63)
    fin = jnp.where(valid_ref[:] > 0, s_ref[:] + (d63 - d_ref[:]), _IMAX)
    minv = jnp.min(fin, axis=0, keepdims=True)
    a = jnp.min(jnp.where(fin == minv, kcol, LANE), axis=0, keepdims=True)
    cur = jnp.where(minv < _IMAX, a, jnp.int32(_SINK))   # [1, T]

    # --- backtrace ------------------------------------------------------
    def back(_, cur):
        sel = kcol == cur
        pvs = jnp.sum(jnp.where(sel, pv_ref[:], 0), axis=0, keepdims=True)
        lvl = (pvs & 0xFFF) - 2048
        nxt = (pvs >> 12) & 0x7F
        p = jnp.where(cur >= _SINK, 0, (127 - cur) // 2)
        act = p > 0
        out_ref[:] = out_ref[:] + jnp.where(
            act & (jcol == p), lvl, 0)
        return jnp.where(act, nxt, cur)

    # positions strictly decrease along prev links, so <= imax hops
    jax.lax.fori_loop(0, imax, back, cur)


_ZZ = tuple(int(v) for v in C.ZIGZAG)

# Lm column layout: c = g*11 + (s-1) for group g in {0,1}, size s in
# 1..11 (the sizes the XLA scan's 11-way accumulate covers); cols 22,23
# pad the MXU operand and are never selected (idx0 <= 21, idx1 <= 20).
_GCOL = np.minimum(np.arange(_NCOL) // 11, 1)
_SCOL = np.arange(_NCOL) % 11 + 1
_SYM = (np.arange(16)[:, None] << 4) | _SCOL[None, :]    # [16, 24]


def _rate_matrix(lt_lens):
    """[..., 2, 256] AC code lengths -> [..., 16, 24] bf16 Lm with
    Lm[r15, g*11+s-1] = lt[g, (r15<<4)|s] (values <= 16: bf16-exact)."""
    return lt_lens[..., jnp.asarray(_GCOL), jnp.asarray(_SYM)].astype(
        jnp.bfloat16)


def _prep(cinter, iquant, ibias, quant, group):
    """Raster inputs -> transposed per-step rows for the kernel."""
    zz = jnp.asarray(_ZZ, jnp.int32)
    cz = cinter[:, zz].astype(jnp.int32)
    iqz = iquant[:, zz].astype(jnp.uint32)
    ibz = ibias[:, zz].astype(jnp.uint32)
    qz = quant[:, zz].astype(jnp.int32)

    V = jnp.abs(cz)
    v0 = ((V.astype(jnp.uint32) + ibz) * iqz >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    nb0 = _bit_length(v0)
    q16 = qz << C.AC_BITS
    lam = ((q16.astype(jnp.uint32) * q16.astype(jnp.uint32))
           // jnp.uint32(32)).astype(jnp.int32)
    vv = (V.astype(jnp.uint32) * V.astype(jnp.uint32)).at[:, 0].set(0)
    disto0 = jnp.cumsum(vv, axis=1).astype(jnp.int32)

    packa = (v0 | (nb0 << 11) | ((cz < 0).astype(jnp.int32) << 15)
             | ((group.astype(jnp.int32) & 1) << 16)[:, None])
    packb = V | (q16 << 15)                      # V <= 16384 (15 bits)

    pos = np.where(np.arange(LANE) <= 125,
                   (127 - np.arange(LANE)) // 2, 0)
    D = disto0[:, jnp.asarray(pos, jnp.int32)]
    return packa.T, packb.T, lam.T, disto0.T, D.T


def _post(outT, coeffs_dc, iquant_dc, ibias_dc, n):
    """[64, NP] kernel output -> [N, 64] raster with the DC lane set."""
    out_z = outT.T[:n]
    dmag = ((jnp.abs(coeffs_dc).astype(jnp.uint32)
             + ibias_dc.astype(jnp.uint32))
            * iquant_dc.astype(jnp.uint32) >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    dc = jnp.where(coeffs_dc < 0, -dmag, dmag)
    out_z = out_z.at[:, 0].set(dc)
    inv = jnp.zeros(64, jnp.int32).at[jnp.asarray(_ZZ, jnp.int32)].set(
        jnp.arange(64, dtype=jnp.int32))
    return out_z[:, inv]


@functools.partial(jax.jit, static_argnames=("tile", "tiles_per_img"))
def trellis_quantize_pallas(cinter, iquant, ibias, quant, group, lt_lens,
                            tile: int = DEFAULT_TILE,
                            tiles_per_img: int = 0):
    """[N, 64] raster coeffs -> [N, 64] trellis-quantized (raster).

    Arguments as in ops.trellis.trellis_quantize_tiled: iquant/ibias/
    quant are per-block [N, 64] rows, group the [N] table-group row,
    lt_lens the [2, 256] AC code-length rate model.  Per-image rate
    tables (a batched dichotomy's evolving tables): lt_lens [B, 2, 256]
    + tiles_per_img (rows image-major, each image's block count padded
    to tile * tiles_per_img by the caller).  Bit-identical to the XLA
    scan and the host oracle spec.trellis_quantize_block.
    """
    N = cinter.shape[0]
    rem = (-N) % tile
    if rem:
        pad2 = ((0, rem), (0, 0))
        cinter = jnp.pad(cinter, pad2)
        iquant = jnp.pad(iquant, pad2, constant_values=1)
        ibias = jnp.pad(ibias, pad2)
        quant = jnp.pad(quant, pad2, constant_values=1)
        group = jnp.pad(group, (0, rem))
    NP = N + rem
    packa, packb, lam, disto, D = _prep(cinter, iquant, ibias, quant,
                                        group)
    Lm = _rate_matrix(jnp.asarray(lt_lens, jnp.int32))
    gi = group.astype(jnp.int32) & 1

    col = lambda r: pl.BlockSpec((r, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
    if tiles_per_img:
        assert Lm.ndim == 3 and NP // tile == \
            Lm.shape[0] * tiles_per_img
        img = jnp.arange(NP, dtype=jnp.int32) // (tile * tiles_per_img)
        esc = lt_lens[img, gi, 0xF0].astype(jnp.int32)[None, :]
        lm_spec = pl.BlockSpec(
            (1, 16, _NCOL), lambda i, t=tiles_per_img: (i // t, 0, 0),
            memory_space=pltpu.VMEM)
        kernel = _trellis_kernel_sets
    else:
        esc = lt_lens[gi, 0xF0].astype(jnp.int32)[None, :]
        lm_spec = pl.BlockSpec((16, _NCOL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        kernel = _trellis_kernel
    outT = pl.pallas_call(
        kernel,
        grid=(NP // tile,),
        in_specs=[col(64), col(64), col(64), col(64), col(LANE), col(1),
                  lm_spec],
        out_specs=col(64),
        out_shape=jax.ShapeDtypeStruct((64, NP), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((LANE, tile), jnp.int32),   # biased scores
            pltpu.VMEM((LANE, tile), jnp.int32),   # validity
            pltpu.VMEM((LANE, tile), jnp.int32),   # packed prev|level
        ],
    )(packa, packb, lam, disto, D, esc, Lm)
    return _post(outT, cinter[:N, 0], iquant[:N, 0], ibias[:N, 0], N)


class _Drop:
    """Ref adapter: a leading grid-selected singleton dim dropped so the
    shared kernel body can index the per-image block as 2-D."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[(0,) + (idx if isinstance(idx, tuple)
                                 else (idx,))]


def _trellis_kernel_sets(packa_ref, packb_ref, lam_ref, disto_ref, d_ref,
                         esc_ref, lm_ref, out_ref, s_ref, valid_ref,
                         pv_ref):
    """Per-image rate-table variant: Lm rides a leading singleton dim
    selected by the grid index map."""
    _trellis_kernel(packa_ref, packb_ref, lam_ref, disto_ref, d_ref,
                    esc_ref, _Drop(lm_ref), out_ref, s_ref, valid_ref,
                    pv_ref)
