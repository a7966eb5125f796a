"""Pallas TPU kernel: fused quantize + zigzag + run/level + VLC + pack.

Extends the VLC+pack kernel (pallas_vlc_pack) all the way back to raw
samples: one VMEM-resident pass takes interleaved (MCU-order) blocks and
produces each block's packed bit buffer + exact bit count.  Replaces the
XLA quantize / zigzag-gather / cummax run-length chain (reference
per-block flow: quantize src/enc.cc:598-630, zigzag + run/level emission
src/enc.cc:882-911) and removes the three [N, 64] int32 run/size/code
intermediates from HBM entirely.

Layout: two blocks per kernel row ([T/2, 128], block A in lanes 0-63 =
tile blocks [0, T/2), block B in lanes 64-127 = [T/2, T)) — see
pallas_vlc_pack's module docstring for why.  In-kernel stages per tile:
1. fDCT (samples-in kernels): pallas_fdct.fdct_body with the paired
   kron(I2, M) matrices — MXU matmuls at full 128-lane width, output
   folded straight into zigzag order.
2. quantize: |c|+bias, 16-bit reciprocal multiply, AC_BITS shift, sign
   restore; luma/chroma rows of the [2, 128] tiled quantizer inputs
   selected by the per-half group mask.
3. run/level: bit-length via 4 halving steps, zero-run via a log-step
   running-maximum scan with per-half base sentinels.
4. Huffman lookup + word packing: pallas_vlc_pack.paired_fields_to_words
   (the per-block DC lookup ships pre-packed in the meta rows).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from . import pallas_fdct
from .pallas_vlc_pack import (LANE, WORDS, _cummax_lanes, _DropLead,
                              _paired, build_meta_rows, lanes_from_cols,
                              meta_split, paired_fields_to_words)

# 1024 amortizes the per-grid-step fixed cost (scalar reductions for the
# dynamic loop bounds + DMA setup): measured 19.1 ms -> 16.7 ms on the
# 16x1024^2 batch vs tile=512 (scripts/r2_experiments.py kernel)
DEFAULT_TILE = 1024


@functools.lru_cache(maxsize=1)
def _zigzag_matrix_paired():
    """[128, 128] kron(I2, ZZ) one-hot f32: out[j] = in[ZIGZAG[j]] per
    64-lane half via in @ P."""
    p = np.zeros((64, 64), dtype=np.float32)
    for j, src in enumerate(C.ZIGZAG):
        p[src, j] = 1.0
    return np.kron(np.eye(2, dtype=np.float32), p)


_ZZ = tuple(int(v) for v in C.ZIGZAG)


def _to_zigzag_lanes(vec):
    """Permute the last axis of a [..., 64] quantizer vector into zigzag
    order (host-side / XLA glue, once per program — the fused kernel
    receives zigzag-domain coefficients straight from the folded
    PO @ ZZ fDCT output and quantizes in that domain)."""
    return vec[..., jnp.asarray(_ZZ)]


def _tile_lanes(vec):
    """[..., G, 64] quantizer rows -> [..., G, 128] for paired rows."""
    return jnp.concatenate([vec, vec], axis=-1)


def _calc_log2(v):
    """Bit length of v for v >= 1 (int32), elementwise (enc.cc:468-480)."""
    out = jnp.zeros_like(v)
    x = v
    for shift in (8, 4, 2, 1):
        hit = x >= (1 << shift)
        out = out + jnp.where(hit, shift, 0)
        x = jnp.where(hit, x >> shift, x)
    return out + (v > 0).astype(jnp.int32)


def _quantize(coef, grp0, iquant_ref, ibias_ref):
    """Exact uint32 16-bit reciprocal quantizer; domain-agnostic — the
    quantizer rows must share the coefficient lane order.  grp0 is a
    [T, L] mask; iquant/ibias rows are [2, L]."""
    iq = jnp.where(grp0, iquant_ref[0:1, :], iquant_ref[1:2, :])
    ib = jnp.where(grp0, ibias_ref[0:1, :], ibias_ref[1:2, :])
    t = (jnp.abs(coef) + ib).astype(jnp.uint32)
    q = ((t * iq.astype(jnp.uint32)) >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    return jnp.where(coef < 0, -q, q)


def derive_fields(zz):
    """Paired zigzag-domain quantized levels [R, 128] -> (run, size,
    code, nz) VLC fields.  Zero-run length = distance to the previous
    nonzero lane within the half; per-half base sentinels at lanes 0/64
    keep the full-width running max from crossing the block boundary.
    Shared by the production kernels and scripts/kernel_ablate.py."""
    R = zz.shape[0]
    gl = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    lane_ib = gl & 63
    nz = (zz != 0) & (lane_ib > 0)
    m = jnp.abs(zz)
    size = jnp.where(nz, _calc_log2(jnp.maximum(m, 1)), 0)
    neg = jnp.where(zz < 0, -1, 0)
    code = (m ^ neg) & ((1 << size) - 1)
    prev = _cummax_lanes(
        jnp.where(nz, gl, jnp.where(lane_ib == 0, gl, 0)))
    prev_before = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), prev[:, :-1]], axis=1)
    run = jnp.where(nz, gl - prev_before - 1, 0)
    return run, size, code, nz


def _rl_fields(zz, mdc, grp0, ac_lut_ref):
    """Paired zigzag-domain quantized levels [R, 128] -> packed words +
    totals (derive_fields + paired_fields_to_words)."""
    run, size, code, nz = derive_fields(zz)
    return paired_fields_to_words(run, size, code, nz, mdc, grp0,
                                  ac_lut_ref)


def _quant_pack_kernel(coef_ref, meta_ref, iquant_ref, ibias_ref,
                       zz_ref, ac_lut_ref, words_ref, total_ref, *, tpm):
    coef = _paired(coef_ref[:])
    R = coef.shape[0]
    mdc, grp0 = meta_split(meta_ref, tpm, R)
    q = _quantize(coef, grp0, iquant_ref, ibias_ref)
    # zigzag permutation on the MXU (2-pass hi/lo exact matmul)
    zz = pallas_fdct._imatmul(q, zz_ref, input_bits=16)
    words, total = _rl_fields(zz, mdc, grp0, ac_lut_ref)
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, total_ref.shape[1])


def _decode_chroma_wrap(xp, grp0):
    """Undo the int8 wrap of RGB-derived chroma samples.

    RGB-derived chroma spans [-127, +128] (pure blue -> U = +128, pure
    red -> V = +128; the reference keeps unclamped int16 samples,
    src/colors_rgb.cc ToU/ToUV), so the int8 transport encoding wraps
    +128 to -128.  -128 is unreachable from RGB chroma (the minimum is
    exactly -127), so the mapping is unambiguous; luma (grp0) spans
    [-128, 127] natively and must not be touched."""
    return jnp.where(jnp.logical_not(grp0) & (xp == -128), 128, xp)


# In-kernel fold levels: 16-block units leave the pack kernel, with the
# tree's sliced level-0/1 truncation invariants (4 blocks <= 4096 bits
# after fold 2, 16 blocks <= 8192 bits after fold 4 — an overflowing
# unit's exact length still reports and flags its image).
FOLD_LEVELS = 4
# unit width and truncation cap per fold round (merge frame -> kept)
_FOLD_WIDTHS = (64, 128, 128, 256, 256)


def _fold_merge_units(words, total, pad_col):
    """In-kernel first FOLD_LEVELS concat levels: [T, 64] per-block
    streams -> [T/2^L, 256] 16-block units + [T/2^L, 1] exact unit bit
    lengths.

    The caller permuted the tile's block rows (fold order, see
    `fold_permute_rows`), so successive half-concat folds put
    scan-consecutive streams side by side; each _merge2 round splices
    them at exact bit offsets in VMEM.  Replaces the tree's first four
    levels along with the ~150 MB/batch per-block stream round trip.
    Pad blocks (marked group >= 2) zeroed here so they merge as
    no-ops."""
    from . import pallas_tree_concat as ptc
    total = jnp.where(pad_col, 0, total)
    words = jnp.where(jnp.broadcast_to(pad_col, words.shape),
                      jnp.uint32(0), words)
    u, lu = words, total
    for j in range(FOLD_LEVELS):
        w_in = _FOLD_WIDTHS[j]
        w_out = _FOLD_WIDTHS[j + 1]
        M = u.shape[0]
        y = jnp.concatenate([u[:M // 2], u[M // 2:]], axis=1)
        ly = jnp.concatenate([lu[:M // 2], lu[M // 2:]], axis=1)
        la = jax.lax.slice_in_dim(ly, 0, 1, axis=1)
        m = ptc._merge2(y, la, w_in)                 # [M/2, 2*w_in]
        u = (m if w_out == 2 * w_in
             else jax.lax.slice_in_dim(m, 0, w_out, axis=1))
        lu = la + jax.lax.slice_in_dim(ly, 1, 2, axis=1)
    return u, lu


def _sample_pack_kernel(x_ref, meta_ref, iquant_ref, ibias_ref,
                        fa_ref, fpcb_ref, fpozz_ref, fkv_ref,
                        ac_lut_ref, words_ref, total_ref, *, tpm,
                        chroma_wrap=False):
    """Samples-in variant: runs the in-kernel fDCT (pallas_fdct.fdct_body,
    MXU matmuls + int32 fixups) before the shared quantize/VLC/pack body,
    so raw centered samples go in and packed bit streams come out — the
    [N, 64] coefficient plane never exists in HBM.  The fDCT's output
    permutation is folded with the zigzag (fpozz), so coefficients arrive
    zigzag-ordered and quantize against zigzag-permuted quantizer rows —
    no separate permutation matmul."""
    xp = _paired(x_ref[:].astype(jnp.int32))
    R = xp.shape[0]
    mdc, grp0 = meta_split(meta_ref, tpm, R)
    if chroma_wrap:
        xp = _decode_chroma_wrap(xp, grp0)
    zz = pallas_fdct.fdct_body(xp, fa_ref, fpcb_ref, fpozz_ref, fkv_ref)
    q = _quantize(zz, grp0, iquant_ref, ibias_ref)
    words, total = _rl_fields(q, mdc, grp0, ac_lut_ref)
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, total_ref.shape[1])


def _sample_pack_kernel_sets(x_ref, meta_ref, iquant_ref, ibias_ref,
                             fa_ref, fpcb_ref, fpozz_ref, fkv_ref,
                             ac_lut_ref, words_ref, total_ref, *, tpm,
                             chroma_wrap=False):
    """Per-image variant: quantizer rows and the AC LUT carry a leading
    singleton dim selected per image by the BlockSpec index maps."""
    xp = _paired(x_ref[:].astype(jnp.int32))
    R = xp.shape[0]
    mdc, grp0 = meta_split(meta_ref, tpm, R)
    if chroma_wrap:
        xp = _decode_chroma_wrap(xp, grp0)
    zz = pallas_fdct.fdct_body(xp, fa_ref, fpcb_ref, fpozz_ref, fkv_ref)
    q = _quantize(zz, grp0, _DropLead(iquant_ref), _DropLead(ibias_ref))
    words, total = _rl_fields(q, mdc, grp0, _DropLead(ac_lut_ref))
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, total_ref.shape[1])


def _sample_pack_units_kernel(x_ref, meta_ref, iquant_ref, ibias_ref,
                              fa_ref, fpcb_ref, fpozz_ref, fkv_ref,
                              ac_lut_ref, units_ref, ulen_ref, *, tpm,
                              chroma_wrap=False, per_image=False):
    """Units variant: the shared fDCT/quantize/VLC/pack body, then the
    first two concat levels fused in VMEM (_fold_merge_units)."""
    from .pallas_vlc_pack import meta_split_pad
    xp = _paired(x_ref[:].astype(jnp.int32))
    R = xp.shape[0]
    mdc, grp0, pad_col = meta_split_pad(meta_ref, tpm, R)
    if chroma_wrap:
        xp = _decode_chroma_wrap(xp, grp0)
    zz = pallas_fdct.fdct_body(xp, fa_ref, fpcb_ref, fpozz_ref, fkv_ref)
    if per_image:
        q = _quantize(zz, grp0, _DropLead(iquant_ref),
                      _DropLead(ibias_ref))
        words, total = _rl_fields(q, mdc, grp0, _DropLead(ac_lut_ref))
    else:
        q = _quantize(zz, grp0, iquant_ref, ibias_ref)
        words, total = _rl_fields(q, mdc, grp0, ac_lut_ref)
    units, ulen = _fold_merge_units(words, total, pad_col)
    units_ref[:] = units
    ulen_ref[:] = lanes_from_cols(ulen, ulen_ref.shape[1])


def _bitrev_perm(levels: int):
    n = 1 << levels
    return np.asarray([int(format(p, f"0{levels}b")[::-1], 2)
                       for p in range(n)])


def fold_permute_rows(x, tile: int, levels: int = FOLD_LEVELS):
    """Scan-order block rows -> the in-tile fold order the units kernel
    needs: `levels` successive half-concat folds of a tile's rows then
    yield scan-consecutive 2^levels-block groups (input row
    q + (tile / 2^L) * p holds scan block 2^L q + bitrev_L(p); XLA
    glue, fused into the preceding interleave copy)."""
    nt = x.shape[0] // tile
    n = 1 << levels
    xr = x.reshape((nt, tile // n, n) + x.shape[1:])
    xr = xr[:, :, _bitrev_perm(levels)]
    xr = jnp.swapaxes(xr, 1, 2)
    return xr.reshape((-1,) + x.shape[1:])


@functools.partial(jax.jit, static_argnames=("tile", "tiles_per_img",
                                             "chroma_wrap"))
def sample_vlc_pack_units_pallas(samples, dc_codes, group, iquant2,
                                 ibias2, dc_luts, ac_luts,
                                 tile: int = DEFAULT_TILE,
                                 tiles_per_img: int = 0,
                                 chroma_wrap: bool = False):
    """sample_vlc_pack_pallas fused with the first two concat levels.

    Same arguments/contract as sample_vlc_pack_pallas, except:
    - N must be a whole number of tiles and per-IMAGE block counts whole
      tiles too (callers pad each image's rows and mark pad blocks with
      group >= 2, which the kernel zeroes before merging);
    - returns ([N/2^L, 256] uint32 left-aligned 16-block units,
      [N/2^L / mw, mw] int32 lane-packed exact unit bit lengths)
      feeding pallas_tree_concat.concat_units_tree.  A unit whose
      content exceeds its truncated frame reports its exact length
      anyway, and the concat flags the image for the engine's overflow
      fallback (thresholds 4096/8192 bits = the tree's sliced
      level-0/1 invariants)."""
    N = samples.shape[0]
    n_fold = 1 << FOLD_LEVELS
    assert N % tile == 0 and tile % n_fold == 0
    samples = fold_permute_rows(samples, tile)
    dc_codes = fold_permute_rows(dc_codes, tile)
    group = fold_permute_rows(group, tile)
    A, PCB, POZZ, KV = pallas_fdct.fdct_matrices(zigzag_out=True,
                                                 paired=True)
    iquant2 = _tile_lanes(_to_zigzag_lanes(iquant2))
    ibias2 = _tile_lanes(_to_zigzag_lanes(ibias2))
    mw = 64 if tile % 512 == 0 else tile
    tpm = tile // mw
    units_per_tile = tile // n_fold
    mw2 = 8 if tile % 512 == 0 else units_per_tile
    uw = _FOLD_WIDTHS[FOLD_LEVELS]
    n_images = dc_luts.shape[0] if dc_luts.ndim == 3 else 1
    meta = build_meta_rows(dc_codes, group, dc_luts, tile, mw, n_images)

    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((2 * tpm, mw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_ulen = pl.BlockSpec((units_per_tile // mw2, mw2),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    if tiles_per_img:
        assert iquant2.ndim == 3 and dc_luts.ndim == 3 and \
            N // tile == n_images * tiles_per_img
        t = tiles_per_img
        per_img = lambda shape, space: pl.BlockSpec(
            (1,) + shape, lambda i, t=t: (i // t, 0, 0),
            memory_space=space)
        q_spec = lambda: per_img((2, LANE), pltpu.VMEM)
        lut_spec = per_img((2, 256), pltpu.SMEM)
        kernel = functools.partial(_sample_pack_units_kernel, tpm=tpm,
                                   chroma_wrap=chroma_wrap,
                                   per_image=True)
    else:
        q_spec = lambda: const((2, LANE))
        lut_spec = pl.BlockSpec((2, 256), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        kernel = functools.partial(_sample_pack_units_kernel, tpm=tpm,
                                   chroma_wrap=chroma_wrap)
    units, ulens = pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[spec64, spec_meta, q_spec(), q_spec(),
                  const((LANE, LANE)), const((LANE, LANE)),
                  const((LANE, LANE)), const((8, LANE)),
                  lut_spec],
        out_specs=(
            pl.BlockSpec((units_per_tile, uw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_ulen,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N // n_fold, uw), jnp.uint32),
            jax.ShapeDtypeStruct((N // n_fold // mw2, mw2), jnp.int32),
        ),
    )(samples.astype(jnp.int8), meta,
      iquant2.astype(jnp.int32), ibias2.astype(jnp.int32),
      jnp.asarray(A), jnp.asarray(PCB), jnp.asarray(POZZ),
      jnp.asarray(KV), ac_luts.astype(jnp.uint32))
    return units, ulens


@functools.partial(jax.jit, static_argnames=("tile", "tiles_per_img",
                                             "chroma_wrap"))
def sample_vlc_pack_pallas(samples, dc_codes, group, iquant2, ibias2,
                           dc_luts, ac_luts, tile: int = DEFAULT_TILE,
                           tiles_per_img: int = 0,
                           chroma_wrap: bool = False):
    """Fused fDCT + quantize + zigzag + run/level + VLC + pack.

    samples: [N, 64] int8 (or int32) raster-order centered samples,
    MCU-interleaved; other arguments as in quant_vlc_pack_pallas
    (dc_codes come from the cheap XLA DC chain over pallas_fdct.fdct_dc).
    Samples ship as int8 — a quarter of the input DMA.  `chroma_wrap`
    (RGB-derived sources only): chroma samples span [-127, +128], so the
    int8 encoding wraps +128 to -128; the kernel decodes -128 back to
    +128 on chroma blocks after widening (see _decode_chroma_wrap).
    Planar YUV sources must pass False — their chroma legitimately
    reaches -128 (sample value 0) and never +128.

    Per-image mode: pass iquant2/ibias2 [B, 2, 64], dc_luts [B, 2, 16] /
    ac_luts [B, 2, 256] and `tiles_per_img` (rows image-major, per-image
    block counts padded to tile * tiles_per_img); each grid step's index
    maps select its image's quantizer rows and LUT slices.
    """
    N = samples.shape[0]
    rem = (-N) % tile
    if rem:
        samples = jnp.pad(samples, ((0, rem), (0, 0)))
        dc_codes = jnp.pad(dc_codes, (0, rem))
        group = jnp.pad(group, (0, rem))
    NP = N + rem
    A, PCB, POZZ, KV = pallas_fdct.fdct_matrices(zigzag_out=True,
                                                 paired=True)
    # the kernel quantizes in zigzag domain (folded PO @ ZZ output),
    # paired rows: both 64-lane halves see the same quantizer lanes
    iquant2 = _tile_lanes(_to_zigzag_lanes(iquant2))
    ibias2 = _tile_lanes(_to_zigzag_lanes(ibias2))
    # Mosaic block rule: sublane dim divisible by 8 -> 64-lane meta rows
    # give an (8, 64) block at the production tile; tiny test tiles fall
    # back to one row per block (interpret mode does not enforce tiling)
    mw = 64 if tile % 512 == 0 else tile
    tpm = tile // mw
    n_images = dc_luts.shape[0] if dc_luts.ndim == 3 else 1
    meta = build_meta_rows(dc_codes, group, dc_luts, tile, mw, n_images)

    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((2 * tpm, mw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_tot = pl.BlockSpec((tpm, mw), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    if tiles_per_img:
        assert iquant2.ndim == 3 and dc_luts.ndim == 3 and \
            NP // tile == n_images * tiles_per_img
        t = tiles_per_img
        per_img = lambda shape, space: pl.BlockSpec(
            (1,) + shape, lambda i, t=t: (i // t, 0, 0),
            memory_space=space)
        q_spec = lambda: per_img((2, LANE), pltpu.VMEM)
        lut_spec = per_img((2, 256), pltpu.SMEM)
        kernel = functools.partial(_sample_pack_kernel_sets, tpm=tpm,
                                   chroma_wrap=chroma_wrap)
    else:
        q_spec = lambda: const((2, LANE))
        lut_spec = pl.BlockSpec((2, 256), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        kernel = functools.partial(_sample_pack_kernel, tpm=tpm,
                                   chroma_wrap=chroma_wrap)
    words, totals = pl.pallas_call(
        kernel,
        grid=(NP // tile,),
        in_specs=[spec64, spec_meta, q_spec(), q_spec(),
                  const((LANE, LANE)), const((LANE, LANE)),
                  const((LANE, LANE)), const((8, LANE)),
                  lut_spec],
        out_specs=(
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_tot,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP, WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((NP // mw, mw), jnp.int32),
        ),
    )(samples.astype(jnp.int8), meta,
      iquant2.astype(jnp.int32), ibias2.astype(jnp.int32),
      jnp.asarray(A), jnp.asarray(PCB), jnp.asarray(POZZ),
      jnp.asarray(KV), ac_luts.astype(jnp.uint32))
    return words[:N], totals.reshape(-1)[:N]


@functools.partial(jax.jit, static_argnames=("tile",))
def quant_vlc_pack_pallas(coeffs, dc_codes, group, iquant2, ibias2,
                          dc_luts, ac_luts, tile: int = DEFAULT_TILE):
    """Fused quantize + zigzag + run/level + VLC + pack.

    coeffs: [N, 64] int32 raster-order fDCT coefficients, MCU-interleaved;
    dc_codes: [N] packed DC size|suffix codes (from the already-quantized
    DC lane); group: [N] int32 table group per block; iquant2/ibias2
    [2, 64] int32 (luma/chroma rows); dc_luts [2, 16] / ac_luts [2, 256]
    uint32 packed (code<<16|len) LUTs.
    Returns ([N, 64] uint32 words, [N] int32 bit counts).
    """
    N = coeffs.shape[0]
    rem = (-N) % tile
    if rem:
        coeffs = jnp.pad(coeffs, ((0, rem), (0, 0)))
        dc_codes = jnp.pad(dc_codes, (0, rem))
        group = jnp.pad(group, (0, rem))
    NP = N + rem
    mw = 64 if tile % 512 == 0 else tile
    tpm = tile // mw
    meta = build_meta_rows(dc_codes, group, dc_luts, tile, mw)
    # raster-domain quantizer rows, tiled over both halves
    iquant2 = _tile_lanes(iquant2)
    ibias2 = _tile_lanes(ibias2)

    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((2 * tpm, mw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_tot = pl.BlockSpec((tpm, mw), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((2, LANE), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    zz_spec = pl.BlockSpec((LANE, LANE), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    lut_spec = pl.BlockSpec((2, 256), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    words, totals = pl.pallas_call(
        functools.partial(_quant_pack_kernel, tpm=tpm),
        grid=(NP // tile,),
        in_specs=[spec64, spec_meta, const2, const2, zz_spec, lut_spec],
        out_specs=(
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_tot,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP, WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((NP // mw, mw), jnp.int32),
        ),
    )(coeffs.astype(jnp.int32), meta,
      iquant2.astype(jnp.int32), ibias2.astype(jnp.int32),
      jnp.asarray(_zigzag_matrix_paired()),
      ac_luts.astype(jnp.uint32))
    return words[:N], totals.reshape(-1)[:N]
