"""TPU encode engine: jitted device pipeline + host orchestration.

The hot path is three cached XLA programs per (geometry, mode):

  A. layout+color+fDCT (+ coefficient histograms when adaptive)   [device]
     -> host: AnalyseHisto lambda-fit, quant-matrix finalization   [tiny]
  B. quantize + run/level/DC codes (+ symbol frequencies)          [device]
     -> host: optimal Huffman table merge                          [tiny]
  C. Huffman LUT map + per-block pack + global bit compaction      [device]
     -> host: 1-padding, 0xFF stuffing, marker splice              [cheap]

Coefficients and run/levels stay resident on device between stages, so
two-pass Huffman and multi-pass dichotomy search replay without recomputing
the transform (the device equivalent of the reference's use_extra_memory
coefficient cache, src/enc.cc:1605).
"""

import dataclasses
import functools
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from . import headers, pipeline, sharp_yuv_device, spec
from .adaptive import analyse_histo
from .bitio import stuff_bytes
from .huffman import (build_code_lut, k3_default_tables,
                      optimal_tables_from_freqs)
from .ops import colorspace, fdct, pack, quantize, vlc
from .params import (TARGET_NONE, TARGET_SIZE, EncoderParam,
                     method_flags)


# ---------------------------------------------------------------------------
# Jitted stages (cached per static geometry)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "with_histo"))
def _stage_coeffs(rgb, yuv_mode: int, width: int, height: int,
                  with_histo: bool):
    """RGB -> per-component fDCT coefficients (+ luma/chroma histograms)."""
    blocks = colorspace.rgb_to_blocks(rgb, yuv_mode, width, height)
    coeffs = [fdct.fdct_blocks(b) for b in blocks]
    if not with_histo:
        return coeffs, None
    histo_l = quantize.store_histo(coeffs[0])
    if len(coeffs) > 1:
        histo_c = (quantize.store_histo(coeffs[1])
                   + quantize.store_histo(coeffs[2]))
    else:
        histo_c = jnp.zeros_like(histo_l)
    # flattened: a [64, bins] jit output gets a tiled device layout that
    # the transfer path fetches catastrophically slowly (~1000x); the 1-D
    # copy is dense and fetches at line rate
    return coeffs, (histo_l.reshape(-1), histo_c.reshape(-1))


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "with_histo"))
def _stage_coeffs_planes(planes, yuv_mode: int, width: int, height: int,
                         with_histo: bool):
    """Planar YUV/gray input -> coefficients (+ histograms)."""
    blocks = colorspace.planes_to_blocks(planes, yuv_mode, width, height)
    coeffs = [fdct.fdct_blocks(b) for b in blocks]
    if not with_histo:
        return coeffs, None
    histo_l = quantize.store_histo(coeffs[0])
    if len(coeffs) > 1:
        histo_c = (quantize.store_histo(coeffs[1])
                   + quantize.store_histo(coeffs[2]))
    else:
        histo_c = jnp.zeros_like(histo_l)
    # flattened: a [64, bins] jit output gets a tiled device layout that
    # the transfer path fetches catastrophically slowly (~1000x); the 1-D
    # copy is dense and fetches at line rate
    return coeffs, (histo_l.reshape(-1), histo_c.reshape(-1))


def _per_image_quantize(coef, iq_g, ib_g, n_images):
    """Quantize one component with per-image [B, 64] iquant/bias rows."""
    c3 = coef.reshape(n_images, -1, 64).astype(jnp.int32)
    mag = jnp.abs(c3)
    t = (mag + ib_g[:, None, :]).astype(jnp.uint32)
    q = ((t * iq_g[:, None, :].astype(jnp.uint32)) >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    return jnp.where(c3 < 0, -q, q).reshape(-1, 64)


def _interleave_quantized(coeffs, iquant, ibias, nb_blocks, n_images=1):
    """Quantize per component, interleave into MCU order at the [N, 64]
    level, and derive zigzag VLC fields + DC codes + per-row table group.

    iquant/ibias: [2, 64] shared, or [B, 2, 64] per-image matrices."""
    if iquant.ndim == 3:
        qbs = [_per_image_quantize(coef, iquant[:, 0 if c == 0 else 1],
                                   ibias[:, 0 if c == 0 else 1], n_images)
               for c, coef in enumerate(coeffs)]
    else:
        qbs = [quantize.quantize_blocks(coef, iquant[0 if c == 0 else 1],
                                        ibias[0 if c == 0 else 1])
               for c, coef in enumerate(coeffs)]
    mcu_blocks = sum(nb_blocks)
    n_mcu = qbs[0].shape[0] // nb_blocks[0]
    qinter = jnp.concatenate(
        [qb.reshape(n_mcu, nb, 64) for qb, nb in zip(qbs, nb_blocks)],
        axis=1).reshape(-1, 64)
    rl = vlc.run_levels(qinter)

    dcv = qinter[:, 0].reshape(n_mcu, mcu_blocks)
    dc_cols = []
    col = 0
    for c, nb in enumerate(nb_blocks):
        comp_dc = dcv[:, col:col + nb].reshape(-1)
        codes = vlc.dc_diff_codes(comp_dc, n_images)
        dc_cols.append(codes.reshape(n_mcu, nb))
        col += nb
    dc_codes = jnp.concatenate(dc_cols, axis=1).reshape(-1)

    slot_group = np.zeros(mcu_blocks, dtype=np.int32)
    slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
    group = jnp.tile(jnp.asarray(slot_group), n_mcu)
    return rl, dc_codes, group


def _interleave_coeffs(coeffs, iquant, ibias, nb_blocks, n_images=1):
    """MCU-interleave raw fDCT coefficients for the fused Pallas kernel
    (which quantizes in VMEM), plus per-block DC diff codes and table
    groups.  Only the DC lane is quantized here — the predictor diff
    (src/enc.cc:482-499) needs the previous block's quantized DC, so it
    runs on [N]-sized arrays before the kernel."""
    mcu_blocks = sum(nb_blocks)
    n_mcu = coeffs[0].shape[0] // nb_blocks[0]
    cinter = jnp.concatenate(
        [co.reshape(n_mcu, nb, 64) for co, nb in zip(coeffs, nb_blocks)],
        axis=1).reshape(-1, 64)

    dc_cols = []
    for c, (co, nb) in enumerate(zip(coeffs, nb_blocks)):
        g = 0 if c == 0 else 1
        dc = co[:, 0].astype(jnp.int32)
        t = (jnp.abs(dc) + ibias[g, 0]).astype(jnp.uint32)
        q = ((t * iquant[g, 0].astype(jnp.uint32)) >> C.FP_BITS).astype(
            jnp.int32) >> C.AC_BITS
        dcq = jnp.where(dc < 0, -q, q)
        codes = vlc.dc_diff_codes(dcq, n_images)
        dc_cols.append(codes.reshape(n_mcu, nb))
    dc_codes = jnp.concatenate(dc_cols, axis=1).reshape(-1)

    slot_group = np.zeros(mcu_blocks, dtype=np.int32)
    slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
    group = jnp.tile(jnp.asarray(slot_group), n_mcu)
    return cinter, dc_codes, group


def _interleave_samples(blocks, iquant, ibias, nb_blocks, n_images=1,
                        chroma_wrap: bool = False):
    """MCU-interleave raw sample blocks for the samples-in fused kernel
    (which runs the fDCT in VMEM), plus per-block DC diff codes and table
    groups.  The DC coefficient alone is computed here via the collapsed
    fDCT chain (ops/pallas_fdct.fdct_dc) — the predictor diff
    (src/enc.cc:482-499) is a cross-block chain that must precede the
    per-tile kernel.

    `chroma_wrap` must be True for RGB-derived sources: their chroma
    spans [-127, +128] (reference keeps unclamped int16, src/colors_rgb.cc
    ToU/ToUV), so the int8 transport wraps +128 to -128; the kernel (and
    the DC chain here) decode it back.  Planar sources pass False — their
    chroma legitimately reaches -128 and never +128."""
    from .ops import pallas_fdct

    mcu_blocks = sum(nb_blocks)
    n_mcu = blocks[0].shape[0] // nb_blocks[0]
    # int8 transport: the interleave concat and the kernel's input DMA
    # move a quarter of the int32 bytes (wrapped chroma +128 decoded
    # in-kernel via chroma_wrap)
    sinter = jnp.concatenate(
        [b.astype(jnp.int8).reshape(n_mcu, nb, 64)
         for b, nb in zip(blocks, nb_blocks)],
        axis=1).reshape(-1, 64)

    dc_cols = []
    for c, (b, nb) in enumerate(zip(blocks, nb_blocks)):
        g = 0 if c == 0 else 1
        if chroma_wrap and c > 0 and b.dtype == jnp.int8:
            b32 = b.astype(jnp.int32)
            b = jnp.where(b32 == -128, 128, b32)
        dc = pallas_fdct.fdct_dc(b)
        if iquant.ndim == 3:                     # per-image matrices
            dcr = dc.reshape(n_images, -1)
            t = (jnp.abs(dcr) + ibias[:, g, 0][:, None]).astype(jnp.uint32)
            q = ((t * iquant[:, g, 0][:, None].astype(jnp.uint32))
                 >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
            dcq = jnp.where(dcr < 0, -q, q).reshape(-1)
        else:
            t = (jnp.abs(dc) + ibias[g, 0]).astype(jnp.uint32)
            q = ((t * iquant[g, 0].astype(jnp.uint32))
                 >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
            dcq = jnp.where(dc < 0, -q, q)
        codes = vlc.dc_diff_codes(dcq, n_images)
        dc_cols.append(codes.reshape(n_mcu, nb))
    dc_codes = jnp.concatenate(dc_cols, axis=1).reshape(-1)

    slot_group = np.zeros(mcu_blocks, dtype=np.int32)
    slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
    group = jnp.tile(jnp.asarray(slot_group), n_mcu)
    return sinter, dc_codes, group


@functools.partial(jax.jit, static_argnames=("nb_blocks", "n_images"))
def _stage_trellis_prep(coeffs, iquant, ibias, quant, nb_blocks,
                        n_images: int = 1):
    """Interleave coefficients into MCU order for the trellis driver;
    DC diff codes come from the plain bias quantizer here, identical to
    the trellis kernel's own DC rule (src/enc.cc:763-766).  The per
    -block row expansion of the matrices happens inside the trellis
    device program (ops.trellis.trellis_quantize_matrices).

    iquant/ibias/quant: [2, 64] shared or [B, 2, 64] per-image matrices
    (raster order)."""
    mcu_blocks = sum(nb_blocks)
    n_mcu = coeffs[0].shape[0] // nb_blocks[0]
    cinter = jnp.concatenate(
        [co.reshape(n_mcu, nb, 64) for co, nb in zip(coeffs, nb_blocks)],
        axis=1).reshape(-1, 64)
    slot_group = np.zeros(mcu_blocks, dtype=np.int32)
    slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
    group = jnp.tile(jnp.asarray(slot_group), n_mcu)

    dc_cols = []
    for c, (co, nb) in enumerate(zip(coeffs, nb_blocks)):
        g = 0 if c == 0 else 1
        dc = co[:, 0].astype(jnp.int32)
        if iquant.ndim == 3:
            dcr = dc.reshape(n_images, -1)
            t = (jnp.abs(dcr) + ibias[:, g, 0][:, None]).astype(jnp.uint32)
            q = ((t * iquant[:, g, 0][:, None].astype(jnp.uint32))
                 >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
            dcq = jnp.where(dcr < 0, -q, q).reshape(-1)
        else:
            t = (jnp.abs(dc) + ibias[g, 0]).astype(jnp.uint32)
            q = ((t * iquant[g, 0].astype(jnp.uint32))
                 >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
            dcq = jnp.where(dc < 0, -q, q)
        codes = vlc.dc_diff_codes(dcq, n_images)
        dc_cols.append(codes.reshape(n_mcu, nb))
    dc_codes = jnp.concatenate(dc_cols, axis=1).reshape(-1)
    return cinter, group, dc_codes


@functools.partial(jax.jit, static_argnames=("with_stats", "n_images",
                                             "per_image_stats"))
def _stage_trellis_post(qinter, dc_codes, group, with_stats: bool,
                        n_images: int = 1, per_image_stats: bool = False):
    """Trellis-quantized blocks -> VLC fields (+ frequencies)."""
    rl = vlc.run_levels(qinter)
    if not with_stats:
        return (rl, dc_codes, group), None
    return (rl, dc_codes, group), _grouped_stats(
        rl, dc_codes, group, n_images if per_image_stats else 1)


def _stage_quantize_trellis(coeffs, iquant, ibias, quant, lt_lens,
                            with_stats: bool, nb_blocks, n_images: int = 1,
                            per_image_stats: bool = False):
    """Trellis quantize + interleave + VLC fields (+ frequencies) — the
    methods-7/8 analog of `_stage_quantize` (src/enc.cc:692-761).

    lt_lens: the AC code lengths supplying the rate costs — [2, 256]
    shared, or [B, 2, 256] per image (a batched dichotomy's evolving
    tables) — always the tables active *before* this pass's Huffman
    optimization (src/enc.cc:1528): K.3 defaults on a single pass, the
    previous size pass's optimized tables inside a dichotomy
    (src/dichotomy.cc:83-85,144)."""
    from .ops import trellis as trellis_ops
    cinter, group, dc_codes = _stage_trellis_prep(
        coeffs, iquant, ibias, quant, nb_blocks, n_images)
    qinter = trellis_ops.trellis_quantize_matrices(
        cinter, iquant, ibias, quant, group, lt_lens, n_images)
    return _stage_trellis_post(qinter, dc_codes, group,
                               with_stats=with_stats, n_images=n_images,
                               per_image_stats=per_image_stats)


@functools.lru_cache(maxsize=1)
def _trellis_cost_lens():
    """[2, 256] K.3-default AC code lengths (the pre-optimization rate
    model the reference trellis uses, src/enc.cc:1528)."""
    defaults = k3_default_tables()
    lens = np.stack([build_code_lut(defaults[2], 256) & 0xFF,
                     build_code_lut(defaults[3], 256) & 0xFF])
    return jnp.asarray(lens.astype(np.int32))


def _grouped_stats(rl, dc_codes, group, n_images: int = 1, valid=None):
    """Per-table-group symbol frequencies from interleaved VLC fields.

    With n_images > 1 (rows image-major, equal blocks per image) the
    statistics segment per image: returns ([B, 2, 12], [B, 2, 256]).
    `valid`: optional [N] bool mask — blocks with False contribute no
    symbols (incl. their DC and EOB; ragged-stripe padding blocks).

    Counting-as-matmul: the 8-bit AC symbol splits into hi/lo nibbles;
    the table group rides along in the hi one-hot (32 rows = 2 groups x
    16 hi nibbles), so freq[b, g, s] is one int8 dot_general per position
    chunk on the MXU — no serialized XLA scatter."""
    nz = rl["nz"]
    n = nz.shape[0]
    per = n // n_images
    sym = (((rl["run"] & 15) << 4) | rl["size"]).astype(jnp.int32)
    ghi = (group[:, None] * 16 + (sym >> 4)).reshape(n_images, per, 64)
    lo = (sym & 15).reshape(n_images, per, 64)
    nz3 = nz.reshape(n_images, per, 64)
    if valid is not None:
        nz3 = nz3 & valid.reshape(n_images, per, 1)
    hi_iota = jnp.arange(32, dtype=jnp.int32)
    lo_iota = jnp.arange(16, dtype=jnp.int32)
    acc = None
    for p0 in range(0, 64, 8):       # position chunks bound the one-hots
        e_hi = ((ghi[:, :, p0:p0 + 8, None] == hi_iota)
                & nz3[:, :, p0:p0 + 8, None]).astype(jnp.int8)
        e_lo = (lo[:, :, p0:p0 + 8, None] == lo_iota).astype(jnp.int8)
        cnt = jax.lax.dot_general(
            e_hi, e_lo, (((1, 2), (1, 2)), ((0,), (0,))),
            preferred_element_type=jnp.int32)      # [B, 32, 16]
        acc = cnt if acc is None else acc + cnt
    freq_ac = acc.reshape(n_images, 2, 256)

    g3 = group.reshape(n_images, per)
    esc = jnp.where(nz, rl["run"] >> 4, 0).sum(axis=1).reshape(n_images, per)
    eobs = (rl["last"] < 63).astype(jnp.int32).reshape(n_images, per)
    if valid is not None:
        v2 = valid.reshape(n_images, per)
        esc = jnp.where(v2, esc, 0)
        eobs = jnp.where(v2, eobs, 0)
    in_g1 = (g3 == 1)
    esc_g = jnp.stack([jnp.where(in_g1, 0, esc).sum(axis=1),
                       jnp.where(in_g1, esc, 0).sum(axis=1)], axis=1)
    eob_g = jnp.stack([jnp.where(in_g1, 0, eobs).sum(axis=1),
                       jnp.where(in_g1, eobs, 0).sum(axis=1)], axis=1)
    freq_ac = freq_ac.at[:, :, 0xF0].add(esc_g)
    freq_ac = freq_ac.at[:, :, 0x00].add(eob_g)

    dci = (g3 * 13 + (dc_codes.reshape(n_images, per) & 0x0F))
    e_dc = (dci[..., None] == jnp.arange(26, dtype=jnp.int32)).astype(
        jnp.int32)
    if valid is not None:
        e_dc = e_dc * valid.reshape(n_images, per, 1).astype(jnp.int32)
    freq_dc = e_dc.sum(axis=1).reshape(n_images, 2, 13)[:, :, :12]
    if n_images == 1:
        return freq_dc[0], freq_ac[0]
    return freq_dc, freq_ac


@functools.partial(jax.jit, static_argnames=("with_stats", "nb_blocks"))
def _stage_quantize(coeffs, iquant, ibias, with_stats: bool,
                    nb_blocks=(4, 1, 1)):
    """Quantize + interleave + VLC fields (+ per-group frequencies)."""
    rl, dc_codes, group = _interleave_quantized(coeffs, iquant, ibias,
                                                nb_blocks)
    if not with_stats:
        return (rl, dc_codes, group), None
    return (rl, dc_codes, group), _grouped_stats(rl, dc_codes, group)


@jax.jit
def _stage_pack(vlc_state, dc_luts, ac_luts):
    """VLC fields + Huffman LUTs -> compact bit stream (+ total bits)."""
    rl, dc_codes, group = vlc_state
    if jax.default_backend() != "cpu":
        from .ops import pallas_tree_concat, pallas_vlc_pack
        words, bit_lens = pallas_vlc_pack.vlc_pack_pallas(
            rl["run"], rl["size"], rl["code"], dc_codes, group,
            dc_luts, ac_luts)
        out, totals = pallas_tree_concat.concat_block_streams_tree(
            words, bit_lens, n_images=1,
            bucket=words.shape[0] * pack.WORDS_PER_BLOCK, sliced=False)
        return out[0], totals[0]
    vals, lens = vlc.block_entries_grouped(rl, dc_codes, dc_luts,
                                           ac_luts, group)
    words, bit_lens = pack.pack_block_entries(vals, lens)
    return pack.concat_block_streams(words, bit_lens)


def _pad_image_tiles(sinter, dc_codes, group, n_images: int, tile: int):
    """Pad each image's block rows to whole tiles for the fused
    units kernel; pad blocks carry group=2 (the kernel's pad flag, bit 0
    = table group) so they merge as zero-length streams."""
    N = group.shape[0]
    per_img = N // n_images
    padded = -(-per_img // tile) * tile
    pad = padded - per_img
    if not pad:
        return sinter, dc_codes, group, per_img
    s2 = sinter.reshape(n_images, per_img, sinter.shape[1])
    sinter = jnp.pad(s2, ((0, 0), (0, pad), (0, 0))).reshape(
        -1, sinter.shape[1])
    dc_codes = jnp.pad(dc_codes.reshape(n_images, per_img),
                       ((0, 0), (0, pad))).reshape(-1)
    group = jnp.pad(group.reshape(n_images, per_img),
                    ((0, 0), (0, pad)),
                    constant_values=2).reshape(-1)
    return sinter, dc_codes, group, padded


def _units_path_ok(n_blocks_padded: int, n_images: int, tile: int) -> bool:
    """The fused pack+merge path applies when per-image rows fill whole
    tiles and the batch is large enough that the old tree would have
    sliced level 0 anyway (same density rationale: small dense batches
    would overflow the truncated frames and fall back wholesale)."""
    from .ops import pallas_tree_concat
    return (n_blocks_padded % (n_images * tile) == 0
            and n_blocks_padded >= pallas_tree_concat.SLICED_MIN_UNITS)


def _encode_core_body(src, iquant, ibias, dc_luts, ac_luts, yuv_mode: int,
                      width: int, height: int, nb_blocks, n_images: int = 1,
                      bucket=None, src_kind: str = "rgb"):
    """Fused encode body: RGB or planar-YUV source (single image or
    image-major batch) -> (stream words, total bits).  Batching is pure
    data parallelism on the flat block axis — no vmap; DC chains and bit
    offsets reset per image by reshaping that axis.

    Layout note: components interleave into MCU order right after
    quantization, at the [N, 64] level (lane-aligned, cheap concat); VLC
    tables are selected per row through flattened LUTs, which keeps every
    downstream array in its natural row-major layout (the per-component
    entry concat used to force a transposed relayout that dominated the
    whole program).
    """
    on_tpu = jax.default_backend() != "cpu"
    # int8 transport quarters the layout copies feeding the samples-in
    # kernel; RGB-derived chroma can reach +128 (wraps to -128 in int8),
    # decoded in-kernel via chroma_wrap
    bdt = jnp.int8 if on_tpu else jnp.int32
    chroma_wrap = src_kind == "rgb"
    if src_kind == "planes":
        blocks = colorspace.planes_to_blocks(src, yuv_mode, width, height,
                                             out_dtype=bdt)
    else:
        blocks = colorspace.rgb_to_blocks(src, yuv_mode, width, height,
                                          out_dtype=bdt)
    if on_tpu:
        # samples go straight into the fused Pallas kernel (in-kernel
        # fDCT): the [N, 64] coefficient plane never reaches HBM
        from .ops import pallas_quant_pack, pallas_tree_concat
        sinter, dc_codes, group = _interleave_samples(
            blocks, iquant, ibias, nb_blocks, n_images,
            chroma_wrap=chroma_wrap)
        if bucket is not None:
            tile = pallas_quant_pack.DEFAULT_TILE
            sp, dp, gp, per_pad = _pad_image_tiles(
                sinter, dc_codes, group, n_images, tile)
            if _units_path_ok(per_pad * n_images, n_images, tile):
                # pack + first two concat levels in one kernel: the
                # [N, 64] per-block stream plane never reaches HBM
                units, ulens = \
                    pallas_quant_pack.sample_vlc_pack_units_pallas(
                        sp, dp, gp, iquant, ibias, dc_luts, ac_luts,
                        chroma_wrap=chroma_wrap)
                return pallas_tree_concat.concat_units_tree(
                    units, ulens, n_images=n_images, bucket=bucket)
        words, bit_lens = pallas_quant_pack.sample_vlc_pack_pallas(
            sinter, dc_codes, group, iquant, ibias, dc_luts, ac_luts,
            chroma_wrap=chroma_wrap)
    else:
        coeffs = [fdct.fdct_blocks(b) for b in blocks]
        rl, dc_codes, group = _interleave_quantized(coeffs, iquant, ibias,
                                                    nb_blocks, n_images)
        vals, lens = vlc.block_entries_grouped(rl, dc_codes, dc_luts,
                                               ac_luts, group)
        words, bit_lens = pack.pack_block_entries(vals, lens)
    if bucket is not None:
        if on_tpu:
            from .ops import pallas_tree_concat
            return pallas_tree_concat.concat_block_streams_tree(
                words, bit_lens, n_images=n_images, bucket=bucket)
        return pack.concat_block_streams_batched(words, bit_lens, n_images,
                                                 bucket)
    return pack.concat_block_streams(words, bit_lens)


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "nb_blocks", "src_kind"))
def encode_core(src, iquant, ibias, dc_luts, ac_luts, *, yuv_mode: int,
                width: int, height: int, nb_blocks, src_kind: str = "rgb"):
    """Fused single-dispatch encode: RGB (or a (y, u, v)/(y,) plane tuple
    with src_kind="planes") -> (stream words, total bits).

    The fixed-table path (no adaptive quant, no two-pass Huffman) as one XLA
    program: layout, color conversion, fDCT, quantization, VLC and bit
    packing fuse into a single device launch.  This is the flagship hot
    path benchmarked against the reference encoder.
    """
    return _encode_core_body(src, iquant, ibias, dc_luts, ac_luts, yuv_mode,
                             width, height, nb_blocks, src_kind=src_kind)


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "nb_blocks", "bucket",
                                             "src_kind", "n_images"))
def encode_batch_core(src, iquant, ibias, dc_luts, ac_luts, *,
                      yuv_mode: int, width: int, height: int, nb_blocks,
                      bucket: int, src_kind: str = "rgb",
                      n_images: int = None):
    """Batched fused encode: [B, H, W, 3] -> ([B, bucket] words, [B] bits).

    One dispatch and one device->host fetch for the whole batch; `bucket`
    caps the per-image stream words fetched (overflowing images — rare, the
    caller sizes the bucket from the expected bits/pixel — are detected via
    the exact totals and refetched through the unbatched path).
    """
    if n_images is None:
        n_images = src.shape[0] if src_kind == "rgb" else src[0].shape[0]
    return _encode_core_body(src, iquant, ibias, dc_luts, ac_luts,
                             yuv_mode, width, height, nb_blocks,
                             n_images=n_images, bucket=bucket,
                             src_kind=src_kind)


def encode_batch(rgbs, param: Optional["EncoderParam"] = None,
                 bits_per_pixel_budget: float = 4.0,
                 share_statistics: bool = False):
    """Encode a uint8 batch [B, H, W, 3] with one device program and one
    bulk result fetch per stage; use this (not per-image calls) when
    throughput matters.  Returns a list of complete JPEG byte strings.

    Fixed-table methods (0/3-off) run fully fused.  With Huffman
    optimization and/or adaptive quantization enabled, the default is
    reference-parity per-image optimization (per-image adaptive matrices
    and per-image optimal Huffman tables; byte-identical to per-image
    encode_rgb, src/enc.cc:1517-1580).  share_statistics=True instead
    derives ONE table set / tuned matrix pair from the whole batch's
    statistics — a deliberate deviation knob (SURVEY §7.3): streams stay
    valid baseline JPEG at near-identical rate while the host table
    build stays O(1) per batch.

    Target-size / target-PSNR searches (param.passes > 1 with a target
    mode) run as B independent dichotomies sharing one batched device
    program per pass, byte-identical to the per-image search;
    share_statistics does not apply to searches.
    """
    param = param or EncoderParam()
    b, h, w = rgbs.shape[:3]
    yuv_mode = param.yuv_mode
    src, src_kind = rgbs, "rgb"
    if yuv_mode == C.YUV_AUTO:
        # per-image riskiness decisions on device (reference semantics:
        # each image picks its own mode, src/enc.cc:2132-2154); the batch
        # splits into per-mode sub-batches
        from . import riskiness as host_risk
        if host_risk.exact_table_active():
            rn = np.asarray(rgbs)
            modes = [host_risk.riskiness(rn[i])[0] for i in range(b)]
        else:
            from .ops import riskiness as dev_risk
            ss, cc, gg = jax.device_get(
                dev_risk.risk_stats(jnp.asarray(rgbs)))
            modes = [dev_risk.finish_riskiness(ss[i], cc[i], gg[i],
                                               w, h)[0]
                     for i in range(b)]
        groups = {}
        for i, m in enumerate(modes):
            groups.setdefault(m, []).append(i)
        if len(groups) > 1:
            out = [None] * b
            for m, idxs in groups.items():
                sub = np.ascontiguousarray(np.asarray(rgbs)[idxs])
                p2 = dataclasses.replace(param, yuv_mode=m)
                res = encode_batch(sub, p2, bits_per_pixel_budget,
                                   share_statistics)
                for j, i in enumerate(idxs):
                    out[i] = res[j]
            return out
        yuv_mode = next(iter(groups))
    if yuv_mode == C.YUV_SHARP:
        core = functools.partial(sharp_yuv_device._sharp_core,
                                 width=w, height=h)
        if min(w, h) <= sharp_yuv_device.MIN_DIMENSION:
            core = functools.partial(sharp_yuv_device._simple_core,
                                     width=w, height=h)
        y, u, v = jax.vmap(core)(jnp.asarray(rgbs))
        src, src_kind = (y, u, v), "planes"
        yuv_mode = C.YUV_420
    return _encode_batch_src(src, src_kind, yuv_mode, w, h, param,
                             bits_per_pixel_budget, share_statistics)


def encode_pipelined(batches, param: Optional["EncoderParam"] = None,
                     depth: int = 2, **kw):
    """Pipelined batched encoding for sustained throughput.

    Runs up to `depth` `encode_batch` calls in flight on worker threads
    so one batch's result fetch + host assembly overlaps the next
    batch's device programs (device dispatch is async and the transport
    serves concurrent fetches; the device itself executes programs
    back-to-back).  In steady state the wall time per batch approaches
    the pure device time — the double-buffering that hides the
    host<->device transfer the one-shot `encode_batch` pays serially.

    `batches` is an iterable of [B, H, W, 3] uint8 arrays (or whatever
    `encode_batch` accepts); yields each batch's list of JPEG byte
    strings, in order.  Works for every mode incl. multi-pass searches,
    where it additionally overlaps one batch's per-pass size fetches
    with another batch's pass programs."""
    import collections
    from concurrent.futures import ThreadPoolExecutor

    pend = collections.deque()
    with ThreadPoolExecutor(max_workers=max(depth, 1)) as pool:
        for batch in batches:
            pend.append(pool.submit(encode_batch, batch, param, **kw))
            if len(pend) > depth:
                yield pend.popleft().result()
        while pend:
            yield pend.popleft().result()


def encode_many(images, param: Optional["EncoderParam"] = None,
                **kw) -> list:
    """Encode a heterogeneous sequence of RGB uint8 images ([H, W, 3],
    shapes may differ).  Images are grouped by shape and each group runs
    through one batched device program (`encode_batch`); results come
    back in input order.  This is the serving-side wrapper for mixed
    traffic — JPEG geometry is baked into every program's shapes, so
    distinct resolutions cannot share a dispatch."""
    param = param or EncoderParam()
    groups = {}
    for i, img in enumerate(images):
        groups.setdefault(img.shape, []).append(i)
    out = [None] * len(images)
    for shape, idxs in groups.items():
        sub = np.stack([np.asarray(images[i]) for i in idxs])
        jpegs = encode_batch(sub, param, **kw)
        for j, i in enumerate(idxs):
            out[i] = jpegs[j]
    return out


def encode_batch_yuv(y, u, v, is_420: bool,
                     param: Optional["EncoderParam"] = None,
                     bits_per_pixel_budget: float = 4.0,
                     share_statistics: bool = False):
    """Batched planar-YUV encode: y [B, H, W] uint8 plus chroma planes
    ([B, ceil(H/2), ceil(W/2)] when `is_420`, else full-size) -> list of
    JPEG byte strings.  Device analog of the reference's planar input
    encoders (src/enc.cc:1974-2078) with the same batching contract as
    `encode_batch`."""
    param = param or EncoderParam()
    b, h, w = y.shape[:3]
    mode = C.YUV_420 if is_420 else C.YUV_444
    src = (jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))
    return _encode_batch_src(src, "planes", mode, w, h, param,
                             bits_per_pixel_budget, share_statistics)


def encode_batch_gray(y, param: Optional["EncoderParam"] = None,
                      bits_per_pixel_budget: float = 4.0,
                      share_statistics: bool = False):
    """Batched grayscale encode: y [B, H, W] uint8 -> JPEGs (YUV 4:0:0;
    reference Encoder400G, src/enc.cc:1857-1876)."""
    param = param or EncoderParam()
    b, h, w = y.shape[:3]
    return _encode_batch_src((jnp.asarray(y),), "planes", C.YUV_400, w, h,
                             param, bits_per_pixel_budget,
                             share_statistics)


def encode_batch_nv12(y, uv, param: Optional["EncoderParam"] = None,
                      bits_per_pixel_budget: float = 4.0,
                      share_statistics: bool = False):
    """Batched semi-planar NV12 encode: y [B, H, W], uv
    [B, ceil(H/2), ceil(W/2), 2] interleaved U/V (reference EncoderNV12,
    src/enc.cc:1881-1947).  The deinterleave is a device slice; chroma
    never round-trips the host."""
    uv = jnp.asarray(uv)
    return encode_batch_yuv(y, uv[..., 0], uv[..., 1], True, param,
                            bits_per_pixel_budget, share_statistics)


def encode_batch_nv21(y, vu, param: Optional["EncoderParam"] = None,
                      bits_per_pixel_budget: float = 4.0,
                      share_statistics: bool = False):
    """Batched semi-planar NV21 encode (V/U interleaved chroma)."""
    vu = jnp.asarray(vu)
    return encode_batch_yuv(y, vu[..., 1], vu[..., 0], True, param,
                            bits_per_pixel_budget, share_statistics)


def _encode_batch_src(src, src_kind: str, yuv_mode: int, w: int, h: int,
                      param: "EncoderParam",
                      bits_per_pixel_budget: float = 4.0,
                      share_statistics: bool = False):
    """Shared batched-encode driver over a device source (RGB batch or
    component plane tuple)."""
    b = src.shape[0] if src_kind == "rgb" else src[0].shape[0]
    flags = method_flags(param.method)
    if param.passes > 1 and param.target_mode != TARGET_NONE:
        if param.search_hook is not None:
            # stateful user hooks can't share the batched pass programs:
            # per-image device searches
            out = []
            for i in range(b):
                if src_kind == "rgb":
                    out.append(encode_rgb(np.asarray(src[i]), param))
                elif len(src) == 1:
                    out.append(encode_gray(np.asarray(src[0][i]), param))
                else:
                    out.append(encode_yuv(
                        np.asarray(src[0][i]), np.asarray(src[1][i]),
                        np.asarray(src[2][i]), yuv_mode == C.YUV_420,
                        param))
            return out
        return _encode_batch_search(src, src_kind, yuv_mode, w, h, param,
                                    bits_per_pixel_budget)
    if flags["use_adaptive_quant"] or flags["optimize_size"]:
        return _encode_batch_optimized(src, param, bits_per_pixel_budget,
                                       share_statistics=share_statistics,
                                       yuv_mode=yuv_mode, width=w, height=h,
                                       src_kind=src_kind)
    layout = pipeline.component_layout(yuv_mode, w, h)
    qmats = param.resolved_quant_matrices()
    min_qmats = param.resolved_min_quant_matrices()
    qms = [spec.finalize_quant_matrix(qmats[i], min_qmats[i],
                                      param.quantization_bias)
           for i in range(2)]
    iq, ib = _quant_device_arrays(qms)
    dc_luts, ac_luts = _device_luts(k3_default_tables())
    tables = k3_default_tables()

    n_blocks = (layout.mb_w * layout.mb_h
                * sum(layout.nb_blocks))
    max_words = n_blocks * pack.WORDS_PER_BLOCK
    bucket = int(min(max_words,
                     max(4096, w * h * bits_per_pixel_budget / 32)))

    if src_kind == "rgb":
        src = jnp.asarray(src)
    words, totals = encode_batch_core(
        src, iq, ib, dc_luts, ac_luts, yuv_mode=yuv_mode,
        width=w, height=h, nb_blocks=tuple(layout.nb_blocks), bucket=bucket,
        src_kind=src_kind, n_images=b)
    totals_np = np.asarray(totals)
    words_np = fetch_streams_batch(words, totals_np)

    out = []
    for i in range(b):
        total_bits = int(totals_np[i])
        if total_bits > bucket * 32:      # bucket overflow: host fallback
            out.append(_host_fallback_one(src, src_kind, i, yuv_mode,
                                          param))
            continue
        scan = _finalize_scan_bytes(words_np[i], total_bits)
        out.append(_assemble_jpeg(layout, param, qms, tables, scan))
    return out


def _host_fallback_one(src, src_kind: str, i: int, yuv_mode: int,
                       param: EncoderParam) -> bytes:
    """Re-encode one image on the HOST after a device-side overflow
    (bucket or sliced-frame).  Deliberately not a device refetch: the TPU
    runtime defect documented in ops/trellis.py (re-running previously
    -used smaller executables after larger ones poisons the device) also
    bites single-image variants of the batch kernels, and overflow is the
    rare path where correctness beats speed."""
    from . import host_encoder
    p2 = dataclasses.replace(param, yuv_mode=yuv_mode)
    if src_kind == "rgb":
        return host_encoder.encode_rgb(np.asarray(src[i]), p2)
    planes = tuple(np.asarray(p[i]) for p in src)
    if len(planes) == 1:
        return host_encoder.encode_gray(planes[0], p2)
    return host_encoder.encode_yuv(planes[0], planes[1], planes[2],
                                   yuv_mode == C.YUV_420, p2)


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "with_histo", "n_images",
                                             "src_kind"))
def _stage_batch_coeffs(src, yuv_mode: int, width: int, height: int,
                        with_histo: bool, n_images: int = 1,
                        src_kind: str = "rgb"):
    """Batched RGB (or planar-YUV tuple) -> interleavable coefficients
    (+ per-image histograms when n_images > 1, else batch-summed)."""
    if src_kind == "planes":
        blocks = colorspace.planes_to_blocks(src, yuv_mode, width, height)
    else:
        blocks = colorspace.rgb_to_blocks(src, yuv_mode, width, height)
    coeffs = [fdct.fdct_blocks(b) for b in blocks]
    if not with_histo:
        return coeffs, None
    histo_l = quantize.store_histo(coeffs[0], n_images)
    if len(coeffs) > 1:
        histo_c = (quantize.store_histo(coeffs[1], n_images)
                   + quantize.store_histo(coeffs[2], n_images))
    else:
        histo_c = jnp.zeros_like(histo_l)
    # flat 1-D outputs fetch dense (see _stage_coeffs layout note)
    return coeffs, (histo_l.reshape(-1), histo_c.reshape(-1))


@functools.partial(jax.jit, static_argnames=("with_stats", "nb_blocks",
                                             "n_images", "per_image_stats"))
def _stage_batch_quantize(coeffs, iquant, ibias, with_stats: bool,
                          nb_blocks, n_images: int,
                          per_image_stats: bool = False):
    rl, dc_codes, group = _interleave_quantized(coeffs, iquant, ibias,
                                                nb_blocks, n_images)
    if not with_stats:
        return (rl, dc_codes, group), None
    return (rl, dc_codes, group), _grouped_stats(
        rl, dc_codes, group, n_images if per_image_stats else 1)


@functools.partial(jax.jit, static_argnames=("n_images", "bucket",
                                             "per_image_tables"))
def _stage_batch_pack(vlc_state, dc_luts, ac_luts, n_images: int,
                      bucket: int, per_image_tables: bool = False,
                      block_valid=None):
    """Batched VLC+pack+concat.  With per_image_tables, dc_luts/ac_luts
    are [B, 2, ...] per-image Huffman LUT sets (reference semantics:
    src/enc.cc:1517-1580 optimizes tables per image).  `block_valid`:
    optional [N] bool — invalid blocks (ragged-stripe padding) emit zero
    bits (every block otherwise emits at least DC+EOB codes)."""
    rl, dc_codes, group = vlc_state
    if jax.default_backend() != "cpu":
        from .ops import pallas_tree_concat, pallas_vlc_pack
        if per_image_tables:
            tile = pallas_vlc_pack.DEFAULT_TILE
            N = group.shape[0]
            per_img = N // n_images
            padded = -(-per_img // tile) * tile
            pad = padded - per_img

            def padrows(x):
                if not pad:
                    return x
                x2 = x.reshape((n_images, per_img) + x.shape[1:])
                cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 1)
                return jnp.pad(x2, cfg).reshape((-1,) + x.shape[1:])

            words, bit_lens = pallas_vlc_pack.vlc_pack_pallas(
                padrows(rl["run"]), padrows(rl["size"]),
                padrows(rl["code"]), padrows(dc_codes), padrows(group),
                dc_luts, ac_luts, tiles_per_img=padded // tile)
            valid = None
            if pad:
                # pad rows still emit DC+EOB codes; zero them so the
                # concat's left-aligned-content invariant holds
                valid = (jnp.arange(padded, dtype=jnp.int32)
                         < per_img)
                valid = jnp.tile(valid, n_images)
            if block_valid is not None:
                bv = padrows(block_valid)
                valid = bv if valid is None else (valid & bv)
            if valid is not None:
                bit_lens = jnp.where(valid, bit_lens, 0)
                words = jnp.where(valid[:, None], words, 0)
            return pallas_tree_concat.concat_block_streams_tree(
                words, bit_lens, n_images=n_images, bucket=bucket)
        words, bit_lens = pallas_vlc_pack.vlc_pack_pallas(
            rl["run"], rl["size"], rl["code"], dc_codes, group,
            dc_luts, ac_luts)
        if block_valid is not None:
            bit_lens = jnp.where(block_valid, bit_lens, 0)
            words = jnp.where(block_valid[:, None], words, 0)
        return pallas_tree_concat.concat_block_streams_tree(
            words, bit_lens, n_images=n_images, bucket=bucket)
    if per_image_tables:
        N = group.shape[0]
        per_img = N // n_images
        img = jnp.arange(N, dtype=jnp.int32) // per_img
        group = img * 2 + group
        dc_luts = dc_luts.reshape(-1, dc_luts.shape[-1])
        ac_luts = ac_luts.reshape(-1, ac_luts.shape[-1])
    vals, lens = vlc.block_entries_grouped(rl, dc_codes, dc_luts,
                                           ac_luts, group)
    words, bit_lens = pack.pack_block_entries(vals, lens)
    if block_valid is not None:
        bit_lens = jnp.where(block_valid, bit_lens, 0)
        words = jnp.where(block_valid[:, None], words, 0)
    return pack.concat_block_streams_batched(words, bit_lens, n_images,
                                             bucket)


# Through the axon dev relay, large jit OUTPUTS (the [N, 64] coefficient
# planes, ~100 MB for a 16x1024^2 batch) stream back at ~0.2 MB/s — minutes
# per stage — while the same arrays as fused intermediates cost nothing.
# So on that backend the optimized batch path recomputes the front end
# inside each program (the reference's own no-extra-memory re-scan
# strategy, methods 5/6, src/enc.cc:1263-1273) and only small dense
# reductions (histograms, frequencies, packed streams) ever leave a
# program.  On CPU and real TPU the resident-coefficient staging below is
# used instead: there the outputs stay in HBM for free.

def _relay_backend() -> bool:
    # the axon relay registers its devices as plain "tpu", so the
    # JAX_PLATFORMS request is the only reliable signal
    return "axon" in os.environ.get("JAX_PLATFORMS", "")


# Env-gated wall-clock stage tracing (SJPEG_TRACE_STAGES=1): one stderr
# line per pipeline stage, for locating host/device/transfer stalls in
# the orchestration paths without a profiler attach.
_TRACE_STAGES = bool(os.environ.get("SJPEG_TRACE_STAGES"))


class _StageTrace:
    def __init__(self, tag):
        self.tag = tag
        self.t0 = time.perf_counter()

    def mark(self, label):
        if _TRACE_STAGES:
            t1 = time.perf_counter()
            print(f"[{self.tag}] {label}: {(t1 - self.t0) * 1e3:.1f} ms",
                  file=sys.stderr)
            self.t0 = t1


def _batch_blocks(src, yuv_mode: int, width: int, height: int,
                  src_kind: str):
    if src_kind == "planes":
        return colorspace.planes_to_blocks(src, yuv_mode, width, height)
    return colorspace.rgb_to_blocks(src, yuv_mode, width, height)


def _batch_blocks_i8(src, yuv_mode: int, width: int, height: int,
                     src_kind: str):
    """int8-transport front end for XLA-consumer stages (TPU): blockize
    relayout copies move a quarter of the int32 bytes, then widen back to
    exact int32 rows (RGB chroma +128 wrap decoded; see
    colorspace.rgb_to_blocks)."""
    if src_kind == "planes":
        blocks = colorspace.planes_to_blocks(src, yuv_mode, width, height,
                                             out_dtype=jnp.int8)
        wrap = False
    else:
        blocks = colorspace.rgb_to_blocks(src, yuv_mode, width, height,
                                          out_dtype=jnp.int8)
        wrap = True
    out = []
    for c, b in enumerate(blocks):
        b32 = b.astype(jnp.int32)
        if wrap and c > 0:
            b32 = jnp.where(b32 == -128, 128, b32)
        out.append(b32)
    return out


def _batch_blocks_fast(src, yuv_mode: int, width: int, height: int,
                       src_kind: str):
    """int8 transport on accelerators, plain int32 on CPU (identical
    values either way)."""
    if jax.default_backend() != "cpu":
        return _batch_blocks_i8(src, yuv_mode, width, height, src_kind)
    return _batch_blocks(src, yuv_mode, width, height, src_kind)


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "stats_images", "src_kind"))
def _stage_batch_histos_fused(src, yuv_mode: int, width: int, height: int,
                              stats_images: int, src_kind: str = "rgb"):
    """color + fDCT + coefficient histograms in ONE program; only the
    flat (dense-layout) histograms leave the device."""
    blocks = _batch_blocks_fast(src, yuv_mode, width, height, src_kind)
    coeffs = [fdct.fdct_blocks(x) for x in blocks]
    histo_l = quantize.store_histo(coeffs[0], stats_images)
    if len(coeffs) > 1:
        histo_c = (quantize.store_histo(coeffs[1], stats_images)
                   + quantize.store_histo(coeffs[2], stats_images))
    else:
        histo_c = jnp.zeros_like(histo_l)
    # bin counts are bounded by the contributing blocks per stats image
    # (luma; U+V summed for chroma); fetching uint16 halves the
    # (tunnel-dominant) histogram transfer
    bound = max(coeffs[0].shape[0],
                2 * coeffs[1].shape[0] if len(coeffs) > 1 else 0)
    if bound // stats_images < (1 << 16):
        return (histo_l.reshape(-1).astype(jnp.uint16),
                histo_c.reshape(-1).astype(jnp.uint16))
    return histo_l.reshape(-1), histo_c.reshape(-1)


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "nb_blocks", "n_images",
                                             "stats_images", "src_kind"))
def _stage_batch_freqs_fused(src, iquant, ibias, yuv_mode: int, width: int,
                             height: int, nb_blocks, n_images: int,
                             stats_images: int, src_kind: str = "rgb"):
    """front end + quantize + symbol statistics in ONE program; only the
    per-image (or batch-aggregated) frequencies leave the device.

    Statistics are order-independent, so no MCU interleave happens here:
    each component quantizes, run-levels, and counts in its own natural
    layout (the DC predictor chain is per component in the reference
    scan anyway, src/enc.cc:877-881) and the per-group frequencies sum —
    skipping the [N, 64] interleave relayout the final pack pass needs."""
    blocks = _batch_blocks_fast(src, yuv_mode, width, height, src_kind)
    coeffs = [fdct.fdct_blocks(x) for x in blocks]
    fdc = fac = None
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        if iquant.ndim == 3:
            qb = _per_image_quantize(coef, iquant[:, g], ibias[:, g],
                                     n_images)
        else:
            qb = quantize.quantize_blocks(coef, iquant[g], ibias[g])
        rl = vlc.run_levels(qb)
        dc_codes = vlc.dc_diff_codes(qb[:, 0], n_images)
        group = jnp.full(qb.shape[0], g, jnp.int32)
        d, a = _grouped_stats(rl, dc_codes, group, stats_images)
        fdc = d if fdc is None else fdc + d
        fac = a if fac is None else fac + a
    return fdc, fac


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "nb_blocks", "n_images",
                                             "bucket", "per_image_tables",
                                             "src_kind"))
def _encode_batch_opt_core(src, iquant, ibias, dc_luts, ac_luts, *,
                           yuv_mode: int, width: int, height: int,
                           nb_blocks, n_images: int, bucket: int,
                           per_image_tables: bool, src_kind: str = "rgb"):
    """Fused final pass for the optimized batch: front end + per-image
    quantize + VLC + pack + concat as one program.  On TPU the samples
    stream through the fused in-kernel-fDCT path (per-image quantizer
    rows / Huffman LUTs selected by grid index maps); XLA fallback keeps
    the staged coefficient route."""
    chroma_wrap = src_kind == "rgb"
    if jax.default_backend() != "cpu":
        # int8 transport straight from the blockize transposes (the
        # samples-in kernel takes int8; wrap decoded in-kernel)
        if src_kind == "planes":
            blocks = colorspace.planes_to_blocks(src, yuv_mode, width,
                                                 height,
                                                 out_dtype=jnp.int8)
        else:
            blocks = colorspace.rgb_to_blocks(src, yuv_mode, width,
                                              height, out_dtype=jnp.int8)
        from .ops import pallas_quant_pack, pallas_tree_concat
        sinter, dc_codes, group = _interleave_samples(
            blocks, iquant, ibias, nb_blocks, n_images,
            chroma_wrap=chroma_wrap)
        per_image = per_image_tables or iquant.ndim == 3
        tile = pallas_quant_pack.DEFAULT_TILE
        if not per_image:
            sp, dp, gp, per_pad = _pad_image_tiles(
                sinter, dc_codes, group, n_images, tile)
            if _units_path_ok(per_pad * n_images, n_images, tile):
                units, ulens = \
                    pallas_quant_pack.sample_vlc_pack_units_pallas(
                        sp, dp, gp, iquant, ibias, dc_luts, ac_luts,
                        chroma_wrap=chroma_wrap)
                return pallas_tree_concat.concat_units_tree(
                    units, ulens, n_images=n_images, bucket=bucket)
            words, bit_lens = pallas_quant_pack.sample_vlc_pack_pallas(
                sinter, dc_codes, group, iquant, ibias, dc_luts, ac_luts,
                chroma_wrap=chroma_wrap)
        else:
            # broadcast whichever side is still shared, then pad each
            # image's rows to whole tiles for the per-image index maps
            iq3 = (iquant if iquant.ndim == 3 else
                   jnp.broadcast_to(iquant, (n_images,) + iquant.shape))
            ib3 = (ibias if ibias.ndim == 3 else
                   jnp.broadcast_to(ibias, (n_images,) + ibias.shape))
            dcl3 = (dc_luts if dc_luts.ndim == 3 else
                    jnp.broadcast_to(dc_luts, (n_images,) + dc_luts.shape))
            acl3 = (ac_luts if ac_luts.ndim == 3 else
                    jnp.broadcast_to(ac_luts, (n_images,) + ac_luts.shape))
            sp, dp, gp, per_pad = _pad_image_tiles(
                sinter, dc_codes, group, n_images, tile)
            if _units_path_ok(per_pad * n_images, n_images, tile):
                units, ulens = \
                    pallas_quant_pack.sample_vlc_pack_units_pallas(
                        sp, dp, gp, iq3, ib3, dcl3, acl3,
                        tiles_per_img=per_pad // tile,
                        chroma_wrap=chroma_wrap)
                return pallas_tree_concat.concat_units_tree(
                    units, ulens, n_images=n_images, bucket=bucket)
            N = group.shape[0]
            per_img = N // n_images
            pad = per_pad - per_img
            words, bit_lens = pallas_quant_pack.sample_vlc_pack_pallas(
                sp, dp, jnp.minimum(gp, 1), iq3, ib3, dcl3, acl3,
                tiles_per_img=per_pad // tile, chroma_wrap=chroma_wrap)
            if pad:
                # pad rows still emit DC+EOB codes; zero them so the
                # concat's left-aligned-content invariant holds
                valid = (jnp.arange(per_pad, dtype=jnp.int32) < per_img)
                valid = jnp.tile(valid, n_images)
                bit_lens = jnp.where(valid, bit_lens, 0)
                words = jnp.where(valid[:, None], words, 0)
        return pallas_tree_concat.concat_block_streams_tree(
            words, bit_lens, n_images=n_images, bucket=bucket)
    blocks = _batch_blocks(src, yuv_mode, width, height, src_kind)
    coeffs = [fdct.fdct_blocks(x) for x in blocks]
    vlc_state = _interleave_quantized(coeffs, iquant, ibias, nb_blocks,
                                      n_images)
    return _stage_batch_pack(vlc_state, dc_luts, ac_luts,
                             n_images=n_images, bucket=bucket,
                             per_image_tables=per_image_tables)


@functools.partial(jax.jit, static_argnames=("per_img",))
def _slice_vlc_state(vlc_state, i, per_img: int):
    """Per-image slice of a batched (image-major) VLC state; `i` is traced
    so every overflow refetch reuses one compiled program."""
    rl, dc_codes, group = vlc_state

    def sl(x):
        return jax.lax.dynamic_slice_in_dim(x, i * per_img, per_img, axis=0)

    return ({k: sl(v) for k, v in rl.items()}, sl(dc_codes), sl(group))


@functools.partial(jax.jit, static_argnames=("nb_blocks", "n_images",
                                             "n_groups", "bucket",
                                             "chroma_wrap"))
def _stage_m4_final(prep, iq3, ib3, nb_blocks, n_images: int,
                    n_groups: int, bucket: int, chroma_wrap: bool):
    """Single-program optimized-encode second pass over the cached prep
    state (the search loop's per-pass body, run once): per-image symbol
    frequencies from the cached coefficients -> device-built optimal
    Huffman tables -> fused per-image-LUT pack from the cached int8
    samples.  Replaces the freqs-program + LUT-upload + front-end-
    recomputing final pass (reference one-scan semantics,
    src/enc.cc:1517-1580).  Returns (words, [B, 1 + 604] combo of total
    bits + DHT descriptions — one fetch)."""
    from .ops import huffman_device as hd
    freqs = _search_component_freqs(prep["coeffs"], iq3, ib3, n_images)
    dcl, acl, nbs, desc = hd.luts_and_desc_from_freqs(
        jnp.reshape(freqs[0], (n_images, 2, -1)),
        jnp.reshape(freqs[1], (n_images, 2, -1)), n_groups)
    desc_flat = hd.desc_to_flat(nbs, desc)
    dc_codes = _search_dc_codes(prep["dc_coefs"], iq3, ib3, nb_blocks,
                                n_images)
    words, totals = _fused_pack_from_samples(
        prep["sinter"], dc_codes, prep["group"], iq3, ib3, dcl, acl,
        n_images, bucket, chroma_wrap)
    combo = jnp.concatenate([totals.astype(jnp.int32)[:, None],
                             desc_flat], axis=1)
    return words, combo


def _encode_batch_opt_prep(src, param, flags, layout, base_qms, min_qmats,
                           n_groups: int, b: int, w: int, h: int,
                           yuv_mode: int, src_kind: str,
                           bits_per_pixel_budget: float):
    """Prep-based optimized batch encode (methods 1-6, per-image
    statistics, relay backend): ONE front-end program caches int8
    samples + coefficients + DC chains (+ histograms), the host tunes
    matrices from the fetched histograms (native node fit), and ONE
    device program does freqs -> tables -> pack.  Three fetches total
    (histos, combo, streams) instead of the former
    histos/freqs/LUT-upload/final-pass chain that recomputed the color
    conversion and fDCT three times."""
    from .ops import huffman_device as hd
    nb_blocks = tuple(layout.nb_blocks)
    prep = _stage_search_prep(
        src, yuv_mode=yuv_mode, width=w, height=h, nb_blocks=nb_blocks,
        n_images=b, src_kind=src_kind,
        with_histo=flags["use_adaptive_quant"])
    if flags["use_adaptive_quant"]:
        from .adaptive import analyse_histo_nodes
        hh = np.asarray(prep["histos"]).astype(np.int64).reshape(
            2, b, 64, -1)
        tuned_l = analyse_histo_nodes(
            hh[0], base_qms[0]["quant"][None], min_qmats[0],
            param.qdelta_max_luma)[:, 0]
        tuned_c = (analyse_histo_nodes(
            hh[1], base_qms[1]["quant"][None], min_qmats[1],
            param.qdelta_max_chroma)[:, 0] if n_groups > 1 else
            np.broadcast_to(base_qms[1]["quant"], (b, 64)))
        per_qms = [[spec.finalize_quant_matrix(
            tuned_l[i], min_qmats[0], param.quantization_bias),
            spec.finalize_quant_matrix(
                tuned_c[i], min_qmats[1], param.quantization_bias)]
            for i in range(b)]
    else:
        per_qms = [base_qms] * b
    iq3 = jnp.asarray(np.stack([[q["iquant"] for q in qms]
                                for qms in per_qms]).astype(np.int32))
    ib3 = jnp.asarray(np.stack([[q["bias"] for q in qms]
                                for qms in per_qms]).astype(np.int32))

    n_blocks_img = layout.mb_w * layout.mb_h * sum(nb_blocks)
    bucket = int(min(n_blocks_img * pack.WORDS_PER_BLOCK,
                     max(4096, w * h * bits_per_pixel_budget / 32)))
    words, combo_dev = _stage_m4_final(
        prep, iq3, ib3, nb_blocks, b, n_groups, bucket,
        chroma_wrap=src_kind == "rgb")
    combo = np.asarray(combo_dev)
    totals_np = combo[:, 0]
    flat_np = combo[:, 1:]
    words_np = fetch_streams_batch(
        words, np.where(totals_np <= bucket * 32, totals_np, 0))
    out = []
    for i in range(b):
        total_bits = int(totals_np[i])
        if total_bits > bucket * 32 or total_bits == 0x7FFFFFFF:
            out.append(_host_fallback_one(src, src_kind, i, yuv_mode,
                                          param))
            continue
        tabs_i = hd.tables_from_flat(flat_np, i, n_groups)
        scan = _finalize_scan_bytes(words_np[i], total_bits)
        out.append(_assemble_jpeg(layout, param, per_qms[i], tabs_i,
                                  scan))
    return out


def _encode_batch_optimized(src, param: EncoderParam,
                            bits_per_pixel_budget: float,
                            share_statistics: bool = False,
                            yuv_mode: int = None, width: int = None,
                            height: int = None, src_kind: str = "rgb"):
    """Batched two-pass Huffman / adaptive-quant encode.

    Default is reference-parity per-image optimization (per-image
    adaptive matrices + per-image optimal Huffman tables; byte-identical
    to per-image encode_rgb, src/enc.cc:1517-1580).  share_statistics=True
    derives ONE table set / tuned matrix pair from the whole batch's
    statistics — a deliberate deviation knob (SURVEY §7.3) that keeps the
    host table build O(1) per batch."""
    flags = method_flags(param.method)
    if src_kind == "rgb":
        b, h, w = src.shape[:3]
        src = jnp.asarray(src)
    else:
        b = src[0].shape[0]
        h, w = height, width
    if yuv_mode is None:
        yuv_mode = param.yuv_mode
        if yuv_mode in (C.YUV_AUTO, C.YUV_SHARP):
            yuv_mode = C.YUV_420
    layout = pipeline.component_layout(yuv_mode, w, h)
    qmats = param.resolved_quant_matrices().copy()
    min_qmats = param.resolved_min_quant_matrices()
    base_qms = [spec.finalize_quant_matrix(qmats[i], min_qmats[i],
                                           param.quantization_bias)
                for i in range(2)]
    n_groups = 2 if layout.nb_comps > 1 else 1
    defaults = k3_default_tables()
    stats_images = 1 if share_statistics else b

    relay_fused = _relay_backend() and not flags["use_trellis"]
    if (relay_fused and not share_statistics and flags["optimize_size"]
            and src_kind in ("rgb", "planes")
            and jax.default_backend() != "cpu"):
        return _encode_batch_opt_prep(
            src, param, flags, layout, base_qms, min_qmats, n_groups,
            b, w, h, yuv_mode, src_kind, bits_per_pixel_budget)
    if relay_fused:
        coeffs = None
        histos = (_stage_batch_histos_fused(
            src, yuv_mode=yuv_mode, width=w, height=h,
            stats_images=stats_images, src_kind=src_kind)
            if flags["use_adaptive_quant"] else None)
    else:
        coeffs, histos = _stage_batch_coeffs(
            src, yuv_mode=yuv_mode, width=w, height=h,
            with_histo=flags["use_adaptive_quant"],
            n_images=stats_images, src_kind=src_kind)

    def tune(histo_pair):
        qms = list(base_qms)
        for g in range(n_groups - 1, -1, -1):
            qdelta_max = (param.qdelta_max_luma if g == 0
                          else param.qdelta_max_chroma)
            tuned = analyse_histo(histo_pair[g].astype(np.int64),
                                  qms[g]["quant"], min_qmats[g],
                                  qdelta_max)
            qms[g] = spec.finalize_quant_matrix(tuned, min_qmats[g],
                                                param.quantization_bias)
        return qms

    if share_statistics:
        qms = (tune([np.asarray(histos[0]).reshape(64, -1),
                     np.asarray(histos[1]).reshape(64, -1)])
               if flags["use_adaptive_quant"] else base_qms)
        per_qms = [qms] * b
        iq, ib = _quant_device_arrays(qms)
    elif flags["use_adaptive_quant"]:
        # reshape: a size-1 sub-batch comes back unbatched
        hl = np.asarray(histos[0]).reshape(b, 64, -1)
        hc = np.asarray(histos[1]).reshape(b, 64, -1)
        # pure-NumPy per-image analysis releases the GIL: thread it
        # (~8 ms/image serial dominates the batched m4 host time)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            per_qms = list(pool.map(lambda i: tune([hl[i], hc[i]]),
                                    range(b)))
        iq = jnp.asarray(np.stack(
            [[q["iquant"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        ib = jnp.asarray(np.stack(
            [[q["bias"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
    else:
        per_qms = [base_qms] * b
        iq, ib = _quant_device_arrays(base_qms)

    if relay_fused:
        vlc_state = None
        freqs = (_stage_batch_freqs_fused(
            src, iq, ib, yuv_mode=yuv_mode, width=w, height=h,
            nb_blocks=tuple(layout.nb_blocks), n_images=b,
            stats_images=stats_images, src_kind=src_kind)
            if flags["optimize_size"] else None)
    elif flags["use_trellis"]:
        if share_statistics or not flags["use_adaptive_quant"]:
            qq = jnp.asarray(np.stack(
                [per_qms[0][0]["quant"], per_qms[0][1]["quant"]]
            ).astype(np.int32))
        else:
            qq = jnp.asarray(np.stack(
                [[q["quant"] for q in qms] for qms in per_qms]
            ).astype(np.int32))
        vlc_state, freqs = _stage_quantize_trellis(
            coeffs, iq, ib, qq, _trellis_cost_lens(),
            with_stats=flags["optimize_size"],
            nb_blocks=tuple(layout.nb_blocks), n_images=b,
            per_image_stats=not share_statistics)
    else:
        vlc_state, freqs = _stage_batch_quantize(
            coeffs, iq, ib, with_stats=flags["optimize_size"],
            nb_blocks=tuple(layout.nb_blocks), n_images=b,
            per_image_stats=not share_statistics)

    per_image_tables = False
    if flags["optimize_size"]:
        if share_statistics:
            tables = optimal_tables_from_freqs(
                np.asarray(freqs[0]).astype(np.int64),
                np.asarray(freqs[1]).astype(np.int64), n_groups)
            if n_groups == 1:
                tables[1], tables[3] = defaults[1], defaults[3]
            per_tables = [tables] * b
            dc_luts, ac_luts = _device_luts(tables)
        else:
            # per-image optimal tables built ON DEVICE: no freqs fetch,
            # no host merge, no LUT upload — the DHT description for
            # emission comes back with one flat fetch after the pack
            from .ops import huffman_device as hd
            dc_luts, ac_luts, nbs_dev, desc_dev = \
                hd.luts_and_desc_from_freqs(
                    jnp.reshape(freqs[0], (b, 2, -1)),
                    jnp.reshape(freqs[1], (b, 2, -1)), n_groups)
            desc_flat = hd.desc_to_flat(nbs_dev, desc_dev)
            per_tables = None
            per_image_tables = True
    else:
        tables = k3_default_tables()
        per_tables = [tables] * b
        dc_luts, ac_luts = _device_luts(tables)

    n_blocks_img = layout.mb_w * layout.mb_h * sum(layout.nb_blocks)
    bucket = int(min(n_blocks_img * pack.WORDS_PER_BLOCK,
                     max(4096, w * h * bits_per_pixel_budget / 32)))
    if relay_fused:
        words, totals = _encode_batch_opt_core(
            src, iq, ib, dc_luts, ac_luts, yuv_mode=yuv_mode, width=w,
            height=h, nb_blocks=tuple(layout.nb_blocks), n_images=b,
            bucket=bucket, per_image_tables=per_image_tables,
            src_kind=src_kind)
    else:
        words, totals = _stage_batch_pack(vlc_state, dc_luts, ac_luts,
                                          n_images=b, bucket=bucket,
                                          per_image_tables=per_image_tables)
    totals_np = np.asarray(totals)
    words_np = fetch_streams_batch(words, totals_np)
    if per_tables is None:
        # device-built tables: one flat fetch of the DHT descriptions
        from .ops import huffman_device as hd
        flat_np = np.asarray(desc_flat)
        per_tables = [hd.tables_from_flat(flat_np, i, n_groups)
                      for i in range(b)]

    per_img = n_blocks_img
    out = []
    for i in range(b):
        total_bits = int(totals_np[i])
        if total_bits > bucket * 32:      # bucket overflow
            if relay_fused:
                # host fallback (see _host_fallback_one: single-image
                # device variants of the batch kernels can poison the
                # TPU runtime)
                out.append(_host_fallback_one(src, src_kind, i, yuv_mode,
                                              param))
                continue
            state_i = _slice_vlc_state(vlc_state, jnp.int32(i), per_img)
            if per_image_tables:
                dcl, acl = _device_luts(per_tables[i])
            else:
                dcl, acl = dc_luts, ac_luts
            wi, ti = _stage_pack(state_i, dcl, acl)
            scan = _finalize_scan_bytes(wi, int(ti))
        else:
            scan = _finalize_scan_bytes(words_np[i], total_bits)
        out.append(_assemble_jpeg(layout, param, per_qms[i],
                                  per_tables[i], scan))
    return out


@functools.partial(jax.jit, static_argnames=("n",))
def _slice_words_batch(words, n: int):
    return jax.lax.slice(words, (0, 0), (words.shape[0], n))


def _ladder(n: int, floor: int = 1024) -> int:
    """Smallest quarter-power-of-two step >= n: {2^k, 1.25, 1.5, 1.75}*2^k.
    A bounded set of slice shapes (so the jitted slice cache stays small)
    that wastes at most 25% transfer vs the exact prefix — the pow2 ladder
    wasted up to 2x through the slow dev tunnel."""
    if n <= floor:
        return floor
    base = 1 << (n - 1).bit_length() - 1          # 2^k <= n-1 < 2^(k+1)
    if n <= base:
        return base
    step = base // 4
    return base + -(-max(n - base, 0) // step) * step


# Above this many bytes a device->host fetch splits into concurrent
# row-chunk RPCs: the dev relay serves parallel streams ~1.4x faster than
# one for large arrays (measured ~23 -> ~31-34 MB/s at 8.4 MB) but pays
# extra per-RPC latency below that (2.6 MB: single 179 ms, 4-way 243 ms).
# A co-located host is indifferent.
_CONCURRENT_FETCH_BYTES = 6 << 20
_CONCURRENT_FETCH_WAYS = 4


def _fetch_rows_concurrent(arr) -> np.ndarray:
    """np.asarray(arr) via `_CONCURRENT_FETCH_WAYS` parallel row-chunk
    fetches (equal chunks keep the jitted-slice cache bounded)."""
    from concurrent.futures import ThreadPoolExecutor
    B = arr.shape[0]
    ways = min(_CONCURRENT_FETCH_WAYS, B)
    if ways <= 1 or arr.nbytes < _CONCURRENT_FETCH_BYTES:
        return np.asarray(arr)
    step = -(-B // ways)
    spans = [(i, min(i + step, B)) for i in range(0, B, step)]
    with ThreadPoolExecutor(max_workers=len(spans)) as pool:
        parts = list(pool.map(lambda s: np.asarray(arr[s[0]:s[1]]), spans))
    return np.concatenate(parts, axis=0)


def fetch_streams_batch(words, totals_np) -> np.ndarray:
    """Fetch a [B, bucket] batch of streams as the smallest ladder-step
    word-column prefix covering every image's used words (the relay moves
    bytes slowly; the bucket is sized for the worst case, not the batch).
    Large fetches split into concurrent row-chunk RPCs."""
    nmax = int((int(totals_np.max()) + 31) // 32) if totals_np.size else 1
    if nmax >= words.shape[1]:
        return _fetch_rows_concurrent(words)
    ncols = min(_ladder(nmax), words.shape[1])
    return _fetch_rows_concurrent(_slice_words_batch(words, ncols))


@functools.partial(jax.jit, static_argnames=("n",))
def _slice_words(words, n: int):
    return jax.lax.slice(words, (0,), (n,))


def fetch_stream(words, total_bits: int) -> np.ndarray:
    """Fetch only the meaningful prefix of the device stream (bucketed to
    ladder-step lengths so transfer slicing doesn't recompile per size)."""
    n_words = (total_bits + 31) // 32
    if n_words >= words.shape[0]:
        return np.asarray(words)[:n_words]
    bucket = min(_ladder(n_words), words.shape[0])
    return np.asarray(_slice_words(words, bucket))[:n_words]


@jax.jit
def _stage_count_stuffing(words, total):
    """Number of 0xFF bytes among the stream's complete bytes (the
    BitCounter stuffing model: the trailing partial byte never counts)."""
    n_bytes = total // 8
    idx = jnp.arange(words.shape[0] * 4, dtype=jnp.int32)
    shifts = (24 - 8 * (idx & 3)).astype(jnp.uint32)
    byte = (jnp.repeat(words, 4) >> shifts) & 0xFF
    return jnp.sum(((byte == 0xFF) & (idx < n_bytes)).astype(jnp.int32))


@jax.jit
def _stage_count_stuffing_batch(words, totals):
    """Per-image 0xFF complete-byte counts: [B, W] words + [B] bits -> [B].

    Four shifted compares over the [B, W] word array (one per byte slot)
    instead of materializing a 4x-repeated byte array."""
    W = words.shape[1]
    word_idx = jnp.arange(W, dtype=jnp.int32)[None, :]
    n_bytes = (totals.astype(jnp.int32) // 8)[:, None]
    cnt = jnp.zeros(words.shape[0], jnp.int32)
    for k in range(4):
        byte = (words >> jnp.uint32(24 - 8 * k)) & 0xFF
        cnt = cnt + jnp.sum(
            ((byte == 0xFF) & (word_idx * 4 + k < n_bytes)).astype(
                jnp.int32), axis=1)
    return cnt


@jax.jit
def _stage_eval_size_batch(words, totals):
    """[2, B] stacked (total bits, stuffing-byte count) — one fetch per
    search pass instead of two."""
    return jnp.stack([totals.astype(jnp.int32),
                      _stage_count_stuffing_batch(words, totals)])


@functools.partial(jax.jit, static_argnames=("nb_blocks", "n_images",
                                             "n_groups"))
def _stage_search_tables(coeffs, iquant3, ibias3, nb_blocks,
                         n_images: int, n_groups: int):
    """Quantize the cached coefficients ONCE -> VLC fields + per-image
    symbol stats -> device-built optimal Huffman LUTs
    (ops.huffman_device).  With the pack program chained after it, a
    size-search pass runs as one dispatch chain with one fetch —
    replacing the round-3 freqs-program + freqs-fetch + host-merge +
    LUT-upload + pack-program structure (src/dichotomy.cc:106-192
    per-pass semantics, byte-exact).  Kept separate from the Pallas
    pack program so each stays an independently compiled executable."""
    from .ops import huffman_device as hd
    vlc_state, freqs = _stage_batch_quantize(
        coeffs, iquant3, ibias3, with_stats=True, nb_blocks=nb_blocks,
        n_images=n_images, per_image_stats=True)
    dcl, acl, nbs = hd.luts_from_freqs(
        jnp.reshape(freqs[0], (n_images, 2, -1)),
        jnp.reshape(freqs[1], (n_images, 2, -1)), n_groups)
    return vlc_state, dcl, acl, nbs


def _stage_search_pass(coeffs, iquant3, ibias3, nb_blocks, n_images: int,
                       n_groups: int, bucket: int):
    """One size-search pass: two chained device programs, one fetch."""
    vlc_state, dcl, acl, nbs = _stage_search_tables(
        coeffs, iquant3, ibias3, nb_blocks, n_images, n_groups)
    words, totals = _stage_batch_pack(vlc_state, dcl, acl,
                                      n_images=n_images, bucket=bucket,
                                      per_image_tables=True)
    return words, totals, _stage_eval_size_nbs(words, totals, nbs)


@jax.jit
def _stage_eval_size_one(words, total, nbs):
    """[6] vector (total bits, stuffing bytes, 4x nb_syms) — the single
    -image analog of `_stage_eval_size_nbs`, one fetch per pass."""
    return jnp.concatenate(
        [jnp.stack([total.astype(jnp.int32),
                    _stage_count_stuffing(words, total).astype(
                        jnp.int32)]),
         jnp.reshape(nbs, (-1,)).astype(jnp.int32)])


@jax.jit
def _stage_eval_size_nbs(words, totals, nbs):
    """[6, B] stacked (total bits, stuffing bytes, 4x per-table symbol
    counts) — the whole size evaluation of a device-tables search pass
    in ONE fetch (nb_syms feeds the host header-size model)."""
    return jnp.concatenate(
        [_stage_eval_size_batch(words, totals),
         jnp.transpose(nbs).astype(jnp.int32)], axis=0)


def _batch_qerr(coeffs, iquant3, ibias3, quant3, n_images: int):
    """Per-image exact uint64 squared quantization error (PSNR search):
    per-component [N, 64] coeffs (image-major rows) against [B, 2, 64]
    per-image quantizer arrays -> ([B] hi, [B] lo) uint32."""
    per_rows = []
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        cb = jnp.abs(coef.astype(jnp.int32)).reshape(n_images, -1, 64)
        t = (cb + ibias3[:, None, g, :]).astype(jnp.uint32)
        q = ((t * iquant3[:, None, g, :].astype(jnp.uint32))
             >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
        deq = quant3[:, None, g, :] * q
        v0 = cb >> C.AC_BITS
        per_rows.append(jnp.sum((v0 - deq) * (v0 - deq), axis=2))
    return quantize.sum_u64_rows(jnp.concatenate(per_rows, axis=1))


@functools.partial(jax.jit, static_argnames=("n_images",))
def _stage_batch_qerr(coeffs, iquant3, ibias3, quant3, n_images: int):
    return _batch_qerr(coeffs, iquant3, ibias3, quant3, n_images)


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "n_images", "src_kind"))
def _stage_batch_qerr_fused(src, iquant3, ibias3, quant3, yuv_mode: int,
                            width: int, height: int, n_images: int,
                            src_kind: str = "rgb"):
    """Relay variant: front end + per-image quantize-error in ONE program
    (only two [B] uint32 vectors leave the device)."""
    blocks = _batch_blocks_fast(src, yuv_mode, width, height, src_kind)
    coeffs = [fdct.fdct_blocks(x) for x in blocks]
    return _batch_qerr(coeffs, iquant3, ibias3, quant3, n_images)


def _derive_quant_arrays(q_u8, q_bias: int):
    """[..., 2, 64] uint8 quant matrices -> (iquant, ibias) int32, exact
    integer replica of spec.finalize_quant_matrix (the matrices arrive
    already clamped to min_quant)."""
    q = jnp.maximum(q_u8.astype(jnp.int32), 1)
    is_one = q == 1
    iq = jnp.where(is_one, 0xFFFF, ((1 << C.FP_BITS) + q // 2) // q)
    pos = jnp.arange(64, dtype=jnp.int32)
    bias = jnp.where(is_one, 0x80,
                     jnp.where(pos == 0, C.BIAS_DC, q_bias))
    ib = (((bias * q) << C.AC_BITS) + 128) >> 8
    return iq, ib


@functools.partial(jax.jit, static_argnames=("yuv_mode", "width", "height",
                                             "nb_blocks", "n_images",
                                             "src_kind", "with_histo"))
def _stage_search_prep(src, yuv_mode: int, width: int, height: int,
                       nb_blocks, n_images: int, src_kind: str = "rgb",
                       with_histo: bool = False):
    """Pass-independent device state for the fused search loop: the
    per-component fDCT coefficients (int16, feeding the per-pass stats
    and PSNR evaluations), the MCU-interleaved int8 samples (feeding the
    fused quantize+VLC+pack kernel, which re-runs the fDCT in VMEM), the
    per-block table groups, and the raw per-component DC coefficients
    (the per-pass DC-predictor chain quantizes these directly)."""
    chroma_wrap = src_kind == "rgb"
    if src_kind == "planes":
        blocks8 = colorspace.planes_to_blocks(src, yuv_mode, width, height,
                                              out_dtype=jnp.int8)
    else:
        blocks8 = colorspace.rgb_to_blocks(src, yuv_mode, width, height,
                                           out_dtype=jnp.int8)
    from .ops import pallas_fdct
    mcu_blocks = sum(nb_blocks)
    n_mcu = blocks8[0].shape[0] // nb_blocks[0]
    sinter = jnp.concatenate(
        [b.reshape(n_mcu, nb, 64) for b, nb in zip(blocks8, nb_blocks)],
        axis=1).reshape(-1, 64)
    slot_group = np.zeros(mcu_blocks, dtype=np.int32)
    slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
    group = jnp.tile(jnp.asarray(slot_group), n_mcu)

    coeffs = []
    coeffs32 = []
    dc_coefs = []
    for c, b in enumerate(blocks8):
        bd = b
        if chroma_wrap and c > 0:
            b32 = b.astype(jnp.int32)
            bd = jnp.where(b32 == -128, 128, b32)
        coef = fdct.fdct_blocks(bd)
        coeffs32.append(coef)
        coeffs.append(coef.astype(jnp.int16))
        dc_coefs.append(pallas_fdct.fdct_dc(bd).astype(jnp.int32))
    prep = {"coeffs": coeffs, "sinter": sinter, "group": group,
            "dc_coefs": dc_coefs}
    if with_histo:
        histo_l = quantize.store_histo(coeffs32[0], n_images)
        if len(coeffs32) > 1:
            histo_c = (quantize.store_histo(coeffs32[1], n_images)
                       + quantize.store_histo(coeffs32[2], n_images))
        else:
            histo_c = jnp.zeros_like(histo_l)
        bound = max(coeffs32[0].shape[0],
                    2 * coeffs32[1].shape[0] if len(coeffs32) > 1 else 0)
        # one [2, B*64*bins] array so both groups' histograms arrive in a
        # single device->host RPC (the dev tunnel charges per fetch)
        if bound // n_images < (1 << 16):
            prep["histos"] = jnp.stack(
                [histo_l.reshape(-1).astype(jnp.uint16),
                 histo_c.reshape(-1).astype(jnp.uint16)])
        else:
            prep["histos"] = jnp.stack([histo_l.reshape(-1),
                                        histo_c.reshape(-1)])
    return prep


def _search_dc_codes(dc_coefs, iq3, ib3, nb_blocks, n_images: int):
    """Per-pass MCU-interleaved DC diff codes from the cached raw DC
    coefficients (quantize DC + predictor diff, src/enc.cc:482-499)."""
    n_mcu = dc_coefs[0].shape[0] // nb_blocks[0]
    dc_cols = []
    for c, dcf in enumerate(dc_coefs):
        g = 0 if c == 0 else 1
        dcr = dcf.reshape(n_images, -1)
        t = (jnp.abs(dcr) + ib3[:, g, 0][:, None]).astype(jnp.uint32)
        q = ((t * iq3[:, g, 0][:, None].astype(jnp.uint32))
             >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
        dcq = jnp.where(dcr < 0, -q, q).reshape(-1)
        codes = vlc.dc_diff_codes(dcq, n_images)
        dc_cols.append(codes.reshape(n_mcu, nb_blocks[c]))
    return jnp.concatenate(dc_cols, axis=1).reshape(-1)


def _search_component_freqs(coeffs, iq3, ib3, n_images: int):
    """Per-pass per-image symbol frequencies straight from the cached
    per-component coefficients — no MCU interleave, so each component's
    quantize -> run-levels -> count chain stays a single-consumer fusion
    (the `_stage_batch_freqs_fused` pattern)."""
    fdc = fac = None
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        qb = _per_image_quantize(coef, iq3[:, g], ib3[:, g], n_images)
        rlc = vlc.run_levels(qb)
        dcc = vlc.dc_diff_codes(qb[:, 0], n_images)
        grp = jnp.full(qb.shape[0], g, jnp.int32)
        d, a = _grouped_stats(rlc, dcc, grp, n_images)
        fdc = d if fdc is None else fdc + d
        fac = a if fac is None else fac + a
    return fdc, fac


def _fused_pack_from_samples(sinter, dc_codes, group, iq3, ib3, dcl3,
                             acl3, n_images: int, bucket: int,
                             chroma_wrap: bool):
    """Per-image-table fused quantize+VLC+pack from cached int8 samples
    (in-kernel fDCT) + tree concat — the `_encode_batch_opt_core` body
    over pre-staged inputs."""
    from .ops import pallas_quant_pack, pallas_tree_concat
    tile = pallas_quant_pack.DEFAULT_TILE
    N = group.shape[0]
    per_img = N // n_images
    sp, dp, gp, per_pad = _pad_image_tiles(sinter, dc_codes, group,
                                           n_images, tile)
    if _units_path_ok(per_pad * n_images, n_images, tile):
        units, ulens = pallas_quant_pack.sample_vlc_pack_units_pallas(
            sp, dp, gp, iq3, ib3, dcl3, acl3,
            tiles_per_img=per_pad // tile, chroma_wrap=chroma_wrap)
        return pallas_tree_concat.concat_units_tree(
            units, ulens, n_images=n_images, bucket=bucket)
    pad = per_pad - per_img
    words, bit_lens = pallas_quant_pack.sample_vlc_pack_pallas(
        sp, dp, jnp.minimum(gp, 1), iq3, ib3, dcl3, acl3,
        tiles_per_img=per_pad // tile, chroma_wrap=chroma_wrap)
    if pad:
        valid = (jnp.arange(per_pad, dtype=jnp.int32) < per_img)
        valid = jnp.tile(valid, n_images)
        bit_lens = jnp.where(valid, bit_lens, 0)
        words = jnp.where(valid[:, None], words, 0)
    return pallas_tree_concat.concat_block_streams_tree(
        words, bit_lens, n_images=n_images, bucket=bucket)


@functools.partial(jax.jit, static_argnames=(
    "passes", "nb_blocks", "n_images", "n_groups", "bucket",
    "optimize_size", "hdr_fixed_bits", "q_bias", "per_image_mats",
    "chroma_wrap"))
def _stage_search_loop_size(prep, quants_nodes, thr, conv_lo, conv_hi,
                            conv_tbl, dc_luts_def,
                            ac_luts_def, passes: int, nb_blocks,
                            n_images: int, n_groups: int, bucket: int,
                            optimize_size: bool, hdr_fixed_bits: int,
                            q_bias: int, per_image_mats: bool,
                            chroma_wrap: bool = True):
    """Device-resident target-size dichotomy: all `passes` bisection
    passes run in ONE program over the cached coefficients, walking a
    host-precomputed tree of candidate matrices; only a [passes, B]
    int32 trace of exact total sizes (header + scan + stuffing, bits)
    leaves the device.  The bisection branch (value > target,
    src/dichotomy.cc:53-70) is the exact integer compare
    bits >= thr = floor(8*target)+1; the host replays the float hook on
    the fetched trace for convergence/best-pass selection.

    quants_nodes: [B, K, 2, 64] (per_image_mats, adaptive) or [K, 2, 64]
    uint8 with K = 2^passes - 1 tree nodes.  Overflowing passes record
    INT32_MAX; the caller falls back per image.

    Besides the trace, every pass's packed stream (words, scan-bit
    totals) and — when optimize_size — its DHT description are saved
    device-side, so the caller reuses the winning pass's output directly
    instead of re-encoding at the best matrices (the same
    tables-are-a-pure-function-of-the-matrices reuse argument as the
    single-image search's `state` path).

    Early exit: `conv_lo`/`conv_hi` are the exact integer bit-count
    range of the hook's tolerance test and `conv_tbl` [K, 2] the exact
    per-(node, decision) bracket-convergence table (both precomputed in
    f64 on host, dichotomy.size_tolerance_range / build_q_conv_table);
    once every image's hook has converged, the remaining passes execute
    as no-ops (their trace rows stay 0 and are never consumed by the
    host replay, which stops at its own convergence).  Returns
    (trace [passes, B], words_all [passes, B, bucket],
     totals_all [passes, B], desc_all [passes, B, 604] or None).
    """
    from .ops import huffman_device as hd
    B = n_images
    coeffs = prep["coeffs"]
    fused = jax.default_backend() != "cpu" and "sinter" in prep

    def body(p, carry):
        path, active, trace, words_all, totals_all, desc_all = carry
        node = (1 << p) - 1 + path                            # [B]
        if per_image_mats:
            qn = jnp.take_along_axis(
                quants_nodes, node[:, None, None, None], axis=1)[:, 0]
        else:
            qn = jnp.broadcast_to(quants_nodes[node], (B, 2, 64))
        iq3, ib3 = _derive_quant_arrays(qn, q_bias)
        nb_sum = jnp.zeros((B,), jnp.int32)
        desc_flat = None
        if fused:
            if optimize_size:
                freqs = _search_component_freqs(coeffs, iq3, ib3, B)
                dcl, acl, nbs, desc = hd.luts_and_desc_from_freqs(
                    jnp.reshape(freqs[0], (B, 2, -1)),
                    jnp.reshape(freqs[1], (B, 2, -1)), n_groups)
                desc_flat = hd.desc_to_flat(nbs, desc)
                nb_sum = (nbs[:, 0] + nbs[:, 2] if n_groups == 1
                          else jnp.sum(nbs, axis=1))
            else:
                dcl = jnp.broadcast_to(dc_luts_def,
                                       (B,) + dc_luts_def.shape)
                acl = jnp.broadcast_to(ac_luts_def,
                                       (B,) + ac_luts_def.shape)
            dc_codes = _search_dc_codes(prep["dc_coefs"], iq3, ib3,
                                        nb_blocks, B)
            words, totals = _fused_pack_from_samples(
                prep["sinter"], dc_codes, prep["group"], iq3, ib3,
                dcl, acl, B, bucket, chroma_wrap)
        elif optimize_size:
            vlc_state, freqs = _stage_batch_quantize(
                coeffs, iq3, ib3, with_stats=True, nb_blocks=nb_blocks,
                n_images=B, per_image_stats=True)
            dcl, acl, nbs, desc = hd.luts_and_desc_from_freqs(
                jnp.reshape(freqs[0], (B, 2, -1)),
                jnp.reshape(freqs[1], (B, 2, -1)), n_groups)
            desc_flat = hd.desc_to_flat(nbs, desc)
            words, totals = _stage_batch_pack(
                vlc_state, dcl, acl, n_images=B, bucket=bucket,
                per_image_tables=True)
            nb_sum = (nbs[:, 0] + nbs[:, 2] if n_groups == 1
                      else jnp.sum(nbs, axis=1))
        else:
            vlc_state, _ = _stage_batch_quantize(
                coeffs, iq3, ib3, with_stats=False, nb_blocks=nb_blocks,
                n_images=B)
            words, totals = _stage_batch_pack(
                vlc_state, dc_luts_def, ac_luts_def, n_images=B,
                bucket=bucket)
        stuffs = _stage_count_stuffing_batch(words, totals)
        node32 = node
        ok = (totals != 0x7FFFFFFF) & (totals <= bucket * 32)
        bits = (hdr_fixed_bits + 8 * nb_sum + totals.astype(jnp.int32)
                + 8 * stuffs)
        bits = jnp.where(ok, bits, jnp.int32(0x7FFFFFFF))
        d = (bits >= thr).astype(jnp.int32)
        tol_hit = ok & (bits >= conv_lo) & (bits <= conv_hi)
        bconv = conv_tbl[node32, d] > 0
        active = active & ~(tol_hit | bconv) & ok
        words_all = jax.lax.dynamic_update_index_in_dim(
            words_all, words, p, axis=0)
        totals_all = jax.lax.dynamic_update_index_in_dim(
            totals_all, totals.astype(jnp.int32), p, axis=0)
        if desc_all is not None:
            desc_all = jax.lax.dynamic_update_index_in_dim(
                desc_all, desc_flat, p, axis=0)
        return (path * 2 + d, active, trace.at[p].set(bits), words_all,
                totals_all, desc_all)

    path0 = jnp.zeros((B,), jnp.int32)
    active0 = jnp.ones((B,), jnp.bool_)
    trace0 = jnp.zeros((passes, B), jnp.int32)
    words0 = jnp.zeros((passes, B, bucket), jnp.uint32)
    tot0 = jnp.zeros((passes, B), jnp.int32)
    desc0 = (jnp.zeros((passes, B, 604), jnp.int32) if optimize_size
             else None)
    carry = (path0, active0, trace0, words0, tot0, desc0)
    if _SEARCH_LOOP_UNROLL:
        carry = body(0, carry)
        for p in range(1, passes):
            carry = jax.lax.cond(
                jnp.any(carry[1]), functools.partial(body, p),
                lambda c: c, carry)
        _, _, trace, words_all, totals_all, desc_all = carry
    else:
        def fbody(p, carry):
            return jax.lax.cond(
                (p == 0) | jnp.any(carry[1]),
                functools.partial(body, p), lambda c: c, carry)

        _, _, trace, words_all, totals_all, desc_all = jax.lax.fori_loop(
            0, passes, fbody, carry)
    # one [P, B, 2 + D] combo (exact bits, scan totals, DHT descriptions)
    # so every loop output except the streams arrives in a single RPC
    parts = [trace[:, :, None], totals_all[:, :, None]]
    if desc_all is not None:
        parts.append(desc_all)
    return jnp.concatenate(parts, axis=2), words_all


# Unrolling the pass loop lets XLA software-pipeline one pass's table
# build against the previous pass's pack (the fori_loop body is a hard
# serialization point); the tradeoff is a ~passes-times-larger program.
_SEARCH_LOOP_UNROLL = True


@jax.jit
def _stage_search_pick(words_all, totals_all, desc_all, best_pass):
    """Select each image's winning pass from the loop's saved state:
    ([P, B, W], [P, B], [P, B, D], [B]) -> ([B, W], [B], [B, D])."""
    bi = jnp.arange(words_all.shape[1], dtype=jnp.int32)
    words = words_all[best_pass, bi]
    totals = totals_all[best_pass, bi]
    desc = None if desc_all is None else desc_all[best_pass, bi]
    return words, totals, desc


@jax.jit
def _stage_search_pick_words(words_all, best_pass):
    """Words-only winning-pass gather ([P, B, W], [B] -> [B, W]); totals
    and DHT descriptions come from the host-side copies of the loop's
    [P, B] outputs, so the device round trip moves only the streams."""
    bi = jnp.arange(words_all.shape[1], dtype=jnp.int32)
    return words_all[best_pass, bi]


@functools.partial(jax.jit, static_argnames=("cap",))
def _stage_compact_pick(words_all, best_pass, counts, cap: int):
    """Winning-pass gather + exact-prefix compaction: [P, B, W] saved
    streams + [B] chosen passes + [B] used word counts -> one [cap]
    flat array holding every image's used words back to back.  The host
    knows the per-image counts (from the loop's totals), so the whole
    batch's output rides ONE device->host RPC with zero ladder overshoot
    — the fetch is the search's serving-path bottleneck through the dev
    tunnel."""
    B = words_all.shape[1]
    bi = jnp.arange(B, dtype=jnp.int32)
    words = words_all[best_pass, bi]                      # [B, W]
    ends = jnp.cumsum(counts)                             # [B]
    offs = ends - counts
    idx = jnp.arange(cap, dtype=jnp.int32)
    img = jnp.searchsorted(ends, idx, side="right").astype(jnp.int32)
    img = jnp.minimum(img, B - 1)
    within = idx - offs[img]
    valid = (idx < ends[B - 1]) & (within < words.shape[1])
    return jnp.where(valid, words[img, jnp.where(valid, within, 0)], 0)


def _u64_ge(a_hi, a_lo, b_hi, b_lo):
    return (a_hi > b_hi) | ((a_hi == b_hi) & (a_lo >= b_lo))


@functools.partial(jax.jit, static_argnames=(
    "passes", "n_images", "q_bias", "per_image_mats"))
def _stage_search_loop_psnr(coeffs, quants_nodes, err_thr_hi, err_thr_lo,
                            zero_d, tol_bounds, zero_tol, conv_tbl,
                            passes: int, n_images: int,
                            q_bias: int, per_image_mats: bool):
    """Device-resident target-PSNR dichotomy: per pass one exact uint64
    quantize-error per image; branch on err <= threshold (the integer
    form of PSNR > target).  Early exit mirrors the size loop:
    `tol_bounds` = (lo_hi, lo_lo, hi_hi, hi_lo) uint32 words of the
    exact err tolerance range, `zero_tol` whether err=0 satisfies it,
    `conv_tbl` [K, 2] the bracket-convergence table.  Returns a
    [passes, 2, B] uint32 (hi, lo) error trace for the host's float64
    hook replay."""
    B = n_images
    lo_hi, lo_lo, hi_hi, hi_lo = tol_bounds

    def body(p, carry):
        path, active, trace = carry
        node = (1 << p) - 1 + path
        if per_image_mats:
            qn = jnp.take_along_axis(
                quants_nodes, node[:, None, None, None], axis=1)[:, 0]
        else:
            qn = quants_nodes[node]
        iq3, ib3 = _derive_quant_arrays(qn, q_bias)
        q3 = jnp.maximum(qn.astype(jnp.int32), 1)
        err_hi, err_lo = _batch_qerr(coeffs, iq3, ib3, q3, B)
        # value > target  <=>  err <= thr  <=>  hi < thr_hi or
        # (hi == thr_hi and lo <= thr_lo); err == 0 maps to psnr 99.0
        le = ((err_hi < err_thr_hi)
              | ((err_hi == err_thr_hi) & (err_lo <= err_thr_lo)))
        zero = (err_hi == 0) & (err_lo == 0)
        d = jnp.where(zero, zero_d, le.astype(jnp.int32))
        in_rng = (_u64_ge(err_hi, err_lo, lo_hi, lo_lo)
                  & _u64_ge(hi_hi, hi_lo, err_hi, err_lo))
        tol_hit = jnp.where(zero, zero_tol > 0, in_rng & ~zero)
        bconv = conv_tbl[node, d] > 0
        active = active & ~(tol_hit | bconv)
        trace = trace.at[p, 0].set(err_hi.astype(jnp.uint32))
        trace = trace.at[p, 1].set(err_lo.astype(jnp.uint32))
        return path * 2 + d, active, trace

    path0 = jnp.zeros((B,), jnp.int32)
    active0 = jnp.ones((B,), jnp.bool_)
    trace0 = jnp.zeros((passes, 2, B), jnp.uint32)

    def fbody(p, carry):
        return jax.lax.cond(
            (p == 0) | jnp.any(carry[1]),
            functools.partial(body, p), lambda c: c, carry)

    _, _, trace = jax.lax.fori_loop(0, passes, fbody,
                                    (path0, active0, trace0))
    return trace


def _encode_batch_search(src, src_kind: str, yuv_mode: int, w: int, h: int,
                         param: EncoderParam,
                         bits_per_pixel_budget: float = 4.0):
    """B independent target-size / target-PSNR dichotomies sharing one
    batched device program per pass (reference LoopScan semantics,
    src/dichotomy.cc:106-192, run per image).  Byte-identical to running
    the single-image search on each image.

    Per pass: per-image matrices from each image's bisection hook (plus
    per-image AnalyseHisto when adaptive), then one batched program
    evaluates every image's size (per-image freqs -> per-image optimal
    tables -> per-image-LUT pack + stuffing count) or PSNR (per-image
    uint64 quantize-error).  Hook updates and table builds stay on host.
    """
    from .dichotomy import (get_psnr, header_size_bits,
                            header_size_bits_nbsyms)
    from .params import SearchHook
    from .tools import estimate_quality

    flags = method_flags(param.method)
    b = src.shape[0] if src_kind == "rgb" else src[0].shape[0]
    layout = pipeline.component_layout(yuv_mode, w, h)
    min_qmats = param.resolved_min_quant_matrices()
    defaults = k3_default_tables()
    n_groups = 2 if layout.nb_comps > 1 else 1
    nb_blocks = tuple(layout.nb_blocks)
    n_blocks_img = layout.mb_w * layout.mb_h * sum(nb_blocks)
    for_size = param.target_mode == TARGET_SIZE

    initial_q = min(max(estimate_quality(
        param.resolved_quant_matrices()[0]), 0.0), 100.0)
    hooks = []
    for _ in range(b):
        hk = SearchHook()
        hk.setup(param, initial_q)
        hooks.append(hk)

    tracer = _StageTrace("search")
    trellis = flags["use_trellis"]
    # the search always caches the fDCT coefficients on device and
    # re-quantizes them per pass (the reference's CollectCoeffs +
    # StoreRunLevels replay, src/dichotomy.cc:110-146) — re-deriving
    # them from source every pass costs a color+fDCT per pass for
    # nothing
    relay_fused = False
    passes = min(max(param.passes, 1), 20)
    use_device_loop = not trellis and 2 <= passes <= 8
    if use_device_loop and jax.default_backend() != "cpu" \
            and src_kind in ("rgb", "planes"):
        # fused-loop staging: int8 samples + int16 coeffs + DC chain
        # state (+ histograms), one program
        prep = _stage_search_prep(
            src, yuv_mode=yuv_mode, width=w, height=h,
            nb_blocks=nb_blocks, n_images=b, src_kind=src_kind,
            with_histo=flags["use_adaptive_quant"])
        coeffs = prep["coeffs"]
        histos = prep.get("histos")
    else:
        coeffs, histos = _stage_batch_coeffs(
            src, yuv_mode=yuv_mode, width=w, height=h,
            with_histo=flags["use_adaptive_quant"], n_images=b,
            src_kind=src_kind)
        prep = {"coeffs": coeffs}

    # per-image trellis rate-table state (methods 7/8): lens evolve per
    # image exactly like the reference's persistent ac_codes_ arrays
    # across LoopScan passes (src/dichotomy.cc:83-85,144); lens_prev
    # holds each image's last-executed-pass ENTRY state so a
    # last-pass-is-best image reproduces its stored bytes
    if trellis:
        base_lens = np.asarray(_trellis_cost_lens())
        lens_dev = jnp.asarray(np.broadcast_to(
            base_lens, (b, 2, 256)).astype(np.int32))
        lens_prev_dev = lens_dev
        last_best = [False] * b

    def trellis_eval(iq3, ib3, per_qms, lens_arr):
        qq3 = jnp.asarray(np.stack(
            [[q["quant"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        return _stage_quantize_trellis(
            coeffs, iq3, ib3, qq3, jnp.asarray(lens_arr.astype(np.int32)),
            with_stats=flags["optimize_size"], nb_blocks=nb_blocks,
            n_images=b, per_image_stats=True)
    tracer.mark("prep dispatch")
    if histos is not None:
        if isinstance(histos, tuple):
            hh = np.stack([np.asarray(histos[0]), np.asarray(histos[1])])
        else:
            hh = np.asarray(histos)           # [2, ...]: one RPC
        hh = hh.astype(np.int64).reshape(2, b, 64, -1)
        hl, hc = hh[0], hh[1]
        tracer.mark("histo fetch")

    from concurrent.futures import ThreadPoolExecutor

    def make_qms(i):
        qmats = np.stack([hooks[i].next_matrices()[c] for c in range(2)])
        qms = [spec.finalize_quant_matrix(qmats[g], min_qmats[g],
                                          param.quantization_bias)
               for g in range(2)]
        if flags["use_adaptive_quant"]:
            for g in range(n_groups - 1, -1, -1):
                qdelta_max = (param.qdelta_max_luma if g == 0
                              else param.qdelta_max_chroma)
                tuned = analyse_histo(hl[i] if g == 0 else hc[i],
                                      qms[g]["quant"], min_qmats[g],
                                      qdelta_max)
                qms[g] = spec.finalize_quant_matrix(
                    tuned, min_qmats[g], param.quantization_bias)
        return qms

    def stack_quant_arrays(per_qms):
        iq3 = jnp.asarray(np.stack(
            [[q["iquant"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        ib3 = jnp.asarray(np.stack(
            [[q["bias"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        return iq3, ib3

    def build_tables(freqs):
        """Per-image optimal Huffman tables + [B, ...] device LUTs."""
        if not flags["optimize_size"]:
            tabs = [defaults] * b
            dcl, acl = _device_luts(defaults)
            return tabs, dcl, acl, False
        fdc = np.asarray(freqs[0]).astype(np.int64).reshape(b, 2, 12)
        fac = np.asarray(freqs[1]).astype(np.int64).reshape(b, 2, 256)

        def build(i):
            t = optimal_tables_from_freqs(fdc[i], fac[i], n_groups)
            if n_groups == 1:
                t[1], t[3] = defaults[1], defaults[3]
            return t

        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            tabs = list(pool.map(build, range(b)))
        dc_np = np.zeros((b, 2, 16), np.uint32)
        ac_np = np.zeros((b, 2, 256), np.uint32)
        for i, t in enumerate(tabs):
            dc_np[i], ac_np[i] = _host_luts(t)
        return tabs, jnp.asarray(dc_np), jnp.asarray(ac_np), True

    def batched_pack(iq3, ib3, dcl, acl, per_tabs, bucket):
        if relay_fused:
            return _encode_batch_opt_core(
                src, iq3, ib3, dcl, acl, yuv_mode=yuv_mode, width=w,
                height=h, nb_blocks=nb_blocks, n_images=b, bucket=bucket,
                per_image_tables=per_tabs, src_kind=src_kind)
        vlc_state, _ = _stage_batch_quantize(
            coeffs, iq3, ib3, with_stats=False, nb_blocks=nb_blocks,
            n_images=b)
        return _stage_batch_pack(vlc_state, dcl, acl, n_images=b,
                                 bucket=bucket,
                                 per_image_tables=per_tabs)

    def batched_freqs(iq3, ib3):
        if not flags["optimize_size"]:
            return None
        if relay_fused:
            return _stage_batch_freqs_fused(
                src, iq3, ib3, yuv_mode=yuv_mode, width=w, height=h,
                nb_blocks=nb_blocks, n_images=b, stats_images=b,
                src_kind=src_kind)
        _, freqs = _stage_batch_quantize(
            coeffs, iq3, ib3, with_stats=True, nb_blocks=nb_blocks,
            n_images=b, per_image_stats=True)
        return freqs

    # size evaluation needs room for early high-quality passes; give the
    # bucket target-size headroom on top of the pixel budget
    bucket = int(min(n_blocks_img * pack.WORDS_PER_BLOCK,
                     max(4096, w * h * bits_per_pixel_budget / 32,
                         (param.target_value * 2 * 8) / 32 + 4096)))

    best = [0.0] * b
    best_q = [0.0] * b
    best_result = [0.0] * b
    opt_qms = [None] * b
    done = [False] * b
    overflow = [False] * b

    # Device-resident loop: every non-trellis default-hook search with a
    # tractable tree (2^passes - 1 candidate matrices) runs all passes in
    # one device program and fetches one small trace — no per-pass host
    # round trips (VERDICT r3 item 2).  Trellis searches keep the
    # per-pass loop (their rate tables evolve with the realized path).
    if use_device_loop:
        from .dichotomy import (build_q_tree, psnr_err_threshold,
                                replay_search_trace)
        from .adaptive import analyse_histo_nodes
        from .params import quant_matrices_for_quality

        tree_q = build_q_tree(param, initial_q, passes)
        base = np.stack([quant_matrices_for_quality(q)
                         for q in tree_q]).astype(np.int64)   # [K, 2, 64]
        minq_arr = np.stack([min_qmats[0], min_qmats[1]]).astype(np.int64)
        clamped = np.maximum(base, minq_arr[None])
        if flags["use_adaptive_quant"]:
            K = clamped.shape[0]
            # groups run serially: the torch fit already saturates the
            # host cores; overlapping them measures slower (GIL +
            # intra-op pool thrash)
            tuned_l = analyse_histo_nodes(
                hl, clamped[:, 0].astype(np.uint8), min_qmats[0],
                param.qdelta_max_luma)
            tuned_c = (analyse_histo_nodes(
                hc, clamped[:, 1].astype(np.uint8), min_qmats[1],
                param.qdelta_max_chroma) if n_groups > 1 else
                np.broadcast_to(clamped[None, :, 1],
                                (b, K, 64)).astype(np.uint8))
            quants_nodes = np.maximum(
                np.stack([tuned_l, tuned_c], axis=2).astype(np.int64),
                minq_arr[None, None]).astype(np.uint8)        # [B,K,2,64]
            per_image_mats = True
        else:
            quants_nodes = clamped.astype(np.uint8)           # [K, 2, 64]
            per_image_mats = False
        tracer.mark("lambda-fit nodes")

        if for_size:
            if flags["optimize_size"]:
                hdr_fixed = header_size_bits_nbsyms(
                    param, layout.nb_comps, [0, 0, 0, 0])
            else:
                hdr_fixed = header_size_bits(param, layout.nb_comps,
                                             defaults)
            thr = int(np.int64(np.floor(8.0 * param.target_value)) + 1)
            thr = min(max(thr, -(2 ** 31)), 2 ** 31 - 1)
            from .dichotomy import (build_q_conv_table,
                                    size_tolerance_range)
            conv_lo, conv_hi = size_tolerance_range(param)
            conv_lo = min(max(conv_lo, -(2 ** 31)), 2 ** 31 - 1)
            conv_hi = min(max(conv_hi, -(2 ** 31)), 2 ** 31 - 1)
            conv_tbl = build_q_conv_table(param, initial_q, passes)
            dcl_def, acl_def = _default_luts_cached()
            combo_dev, words_all = \
                _stage_search_loop_size(
                    prep, jnp.asarray(quants_nodes), jnp.int32(thr),
                    jnp.int32(conv_lo), jnp.int32(conv_hi),
                    jnp.asarray(conv_tbl),
                    dcl_def, acl_def, passes=passes, nb_blocks=nb_blocks,
                    n_images=b, n_groups=n_groups, bucket=bucket,
                    optimize_size=flags["optimize_size"],
                    hdr_fixed_bits=int(hdr_fixed),
                    q_bias=int(param.quantization_bias),
                    per_image_mats=per_image_mats,
                    chroma_wrap=src_kind == "rgb")
            tracer.mark("loop dispatch")
            combo = np.asarray(combo_dev)     # one RPC for all loop
            trace = combo[:, :, 0]            # outputs but the streams
            totals_all_np = combo[:, :, 1]
            desc_all_np = (combo[:, :, 2:] if combo.shape[2] > 2
                           else None)
            tracer.mark("trace fetch")
            best_pass = np.zeros(b, np.int32)
            for i in range(b):
                col = trace[:, i]
                if (col == 0x7FFFFFFF).any():
                    overflow[i] = True
                    continue
                vals = [float(np.float32(int(v) / 8.0)) for v in col]
                decs = [1 if int(v) >= thr else 0 for v in col]
                best_node, ok = replay_search_trace(vals, decs, param,
                                                    hooks[i])
                if not ok:
                    overflow[i] = True
                    continue
                qn = (quants_nodes[i, best_node] if per_image_mats
                      else quants_nodes[best_node])
                opt_qms[i] = [qn[0].copy(), qn[1].copy()]
                best_q[i] = hooks[i].q
                best_result[i] = hooks[i].value
                best_pass[i] = (best_node + 1).bit_length() - 1
            # reuse the winning pass's saved stream + tables: no final
            # re-encode (the reference's FinalPassScan at the best
            # matrices reproduces exactly these bytes)
            tracer.mark("replay")
            bi = np.arange(b)
            totals_np = totals_all_np[best_pass, bi]
            desc_np = (None if desc_all_np is None
                       else desc_all_np[best_pass, bi])
            ok_mask = ((totals_np != 0x7FFFFFFF)
                       & (totals_np <= bucket * 32))
            counts = np.where(ok_mask, (totals_np + 31) // 32, 0)
            offs = np.cumsum(counts) - counts
            cap = min(int(_ladder(max(int(counts.sum()), 1))),
                      b * words_all.shape[2])
            flat = _stage_compact_pick(
                words_all, jnp.asarray(best_pass),
                jnp.asarray(counts.astype(np.int32)), cap)
            tracer.mark("pick dispatch")
            flat_np = _fetch_rows_concurrent(flat[None])[0]
            words_np = [flat_np[offs[i]:offs[i] + counts[i]]
                        for i in range(b)]
            tracer.mark("words fetch")
            out = []
            for i in range(b):
                if overflow[i] or not ok_mask[i]:
                    out.append(_host_fallback_one(src, src_kind, i,
                                                  yuv_mode, param))
                    continue
                qms_i = [spec.finalize_quant_matrix(
                    opt_qms[i][g], min_qmats[g],
                    param.quantization_bias) for g in range(2)]
                if desc_np is not None:
                    from .ops import huffman_device as hd
                    tabs_i = hd.tables_from_flat(desc_np, i, n_groups)
                else:
                    tabs_i = defaults
                scan = _finalize_scan_bytes(words_np[i],
                                            int(totals_np[i]))
                out.append(_assemble_jpeg(layout, param, qms_i, tabs_i,
                                          scan))
            tracer.mark("assemble")
            return out
        else:
            size_img = 64 * n_blocks_img
            E = psnr_err_threshold(param.target_value, size_img)
            zd = 1 if 99.0 > param.target_value else 0
            from .dichotomy import (build_q_conv_table,
                                    psnr_tolerance_range)
            t_lo, t_hi, zero_tol = psnr_tolerance_range(param, size_img)
            conv_tbl = build_q_conv_table(param, initial_q, passes)
            tol_bounds = (jnp.uint32(t_lo >> 32),
                          jnp.uint32(t_lo & 0xFFFFFFFF),
                          jnp.uint32(t_hi >> 32),
                          jnp.uint32(t_hi & 0xFFFFFFFF))
            trace = np.asarray(_stage_search_loop_psnr(
                coeffs, jnp.asarray(quants_nodes),
                jnp.uint32(E >> 32), jnp.uint32(E & 0xFFFFFFFF),
                jnp.int32(zd), tol_bounds, jnp.int32(int(zero_tol)),
                jnp.asarray(conv_tbl), passes=passes, n_images=b,
                q_bias=int(param.quantization_bias),
                per_image_mats=per_image_mats))
            for i in range(b):
                errs = [(int(trace[p, 0, i]) << 32) | int(trace[p, 1, i])
                        for p in range(passes)]
                vals = [get_psnr(e, size_img) for e in errs]
                decs = [(zd if e == 0 else (1 if e <= E else 0))
                        for e in errs]
                best_node, ok = replay_search_trace(vals, decs, param,
                                                    hooks[i])
                if not ok:
                    overflow[i] = True
                    continue
                qn = (quants_nodes[i, best_node] if per_image_mats
                      else quants_nodes[best_node])
                opt_qms[i] = [qn[0].copy(), qn[1].copy()]
                best_q[i] = hooks[i].q
                best_result[i] = hooks[i].value
        passes_range = ()
    else:
        passes_range = range(passes)

    for p in passes_range:
        with ThreadPoolExecutor(max_workers=min(8, b)) as pool:
            per_qms = list(pool.map(make_qms, range(b)))
        iq3, ib3 = stack_quant_arrays(per_qms)

        if for_size:
            if trellis:
                from .ops import huffman_device as hd
                vlc_state, freqs = trellis_eval(iq3, ib3, per_qms,
                                                lens_dev)
                dcl, acl, nbs_dev = hd.luts_from_freqs(
                    jnp.reshape(freqs[0], (b, 2, -1)),
                    jnp.reshape(freqs[1], (b, 2, -1)), n_groups)
                # evolve the per-image trellis rate tables on device
                # (reference InitCodes overlay: only symbols PRESENT in
                # the new table get new lengths); images whose own loop
                # has exited keep their state frozen
                upd = jnp.asarray(np.array(
                    [not (done[i] or overflow[i]) for i in range(b)]
                ))[:, None, None]
                lens_prev_dev = jnp.where(upd, lens_dev, lens_prev_dev)
                new_lens = (acl & 0xFF).astype(jnp.int32)
                lens_dev = jnp.where(upd & (new_lens > 0), new_lens,
                                     lens_dev)
                words, totals = _stage_batch_pack(
                    vlc_state, dcl, acl, n_images=b, bucket=bucket,
                    per_image_tables=True)
            elif flags["optimize_size"]:
                # optimal tables built ON DEVICE: the whole pass is one
                # fused device program (quantize once -> freqs -> merge
                # -> LUTs -> pack) with a single [6, B] fetch — no freqs
                # round trip, no host merge, no LUT upload on the
                # search's critical path
                words, totals, eval6 = _stage_search_pass(
                    coeffs, iq3, ib3, nb_blocks, b, n_groups, bucket)
            else:
                tabs, dcl, acl, per_tabs = build_tables(None)
                words, totals = batched_pack(iq3, ib3, dcl, acl, per_tabs,
                                             bucket)
            # one fetch for (totals, stuffing counts, nb_syms): per-pass
            # evaluation costs a single device round trip (the dev
            # tunnel's ~40 ms RPC latency dominates the search loop)
            if not flags["optimize_size"]:
                ts = np.asarray(_stage_eval_size_batch(words, totals))
                nbs = None
            elif trellis:
                ts = np.asarray(_stage_eval_size_nbs(words, totals,
                                                     nbs_dev))
                nbs = ts[2:6].T
            else:
                ts = np.asarray(eval6)
                nbs = ts[2:6].T
            totals_np, stuffs = ts[0], ts[1]
            results = []
            for i in range(b):
                if (totals_np[i] == 0x7FFFFFFF
                        or totals_np[i] > bucket * 32):
                    overflow[i] = True
                    results.append(None)
                    continue
                if nbs is None:
                    hdr = header_size_bits(param, layout.nb_comps,
                                           tabs[i])
                else:
                    hdr = header_size_bits_nbsyms(
                        param, layout.nb_comps, nbs[i])
                bits = (hdr + int(totals_np[i]) + 8 * int(stuffs[i]))
                results.append(float(np.float32(bits / 8.0)))
        else:
            q3 = jnp.asarray(np.stack(
                [[q["quant"] for q in qms] for qms in per_qms]
            ).astype(np.int32))
            if relay_fused:
                err_hi, err_lo = _stage_batch_qerr_fused(
                    src, iq3, ib3, q3, yuv_mode=yuv_mode, width=w,
                    height=h, n_images=b, src_kind=src_kind)
            else:
                err_hi, err_lo = _stage_batch_qerr(coeffs, iq3, ib3, q3, b)
            err_hi, err_lo = np.asarray(err_hi), np.asarray(err_lo)
            results = [get_psnr((int(err_hi[i]) << 32) | int(err_lo[i]),
                                64 * n_blocks_img) for i in range(b)]

        all_done = True
        for i in range(b):
            if done[i] or overflow[i]:
                continue
            hooks[i].pass_count = p
            result = results[i]
            is_best = p == 0 or abs(result - hooks[i].target) < best[i]
            if trellis:
                last_best[i] = is_best
            if is_best:
                opt_qms[i] = [per_qms[i][0]["quant"].copy(),
                              per_qms[i][1]["quant"].copy()]
                best[i] = abs(result - hooks[i].target)
                best_q[i] = hooks[i].q
                best_result[i] = result
            if hooks[i].update(result):
                done[i] = True
            else:
                all_done = False
        if all_done:
            break

    # final pass: re-quantize every image at its best matrices (tables are
    # a pure function of the matrices, so recomputing reproduces the best
    # pass's bytes exactly)
    final_qms = []
    for i in range(b):
        if overflow[i]:
            final_qms.append(make_qms(i))       # placeholder, unused
            continue
        qms = [spec.finalize_quant_matrix(opt_qms[i][g], min_qmats[g],
                                          param.quantization_bias)
               for g in range(2)]
        final_qms.append(qms)
        hooks[i].q = best_q[i]
        hooks[i].value = best_result[i]
    iq3, ib3 = stack_quant_arrays(final_qms)
    if trellis:
        # per image: best-pass == last-executed-pass reuses that pass's
        # ENTRY rate tables (the reference reuses its stored run-levels,
        # quantized before the pass's table update); otherwise the final
        # StoreRunLevels runs with the loop-exit state
        final_lens = (jnp.where(jnp.asarray(last_best)[:, None, None],
                                lens_prev_dev, lens_dev)
                      if for_size else lens_dev)
        vlc_state, freqs = trellis_eval(iq3, ib3, final_qms, final_lens)
        tabs, dcl, acl, per_tabs = build_tables(freqs)
        words, totals = _stage_batch_pack(
            vlc_state, dcl, acl, n_images=b, bucket=bucket,
            per_image_tables=per_tabs)
    else:
        freqs = batched_freqs(iq3, ib3)
        tabs, dcl, acl, per_tabs = build_tables(freqs)
        words, totals = batched_pack(iq3, ib3, dcl, acl, per_tabs, bucket)
    totals_np = np.asarray(totals)
    ok = (totals_np != 0x7FFFFFFF) & (totals_np <= bucket * 32)
    words_np = fetch_streams_batch(words, np.where(ok, totals_np, 0))

    out = []
    for i in range(b):
        total_bits = int(totals_np[i])
        if overflow[i] or total_bits == 0x7FFFFFFF \
                or total_bits > bucket * 32:
            # rare: this image's streams outgrew the batch bucket at some
            # pass — run the standard single-image search for it on the
            # host (see _host_fallback_one)
            out.append(_host_fallback_one(src, src_kind, i, yuv_mode,
                                          param))
            continue
        scan = _finalize_scan_bytes(words_np[i], total_bits)
        out.append(_assemble_jpeg(layout, param, final_qms[i], tabs[i],
                                  scan))
    return out


def _encode_search_device(coeffs, histos, layout, param: EncoderParam):
    """Target-size / target-PSNR dichotomy over device-resident coeffs.

    Mirrors dichotomy.loop_scan (and the reference LoopScan) with the
    per-pass quantize/size/PSNR evaluation on device; table builds and the
    bisection control stay on host.  Byte-identical to the host path.

    Methods 7/8 (trellis) run the device trellis per pass with the rate
    model the reference uses: the tables active *before* this pass's
    Huffman optimization — K.3 defaults on pass 0, then each size pass's
    optimized tables feed the next pass's trellis (InitCodes(true) in
    StoreRunLevels, src/dichotomy.cc:83-85,144).
    """
    from .dichotomy import header_size_bits, header_size_bits_nbsyms
    from .params import SearchHook
    from .tools import estimate_quality

    flags = method_flags(param.method)
    min_qmats = param.resolved_min_quant_matrices()
    hook = param.search_hook or SearchHook()
    initial_q = min(max(estimate_quality(
        param.resolved_quant_matrices()[0]), 0.0), 100.0)
    hook.setup(param, initial_q)

    defaults = k3_default_tables()
    tables = list(defaults)
    n_groups = 2 if layout.nb_comps > 1 else 1
    nb_blocks = tuple(layout.nb_blocks)
    histos_np = (None if histos is None else
                 [np.asarray(histos[0]).astype(np.int64).reshape(64, -1),
                  np.asarray(histos[1]).astype(np.int64).reshape(64, -1)])

    best = 0.0
    best_q = 0.0
    best_result = 0.0
    last_is_best = False
    opt_quants = None
    passes = min(max(param.passes, 1), 20)
    state = None
    cost_lens = _trellis_cost_lens() if flags["use_trellis"] else None

    def make_qms():
        qmats = np.stack([hook.next_matrices()[c] for c in range(2)])
        qms = [spec.finalize_quant_matrix(qmats[g], min_qmats[g],
                                          param.quantization_bias)
               for g in range(2)]
        if flags["use_adaptive_quant"]:
            for g in range(n_groups - 1, -1, -1):
                qdelta_max = (param.qdelta_max_luma if g == 0
                              else param.qdelta_max_chroma)
                tuned = analyse_histo(histos_np[g], qms[g]["quant"],
                                      min_qmats[g], qdelta_max)
                qms[g] = spec.finalize_quant_matrix(
                    tuned, min_qmats[g], param.quantization_bias)
        return qms

    def quantize_stage(qms, iq, ib, with_stats):
        if flags["use_trellis"]:
            qq = jnp.asarray(np.stack(
                [qms[0]["quant"], qms[1]["quant"]]).astype(np.int32))
            return _stage_quantize_trellis(
                coeffs, iq, ib, qq, cost_lens, with_stats=with_stats,
                nb_blocks=nb_blocks)
        return _stage_quantize(coeffs, iq, ib, with_stats=with_stats,
                               nb_blocks=nb_blocks)

    for p in range(passes):
        hook.pass_count = p
        qms = make_qms()
        iq, ib = _quant_device_arrays(qms)

        if hook.for_size:
            vlc_state, freqs = quantize_stage(
                qms, iq, ib, with_stats=flags["optimize_size"])
            if flags["optimize_size"]:
                # optimal tables built ON DEVICE (ops.huffman_device):
                # the pass runs freqs -> merge -> LUTs -> pack as one
                # dispatch chain with a single (total, stuffing,
                # nb_syms) fetch; the winning pass's frequencies are
                # kept device-resident and fetched once at the end for
                # the DHT emission tables
                from .ops import huffman_device as hd
                dcl1, acl1, nbs_dev = hd.luts_from_freqs(
                    jnp.reshape(freqs[0], (1, 2, -1)),
                    jnp.reshape(freqs[1], (1, 2, -1)), n_groups)
                dc_luts, ac_luts = dcl1[0], acl1[0]
                if flags["use_trellis"]:
                    new_lens = (ac_luts & 0xFF).astype(jnp.int32)
                    cost_lens = jnp.where(new_lens > 0, new_lens,
                                          cost_lens)
            else:
                nbs_dev = None
                dc_luts, ac_luts = _device_luts(tables)
            # The per-pass size must match the reference's BitCounter
            # (src/bit_writer.h:157-168, dichotomy.cc:263-270) bit-exactly —
            # it counts 0xFF stuffing bytes, and the float size feeds the
            # best-pass comparison — so a count-only (no-pack) evaluation
            # would change dichotomy decisions.  Packing + counting 0xFF
            # bytes is the device equivalent of the reference's O(blocks)
            # BlocksSize replay.
            words, total = _stage_pack(vlc_state, dc_luts, ac_luts)
            if nbs_dev is None:
                stuff = int(_stage_count_stuffing(words, total))
                hdr = header_size_bits(param, layout.nb_comps, tables)
                bits = hdr + int(total) + 8 * stuff
            else:
                ts = np.asarray(_stage_eval_size_one(words, total,
                                                     nbs_dev))
                hdr = header_size_bits_nbsyms(param, layout.nb_comps,
                                              ts[2:6])
                bits = hdr + int(ts[0]) + 8 * int(ts[1])
            result = float(np.float32(bits / 8.0))
            state = (words, total, freqs, qms)
        else:
            quant = jnp.asarray(np.stack([qms[0]["quant"],
                                          qms[1]["quant"]]).astype(np.int32))
            err_hi, err_lo = _stage_quant_error(coeffs, iq, ib, quant)
            err = (int(err_hi) << 32) | int(err_lo)
            from .dichotomy import get_psnr
            n_blocks = sum(int(co.shape[0]) for co in coeffs)
            result = get_psnr(err, 64 * n_blocks)

        last_is_best = p == 0 or abs(result - hook.target) < best
        if last_is_best:
            opt_quants = [qms[0]["quant"].copy(), qms[1]["quant"].copy()]
            best = abs(result - hook.target)
            best_q = hook.q
            best_result = result
        if hook.update(result):
            break

    qms = [spec.finalize_quant_matrix(opt_quants[g], min_qmats[g],
                                      param.quantization_bias)
           for g in range(2)]
    hook.q = best_q
    hook.value = best_result

    if not hook.for_size or not last_is_best:
        iq, ib = _quant_device_arrays(qms)
        vlc_state, freqs = quantize_stage(
            qms, iq, ib, with_stats=flags["optimize_size"])
        if flags["optimize_size"]:
            tables = optimal_tables_from_freqs(
                np.asarray(freqs[0]).astype(np.int64),
                np.asarray(freqs[1]).astype(np.int64), n_groups)
            if n_groups == 1:
                tables[1], tables[3] = defaults[1], defaults[3]
        dc_luts, ac_luts = _device_luts(tables)
        words, total = _stage_pack(vlc_state, dc_luts, ac_luts)
    else:
        words, total, freqs_best, qms_used = state
        qms = qms_used
        if flags["optimize_size"]:
            # one end-of-search fetch of the winning pass's frequencies
            # rebuilds the emission tables (device LUTs already packed
            # the scan with the identical codes)
            tables = optimal_tables_from_freqs(
                np.asarray(freqs_best[0]).astype(np.int64),
                np.asarray(freqs_best[1]).astype(np.int64), n_groups)
            if n_groups == 1:
                tables[1], tables[3] = defaults[1], defaults[3]

    scan = _finalize_scan_bytes(words, int(total))
    return _assemble_jpeg(layout, param, qms, tables, scan)


@jax.jit
def _stage_quant_error(coeffs, iquant, ibias, quant):
    """Summed squared quantization error over all components (PSNR search).

    Exact uint64 accumulation without x64: per-block int32 sums folded
    with carry propagation (reference src/enc.cc:851-863 uses uint64;
    float32/int32 accumulators diverge from it on large images)."""
    hi = lo = jnp.uint32(0)
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        per_block = quantize.quantize_error(coef, iquant[g], ibias[g],
                                            quant[g])
        hi, lo = quantize.sum_u64(per_block, hi, lo)
    return hi, lo


# ---------------------------------------------------------------------------
# Host-side assembly
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _default_luts_cached():
    return _device_luts(k3_default_tables())


def _host_luts(tables):
    """HuffmanTable[4] -> ([2, 16], [2, 256]) uint32 host LUTs."""
    dc = np.zeros((2, 16), dtype=np.uint32)
    ac = np.zeros((2, 256), dtype=np.uint32)
    for g in range(2):
        if tables[g] is not None:
            dc[g] = build_code_lut(tables[g], 16)
        if tables[2 + g] is not None:
            ac[g] = build_code_lut(tables[2 + g], 256)
    return dc, ac


def _device_luts(tables):
    """HuffmanTable[4] -> ([2, 16], [2, 256]) uint32 device-ready LUTs."""
    dc, ac = _host_luts(tables)
    return jnp.asarray(dc), jnp.asarray(ac)


def _quant_device_arrays(qms):
    iq = np.stack([qms[0]["iquant"], qms[1]["iquant"]]).astype(np.int32)
    ib = np.stack([qms[0]["bias"], qms[1]["bias"]]).astype(np.int32)
    return jnp.asarray(iq), jnp.asarray(ib)


def _finalize_scan_bytes(words, total_bits: int) -> bytes:
    """Device word stream -> stuffed entropy-coded byte segment."""
    if isinstance(words, np.ndarray):
        w = words[: (total_bits + 31) // 32]
    else:
        w = fetch_stream(words, total_bits)
    from . import native
    return native.words_to_scan(w, total_bits)


def _encode_blocks_device(get_coeffs, layout, param: EncoderParam) -> bytes:
    flags = method_flags(param.method)
    if param.passes > 1:
        coeffs, histos = get_coeffs(flags["use_adaptive_quant"])
        return _encode_search_device(coeffs, histos, layout, param)

    qmats = param.resolved_quant_matrices().copy()
    min_qmats = param.resolved_min_quant_matrices()
    coeffs, histos = get_coeffs(flags["use_adaptive_quant"])

    qms = [spec.finalize_quant_matrix(qmats[i], min_qmats[i],
                                      param.quantization_bias)
           for i in range(2)]

    if flags["use_adaptive_quant"]:
        histo_l = np.asarray(histos[0]).reshape(64, -1)
        histo_c = np.asarray(histos[1]).reshape(64, -1)
        n_groups = 2 if layout.nb_comps > 1 else 1
        group_histos = [histo_l, histo_c]
        for g in range(n_groups - 1, -1, -1):
            qdelta_max = (param.qdelta_max_luma if g == 0
                          else param.qdelta_max_chroma)
            tuned = analyse_histo(group_histos[g].astype(np.int64),
                                  qms[g]["quant"], min_qmats[g], qdelta_max)
            qms[g] = spec.finalize_quant_matrix(tuned, min_qmats[g],
                                                param.quantization_bias)

    iq, ib = _quant_device_arrays(qms)
    if flags["use_trellis"]:
        qq = jnp.asarray(np.stack([qms[0]["quant"], qms[1]["quant"]])
                         .astype(np.int32))
        vlc_state, freqs = _stage_quantize_trellis(
            coeffs, iq, ib, qq, _trellis_cost_lens(),
            with_stats=flags["optimize_size"],
            nb_blocks=tuple(layout.nb_blocks))
    else:
        vlc_state, freqs = _stage_quantize(
            coeffs, iq, ib, with_stats=flags["optimize_size"],
            nb_blocks=tuple(layout.nb_blocks))

    if flags["optimize_size"]:
        freq_dc = np.asarray(freqs[0]).astype(np.int64)
        freq_ac = np.asarray(freqs[1]).astype(np.int64)
        n_groups = 2 if layout.nb_comps > 1 else 1
        tables = optimal_tables_from_freqs(freq_dc, freq_ac, n_groups)
        if n_groups == 1:
            defaults = k3_default_tables()
            tables[1], tables[3] = defaults[1], defaults[3]
    else:
        tables = k3_default_tables()

    dc_luts, ac_luts = _device_luts(tables)
    words, total = _stage_pack(vlc_state, dc_luts, ac_luts)
    scan = _finalize_scan_bytes(words, int(total))
    return _assemble_jpeg(layout, param, qms, tables, scan)


def _assemble_jpeg(layout, param, qms, tables, scan: bytes) -> bytes:
    out = bytearray()
    out += headers.write_app0()
    out += headers.write_app_markers(param.app_markers)
    out += headers.write_exif(param.exif)
    out += headers.write_iccp(param.iccp)
    out += headers.write_xmp(param.xmp, param.xmp_split_point)
    out += headers.write_dqt([qms[0]["quant"], qms[1]["quant"]],
                             layout.yuv_mode)
    out += headers.write_sof0(layout.width, layout.height, layout.nb_comps,
                              layout.block_dims, layout.quant_idx)
    out += headers.write_dht(tables, layout.nb_comps)
    out += headers.write_sos(layout.nb_comps, layout.quant_idx)
    out += scan
    out += headers.EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Public device entry points
# ---------------------------------------------------------------------------

def encode_rgb(rgb: np.ndarray, param: Optional[EncoderParam] = None) -> bytes:
    """Encode an RGB uint8 image on the accelerator."""
    param = param or EncoderParam()
    h, w = rgb.shape[:2]
    assert 0 < w <= C.MAX_DIMENSION and 0 < h <= C.MAX_DIMENSION
    yuv_mode = param.yuv_mode
    dev_rgb = jnp.asarray(rgb)
    if yuv_mode == C.YUV_AUTO:
        from . import riskiness as host_risk
        if host_risk.exact_table_active():
            yuv_mode, _ = host_risk.riskiness(np.asarray(rgb))
        else:
            # riskiness reduction on the device copy (ops/riskiness.py);
            # only three scalars come back to pick the mode
            from .ops.riskiness import riskiness_device
            yuv_mode, _ = riskiness_device(dev_rgb)
    if yuv_mode == C.YUV_SHARP:
        # device-resident sharp conversion (plane-exact vs the host
        # oracle); the planes feed encode_yuv without leaving the chip
        from .sharp_yuv_device import sharp_rgb_to_yuv420_device
        y, u, v = sharp_rgb_to_yuv420_device(dev_rgb)
        return encode_yuv(y, u, v, is_420=True, param=param)
    layout = pipeline.component_layout(yuv_mode, w, h)

    flags = method_flags(param.method)
    searching = param.passes > 1 and param.target_mode != TARGET_NONE
    if (not flags["use_adaptive_quant"] and not flags["optimize_size"]
            and not searching):
        # fixed-table fast path: one fused device dispatch
        qmats = param.resolved_quant_matrices()
        min_qmats = param.resolved_min_quant_matrices()
        qms = [spec.finalize_quant_matrix(qmats[i], min_qmats[i],
                                          param.quantization_bias)
               for i in range(2)]
        tables = k3_default_tables()
        iq, ib = _quant_device_arrays(qms)
        dc_luts, ac_luts = _default_luts_cached()
        words, total = encode_core(dev_rgb, iq, ib, dc_luts, ac_luts,
                                   yuv_mode=yuv_mode, width=w, height=h,
                                   nb_blocks=tuple(layout.nb_blocks))
        scan = _finalize_scan_bytes(words, int(total))
        return _assemble_jpeg(layout, param, qms, tables, scan)

    def get_coeffs(with_histo):
        return _stage_coeffs(dev_rgb, yuv_mode=yuv_mode, width=w, height=h,
                             with_histo=with_histo)

    return _encode_blocks_device(get_coeffs, layout, param)


def encode_gray(gray: np.ndarray,
                param: Optional[EncoderParam] = None) -> bytes:
    param = param or EncoderParam()
    h, w = gray.shape
    layout = pipeline.component_layout(C.YUV_400, w, h)
    dev = (jnp.asarray(gray),)

    def get_coeffs(with_histo):
        return _stage_coeffs_planes(dev, yuv_mode=C.YUV_400, width=w,
                                    height=h, with_histo=with_histo)

    return _encode_blocks_device(get_coeffs, layout, param)


def encode_yuv(y, u, v, is_420: bool,
               param: Optional[EncoderParam] = None) -> bytes:
    param = param or EncoderParam()
    h, w = y.shape
    mode = C.YUV_420 if is_420 else C.YUV_444
    layout = pipeline.component_layout(mode, w, h)
    dev = (jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))

    def get_coeffs(with_histo):
        return _stage_coeffs_planes(dev, yuv_mode=mode, width=w, height=h,
                                    with_histo=with_histo)

    return _encode_blocks_device(get_coeffs, layout, param)
