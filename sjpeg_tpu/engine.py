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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from . import headers, pipeline, spec
from .adaptive import analyse_histo
from .bitio import stuff_bytes
from .huffman import (build_code_lut, k3_default_tables,
                      optimal_tables_from_freqs)
from .ops import colorspace, fdct, pack, quantize, vlc
from .params import EncoderParam, method_flags


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
    return coeffs, (histo_l, histo_c)


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
    return coeffs, (histo_l, histo_c)


@functools.partial(jax.jit, static_argnames=("with_stats",))
def _stage_quantize(coeffs, iquant, ibias, with_stats: bool):
    """Quantize all components and derive VLC fields.

    `iquant`/`ibias`: [2, 64] int32 device arrays (luma/chroma groups).
    Returns per-component (rl dict, dc_codes) and optional per-group
    frequency arrays.
    """
    nb = len(coeffs)
    out_rl, out_dc = [], []
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        qb = quantize.quantize_blocks(coef, iquant[g], ibias[g])
        rl = vlc.run_levels(qb)
        dc = vlc.dc_diff_codes(qb[:, 0])
        out_rl.append(rl)
        out_dc.append(dc)
    if not with_stats:
        return out_rl, out_dc, None
    freq_dc = jnp.zeros((2, 12), dtype=jnp.int32)
    freq_ac = jnp.zeros((2, 256), dtype=jnp.int32)
    for c in range(nb):
        g = 0 if c == 0 else 1
        fdc, fac = vlc.entropy_stats(out_rl[c], out_dc[c])
        freq_dc = freq_dc.at[g].add(fdc)
        freq_ac = freq_ac.at[g].add(fac)
    return out_rl, out_dc, (freq_dc, freq_ac)


@functools.partial(jax.jit, static_argnames=("nb_blocks",))
def _stage_pack(rls, dcs, dc_luts, ac_luts, nb_blocks):
    """VLC fields + Huffman LUTs -> compact bit stream (+ total bits)."""
    comp_vals, comp_lens = [], []
    for c, (rl, dc) in enumerate(zip(rls, dcs)):
        g = 0 if c == 0 else 1
        v, l = vlc.block_entries(rl, dc, dc_luts[g], ac_luts[g])
        comp_vals.append(v)
        comp_lens.append(l)
    vals, lens = pack.interleave_components(comp_vals, comp_lens, nb_blocks)
    words, bit_lens = pack.pack_block_entries(vals, lens)
    return pack.concat_block_streams(words, bit_lens)


@jax.jit
def _stage_size_bits(rls, dcs, dc_luts, ac_luts):
    """Total entropy bit count without packing (for size-target search)."""
    total = jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0)
    for c, (rl, dc) in enumerate(zip(rls, dcs)):
        g = 0 if c == 0 else 1
        _, lens = vlc.block_entries(rl, dc, dc_luts[g], ac_luts[g])
        total = total + jnp.sum(lens)
    return total


@jax.jit
def _stage_quant_error(coeffs, iquant, ibias, quant):
    """Summed squared quantization error per group pair (PSNR search)."""
    err = jnp.int64(0) if jax.config.jax_enable_x64 else jnp.float32(0)
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        err = err + quantize.quantize_error(coef, iquant[g], ibias[g],
                                            quant[g]).astype(err.dtype)
    return err


# ---------------------------------------------------------------------------
# Host-side assembly
# ---------------------------------------------------------------------------

def _device_luts(tables):
    """HuffmanTable[4] -> ([2, 16], [2, 256]) uint32 device-ready LUTs."""
    dc = np.zeros((2, 16), dtype=np.uint32)
    ac = np.zeros((2, 256), dtype=np.uint32)
    for g in range(2):
        if tables[g] is not None:
            dc[g] = build_code_lut(tables[g], 16)
        if tables[2 + g] is not None:
            ac[g] = build_code_lut(tables[2 + g], 256)
    return jnp.asarray(dc), jnp.asarray(ac)


def _quant_device_arrays(qms):
    iq = np.stack([qms[0]["iquant"], qms[1]["iquant"]]).astype(np.int32)
    ib = np.stack([qms[0]["bias"], qms[1]["bias"]]).astype(np.int32)
    return jnp.asarray(iq), jnp.asarray(ib)


def _finalize_scan_bytes(words, total_bits: int) -> bytes:
    """Device word stream -> stuffed entropy-coded byte segment."""
    n_words = (total_bits + 31) // 32
    w = np.asarray(words[:n_words])
    raw = w.astype(">u4").view(np.uint8)
    n_bytes = (total_bits + 7) // 8
    raw = np.array(raw[:n_bytes])
    pad = (-total_bits) % 8
    if pad:
        raw[-1] |= (1 << pad) - 1     # flush-with-1s padding
    return stuff_bytes(raw)


def _encode_blocks_device(get_coeffs, layout, param: EncoderParam) -> bytes:
    flags = method_flags(param.method)
    if flags["use_trellis"]:
        raise NotImplementedError("trellis path lands with M5")

    qmats = param.resolved_quant_matrices().copy()
    min_qmats = param.resolved_min_quant_matrices()
    coeffs, histos = get_coeffs(flags["use_adaptive_quant"])

    qms = [spec.finalize_quant_matrix(qmats[i], min_qmats[i],
                                      param.quantization_bias)
           for i in range(2)]

    if flags["use_adaptive_quant"]:
        histo_l, histo_c = np.asarray(histos[0]), np.asarray(histos[1])
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
    rls, dcs, freqs = _stage_quantize(coeffs, iq, ib,
                                      with_stats=flags["optimize_size"])

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
    words, total = _stage_pack(rls, dcs, dc_luts, ac_luts,
                               nb_blocks=tuple(layout.nb_blocks))
    total_bits = int(total)
    scan = _finalize_scan_bytes(words, total_bits)

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
    if yuv_mode == C.YUV_AUTO:
        from .riskiness import auto_yuv_mode
        yuv_mode = auto_yuv_mode(rgb)
    if yuv_mode == C.YUV_SHARP:
        from .sharp_yuv import sharp_rgb_to_yuv420
        y, u, v = sharp_rgb_to_yuv420(rgb)
        return encode_yuv(y, u, v, is_420=True, param=param)
    layout = pipeline.component_layout(yuv_mode, w, h)
    dev_rgb = jnp.asarray(rgb)

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
