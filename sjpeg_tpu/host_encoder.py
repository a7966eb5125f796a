"""Host (NumPy) encoder: the integer-exact fallback / golden path.

Runs the full pipeline of `sjpeg_tpu.spec` serially on the host.  It exists
to (a) pin down the exact semantics the TPU engine must reproduce, (b) serve
as a CPU fallback when no accelerator is present, and (c) drive tests that
compare byte-for-byte against the reference encoder binary.

Pipeline (reference call stack: src/enc.cc:1585-1641):
  components -> fDCT -> [adaptive quant] -> quantize -> [two-pass Huffman]
  -> VLC pack -> markers.
"""

from typing import Optional

import numpy as np

from . import constants as C
from . import headers, pipeline, spec
from .adaptive import analyse_histo
from .bitio import BitWriter
from .huffman import (build_code_lut, k3_default_tables,
                      optimal_tables_from_freqs)
from .params import EncoderParam, method_flags


def _compute_coeffs(comp_blocks):
    return [spec.fdct_blocks(b) for b in comp_blocks]


def _group_histograms(coeffs, layout):
    """Per quant-group (luma/chroma) coefficient histograms."""
    histos = [np.zeros((64, C.MAX_HISTO_DCT_COEFF), dtype=np.int64)
              for _ in range(2)]
    for c in range(layout.nb_comps):
        histos[layout.quant_idx[c]] += spec.store_histo(coeffs[c])
    return histos


def encode_components(comp_blocks, layout, param: EncoderParam) -> bytes:
    """Encode already-converted component blocks into a full JPEG stream."""
    flags = method_flags(param.method)
    qmats = param.resolved_quant_matrices().copy()
    min_qmats = param.resolved_min_quant_matrices()
    coeffs = _compute_coeffs(comp_blocks)

    if param.passes > 1:
        from .dichotomy import loop_scan
        histos = (_group_histograms(coeffs, layout)
                  if flags["use_adaptive_quant"] else None)
        qms, tables, comp_rl, comp_dc, _hook = loop_scan(
            coeffs, histos, layout, param)
        return _emit(layout, param, qms, tables, comp_rl, comp_dc)

    qms = [spec.finalize_quant_matrix(qmats[i], min_qmats[i],
                                      param.quantization_bias)
           for i in range(2)]

    if flags["use_adaptive_quant"]:
        histos = _group_histograms(coeffs, layout)
        n_groups = 2 if layout.nb_comps > 1 else 1
        for g in range(n_groups - 1, -1, -1):
            qdelta_max = (param.qdelta_max_luma if g == 0
                          else param.qdelta_max_chroma)
            tuned = analyse_histo(histos[g], qms[g]["quant"], min_qmats[g],
                                  qdelta_max)
            qms[g] = spec.finalize_quant_matrix(tuned, min_qmats[g],
                                                param.quantization_bias)

    if flags["use_trellis"]:
        # rate costs come from the tables active *before* optimization
        # (the K.3 defaults on a single pass; src/enc.cc:1528)
        defaults = k3_default_tables()
        cost_luts = [build_code_lut(defaults[2], 256),
                     build_code_lut(defaults[3], 256)]
        qblocks = [spec.trellis_quantize_blocks(
            coeffs[c], qms[layout.quant_idx[c]],
            qms[layout.quant_idx[c]]["quant"],
            cost_luts[layout.quant_idx[c]])
            for c in range(layout.nb_comps)]
    else:
        qblocks = [spec.quantize_blocks(coeffs[c], qms[layout.quant_idx[c]])
                   for c in range(layout.nb_comps)]
    comp_rl = [spec.block_run_levels(qb) for qb in qblocks]
    comp_dc = [spec.dc_diff_codes(qb[:, 0]) for qb in qblocks]

    if flags["optimize_size"]:
        n_groups = 2 if layout.nb_comps > 1 else 1
        freq_dc = np.zeros((2, 12), dtype=np.int64)
        freq_ac = np.zeros((2, 256), dtype=np.int64)
        for c in range(layout.nb_comps):
            fdc, fac = spec.entropy_stats(comp_rl[c], comp_dc[c])
            freq_dc[layout.quant_idx[c]] += fdc
            freq_ac[layout.quant_idx[c]] += fac
        tables = optimal_tables_from_freqs(freq_dc, freq_ac, n_groups)
        if n_groups == 1:
            defaults = k3_default_tables()
            tables[1], tables[3] = defaults[1], defaults[3]
    else:
        tables = k3_default_tables()

    return _emit(layout, param, qms, tables, comp_rl, comp_dc)


def _emit(layout, param, qms, tables, comp_rl, comp_dc) -> bytes:
    dc_luts = [build_code_lut(tables[0], 16),
               build_code_lut(tables[1], 16) if tables[1] is not None else None]
    ac_luts = [build_code_lut(tables[2], 256),
               build_code_lut(tables[3], 256) if tables[3] is not None else None]

    # ---- assemble ----
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

    writer = BitWriter()
    order = pipeline.scan_order(layout)
    spec.code_scan(writer, order, comp_rl, comp_dc, layout.quant_idx,
                   dc_luts, ac_luts)
    writer.flush()
    out += writer.get_bytes()
    out += headers.EOI
    return bytes(out)


def encode_rgb(rgb: np.ndarray, param: Optional[EncoderParam] = None) -> bytes:
    """Encode an RGB image ([H, W, 3] uint8) to a baseline JPEG stream."""
    param = param or EncoderParam()
    h, w = rgb.shape[:2]
    assert 0 < w <= C.MAX_DIMENSION and 0 < h <= C.MAX_DIMENSION
    yuv_mode = param.yuv_mode
    if yuv_mode == C.YUV_AUTO:
        from .riskiness import auto_yuv_mode
        yuv_mode = auto_yuv_mode(rgb)
    if yuv_mode == C.YUV_SHARP:
        from .sharp_yuv import sharp_rgb_to_yuv420
        layout = pipeline.component_layout(C.YUV_420, w, h)
        y, u, v = sharp_rgb_to_yuv420(rgb)
        blocks = pipeline.yuv_planes_to_component_blocks(y, u, v, layout)
    else:
        layout = pipeline.component_layout(yuv_mode, w, h)
        blocks = pipeline.rgb_to_component_blocks(rgb, layout)
    return encode_components(blocks, layout, param)


def encode_gray(gray: np.ndarray,
                param: Optional[EncoderParam] = None) -> bytes:
    """Encode a grayscale plane ([H, W] uint8) as YUV 4:0:0."""
    param = param or EncoderParam()
    h, w = gray.shape
    layout = pipeline.component_layout(C.YUV_400, w, h)
    blocks = pipeline.gray_to_component_blocks(gray, layout)
    return encode_components(blocks, layout, param)


def encode_yuv(y: np.ndarray, u: np.ndarray, v: np.ndarray, is_420: bool,
               param: Optional[EncoderParam] = None) -> bytes:
    """Encode planar YUV input (4:2:0 when `is_420`, else 4:4:4)."""
    param = param or EncoderParam()
    h, w = y.shape
    mode = C.YUV_420 if is_420 else C.YUV_444
    layout = pipeline.component_layout(mode, w, h)
    blocks = pipeline.yuv_planes_to_component_blocks(y, u, v, layout)
    return encode_components(blocks, layout, param)


def encode_nv12(y: np.ndarray, uv: np.ndarray,
                param: Optional[EncoderParam] = None) -> bytes:
    """Encode semi-planar NV12 input: y [H, W], uv [ceil(H/2), ceil(W/2), 2]
    with interleaved U/V samples."""
    return encode_yuv(y, uv[..., 0], uv[..., 1], is_420=True, param=param)


def encode_nv21(y: np.ndarray, vu: np.ndarray,
                param: Optional[EncoderParam] = None) -> bytes:
    """Encode semi-planar NV21 input (V/U interleaved chroma)."""
    return encode_yuv(y, vu[..., 1], vu[..., 0], is_420=True, param=param)
