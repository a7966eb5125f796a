"""Target-size / target-PSNR search (the dichotomy loop).

Per pass: rescale the quant matrices for the hook's quality (plus adaptive
tuning), re-quantize the *cached* fDCT coefficients, and evaluate either the
exact output size (header model + entropy bit count incl. 0xFF stuffing) or
the quantization-error PSNR; the hook bisects the quality bracket.  The best
matrices over all passes win.  Behavioral contract: reference
src/dichotomy.cc:106-295 (LoopScan, HeaderSize, BlocksSize, ComputeSize,
ComputePSNR) and the SearchHook protocol (src/sjpeg.h:339-357).

Coefficients are computed once and stay cached (on device for the TPU path)
— passes replay quantization + bit counting only, the same memoization the
reference implements with use_extra_memory_/reuse_run_levels_.
"""

import math
from typing import List, Optional

import numpy as np

from . import constants as C
from . import spec
from .huffman import (HuffmanTable, build_code_lut, k3_default_tables,
                      overlay_code_lut,
                      optimal_tables_from_freqs)
from .params import EncoderParam, SearchHook, method_flags, \
    quant_matrices_for_quality
from .tools import estimate_quality


def header_size_bits(param: EncoderParam, nb_comps: int,
                     tables: List[HuffmanTable]) -> int:
    """The reference's header-size model (src/dichotomy.cc:197-228), bits."""
    return header_size_bits_nbsyms(
        param, nb_comps, [t.nb_syms if t is not None else 0
                          for t in tables])


def header_size_bits_nbsyms(param: EncoderParam, nb_comps: int,
                            nb_syms4) -> int:
    """header_size_bits from the four tables' symbol counts alone
    (order [dc_luma, dc_chroma, ac_luma, ac_chroma]) — the form a
    device-built table pass reports without materializing tables."""
    size = 20                                # APP0
    size += len(param.app_markers)
    if param.exif:
        size += 8 + len(param.exif)
    if param.iccp:
        chunk_max = 0xFFFF - 12 - 4
        num_chunks = (len(param.iccp) - 1) // chunk_max + 1
        size += num_chunks * (12 + 4 + 2) + len(param.iccp)
    if param.xmp:
        size += 2 + 2 + 29 + len(param.xmp)
        if len(param.xmp) > 65533:
            size += (len(param.xmp) // 65458 + 1) * 40
    size += 2 * 65 + 2 + 2                   # DQT
    size += 8 + 3 * nb_comps + 2             # SOF
    size += 6 + 2 * nb_comps + 2             # SOS
    size += 2                                # EOI
    for c in range(1 if nb_comps == 1 else 2):
        for type_ in range(2):
            size += 2 + 3 + 16 + int(nb_syms4[type_ * 2 + c])
    return size * 8


def scan_bits_with_stuffing(comp_rl, comp_dc, layout, dc_luts, ac_luts,
                            order) -> int:
    """Exact entropy-scan bit count incl. byte stuffing (BitCounter model:
    every completed 0xFF byte adds 8 stuffing bits; the trailing partial
    byte never counts)."""
    from .bitio import BitWriter
    w = BitWriter()
    spec.code_scan(w, order, comp_rl, comp_dc, layout.quant_idx,
                   dc_luts, ac_luts)
    # BitWriter.bit_count already includes the stuffed zero bytes, matching
    # the BitCounter model (raw bits + 8 per completed 0xFF byte).
    return w.bit_count


def get_psnr(err: int, size: int) -> float:
    """float32 PSNR formula, written exactly like the reference."""
    if err > 0 and size > 0:
        return float(np.float32(4.3429448 * math.log(
            size / (err / 255.0 / 255.0))))
    return 99.0


def build_q_tree(param: EncoderParam, initial_q: float, passes: int):
    """Enumerate every quality the default bisection hook can visit.

    The hook's pass-p quality depends only on the sequence of
    (value > target) decisions taken so far, so the candidate qualities
    form a binary tree: node index 2^p - 1 + path, where path accumulates
    decision bits (1 = value > target, i.e. qmax <- q).  Returns a
    [2^passes - 1] float64 array of node qualities, computed with the
    exact SearchHook arithmetic (src/dichotomy.cc:34-74) so a
    device-resident loop can pre-tabulate every pass's matrices.
    """
    qmin0 = max(param.qmin, 0.0)
    qmax0 = (100.0 if param.qmax > 100 else
             param.qmin if param.qmax < param.qmin else param.qmax)
    q0 = min(max(initial_q, qmin0), qmax0)
    nodes = [(qmin0, qmax0, q0)]
    for p in range(1, passes):
        base = (1 << (p - 1)) - 1
        for path in range(1 << p):
            qmin, qmax, q = nodes[base + (path >> 1)]
            if path & 1:
                qmax = q
            else:
                qmin = q
            nodes.append((qmin, qmax, (qmin + qmax) / 2.0))
    return np.asarray([n[2] for n in nodes], dtype=np.float64)


def build_q_conv_table(param: EncoderParam, initial_q: float,
                       passes: int) -> np.ndarray:
    """[2^passes - 1, 2] int32: does the default hook's bracket update
    converge (|new_q - q| < 0.15, src/dichotomy.cc:66-69) after taking
    decision d at each tree node?  Pure f64 replica of the SearchHook
    arithmetic, so a device loop can stop exactly when the host hook
    would."""
    qmin0 = max(param.qmin, 0.0)
    qmax0 = (100.0 if param.qmax > 100 else
             param.qmin if param.qmax < param.qmin else param.qmax)
    q0 = min(max(initial_q, qmin0), qmax0)
    nodes = [(qmin0, qmax0, q0)]
    for p in range(1, passes):
        base = (1 << (p - 1)) - 1
        for path in range(1 << p):
            qmin, qmax, q = nodes[base + (path >> 1)]
            if path & 1:
                qmax = q
            else:
                qmin = q
            nodes.append((qmin, qmax, (qmin + qmax) / 2.0))
    conv = np.zeros((len(nodes), 2), np.int32)
    for k, (qmin, qmax, q) in enumerate(nodes):
        for d in range(2):
            nmin, nmax = (qmin, q) if d else (q, qmax)
            conv[k, d] = 1 if abs((nmin + nmax) / 2.0 - q) < 0.15 else 0
    return conv


def size_tolerance_range(param: EncoderParam):
    """Largest contiguous int range [lo, hi] of total BIT counts whose
    float32 byte size satisfies the hook's tolerance test
    |float32(bits/8) - target| < tolerance/100 * target (the exact
    update() early-return, src/dichotomy.cc:55-58).  Returns (1, 0)
    when no bit count satisfies it.  float32(bits/8) is monotone in
    bits, so the satisfying set is contiguous and binary search against
    the exact predicate finds its edges."""
    target = float(param.target_value)
    tt = (param.tolerance / 100.0) * target

    def hit(bits: int) -> bool:
        return abs(float(np.float32(bits / 8.0)) - target) < tt

    center = int(max(round(target * 8.0), 0))
    if not hit(center):
        for c in (center - 8, center + 8, center - 1, center + 1):
            if c >= 0 and hit(c):
                center = c
                break
        else:
            return 1, 0
    lo, x = 0, center
    while lo < x:                      # min satisfying bits
        mid = (lo + x) // 2
        if hit(mid):
            x = mid
        else:
            lo = mid + 1
    lo_bits = x
    x, hi = center, 2 ** 31 - 2
    while x < hi:                      # max satisfying bits
        mid = (x + hi + 1) // 2
        if hit(mid):
            x = mid
        else:
            hi = mid - 1
    return lo_bits, x


def psnr_tolerance_range(param: EncoderParam, size: int):
    """(lo, hi, zero_hit): contiguous uint64 range of POSITIVE
    quantization errors whose PSNR satisfies |psnr - target| <
    tolerance/100 * target ((1, 0, zero_hit) when empty), plus whether
    err=0 (psnr 99.0, outside the monotone branch) satisfies it.
    get_psnr is monotone decreasing in err >= 1."""
    target = float(param.target_value)
    tt = (param.tolerance / 100.0) * target

    def hit(err: int) -> bool:
        return abs(get_psnr(err, size) - target) < tt

    zero_hit = hit(0)
    lo_e, hi_e = 1, 1 << 62
    if not hit(lo_e) and not hit(hi_e):
        # bracket some satisfying err by bisection on the monotone psnr
        lo, hi = lo_e, hi_e
        found = None
        while lo <= hi:
            mid = (lo + hi) // 2
            p = get_psnr(mid, size)
            if hit(mid):
                found = mid
                break
            if p > target:
                lo = mid + 1
            else:
                hi = mid - 1
        if found is None:
            return 1, 0, zero_hit
        center = found
    else:
        center = lo_e if hit(lo_e) else hi_e
    lo, x = 1, center
    while lo < x:
        mid = (lo + x) // 2
        if hit(mid):
            x = mid
        else:
            lo = mid + 1
    lo_err = x
    x, hi = center, 1 << 62
    while x < hi:
        mid = (x + hi + 1) // 2
        if hit(mid):
            x = mid
        else:
            hi = mid - 1
    return lo_err, x, zero_hit


def psnr_err_threshold(target: float, size: int) -> int:
    """Largest integer err with get_psnr(err, size) > target (so the
    device loop's `value > target` test becomes an exact integer
    compare); 0 when even err=1 misses the target (err=0 maps to 99.0,
    handled as hi=lo=0 on device)."""
    if get_psnr(1, size) <= target:
        return 0
    lo, hi = 1, 1 << 62
    while lo < hi:                      # find last err with psnr > target
        mid = (lo + hi + 1) >> 1
        if get_psnr(mid, size) > target:
            lo = mid
        else:
            hi = mid - 1
    return lo


def replay_search_trace(values, decisions, param: EncoderParam,
                        hook: SearchHook):
    """Re-run the hook in float64 against a device loop's per-pass trace.

    `values`: per executed-tree-path pass the evaluated result (bytes or
    PSNR); `decisions`: the integer decision bit the device actually
    took at each pass.  Returns (best_node, ok): the winning tree node
    index, with ok=False when the device's integer decision ever
    disagrees with the exact float hook (possible only past float32's
    27-bit integer range; the caller falls back to the host search).
    `hook` must be freshly set up; its q/value/pass_count are left at
    the reference's post-search state.
    """
    passes = len(values)
    best = 0.0
    best_q = hook.q
    best_result = 0.0
    best_node = 0
    path = 0
    for p in range(passes):
        node = (1 << p) - 1 + path
        value = values[p]
        hook.pass_count = p
        if p == 0 or abs(value - hook.target) < best:
            best = abs(value - hook.target)
            best_q = hook.q
            best_result = value
            best_node = node
        d_host = 1 if value > hook.target else 0
        if hook.update(value):
            break
        if d_host != int(decisions[p]):
            return best_node, False
        path = path * 2 + d_host
    hook.q = best_q
    hook.value = best_result
    return best_node, True


def loop_scan(coeffs, histos, layout, param: EncoderParam):
    """Run the search over cached coefficients.

    `coeffs`: per-component [N_c, 64] int arrays; `histos`: per-group
    histograms (or None when not adaptive).  Returns (qms, tables, comp_rl,
    comp_dc, hook) ready for final emission.
    """
    from . import pipeline
    from .adaptive import analyse_histo

    flags = method_flags(param.method)
    min_qmats = param.resolved_min_quant_matrices()
    hook = param.search_hook or SearchHook()
    initial_q = min(max(estimate_quality(
        param.resolved_quant_matrices()[0]), 0.0), 100.0)
    hook.setup(param, initial_q)

    defaults = k3_default_tables()
    tables = list(defaults)
    cost_luts = [build_code_lut(defaults[2], 256),
                 build_code_lut(defaults[3], 256)]
    order = pipeline.scan_order(layout)
    n_groups = 2 if layout.nb_comps > 1 else 1

    best = 0.0
    best_q = 0.0
    best_result = 0.0
    last_is_best = False
    opt_quants = None
    passes = min(max(param.passes, 1), 20)

    state = {}

    def quantize_all(qms):
        if flags["use_trellis"]:
            qb = [spec.trellis_quantize_blocks(
                coeffs[c], qms[layout.quant_idx[c]],
                qms[layout.quant_idx[c]]["quant"],
                cost_luts[layout.quant_idx[c]])
                for c in range(layout.nb_comps)]
        else:
            qb = [spec.quantize_blocks(coeffs[c], qms[layout.quant_idx[c]])
                  for c in range(layout.nb_comps)]
        comp_rl = [spec.block_run_levels(q) for q in qb]
        comp_dc = [spec.dc_diff_codes(q[:, 0]) for q in qb]
        return comp_rl, comp_dc

    def build_tables(comp_rl, comp_dc):
        freq_dc = np.zeros((2, 12), dtype=np.int64)
        freq_ac = np.zeros((2, 256), dtype=np.int64)
        for c in range(layout.nb_comps):
            fdc, fac = spec.entropy_stats(comp_rl[c], comp_dc[c])
            freq_dc[layout.quant_idx[c]] += fdc
            freq_ac[layout.quant_idx[c]] += fac
        t = optimal_tables_from_freqs(freq_dc, freq_ac, n_groups)
        if n_groups == 1:
            t[1], t[3] = defaults[1], defaults[3]
        return t

    for p in range(passes):
        hook.pass_count = p
        qmats = np.stack([hook.next_matrices()[c] for c in range(2)])
        qms = [spec.finalize_quant_matrix(qmats[g], min_qmats[g],
                                          param.quantization_bias)
               for g in range(2)]
        if flags["use_adaptive_quant"]:
            for g in range(n_groups - 1, -1, -1):
                qdelta_max = (param.qdelta_max_luma if g == 0
                              else param.qdelta_max_chroma)
                tuned = analyse_histo(histos[g].astype(np.int64),
                                      qms[g]["quant"], min_qmats[g],
                                      qdelta_max)
                qms[g] = spec.finalize_quant_matrix(
                    tuned, min_qmats[g], param.quantization_bias)

        if hook.for_size:
            comp_rl, comp_dc = quantize_all(qms)
            if flags["optimize_size"]:
                tables = build_tables(comp_rl, comp_dc)
                if flags["use_trellis"]:
                    # persistent-array InitCodes semantics: absent symbols
                    # keep their previous (ultimately default) lengths
                    cost_luts[0] = overlay_code_lut(cost_luts[0], tables[2])
                    if tables[3] is not None:
                        cost_luts[1] = overlay_code_lut(cost_luts[1],
                                                        tables[3])
            dc_luts = [build_code_lut(tables[0], 16),
                       build_code_lut(tables[1], 16)
                       if tables[1] is not None else None]
            ac_luts = [build_code_lut(tables[2], 256),
                       build_code_lut(tables[3], 256)
                       if tables[3] is not None else None]
            bits = (header_size_bits(param, layout.nb_comps, tables)
                    + scan_bits_with_stuffing(comp_rl, comp_dc, layout,
                                              dc_luts, ac_luts, order))
            result = float(np.float32(bits / 8.0))
            state = {"comp_rl": comp_rl, "comp_dc": comp_dc}
        else:
            err = 0
            for c in range(layout.nb_comps):
                err += int(spec.quantize_error(
                    coeffs[c], qms[layout.quant_idx[c]]).sum())
            n_blocks = sum(co.shape[0] for co in coeffs)
            result = get_psnr(err, 64 * n_blocks)

        last_is_best = (p == 0
                        or abs(result - hook.target) < best)
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
        comp_rl, comp_dc = quantize_all(qms)
        if flags["optimize_size"]:
            tables = build_tables(comp_rl, comp_dc)
        state = {"comp_rl": comp_rl, "comp_dc": comp_dc}

    return qms, tables, state["comp_rl"], state["comp_dc"], hook
