"""Profile the batched target-size dichotomy (bench config 5) stage by
stage: where do the ~650 ms per 16-image batch actually go?

Stages of engine._encode_batch_search (device-resident loop path):
  1. _stage_search_prep        (device: coeffs+samples+histos program)
  2. histogram fetch + analyse_histo_nodes (host: 63 nodes x B images)
  3. _stage_search_loop_size   (device: all 6 passes in one program)
  4. trace fetch + hook replay (host)
  5. final freqs+tables+pack   (device + host table builds)
  6. stream fetch + assembly   (host)
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sjpeg_tpu import constants as C, pipeline, spec
from sjpeg_tpu import engine
from sjpeg_tpu.params import EncoderParam, SearchHook, method_flags
from sjpeg_tpu.huffman import k3_default_tables

SIZE = 1024
BATCH = 16


def make_image(w, h, seed=42):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    return img.astype(np.uint8)


def t(label, fn, reps=3):
    fn()   # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms")
    return r


def main():
    rgb = make_image(SIZE, SIZE)
    target = 100000
    param = EncoderParam(yuv_mode=C.YUV_420)
    param.set_target_size(target, passes=6)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, SIZE, SIZE, 3)).copy())
    b, h, w = BATCH, SIZE, SIZE

    # full path first (warm compile)
    t0 = time.perf_counter()
    engine.encode_batch(dev, param)
    print(f"first (compile) encode_batch: {time.perf_counter()-t0:.1f} s")
    t("encode_batch e2e", lambda: engine.encode_batch(dev, param), reps=3)

    flags = method_flags(param.method)
    yuv_mode = C.YUV_420
    layout = pipeline.component_layout(yuv_mode, w, h)
    nb_blocks = tuple(layout.nb_blocks)
    min_qmats = param.resolved_min_quant_matrices()
    passes = 6
    n_groups = 2
    from sjpeg_tpu.tools import estimate_quality
    initial_q = min(max(estimate_quality(
        param.resolved_quant_matrices()[0]), 0.0), 100.0)

    def run_prep():
        p = engine._stage_search_prep(
            dev, yuv_mode=yuv_mode, width=w, height=h,
            nb_blocks=nb_blocks, n_images=b, src_kind="rgb",
            with_histo=True)
        jax.block_until_ready(p["coeffs"][0])
        return p

    prep = t("1 _stage_search_prep (dispatch+ready)", run_prep)

    def fetch_histos():
        return (np.asarray(prep["histos"][0]),
                np.asarray(prep["histos"][1]))

    hln, hcn = t("2a histo fetch", fetch_histos)
    hl = hln.astype(np.int64).reshape(b, 64, -1)
    hc = hcn.astype(np.int64).reshape(b, 64, -1)

    from sjpeg_tpu.dichotomy import (build_q_tree, header_size_bits_nbsyms,
                                     replay_search_trace)
    from sjpeg_tpu.adaptive import analyse_histo_nodes
    from sjpeg_tpu.params import quant_matrices_for_quality

    tree_q = build_q_tree(param, initial_q, passes)
    base = np.stack([quant_matrices_for_quality(q)
                     for q in tree_q]).astype(np.int64)
    minq_arr = np.stack([min_qmats[0], min_qmats[1]]).astype(np.int64)
    clamped = np.maximum(base, minq_arr[None])
    K = clamped.shape[0]
    print(f"   K = {K} tree nodes")

    def tune_nodes():
        tuned_l = analyse_histo_nodes(
            hl, clamped[:, 0].astype(np.uint8), min_qmats[0],
            param.qdelta_max_luma)
        tuned_c = analyse_histo_nodes(
            hc, clamped[:, 1].astype(np.uint8), min_qmats[1],
            param.qdelta_max_chroma)
        return np.maximum(
            np.stack([tuned_l, tuned_c], axis=2).astype(np.int64),
            minq_arr[None, None]).astype(np.uint8)

    quants_nodes = t("2b analyse_histo_nodes (63xB, 2 grp)", tune_nodes)

    hdr_fixed = header_size_bits_nbsyms(param, layout.nb_comps,
                                        [0, 0, 0, 0])
    thr = int(np.int64(np.floor(8.0 * param.target_value)) + 1)
    bucket = int(min(layout.mb_w * layout.mb_h * sum(nb_blocks) * 64,
                     max(4096, w * h * 4.0 / 32,
                         (param.target_value * 2 * 8) / 32 + 4096)))
    dcl_def, acl_def = engine._default_luts_cached()
    qn_dev = jnp.asarray(quants_nodes)

    def run_loop():
        tr = engine._stage_search_loop_size(
            prep, qn_dev, jnp.int32(thr),
            dcl_def, acl_def, passes=passes, nb_blocks=nb_blocks,
            n_images=b, n_groups=n_groups, bucket=bucket,
            optimize_size=True, hdr_fixed_bits=int(hdr_fixed),
            q_bias=int(param.quantization_bias),
            per_image_mats=True, chroma_wrap=True)
        jax.block_until_ready(tr[0])
        return tr

    loop_out = t("3 _stage_search_loop_size (6 passes)", run_loop)
    trace_dev, words_all, totals_all, desc_all = loop_out
    trace = t("4a trace fetch", lambda: np.asarray(trace_dev))

    def replay():
        outs = []
        for i in range(b):
            col = trace[:, i]
            vals = [float(np.float32(int(v) / 8.0)) for v in col]
            decs = [1 if int(v) >= thr else 0 for v in col]
            hk = SearchHook()
            hk.setup(param, initial_q)
            outs.append(replay_search_trace(vals, decs, param, hk))
        return outs

    replays = t("4b hook replay x16", replay)

    final_qms = []
    for i in range(b):
        node = replays[i][0]
        qn = quants_nodes[i, node]
        final_qms.append([spec.finalize_quant_matrix(
            qn[g], min_qmats[g], param.quantization_bias)
            for g in range(2)])
    iq3 = jnp.asarray(np.stack(
        [[q["iquant"] for q in qms] for qms in final_qms]).astype(np.int32))
    ib3 = jnp.asarray(np.stack(
        [[q["bias"] for q in qms] for qms in final_qms]).astype(np.int32))

    coeffs = prep["coeffs"]

    def final_freqs():
        _, freqs = engine._stage_batch_quantize(
            coeffs, iq3, ib3, with_stats=True, nb_blocks=nb_blocks,
            n_images=b, per_image_stats=True)
        jax.block_until_ready(freqs[0])
        return freqs

    freqs = t("5a final freqs program", final_freqs)

    def tables():
        from sjpeg_tpu.huffman import optimal_tables_from_freqs
        fdc = np.asarray(freqs[0]).astype(np.int64).reshape(b, 2, 12)
        fac = np.asarray(freqs[1]).astype(np.int64).reshape(b, 2, 256)
        tabs = [optimal_tables_from_freqs(fdc[i], fac[i], 2)
                for i in range(b)]
        dc_np = np.zeros((b, 2, 16), np.uint32)
        ac_np = np.zeros((b, 2, 256), np.uint32)
        for i, tb in enumerate(tabs):
            dc_np[i], ac_np[i] = engine._host_luts(tb)
        return tabs, jnp.asarray(dc_np), jnp.asarray(ac_np)

    tabs, dcl, acl = t("5b freq fetch + host tables + upload", tables)

    def final_pack():
        vlc_state, _ = engine._stage_batch_quantize(
            coeffs, iq3, ib3, with_stats=False, nb_blocks=nb_blocks,
            n_images=b)
        words, totals = engine._stage_batch_pack(
            vlc_state, dcl, acl, n_images=b, bucket=bucket,
            per_image_tables=True)
        jax.block_until_ready(totals)
        return words, totals

    words, totals = t("5c final quantize+pack program", final_pack)
    totals_np = np.asarray(totals)

    words_np = t("6a stream fetch",
                 lambda: engine.fetch_streams_batch(words, totals_np))

    def assemble():
        out = []
        for i in range(b):
            scan = engine._finalize_scan_bytes(words_np[i],
                                               int(totals_np[i]))
            out.append(engine._assemble_jpeg(layout, param, final_qms[i],
                                             tabs[i], scan))
        return out

    t("6b host stuff+assemble", assemble)


if __name__ == "__main__":
    main()
