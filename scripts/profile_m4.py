"""Wall-clock split of the batched method-4 (adaptive + two-pass Huffman)
encode through the relay: device programs vs host table builds.

    python scripts/profile_m4.py [batch] [size]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sjpeg_tpu import constants as C
from sjpeg_tpu import engine, pipeline, spec
from sjpeg_tpu.huffman import k3_default_tables, optimal_tables_from_freqs
from sjpeg_tpu.adaptive import analyse_histo
from sjpeg_tpu.ops import pack
from sjpeg_tpu.params import EncoderParam


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    w = h = size
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    rgb = img.astype(np.uint8)
    src = jax.device_put(np.broadcast_to(rgb, (b, h, w, 3)).copy())
    param = EncoderParam(quality=75, yuv_mode=C.YUV_420)

    jpegs = engine.encode_batch(src, param)        # warm all programs
    layout = pipeline.component_layout(C.YUV_420, w, h)

    for rep in range(2):
        t0 = time.perf_counter()
        histos = engine._stage_batch_histos_fused(
            src, yuv_mode=C.YUV_420, width=w, height=h, stats_images=b)
        hl = np.asarray(histos[0]).reshape(b, 64, -1)
        hc = np.asarray(histos[1]).reshape(b, 64, -1)
        t1 = time.perf_counter()

        qmats = param.resolved_quant_matrices()
        minq = param.resolved_min_quant_matrices()
        base = [spec.finalize_quant_matrix(qmats[i], minq[i],
                                           param.quantization_bias)
                for i in range(2)]
        per_qms = []
        for i in range(b):
            qms = list(base)
            for g in (1, 0):
                qd = (param.qdelta_max_luma if g == 0
                      else param.qdelta_max_chroma)
                tuned = analyse_histo((hl if g == 0 else hc)[i].astype(
                    np.int64), qms[g]["quant"], minq[g], qd)
                qms[g] = spec.finalize_quant_matrix(
                    tuned, minq[g], param.quantization_bias)
            per_qms.append(qms)
        iq = jnp.asarray(np.stack([[q["iquant"] for q in qms]
                                   for qms in per_qms]).astype(np.int32))
        ib = jnp.asarray(np.stack([[q["bias"] for q in qms]
                                   for qms in per_qms]).astype(np.int32))
        t2 = time.perf_counter()

        freqs = engine._stage_batch_freqs_fused(
            src, iq, ib, yuv_mode=C.YUV_420, width=w, height=h,
            nb_blocks=tuple(layout.nb_blocks), n_images=b, stats_images=b)
        fdc = np.asarray(freqs[0]).astype(np.int64).reshape(b, 2, 12)
        fac = np.asarray(freqs[1]).astype(np.int64).reshape(b, 2, 256)
        t3 = time.perf_counter()

        per_tables = [optimal_tables_from_freqs(fdc[i], fac[i], 2)
                      for i in range(b)]
        dc_np = np.zeros((b, 2, 16), np.uint32)
        ac_np = np.zeros((b, 2, 256), np.uint32)
        for i, t in enumerate(per_tables):
            dc_np[i], ac_np[i] = engine._host_luts(t)
        dc_luts, ac_luts = jnp.asarray(dc_np), jnp.asarray(ac_np)
        t4 = time.perf_counter()

        n_blocks_img = layout.mb_w * layout.mb_h * sum(layout.nb_blocks)
        bucket = int(min(n_blocks_img * pack.WORDS_PER_BLOCK,
                         max(4096, w * h * 4.0 / 32)))
        words, totals = engine._encode_batch_opt_core(
            src, iq, ib, dc_luts, ac_luts, yuv_mode=C.YUV_420, width=w,
            height=h, nb_blocks=tuple(layout.nb_blocks), n_images=b,
            bucket=bucket, per_image_tables=True)
        totals_np = np.asarray(totals)
        words_np = engine.fetch_streams_batch(words, totals_np)
        t5 = time.perf_counter()

        scans = [engine._finalize_scan_bytes(words_np[i], int(totals_np[i]))
                 for i in range(b)]
        outs = [engine._assemble_jpeg(layout, param, per_qms[i],
                                      per_tables[i], scans[i])
                for i in range(b)]
        t6 = time.perf_counter()
        if rep:
            print(f"histos program+fetch : {(t1-t0)*1e3:8.1f} ms")
            print(f"analyse_histo (host) : {(t2-t1)*1e3:8.1f} ms")
            print(f"freqs program+fetch  : {(t3-t2)*1e3:8.1f} ms")
            print(f"table build (host)   : {(t4-t3)*1e3:8.1f} ms")
            print(f"final program+fetch  : {(t5-t4)*1e3:8.1f} ms")
            print(f"scan+assemble (host) : {(t6-t5)*1e3:8.1f} ms")
            print(f"TOTAL                : {(t6-t0)*1e3:8.1f} ms "
                  f"-> {b*w*h/(t6-t0)/1e6:.1f} Mpx/s")
            print("bytes:", len(outs[0]), "match:", outs[0] == jpegs[0])


if __name__ == "__main__":
    main()
