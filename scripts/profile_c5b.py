"""Sub-stage profiling: analyse_histo_nodes internals + device-loop
per-pass component programs (freqs / huffman / dc / pack / stuffing)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sjpeg_tpu import constants as C, pipeline, spec
from sjpeg_tpu import engine
from sjpeg_tpu.params import EncoderParam, method_flags
from sjpeg_tpu.adaptive import (analyse_histo_nodes,
                                _analyse_histo_nodes_chunk_torch,
                                _analyse_histo_nodes_chunk)

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
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} {min(ts)*1e3:9.1f} ms")
    return r


def main():
    rgb = make_image(SIZE, SIZE)
    param = EncoderParam(yuv_mode=C.YUV_420)
    param.set_target_size(100000, passes=6)
    dev = jax.device_put(np.broadcast_to(rgb, (BATCH, SIZE, SIZE, 3)).copy())
    b, h, w = BATCH, SIZE, SIZE
    yuv_mode = C.YUV_420
    layout = pipeline.component_layout(yuv_mode, w, h)
    nb_blocks = tuple(layout.nb_blocks)
    min_qmats = param.resolved_min_quant_matrices()

    prep = engine._stage_search_prep(
        dev, yuv_mode=yuv_mode, width=w, height=h, nb_blocks=nb_blocks,
        n_images=b, src_kind="rgb", with_histo=True)
    jax.block_until_ready(prep["coeffs"][0])
    hl = np.asarray(prep["histos"][0]).astype(np.int64).reshape(b, 64, -1)
    hc = np.asarray(prep["histos"][1]).astype(np.int64).reshape(b, 64, -1)

    from sjpeg_tpu.dichotomy import build_q_tree
    from sjpeg_tpu.params import quant_matrices_for_quality
    from sjpeg_tpu.tools import estimate_quality
    initial_q = min(max(estimate_quality(
        param.resolved_quant_matrices()[0]), 0.0), 100.0)
    tree_q = build_q_tree(param, initial_q, 6)
    base = np.stack([quant_matrices_for_quality(q)
                     for q in tree_q]).astype(np.int64)
    minq_arr = np.stack([min_qmats[0], min_qmats[1]]).astype(np.int64)
    clamped = np.maximum(base, minq_arr[None])
    K = clamped.shape[0]

    # how many unique matrices?
    uniq_l = np.unique(clamped[:, 0], axis=0)
    uniq_c = np.unique(clamped[:, 1], axis=0)
    print(f"K={K}: unique luma matrices {uniq_l.shape[0]}, "
          f"chroma {uniq_c.shape[0]}")

    t("torch luma (K=63)", lambda: _analyse_histo_nodes_chunk_torch(
        hl, clamped[:, 0].astype(np.uint8), min_qmats[0],
        param.qdelta_max_luma))
    t("torch chroma (K=63)", lambda: _analyse_histo_nodes_chunk_torch(
        hc, clamped[:, 1].astype(np.uint8), min_qmats[1],
        param.qdelta_max_chroma))
    t("numpy luma chunk (K=63)", lambda: _analyse_histo_nodes_chunk(
        hl, clamped[:, 0].astype(np.uint8), min_qmats[0],
        param.qdelta_max_luma))
    Ku = uniq_l.shape[0]
    t(f"torch luma unique (K={Ku})",
      lambda: _analyse_histo_nodes_chunk_torch(
          hl, uniq_l.astype(np.uint8), min_qmats[0],
          param.qdelta_max_luma))

    # ---- device loop per-pass sub-stages ----
    from sjpeg_tpu.ops import huffman_device as hd
    qms = [spec.finalize_quant_matrix(clamped[0][g], min_qmats[g],
                                      param.quantization_bias)
           for g in range(2)]
    iq, ib = engine._quant_device_arrays(qms)
    iq3 = jnp.broadcast_to(iq, (b,) + iq.shape)
    ib3 = jnp.broadcast_to(ib, (b,) + ib.shape)
    coeffs = prep["coeffs"]
    bucket = int(min(layout.mb_w * layout.mb_h * sum(nb_blocks) * 64,
                     max(4096, w * h * 4.0 / 32,
                         (param.target_value * 2 * 8) / 32 + 4096)))

    @jax.jit
    def freqs_prog(coeffs, iq3, ib3):
        return engine._search_component_freqs(coeffs, iq3, ib3, b)

    r = t("pass: component freqs", lambda: jax.block_until_ready(
        freqs_prog(coeffs, iq3, ib3)))

    @jax.jit
    def luts_prog(f0, f1):
        return hd.luts_from_freqs(jnp.reshape(f0, (b, 2, -1)),
                                  jnp.reshape(f1, (b, 2, -1)), 2)

    lr = t("pass: device huffman luts", lambda: jax.block_until_ready(
        luts_prog(r[0], r[1])))
    dcl, acl, nbs = lr

    @jax.jit
    def dc_prog(dc_coefs, iq3, ib3):
        return engine._search_dc_codes(dc_coefs, iq3, ib3, nb_blocks, b)

    dcc = t("pass: dc codes", lambda: jax.block_until_ready(
        dc_prog(prep["dc_coefs"], iq3, ib3)))

    @jax.jit
    def pack_prog(sinter, dcc, group, iq3, ib3, dcl, acl):
        return engine._fused_pack_from_samples(
            sinter, dcc, group, iq3, ib3, dcl, acl, b, bucket, True)

    pr = t("pass: fused pack+concat", lambda: jax.block_until_ready(
        pack_prog(prep["sinter"], dcc, prep["group"], iq3, ib3, dcl, acl)))
    words, totals = pr

    t("pass: stuffing count", lambda: jax.block_until_ready(
        engine._stage_count_stuffing_batch(words, totals)))

    # subcomponent: vlc_pack alone vs concat alone
    from sjpeg_tpu.ops import pallas_quant_pack, pallas_tree_concat

    @jax.jit
    def pack_only(sinter, dcc, group, iq3, ib3, dcl, acl):
        tile = pallas_quant_pack.DEFAULT_TILE
        N = group.shape[0]
        per_img = N // b
        padded = -(-per_img // tile) * tile
        pad = padded - per_img

        def padrows(x):
            if not pad:
                return x
            x2 = x.reshape((b, per_img) + x.shape[1:])
            cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x2, cfg).reshape((-1,) + x.shape[1:])

        return pallas_quant_pack.sample_vlc_pack_pallas(
            padrows(sinter), padrows(dcc), padrows(group),
            iq3, ib3, dcl, acl, tiles_per_img=padded // tile,
            chroma_wrap=True)

    wb = t("  sub: sample_vlc_pack only", lambda: jax.block_until_ready(
        pack_only(prep["sinter"], dcc, prep["group"], iq3, ib3, dcl,
                  acl)))

    @jax.jit
    def concat_only(words, bit_lens):
        return pallas_tree_concat.concat_block_streams_tree(
            words, bit_lens, n_images=b, bucket=bucket)

    t("  sub: tree concat only", lambda: jax.block_until_ready(
        concat_only(wb[0], wb[1])))


if __name__ == "__main__":
    main()
