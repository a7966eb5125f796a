"""Dispatch-only cost of the unrolled search loop + torch lambda-fit
internals."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sjpeg_tpu import constants as C, pipeline, spec
from sjpeg_tpu import engine
from sjpeg_tpu.params import EncoderParam
from sjpeg_tpu.dichotomy import build_q_tree, header_size_bits_nbsyms
from sjpeg_tpu.params import quant_matrices_for_quality
from sjpeg_tpu.tools import estimate_quality
from sjpeg_tpu.adaptive import analyse_histo_nodes, _dq_tables

SIZE, BATCH = 1024, 16


def make_image(w, h, seed=42):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
                    (xx + yy) // 2 % 256], -1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    return img.astype(np.uint8)


rgb = make_image(SIZE, SIZE)
param = EncoderParam(yuv_mode=C.YUV_420)
param.set_target_size(100000, passes=6)
dev = jax.device_put(np.broadcast_to(rgb, (BATCH, SIZE, SIZE, 3)).copy())
b, h, w = BATCH, SIZE, SIZE
layout = pipeline.component_layout(C.YUV_420, w, h)
nb_blocks = tuple(layout.nb_blocks)
min_qmats = param.resolved_min_quant_matrices()

prep = engine._stage_search_prep(dev, yuv_mode=C.YUV_420, width=w,
                                 height=h, nb_blocks=nb_blocks,
                                 n_images=b, src_kind="rgb",
                                 with_histo=True)
jax.block_until_ready(prep["coeffs"][0])
hl = np.asarray(prep["histos"][0]).astype(np.int64).reshape(b, 64, -1)

initial_q = min(max(estimate_quality(
    param.resolved_quant_matrices()[0]), 0.0), 100.0)
tree_q = build_q_tree(param, initial_q, 6)
base = np.stack([quant_matrices_for_quality(q)
                 for q in tree_q]).astype(np.int64)
minq_arr = np.stack([min_qmats[0], min_qmats[1]]).astype(np.int64)
clamped = np.maximum(base, minq_arr[None])
quants_l = clamped[:, 0].astype(np.uint8)

# --- torch lambda-fit microprofile ---
import torch
print(f"torch num_threads = {torch.get_num_threads()}")
K = 63

t0 = time.perf_counter()
for _ in range(3):
    analyse_histo_nodes(hl, quants_l, min_qmats[0], param.qdelta_max_luma)
print(f"analyse_histo_nodes luma: {(time.perf_counter()-t0)/3*1e3:.1f} ms")

# piecewise: gathers vs delta loop vs pos loop
from sjpeg_tpu.adaptive import _FLT_MAX, _seq_sum
h64 = hl.astype(np.int64)
q64 = quants_l.astype(np.int64)
dq = (q64[:, :, None] + np.arange(C.QSIZE, dtype=np.int64)[None, None, :]
      + C.QDELTA_MIN)
valid = (dq >= min_qmats[0].astype(np.int64)[None, :, None]) & (dq <= 255)
dqi = np.clip(dq, 1, 255)
bits_t, err_t = _dq_tables()

t0 = time.perf_counter()
for _ in range(3):
    ht = torch.from_numpy(
        np.ascontiguousarray(h64.astype(np.float64).reshape(b * 64, -1)))
    hb = (ht @ torch.from_numpy(np.ascontiguousarray(bits_t.T))) \
        .reshape(b, 1, 64, 256).expand(b, K, 64, 256)
    hd = (ht @ torch.from_numpy(np.ascontiguousarray(err_t.T))) \
        .reshape(b, 1, 64, 256).expand(b, K, 64, 256)
    idxt = torch.from_numpy(dqi)[None].expand(b, K, 64, C.QSIZE)
    bsum = torch.gather(hb, 3, idxt)
    dsum = torch.gather(hd, 3, idxt)
print(f"  dgemm+gathers: {(time.perf_counter()-t0)/3*1e3:.1f} ms")

validt = torch.from_numpy(valid)[None]
fmax32 = torch.tensor(np.float32(_FLT_MAX))
t0 = time.perf_counter()
for _ in range(3):
    dist32 = torch.where(validt, dsum.to(torch.float32), fmax32)
    size32 = torch.where(validt, bsum.to(torch.float32),
                         torch.tensor(np.float32(0.0)))
print(f"  f32 clouds: {(time.perf_counter()-t0)/3*1e3:.1f} ms")

xs = np.arange(C.QSIZE, dtype=np.float64) + C.QDELTA_MIN
wgt = np.where(valid & (C.HISTO_WEIGHT > 0.0)[None, None, :],
               C.HISTO_WEIGHT[None, None, :], 0.0)
wt = torch.from_numpy(wgt)
t0 = time.perf_counter()
for _ in range(3):
    sy1 = syy1 = sy2 = sxy1 = sxy2 = None
    for d in range(C.QSIZE):
        wd = wt[:, :, d]
        dd = dsum[:, :, :, d]
        bd = bsum[:, :, :, d]
        t1 = wd * dd
        t2 = wd * bd
        x = float(xs[d])
        if d == 0:
            sy1, syy1, sy2 = t1, t1 * dd, t2
            sxy1, sxy2 = t1 * x, t2 * x
        else:
            sy1 = sy1 + t1
            syy1 = syy1 + t1 * dd
            sy2 = sy2 + t2
            sxy1 = sxy1 + t1 * x
            sxy2 = sxy2 + t2 * x
print(f"  delta loop (25x): {(time.perf_counter()-t0)/3*1e3:.1f} ms")

# --- loop dispatch overhead ---
from sjpeg_tpu.dichotomy import header_size_bits
hdr_fixed = header_size_bits_nbsyms(param, layout.nb_comps, [0, 0, 0, 0])
thr = int(np.int64(np.floor(8.0 * param.target_value)) + 1)
bucket = int(min(layout.mb_w * layout.mb_h * sum(nb_blocks) * 64,
                 max(4096, w * h * 4.0 / 32,
                     (param.target_value * 2 * 8) / 32 + 4096)))
dcl_def, acl_def = engine._default_luts_cached()
qn = np.maximum(
    np.stack([np.broadcast_to(quants_l[None], (b, K, 64)),
              np.broadcast_to(clamped[None, :, 1], (b, K, 64))], axis=2)
    .astype(np.int64), minq_arr[None, None]).astype(np.uint8)
qn_dev = jnp.asarray(qn)


def call_loop():
    return engine._stage_search_loop_size(
        prep, qn_dev, jnp.int32(thr), dcl_def, acl_def, passes=6,
        nb_blocks=nb_blocks, n_images=b, n_groups=2, bucket=bucket,
        optimize_size=True, hdr_fixed_bits=int(hdr_fixed),
        q_bias=int(param.quantization_bias), per_image_mats=True,
        chroma_wrap=True)


r = call_loop()
jax.block_until_ready(r[0])
t0 = time.perf_counter()
r = call_loop()
disp = time.perf_counter() - t0
jax.block_until_ready(r[0])
tot = time.perf_counter() - t0
print(f"loop dispatch-only: {disp*1e3:.1f} ms; total {tot*1e3:.1f} ms")

# fetch bandwidth of the picked words
bp = jnp.zeros(b, jnp.int32)
wsel, tsel, dsel = engine._stage_search_pick(r[1], r[2], r[3], bp)
jax.block_until_ready(wsel)
tnp = np.asarray(tsel)
t0 = time.perf_counter()
wn = engine.fetch_streams_batch(wsel, tnp)
print(f"picked words fetch: {(time.perf_counter()-t0)*1e3:.1f} ms "
      f"({wn.nbytes/1e6:.2f} MB)")
