"""Ablation timing of the fused sample->stream kernel's stages.

Builds reduced variants of the samples-in kernel (same tiles/specs) that
stop after successive stages, so per-stage cost on real hardware can be
attributed: fdct -> quantize -> fields/offsets -> LUT -> word pack.
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r2_experiments import _kernel_inputs, timeit
from sjpeg_tpu.ops import pallas_fdct, pallas_quant_pack as pqp
from sjpeg_tpu.ops import pallas_vlc_pack as pvp
from sjpeg_tpu.ops.pallas_vlc_pack import (LANE, WORDS, _cummax_lanes,
                                           _paired, _unpaired,
                                           _split_entries, _pack_words,
                                           _cumsum_seg_exclusive,
                                           lanes_from_cols, meta_split)


def make_variant(stage):
    def kernel(x_ref, meta_ref, iquant_ref, ibias_ref, fa_ref, fpcb_ref,
               fpozz_ref, fkv_ref, ac_lut_ref, words_ref, total_ref, *, tpm):
        xp = _paired(x_ref[:].astype(jnp.int32))
        R = xp.shape[0]
        T = 2 * R
        mdc, grp0 = meta_split(meta_ref, tpm, R)
        zz = pallas_fdct.fdct_body(xp, fa_ref, fpcb_ref, fpozz_ref, fkv_ref)
        if stage == "fdct":
            words_ref[:] = jnp.zeros((T, WORDS), jnp.uint32)
            tot = jnp.sum(jnp.abs(zz), axis=1, keepdims=True)
            total_ref[:] = lanes_from_cols(
                jnp.concatenate([tot, tot], 0), total_ref.shape[1])
            return
        q = pqp._quantize(zz, grp0, iquant_ref, ibias_ref)
        if stage == "quant":
            words_ref[:] = jnp.zeros((T, WORDS), jnp.uint32)
            tot = jnp.sum(jnp.abs(q), axis=1, keepdims=True)
            total_ref[:] = lanes_from_cols(
                jnp.concatenate([tot, tot], 0), total_ref.shape[1])
            return
        # --- fields (run/size/code) ---
        gl = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
        lane_ib = gl & 63
        nz = (q != 0) & (lane_ib > 0)
        m = jnp.abs(q)
        size = jnp.where(nz, pqp._calc_log2(jnp.maximum(m, 1)), 0)
        neg = jnp.where(q < 0, -1, 0)
        code = (m ^ neg) & ((1 << size) - 1)
        prev = _cummax_lanes(jnp.where(nz, gl, jnp.where(lane_ib == 0, gl, 0)))
        prev_before = jnp.concatenate(
            [jnp.zeros((R, 1), jnp.int32), prev[:, :-1]], axis=1)
        run = jnp.where(nz, gl - prev_before - 1, 0)
        if stage == "fields":
            words_ref[:] = jnp.zeros((T, WORDS), jnp.uint32)
            tot = jnp.sum(run + size + code, axis=1, keepdims=True)
            total_ref[:] = lanes_from_cols(
                jnp.concatenate([tot, tot], 0), total_ref.shape[1])
            return
        code_u = code.astype(jnp.uint32)
        sym = ((run & 15) << 4) | size
        smax = jnp.max(jnp.where(nz, size, 0))
        sym_g = (sym | 0x70).astype(jnp.int32)
        b4 = (sym & 0x10) != 0
        b5 = (sym & 0x20) != 0
        b6 = (sym & 0x40) != 0

        def lut_step(i, acc):
            s_cls = i + 1
            for g in range(2):
                leaves = []
                for j in range(8):
                    k = (((g << 3) | j) << 4 | s_cls).astype(jnp.int32)
                    leaves.append(jnp.where(grp0, ac_lut_ref[0, k],
                                            ac_lut_ref[1, k]))
                t01 = jnp.where(b4, leaves[1], leaves[0])
                t23 = jnp.where(b4, leaves[3], leaves[2])
                t45 = jnp.where(b4, leaves[5], leaves[4])
                t67 = jnp.where(b4, leaves[7], leaves[6])
                sel = jnp.where(b6, jnp.where(b5, t67, t45),
                                jnp.where(b5, t23, t01))
                key = (g << 7) | 0x70 | s_cls
                acc = acc | jnp.where(sym_g == key, sel, jnp.uint32(0))
            return acc

        ac_packed = jax.lax.fori_loop(
            0, smax, lut_step, jnp.zeros_like(sym).astype(jnp.uint32))
        s_code = (ac_packed >> 16).astype(jnp.uint32)
        s_len = (ac_packed & 0xFF).astype(jnp.int32)
        if stage == "lut":
            words_ref[:] = jnp.zeros((T, WORDS), jnp.uint32)
            tot = jnp.sum(s_code.astype(jnp.int32) + s_len, axis=1,
                          keepdims=True)
            total_ref[:] = lanes_from_cols(
                jnp.concatenate([tot, tot], 0), total_ref.shape[1])
            return
        raise ValueError(stage)

    return kernel


def run_variant(stage, sinter, dc_codes, group, iq, ib, dcl, acl,
                tile=1024):
    N = sinter.shape[0]
    NP = N
    A, PCB, POZZ, KV = pallas_fdct.fdct_matrices(zigzag_out=True,
                                                 paired=True)
    iq2 = pqp._tile_lanes(pqp._to_zigzag_lanes(iq))
    ib2 = pqp._tile_lanes(pqp._to_zigzag_lanes(ib))
    mw = 64
    tpm = tile // mw
    meta = pvp.build_meta_rows(dc_codes, group, dcl, tile, mw, 1)
    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((2 * tpm, mw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_tot = pl.BlockSpec((tpm, mw), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    lut_spec = pl.BlockSpec((2, 256), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    fn = pl.pallas_call(
        functools.partial(make_variant(stage), tpm=tpm),
        grid=(NP // tile,),
        in_specs=[spec64, spec_meta, const((2, LANE)), const((2, LANE)),
                  const((LANE, LANE)), const((LANE, LANE)),
                  const((LANE, LANE)), const((8, LANE)), lut_spec],
        out_specs=(
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_tot,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP, WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((NP // mw, mw), jnp.int32),
        ),
    )
    jfn = jax.jit(lambda: fn(sinter.astype(jnp.int8), meta,
                             iq2.astype(jnp.int32), ib2.astype(jnp.int32),
                             jnp.asarray(A), jnp.asarray(PCB),
                             jnp.asarray(POZZ), jnp.asarray(KV),
                             acl.astype(jnp.uint32)))
    return timeit(jfn)


def main():
    sinter, dc_codes, group, iq, ib, dcl, acl = _kernel_inputs()
    n = sinter.shape[0]
    print(f"n blocks = {n}")
    full = timeit(lambda: pqp.sample_vlc_pack_pallas(
        sinter, dc_codes, group, iq, ib, dcl, acl, tile=1024))
    print(f"full       : {full*1e3:7.2f} ms")
    for stage in ("fdct", "quant", "fields", "lut"):
        dt = run_variant(stage, sinter, dc_codes, group, iq, ib, dcl, acl)
        print(f"upto {stage:7s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
