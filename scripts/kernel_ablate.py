"""Ablation timing of the fused sample->stream kernel's stages.

Builds reduced variants of the samples-in kernel (same tiles/specs) that
stop after successive stages, so per-stage cost on real hardware can be
attributed: fdct -> quantize -> fields/offsets -> LUT -> word pack.
The stage bodies are the production functions (pallas_fdct.fdct_body,
pallas_quant_pack._quantize/derive_fields, pallas_vlc_pack.ac_lut_lookup),
so the timings cannot drift from the real kernel as it evolves.
"""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r2_experiments import _kernel_inputs
from r3_experiments import slope_time


def timeit(fn):
    return slope_time(fn)[0]
from sjpeg_tpu.ops import pallas_fdct, pallas_quant_pack as pqp
from sjpeg_tpu.ops import pallas_vlc_pack as pvp
from sjpeg_tpu.ops.pallas_vlc_pack import (LANE, WORDS, ac_lut_lookup,
                                           _paired, lanes_from_cols,
                                           meta_split)


def make_variant(stage):
    def kernel(x_ref, meta_ref, iquant_ref, ibias_ref, fa_ref, fpcb_ref,
               fpozz_ref, fkv_ref, ac_lut_ref, words_ref, total_ref, *, tpm):
        xp = _paired(x_ref[:].astype(jnp.int32))
        R = xp.shape[0]
        T = 2 * R
        mdc, grp0 = meta_split(meta_ref, tpm, R)

        def emit(tot):
            words_ref[:] = jnp.zeros((T, WORDS), jnp.uint32)
            total_ref[:] = lanes_from_cols(
                jnp.concatenate([tot, tot], 0), total_ref.shape[1])

        zz = pallas_fdct.fdct_body(xp, fa_ref, fpcb_ref, fpozz_ref, fkv_ref)
        if stage == "fdct":
            return emit(jnp.sum(jnp.abs(zz), axis=1, keepdims=True))
        q = pqp._quantize(zz, grp0, iquant_ref, ibias_ref)
        if stage == "quant":
            return emit(jnp.sum(jnp.abs(q), axis=1, keepdims=True))
        run, size, code, nz = pqp.derive_fields(q)
        if stage == "fields":
            return emit(jnp.sum(run + size + code, axis=1, keepdims=True))
        ac_packed = ac_lut_lookup(run, size, nz, grp0, ac_lut_ref)
        if stage == "lut":
            s_code = (ac_packed >> 16).astype(jnp.int32)
            s_len = (ac_packed & 0xFF).astype(jnp.int32)
            return emit(jnp.sum(s_code + s_len, axis=1, keepdims=True))
        # ---- inline replica of paired_fields_to_words with extra cut
        # points (offsets | split); keep in sync with pallas_vlc_pack ----
        LANEc = 128
        code_u = code.astype(jnp.uint32)
        gl = jax.lax.broadcasted_iota(jnp.int32, (R, LANEc), 1)
        lane_ib = gl & 63
        s_code = (ac_packed >> 16).astype(jnp.uint32)
        s_len = (ac_packed & 0xFF).astype(jnp.int32)
        esc = jnp.where(grp0, ac_lut_ref[0, 0xF0], ac_lut_ref[1, 0xF0])
        esc_code = (esc >> 16).astype(jnp.uint32)
        esc_len = (esc & 0xFF).astype(jnp.int32)
        eob = jnp.where(grp0, ac_lut_ref[0, 0x00], ac_lut_ref[1, 0x00])
        sym_val = (s_code << size.astype(jnp.uint32)) | code_u
        sym_len = jnp.where(nz, s_len + size, 0)
        n_esc = jnp.where(nz, run >> 4, 0)
        pair = jnp.minimum(n_esc, 2)
        single = n_esc - pair
        ep_val = jnp.where(
            pair == 2,
            (esc_code << esc_len.astype(jnp.uint32)) | esc_code,
            jnp.where(pair == 1, esc_code, jnp.uint32(0)))
        ep_len = pair * esc_len
        es_val = jnp.where(single == 1, esc_code, jnp.uint32(0))
        es_len = single * esc_len
        mu = mdc.astype(jnp.uint32)
        dv = mu >> pvp._DC_SHIFT
        dl = (mu & ((1 << pvp._DC_SHIFT) - 1)).astype(jnp.int32)
        first0 = gl == 0
        first64 = gl == 64
        sym_val = jnp.where(first0, dv[:R],
                            jnp.where(first64, dv[R:], sym_val))
        sym_len = jnp.where(first0, dl[:R],
                            jnp.where(first64, dl[R:], sym_len))
        pos_len = ep_len + es_len + sym_len
        pos_off = pvp._cumsum_seg_exclusive(pos_len, 64)
        if stage == "offsets":
            return emit(jnp.sum(pos_off, axis=1, keepdims=True))
        ep_off = pos_off
        es_off = pos_off + ep_len
        sym_off = es_off + es_len

        def _col(x, k):
            return jnp.sum(jnp.where(gl == k, x.astype(jnp.int32), 0),
                           axis=1, keepdims=True)

        tot_incl = pos_off + pos_len
        totA = _col(tot_incl, 63)
        totB = _col(tot_incl, 127)
        lastnz = pvp._cummax_lanes(
            jnp.where(nz, gl, jnp.where(lane_ib == 0, gl, 0)))
        lastA = _col(lastnz, 63)
        lastB = _col(lastnz, 127) - 64
        hA, hB = lastA < 63, lastB < 63
        eobA = _col(eob, 0).astype(jnp.uint32)
        eobB = _col(eob, 64).astype(jnp.uint32)
        eob_len = jnp.concatenate(
            [jnp.where(hA, eobA & 0xFF, 0),
             jnp.where(hB, eobB & 0xFF, 0)], axis=0).astype(jnp.int32)
        eob_val = jnp.concatenate(
            [jnp.where(hA, eobA >> 16, 0),
             jnp.where(hB, eobB >> 16, 0)], axis=0).astype(jnp.uint32)
        total_no_eob = jnp.concatenate([totA, totB], axis=0)
        total = total_no_eob + eob_len
        sym_f = tuple(pvp._unpaired(a) for a in
                      pvp._split_entries(sym_val, sym_len, sym_off))
        if stage == "split":
            words_ref[:] = (sym_f[0].astype(jnp.uint32)
                            | sym_f[1].astype(jnp.uint32)
                            | sym_f[2].astype(jnp.uint32))[:, :WORDS] \
                if False else jnp.zeros((T, WORDS), jnp.uint32)
            s = sym_f[0] + sym_f[1] + sym_f[2]
            total_ref[:] = lanes_from_cols(
                total + jnp.sum(s, axis=1, keepdims=True),
                total_ref.shape[1])
            return
        esc_thunk = lambda: (
            tuple(pvp._unpaired(a) for a in
                  pvp._split_entries(ep_val, ep_len, ep_off)),
            tuple(pvp._unpaired(a) for a in
                  pvp._split_entries(es_val, es_len, es_off)),
        )
        eob_f = pvp._split_entries(eob_val, eob_len, total_no_eob)
        wmax = (jnp.max(total) + 31) >> 5
        words = pvp._pack_words(T, wmax, sym_f, esc_thunk,
                                jnp.any(n_esc > 0), eob_f)
        if stage == "wordloop":
            words_ref[:] = words
            total_ref[:] = lanes_from_cols(total, total_ref.shape[1])
            return
        raise ValueError(stage)

    return kernel


def run_variant(stage, sinter, dc_codes, group, iq, ib, dcl, acl,
                tile=1024):
    N = sinter.shape[0]
    rem = (-N) % tile
    if rem:                       # pad to whole tiles like the real kernel
        sinter = jnp.pad(sinter, ((0, rem), (0, 0)))
        dc_codes = jnp.pad(dc_codes, (0, rem))
        group = jnp.pad(group, (0, rem))
    NP = N + rem
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
    for stage in ("fdct", "quant", "fields", "lut", "offsets", "split", "wordloop"):
        dt = run_variant(stage, sinter, dc_codes, group, iq, ib, dcl, acl)
        print(f"upto {stage:7s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
