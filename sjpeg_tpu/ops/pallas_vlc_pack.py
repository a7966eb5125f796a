"""Pallas TPU kernel: fused VLC coding + per-block bit packing.

Takes zigzag-order run/size/code fields straight from quantization and
produces each block's packed 64-word bit buffer + exact bit count in one
VMEM-resident pass:

1. Huffman lookups as masked accumulation over the (run, size) symbol
   domain — TPU has no vector gather, and XLA's gather lowering costs
   ~10 ns/element; 176 predicated selects on whole tiles beat it by >10x.
   Tables are runtime inputs (two groups: luma/chroma), selected per row.
2. Entry streams assembled *interleaved* via `pltpu.repeat` + static roll
   lane arithmetic (DC, then per AC position escape-pair / escape-single /
   symbol+value lanes, then EOB) — no [N, 192] HBM materialization at all.
3. Exclusive bit-offset cumsum (log-step shifted adds), word-straddling
   hi/lo split, and the 64-word predicated-reduction pack.

This kernel plus the concat kernel replace everything between
quantization and the byte-level host pass.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_pack import _cumsum_lanes_exclusive

ENTRIES = 192
WORDS = 64
DEFAULT_TILE = 512
_MAX_SIZE = 11          # max AC size category (coeffs are <= 11 bits)
LANE = 128

# Per-block scalars (DC code, table group, total bits) cost ~1.7 ms of
# DMA each per 393k-block batch when shipped as [N, 1] arrays — TPU
# tiled layouts pad the minor dim to 128 lanes.  Instead they travel as
# full-lane [N/128, 128] rows and convert to/from the kernel's [T, 1]
# per-row shape with a diagonal extract/spread (a handful of [128, 128]
# VPU ops per tile).
_META_GROUP_SHIFT = 20


def _eye(w):
    return (jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (w, w), 1))


def cols_from_lanes(blk):
    """[T/W, W] lane-packed values -> [T, 1] per-row column."""
    eye = _eye(blk.shape[1])
    outs = []
    for k in range(blk.shape[0]):
        row = blk[k:k + 1, :]
        outs.append(jnp.sum(jnp.where(eye, row, 0), axis=1,
                            keepdims=True))
    return jnp.concatenate(outs, axis=0)


def lanes_from_cols(col, w):
    """[T, 1] per-row column -> [T/w, w] lane-packed values."""
    eye = _eye(w)
    outs = []
    for k in range(col.shape[0] // w):
        c = jax.lax.slice_in_dim(col, k * w, (k + 1) * w, axis=0)
        outs.append(jnp.sum(jnp.where(eye, c, 0), axis=0, keepdims=True))
    return jnp.concatenate(outs, axis=0)


def pack_block_meta(dc_codes, group):
    """[N] dc codes (<= 2^16) + [N] table groups -> [N] packed meta."""
    return (dc_codes.astype(jnp.int32)
            | (group.astype(jnp.int32) << _META_GROUP_SHIFT))


def unpack_block_meta(meta_col):
    dc = meta_col & ((1 << _META_GROUP_SHIFT) - 1)
    group = meta_col >> _META_GROUP_SHIFT
    return dc, group


def _vlc_pack_kernel(run_ref, size_ref, code_ref, meta_ref,
                     dc_lut_ref, ac_lut_ref, words_ref, total_ref):
    dc, group = unpack_block_meta(cols_from_lanes(meta_ref[:]))
    words, total = _vlc_pack_body(
        run_ref[:], size_ref[:], code_ref[:], dc, group,
        dc_lut_ref, ac_lut_ref)
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, meta_ref.shape[1])


def _vlc_pack_body(run, size, code, dc_code, group, ac_scalar_src_dc,
                   ac_scalar_src_ac):
    """Pure body shared by the kernel and its tests.

    `ac_scalar_src_dc`/`ac_scalar_src_ac` are indexable [2, K] sources of
    LUT scalars (pallas Refs in the kernel, arrays in tests).
    """
    T = run.shape[0]
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (T, 64), 1)
    nz = (size > 0) & (lane64 > 0)
    return fields_to_words(run, size, code, nz, dc_code, group,
                           ac_scalar_src_dc, ac_scalar_src_ac)


def fields_to_words(run, size, code, nz, dc_code, group, dc_lut_ref,
                    ac_lut_ref):
    """VLC fields -> per-block packed words: the core shared by the
    rl-input kernel and the fused coeff-input kernel (pallas_quant_pack).

    run/size/code/nz: [T, 64] zigzag-order fields; dc_code/group: [T, 1].
    """
    T = run.shape[0]
    code = code.astype(jnp.uint32)
    grp0 = group == 0                      # [T, 1] bool
    lane64 = jax.lax.broadcasted_iota(jnp.int32, (T, 64), 1)

    # ---- Huffman lookups: masked accumulation over the symbol domain ----
    # masks are disjoint (sym == k), so OR composes the selects exactly;
    # a fori_loop keeps the kernel's stack footprint constant (Mosaic does
    # not reuse slots of unrolled loops) with dynamic SMEM scalar reads
    sym = ((run & 15) << 4) | size

    # dynamic size bound: only size classes present in the tile are
    # scanned.  Within a size class the 16 run nibbles resolve with two
    # grouped compares (run bit 3 rides in the compare key, run bits 0-2
    # pick among 8 per-row leaf scalars through a select tree): ~20 whole
    # -tile ops per size class instead of 48 for 16 single-symbol selects
    smax = jnp.max(jnp.where(nz, size, 0))
    sym_g = (sym | 0x70).astype(jnp.int32)      # keep run bit 3 + size
    b4 = (sym & 0x10) != 0
    b5 = (sym & 0x20) != 0
    b6 = (sym & 0x40) != 0

    def lut_step(i, acc):
        s_cls = i + 1
        for g in range(2):                      # run high bit
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

    esc = jnp.where(grp0, ac_lut_ref[0, 0xF0], ac_lut_ref[1, 0xF0])
    esc_code = (esc >> 16).astype(jnp.uint32)      # [T, 1]
    esc_len = (esc & 0xFF).astype(jnp.int32)
    eob = jnp.where(grp0, ac_lut_ref[0, 0x00], ac_lut_ref[1, 0x00])

    dcl = dc_code & 0x0F

    def dc_step(k, acc):
        leaf = jnp.where(grp0, dc_lut_ref[0, k], dc_lut_ref[1, k])
        return acc | jnp.where(dcl == k, leaf, jnp.uint32(0))

    dc_packed = jax.lax.fori_loop(
        0, jnp.max(dcl) + 1, dc_step, jnp.zeros_like(dcl).astype(jnp.uint32))

    # ---- per-position entry fields ----
    sym_val = (s_code << size.astype(jnp.uint32)) | code
    sym_len = jnp.where(nz, s_len + size, 0)

    n_esc = jnp.where(nz, run >> 4, 0)
    pair = jnp.minimum(n_esc, 2)
    single = n_esc - pair
    ep_val = jnp.where(
        pair == 2, (esc_code << esc_len.astype(jnp.uint32)) | esc_code,
        jnp.where(pair == 1, esc_code, jnp.uint32(0)))
    ep_len = pair * esc_len
    es_val = jnp.where(single == 1, esc_code, jnp.uint32(0))
    es_len = single * esc_len

    # DC entry occupies the sym/val slot of position 0
    dc_suffix = (dc_code >> 4).astype(jnp.uint32)
    dc_val = ((dc_packed >> 16) << dcl.astype(jnp.uint32)) | dc_suffix
    dc_len = (dc_packed & 0xFF).astype(jnp.int32) + dcl
    first = lane64 == 0
    sym_val = jnp.where(first, dc_val, sym_val)
    sym_len = jnp.where(first, dc_len, sym_len)

    # EOB is emitted after everything when the last nonzero isn't #63
    # (escape fields at position 0 are already zero: nz excludes lane 0)
    last = jnp.max(jnp.where(nz, lane64, 0), axis=1, keepdims=True)
    has_eob = last < 63

    # ---- per-position bit offsets (the three sub-entries of a position
    # emit in order: escape-pair, escape-single, symbol+value; position 0
    # carries the DC entry in the sym field; EOB goes last) ----
    pos_len = ep_len + es_len + sym_len             # [T, 64]
    pos_off = _cumsum_lanes_exclusive(pos_len)
    ep_off = pos_off
    es_off = pos_off + ep_len
    sym_off = es_off + es_len
    total_no_eob = (jax.lax.slice_in_dim(pos_off, 63, 64, axis=1)
                    + jax.lax.slice_in_dim(pos_len, 63, 64, axis=1))
    eob_len = jnp.where(has_eob, eob & 0xFF, 0).astype(jnp.int32)  # [T, 1]
    eob_val = jnp.where(has_eob, eob >> 16, 0).astype(jnp.uint32)
    total = total_no_eob + eob_len

    def split(vals, lens, offs):
        """Word-straddling hi/lo contributions of right-aligned entries."""
        b = offs & 31
        end = b + lens
        active = lens > 0
        sh_hi_l = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
        sh_hi_r = jnp.clip(end - 32, 0, 31).astype(jnp.uint32)
        sh_lo = jnp.clip(64 - end, 0, 31).astype(jnp.uint32)
        hi = jnp.where(end <= 32, vals << sh_hi_l, vals >> sh_hi_r)
        hi = jnp.where(active, hi, jnp.uint32(0)).astype(jnp.int32)
        lo = jnp.where(end > 32, vals << sh_lo,
                       jnp.uint32(0)).astype(jnp.int32)
        return hi, lo, offs >> 5

    lane64u = lane64

    def word_loop(fields, init):
        # fold every entry's straddling halves into one lane-doubled
        # array (the lo half targets word q+1), so each word iteration is
        # a single masked reduce instead of two per field
        vals, qs = [], []
        for hi, lo, q in fields:
            vals.extend((hi, lo))
            qs.extend((q, q + 1))
        v2 = jnp.concatenate(vals, axis=1)
        q2 = jnp.concatenate(qs, axis=1)

        def word_step(w, words_acc):
            acc = jnp.sum(jnp.where(q2 == w, v2, 0), axis=1,
                          keepdims=True)
            return words_acc | jnp.where(lane64u == w, acc,
                                         0).astype(jnp.uint32)

        # dynamic bound: only words below the tile's longest stream
        return jax.lax.fori_loop(0, wmax, word_step, init)

    wmax = (jnp.max(total) + 31) >> 5
    words = word_loop([split(sym_val, sym_len, sym_off)],
                      jnp.zeros((T, WORDS), jnp.uint32))

    # escape runs (>= 16 zeros) are rare: fold their two fields in only
    # when the tile contains any, halving the word loop on typical tiles
    words = jax.lax.cond(
        jnp.any(n_esc > 0),
        lambda ws: word_loop([split(ep_val, ep_len, ep_off),
                              split(es_val, es_len, es_off)], ws),
        lambda ws: ws, words)

    # EOB: exactly one right-aligned entry per block at a known offset —
    # OR it straight into its (at most two) words by lane match instead of
    # carrying a third field through the word loop (bits are disjoint)
    ehi, elo, eq = split(eob_val, eob_len, total_no_eob)
    words = words | jnp.where(lane64u == eq, ehi, 0).astype(jnp.uint32) \
                  | jnp.where(lane64u == eq + 1, elo, 0).astype(jnp.uint32)
    return words, total


class _DropLead:
    """Index adapter: exposes ref[g, k] over a [1, G, K]-shaped ref."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[(0,) + tuple(idx)]


def _vlc_pack_kernel_sets(run_ref, size_ref, code_ref, meta_ref,
                          dc_lut_ref, ac_lut_ref, words_ref, total_ref):
    """Per-image-LUT variant: LUT refs carry a leading singleton dim
    (the image slice picked by the BlockSpec index map)."""
    dc, group = unpack_block_meta(cols_from_lanes(meta_ref[:]))
    words, total = _vlc_pack_body(
        run_ref[:], size_ref[:], code_ref[:], dc, group,
        _DropLead(dc_lut_ref), _DropLead(ac_lut_ref))
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, meta_ref.shape[1])


@functools.partial(jax.jit, static_argnames=("tile", "tiles_per_img"))
def vlc_pack_pallas(run, size, code, dc_codes, group, dc_luts, ac_luts,
                    tile: int = DEFAULT_TILE, tiles_per_img: int = 0):
    """Fused VLC + pack.

    run/size/code: [N, 64] int32 zigzag-order fields (position 0 ignored
    for AC; size==0 marks uncoded positions); dc_codes: [N] packed DC
    size|suffix codes; group: [N] int32 table group per block;
    dc_luts [2, 16] / ac_luts [2, 256] uint32 packed (code<<16|len) LUTs.

    Per-image Huffman tables: pass dc_luts [B, 2, 16] / ac_luts
    [B, 2, 256] and `tiles_per_img` (rows must be image-major with
    per-image block counts padded to tile * tiles_per_img); each grid
    step's BlockSpec index map selects its image's LUT slice, so the
    kernel body stays two-table.
    Returns ([N, 64] uint32 words, [N] int32 bit counts).
    """
    N = run.shape[0]
    rem = (-N) % tile
    if rem:
        pad2 = ((0, rem), (0, 0))
        run = jnp.pad(run, pad2)
        size = jnp.pad(size, pad2)
        code = jnp.pad(code, pad2)
        dc_codes = jnp.pad(dc_codes, (0, rem))
        group = jnp.pad(group, (0, rem))
    NP = N + rem
    # Mosaic block rule: sublane dim divisible by 8 -> 64-lane meta rows
    # give an (8, 64) block at the production tile; tiny test tiles fall
    # back to one row per block (interpret mode does not enforce tiling)
    mw = 64 if tile % 512 == 0 else tile
    meta = pack_block_meta(dc_codes, group).reshape(NP // mw, mw)

    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((tile // mw, mw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    if tiles_per_img:
        assert dc_luts.ndim == 3 and NP // tile == \
            dc_luts.shape[0] * tiles_per_img
        t = tiles_per_img
        lut_spec = lambda shape: pl.BlockSpec(
            (1,) + shape, lambda i, t=t: (i // t, 0, 0),
            memory_space=pltpu.SMEM)
        kernel = _vlc_pack_kernel_sets
    else:
        lut_spec = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                              memory_space=pltpu.SMEM)
        kernel = _vlc_pack_kernel
    words, totals = pl.pallas_call(
        kernel,
        grid=(NP // tile,),
        in_specs=[spec64, spec64, spec64, spec_meta,
                  lut_spec((2, 16)), lut_spec((2, 256))],
        out_specs=(
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_meta,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP, WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((NP // mw, mw), jnp.int32),
        ),
    )(run, size, code.astype(jnp.int32), meta,
      dc_luts.astype(jnp.uint32), ac_luts.astype(jnp.uint32))
    return words[:N], totals.reshape(-1)[:N]
