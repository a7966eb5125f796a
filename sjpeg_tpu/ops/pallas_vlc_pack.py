"""Pallas TPU kernel: fused VLC coding + per-block bit packing.

Takes zigzag-order run/size/code fields straight from quantization and
produces each block's packed 64-word bit buffer + exact bit count in one
VMEM-resident pass:

1. Huffman lookups as masked accumulation over the (run, size) symbol
   domain — TPU has no vector gather, and XLA's gather lowering costs
   ~10 ns/element; grouped predicated selects on whole tiles beat it by
   >10x.  AC tables are runtime inputs (two groups: luma/chroma),
   selected per lane.  The per-block DC lookup happens *outside* the
   kernel on [N] arrays (32 predicated selects in XLA) and ships as a
   packed (dc_value << 5 | dc_len) word in the lane-packed meta rows —
   per-block [T, 1]-shaped work inside a kernel costs a full vreg row
   per op, the same as [T, 64] work, so scalar chains don't belong here.
2. Two blocks per kernel row: every [*, 64] array would waste half of
   each 128-lane vreg, so fields are carried as [T/2, 128] with block A
   in lanes 0-63 and block B in lanes 64-127 (A = tile blocks [0, T/2),
   B = [T/2, T)); lane scans (bit-offset cumsum, zero-run cummax) are
   segmented at the half boundary.  This halves the VPU cost of the
   whole body (measured 2.8x on chip for the op mix).
3. Entry streams assembled *interleaved* — no [N, 192] HBM
   materialization: exclusive bit-offset cumsum (log-step shifted adds),
   word-straddling hi/lo split, and the 64-word predicated-reduction
   pack over one-block rows.

This kernel plus the concat kernel replace everything between
quantization and the byte-level host pass.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORDS = 64
# 1024 amortizes the per-grid-step fixed cost (scalar reductions for the
# dynamic loop bounds + DMA setup); measured faster than 512 on the chip
# (scripts/r2_experiments.py kernel)
DEFAULT_TILE = 1024
LANE = 128


def _cumsum_lanes_exclusive(x):
    """Exclusive prefix sum along the last (lane) axis, log-step shifts.

    Mosaic has no cumsum primitive; build it from static-shape shifted
    adds (zero-padded concatenation, no dynamic slicing).
    """
    lanes = x.shape[-1]
    zeros = jnp.zeros_like(x)
    total = x
    s = 1
    while s < lanes:
        shifted = jnp.concatenate(
            [zeros[:, :s], total[:, :-s]], axis=1)
        total = total + shifted
        s <<= 1
    return total - x       # exclusive


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


def _paired(x):
    """[T, C] one-block rows -> [T/2, 2C]: block r in lanes [0, C) of
    row r, block r + T/2 in lanes [C, 2C)."""
    half = x.shape[0] // 2
    return jnp.concatenate([x[:half], x[half:]], axis=1)


def _unpaired(x):
    """[R, 2C] paired rows -> [2R, C] one-block rows (inverse of
    `_paired`).  The high half is brought to lane offset 0 with a full
    -width rotate before slicing: a bare x[:, half:] slice keeps lane
    offset `half` in its Mosaic layout, and concatenating it with the
    offset-0 low half on dim 0 fails to compile."""
    half = x.shape[1] // 2
    hi = jnp.roll(x, -half, axis=1)
    return jnp.concatenate([x[:, :half], hi[:, :half]], axis=0)


def _cumsum_seg_exclusive(x, seg):
    """Exclusive prefix sum along lanes, restarting every `seg` lanes."""
    lanes = x.shape[-1]
    if seg == lanes:
        return _cumsum_lanes_exclusive(x)
    lane_ib = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % seg
    zeros = jnp.zeros_like(x)
    total = x
    s = 1
    while s < seg:
        shifted = jnp.concatenate([zeros[:, :s], total[:, :-s]], axis=1)
        total = total + jnp.where(lane_ib >= s, shifted, 0)
        s <<= 1
    return total - x


def _cummax_lanes(x):
    """Inclusive running maximum along the last (lane) axis, log steps."""
    lanes = x.shape[-1]
    zeros = jnp.zeros_like(x)
    s = 1
    while s < lanes:
        shifted = jnp.concatenate([zeros[:, :s], x[:, :-s]], axis=1)
        x = jnp.maximum(x, shifted)
        s <<= 1
    return x


# ---------------------------------------------------------------------------
# XLA-side helpers (wrapper code, not kernel code)
# ---------------------------------------------------------------------------

_DC_SHIFT = 5            # packed meta: (dc_value << 5) | dc_bit_length


def dc_pack32(dc_codes, group, dc_luts, n_images: int = 1):
    """[N] packed DC size|suffix codes + [N] groups -> [N] uint32
    (dc_value << 5 | dc_len) via the group's DC Huffman table.

    The reference's DC path (src/enc.cc:482-499 + the kDCTable lookup in
    CodeBlock, src/enc.cc:889-892) as 32 predicated selects over [N]
    arrays — XLA's vector gather would cost ~10 ns/element.
    dc_luts: [2, 16] shared or [B, 2, 16] per-image packed
    (code << 16 | len) LUTs.
    """
    dcl = (dc_codes & 15).astype(jnp.int32)
    suffix = (dc_codes >> 4).astype(jnp.uint32) & 0xFFF
    per_img = dc_luts.ndim == 3
    if per_img:
        shp = (n_images, dc_codes.shape[0] // n_images)
        dcl2 = dcl.reshape(shp)
        grp2 = group.reshape(shp)
        packed = jnp.zeros(shp, jnp.uint32)
        for g in range(2):
            for k in range(16):
                leaf = dc_luts[:, g, k].astype(jnp.uint32)[:, None]
                packed = packed | jnp.where((grp2 == g) & (dcl2 == k),
                                            leaf, jnp.uint32(0))
        packed = packed.reshape(-1)
    else:
        packed = jnp.zeros(dc_codes.shape, jnp.uint32)
        for g in range(2):
            for k in range(16):
                leaf = dc_luts[g, k].astype(jnp.uint32)
                packed = packed | jnp.where((group == g) & (dcl == k),
                                            leaf, jnp.uint32(0))
    code = packed >> 16
    clen = (packed & 0xFF).astype(jnp.int32)
    dcl_u = dcl.astype(jnp.uint32)
    dc_val = (code << dcl_u) | suffix
    dc_len = (clen + dcl).astype(jnp.uint32)
    return (dc_val << _DC_SHIFT) | dc_len


def build_meta_rows(dc_codes, group, dc_luts, tile, mw, n_images=1):
    """Lane-packed per-block meta: [2 * N/mw, mw] int32 with per-tile
    interleaving — each grid step's meta block holds tile//mw rows of
    packed DC words followed by tile//mw rows of table groups."""
    n = dc_codes.shape[0]
    dc32 = dc_pack32(dc_codes, group, dc_luts, n_images)
    tpm = tile // mw
    a = dc32.astype(jnp.int32).reshape(n // tile, tpm, mw)
    b = group.astype(jnp.int32).reshape(n // tile, tpm, mw)
    return jnp.concatenate([a, b], axis=1).reshape(-1, mw)


# ---------------------------------------------------------------------------
# Kernel body (pure, shape-polymorphic; shared with tests)
# ---------------------------------------------------------------------------


def _split_entries(vals, lens, offs):
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


def _pack_words(T, wmax, sym_f, esc_thunk, any_esc, eob_f,
                esc_bounds=None):
    """Predicated-reduction word pack over one-block rows.

    sym_f: (hi, lo, q) [T, 64] triples for the symbol entries;
    esc_thunk: nullary returning the escape-field triples (traced only
    inside the cond); eob_f: (hi, lo, q) [T, 1] for the EOB entry;
    esc_bounds: optional (lo, hi) scalar word window containing every
    escape entry in the tile (escapes are rare AND clustered, so their
    pass scans a few words instead of wmax).
    """
    lane64u = jax.lax.broadcasted_iota(jnp.int32, (T, WORDS), 1)

    def word_loop(fields, init, lo=0, hi=None):
        # fold every entry's straddling halves into one lane-doubled
        # array (the lo half targets word q+1), so each word iteration is
        # a single masked reduce instead of two per field
        vals, qs = [], []
        for hi_f, lo_f, q in fields:
            vals.extend((hi_f, lo_f))
            qs.extend((q, q + 1))
        v2 = jnp.concatenate(vals, axis=1)
        q2 = jnp.concatenate(qs, axis=1)

        def word_step(w, words_acc):
            acc = jnp.sum(jnp.where(q2 == w, v2, 0), axis=1,
                          keepdims=True)
            return words_acc | jnp.where(lane64u == w, acc,
                                         0).astype(jnp.uint32)

        # dynamic bound: only words below the tile's longest stream
        return jax.lax.fori_loop(lo, wmax if hi is None else hi,
                                 word_step, init)

    words = word_loop([sym_f], jnp.zeros((T, WORDS), jnp.uint32))

    # escape runs (>= 16 zeros) are rare: fold their two fields in only
    # when the tile contains any, halving the word loop on typical tiles
    e_lo, e_hi = ((jnp.int32(0), None) if esc_bounds is None
                  else esc_bounds)
    words = jax.lax.cond(
        any_esc,
        lambda ws: word_loop(list(esc_thunk()), ws, e_lo, e_hi),
        lambda ws: ws, words)

    # EOB: exactly one right-aligned entry per block at a known offset —
    # OR it straight into its (at most two) words by lane match instead of
    # carrying a third field through the word loop (bits are disjoint)
    ehi, elo, eq = eob_f
    words = words | jnp.where(lane64u == eq, ehi, 0).astype(jnp.uint32) \
                  | jnp.where(lane64u == eq + 1, elo, 0).astype(jnp.uint32)
    return words


def ac_lut_lookup(run, size, nz, grp0, ac_lut_ref):
    """Huffman AC lookups as masked accumulation over the symbol domain.

    Masks are disjoint (sym == k), so OR composes the selects exactly; a
    fori_loop keeps the kernel's stack footprint constant (Mosaic does
    not reuse slots of unrolled loops) with dynamic SMEM scalar reads.

    Dynamic size bound: only size classes present in the tile are
    scanned.  Within a size class the 16 run nibbles resolve with two
    grouped compares (run bit 3 rides in the compare key, run bits 0-2
    pick among 8 per-lane leaf scalars through a select tree): ~20 whole
    -tile ops per size class instead of 48 for 16 single-symbol selects.
    Shared by the production kernels and scripts/kernel_ablate.py.
    Returns the packed (code << 16 | len) uint32 per lane."""
    sym = ((run & 15) << 4) | size
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

    return jax.lax.fori_loop(
        0, smax, lut_step, jnp.zeros_like(sym).astype(jnp.uint32))


def paired_fields_to_words(run, size, code, nz, mdc, grp0, ac_lut_ref):
    """VLC fields -> per-block packed words, paired-row layout.

    run/size/code/nz: [R, 128] zigzag-order fields, two blocks per row
    (block r in lanes 0-63, block r + R in lanes 64-127 of row r);
    mdc: [2R, 1] int32 bit-pattern of packed (dc_value << 5 | dc_len);
    grp0: [R, 128] luma-table mask; ac_lut_ref: indexable [2, 256]
    packed-LUT scalars.  Returns ([2R, 64] words, [2R, 1] bit totals).
    """
    R = run.shape[0]
    T = 2 * R
    code = code.astype(jnp.uint32)
    gl = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    lane_ib = gl & 63

    ac_packed = ac_lut_lookup(run, size, nz, grp0, ac_lut_ref)
    s_code = (ac_packed >> 16).astype(jnp.uint32)
    s_len = (ac_packed & 0xFF).astype(jnp.int32)

    esc = jnp.where(grp0, ac_lut_ref[0, 0xF0], ac_lut_ref[1, 0xF0])
    esc_code = (esc >> 16).astype(jnp.uint32)      # [R, 128]
    esc_len = (esc & 0xFF).astype(jnp.int32)
    eob = jnp.where(grp0, ac_lut_ref[0, 0x00], ac_lut_ref[1, 0x00])

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

    # DC entry occupies the sym/val slot of lane 0 of each half; the
    # (value, bit length) pair comes pre-looked-up in the meta word
    mu = mdc.astype(jnp.uint32)
    dv = mu >> _DC_SHIFT                              # [2R, 1]
    dl = (mu & ((1 << _DC_SHIFT) - 1)).astype(jnp.int32)
    dvA, dvB = dv[:R], dv[R:]
    dlA, dlB = dl[:R], dl[R:]
    first0 = gl == 0
    first64 = gl == 64
    sym_val = jnp.where(first0, dvA, jnp.where(first64, dvB, sym_val))
    sym_len = jnp.where(first0, dlA, jnp.where(first64, dlB, sym_len))

    # ---- per-position bit offsets (the three sub-entries of a position
    # emit in order: escape-pair, escape-single, symbol+value; lane 0 of
    # each half carries the DC entry in the sym field; EOB goes last) ----
    pos_len = ep_len + es_len + sym_len             # [R, 128]
    pos_off = _cumsum_seg_exclusive(pos_len, 64)
    ep_off = pos_off
    es_off = pos_off + ep_len
    sym_off = es_off + es_len

    # columns are extracted with masked lane-reductions, not lane slices:
    # a [R, 1] slice keeps its source lane offset in its Mosaic layout and
    # concatenating offset-63 with offset-127 columns fails to compile
    def _col(x, k):
        return jnp.sum(jnp.where(gl == k, x.astype(jnp.int32), 0),
                       axis=1, keepdims=True)

    tot_incl = pos_off + pos_len
    totA = _col(tot_incl, 63)                       # [R, 1]
    totB = _col(tot_incl, 127)
    # inclusive cummax of nonzero lanes with a per-half base sentinel at
    # lane 0 -> the value at each half's last lane is base + last nonzero
    lastnz = _cummax_lanes(
        jnp.where(nz, gl, jnp.where(lane_ib == 0, gl, 0)))
    lastA = _col(lastnz, 63)
    lastB = _col(lastnz, 127) - 64
    # EOB is emitted after everything when the last nonzero isn't #63
    hA, hB = lastA < 63, lastB < 63
    eobA = _col(eob, 0).astype(jnp.uint32)
    eobB = _col(eob, 64).astype(jnp.uint32)
    eob_len = jnp.concatenate(
        [jnp.where(hA, eobA & 0xFF, 0), jnp.where(hB, eobB & 0xFF, 0)],
        axis=0).astype(jnp.int32)                   # [2R, 1]
    eob_val = jnp.concatenate(
        [jnp.where(hA, eobA >> 16, 0), jnp.where(hB, eobB >> 16, 0)],
        axis=0).astype(jnp.uint32)
    total_no_eob = jnp.concatenate([totA, totB], axis=0)
    total = total_no_eob + eob_len

    # ---- unpair to one-block rows for the word-pack reduction ----
    sym_f = tuple(_unpaired(a) for a in
                  _split_entries(sym_val, sym_len, sym_off))
    esc_thunk = lambda: (
        tuple(_unpaired(a) for a in _split_entries(ep_val, ep_len, ep_off)),
        tuple(_unpaired(a) for a in _split_entries(es_val, es_len, es_off)),
    )
    eob_f = _split_entries(eob_val, eob_len, total_no_eob)
    wmax = (jnp.max(total) + 31) >> 5
    has_esc = n_esc > 0
    esc_end = jnp.max(jnp.where(has_esc, (es_off + es_len) >> 5, 0)) + 2
    esc_lo = jnp.minimum(
        jnp.min(jnp.where(has_esc, ep_off >> 5, jnp.int32(0x7FFFFFFF))),
        wmax)
    words = _pack_words(T, wmax, sym_f, esc_thunk, jnp.any(has_esc),
                        eob_f, esc_bounds=(esc_lo,
                                           jnp.minimum(esc_end, wmax + 1)))
    return words, total


class _DropLead:
    """Index adapter: exposes ref[g, k] over a [1, G, K]-shaped ref."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, idx):
        return self._ref[(0,) + tuple(idx)]


def meta_split(meta_ref, tpm, R):
    """Kernel-side meta unpack: [2*tpm, mw] rows -> ([2R, 1] packed DC
    column, [R, 128] luma-group mask)."""
    mdc, grp0, _ = meta_split_pad(meta_ref, tpm, R)
    return mdc, grp0


def meta_split_pad(meta_ref, tpm, R):
    """meta_split plus the [2R, 1] pad-block column (group values >= 2
    mark per-image padding rows; bit 0 keeps the luma/chroma table
    group so the quantize/LUT selects stay two-way)."""
    mdc = cols_from_lanes(meta_ref[0:tpm])          # [2R, 1]
    grp = cols_from_lanes(meta_ref[tpm:2 * tpm])
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    # select in the int domain, compare after: a select over i1 vectors
    # lowers to an i8->i1 trunci Mosaic can't compile at tile shapes
    grp0 = (jnp.where(lane < 64, grp[:R], grp[R:]) & 1) == 0
    return mdc, grp0, grp >= 2


def _vlc_pack_kernel(run_ref, size_ref, code_ref, meta_ref,
                     ac_lut_ref, words_ref, total_ref, *, tpm):
    run = _paired(run_ref[:])
    size = _paired(size_ref[:])
    code = _paired(code_ref[:])
    R = run.shape[0]
    mdc, grp0 = meta_split(meta_ref, tpm, R)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    nz = (size > 0) & ((lane & 63) > 0)
    words, total = paired_fields_to_words(run, size, code, nz, mdc,
                                          grp0, ac_lut_ref)
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, total_ref.shape[1])


def _vlc_pack_kernel_sets(run_ref, size_ref, code_ref, meta_ref,
                          ac_lut_ref, words_ref, total_ref, *, tpm):
    """Per-image-LUT variant: LUT ref carries a leading singleton dim
    (the image slice picked by the BlockSpec index map)."""
    run = _paired(run_ref[:])
    size = _paired(size_ref[:])
    code = _paired(code_ref[:])
    R = run.shape[0]
    mdc, grp0 = meta_split(meta_ref, tpm, R)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    nz = (size > 0) & ((lane & 63) > 0)
    words, total = paired_fields_to_words(run, size, code, nz, mdc,
                                          grp0, _DropLead(ac_lut_ref))
    words_ref[:] = words
    total_ref[:] = lanes_from_cols(total, total_ref.shape[1])


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
    tpm = tile // mw
    n_images = dc_luts.shape[0] if dc_luts.ndim == 3 else 1
    meta = build_meta_rows(dc_codes, group, dc_luts, tile, mw, n_images)

    spec64 = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((2 * tpm, mw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_tot = pl.BlockSpec((tpm, mw), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if tiles_per_img:
        assert dc_luts.ndim == 3 and NP // tile == \
            n_images * tiles_per_img
        t = tiles_per_img
        lut_spec = pl.BlockSpec(
            (1, 2, 256), lambda i, t=t: (i // t, 0, 0),
            memory_space=pltpu.SMEM)
        kernel = functools.partial(_vlc_pack_kernel_sets, tpm=tpm)
    else:
        lut_spec = pl.BlockSpec((2, 256), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        kernel = functools.partial(_vlc_pack_kernel, tpm=tpm)
    words, totals = pl.pallas_call(
        kernel,
        grid=(NP // tile,),
        in_specs=[spec64, spec64, spec64, spec_meta, lut_spec],
        out_specs=(
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            spec_tot,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP, WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((NP // mw, mw), jnp.int32),
        ),
    )(run, size, code.astype(jnp.int32), meta,
      ac_luts.astype(jnp.uint32))
    return words[:N], totals.reshape(-1)[:N]
