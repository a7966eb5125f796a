"""Device-side optimal Huffman table construction.

Byte-exact replica of huffman.build_optimal_table + build_code_lut (the
host mirror of the reference's BuildOptimalTable / BuildHuffmanTable,
src/enc.cc:1311-1487 and :433-463), vectorized over a batch of table
instances so a dichotomy pass can go frequencies -> packed code LUTs ->
bit-exact size entirely on device: the search loop's freqs fetch + host
merge + LUT upload round trip (2 tunnel RPCs per pass) collapses to one
scalar fetch.

Algorithm notes (mirroring the host implementation exactly):
- merge keys are (freq << 9 | index); active indices stay distinct, so
  keys never tie and selection is a pure lexicographic (freq, index)
  argmin-2.  The smallest node is absorbed into the second-smallest,
  which keeps its index (enc.cc:1412-1426).
- a fake lowest-frequency symbol (index `size`, freq 1) owns the
  all-ones code and is dropped at the end.
- subtree depth increments ride a per-leaf component id (`comp`): the
  reference's intrusive linked list becomes a masked vector update.
- code lengths clamp at 32, rebalance to <= 16 by the pair-up/leaf-down
  moves, then the fake's slot is removed from the longest length.
- symbols sort by (codesize, symbol) with the fake INSERTED at position
  #(real codesizes <= fake codesize) and the list truncated to nb_syms;
  canonical codes assign first-code-per-length running counters.  The
  resulting LUT entry is (code << 16) | length, 0 for absent symbols,
  duplicate writes resolved last-position-wins like numpy fancy
  assignment in the host version.

Frequencies must stay below 2^31 (the reference's own counters are
uint32; callers gate gigantic inputs to the host path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.int32(0x7FFFFFFF)


def _merge_kernel(freqw_ref, active_ref, comp_ref, cs_ref, nleft_ref,
                  out_ref, *, steps: int):
    """The Huffman merge loop in VMEM: identical per-step ops to the
    lax.scan path below, but the ~size serial steps run inside one
    kernel instead of ~size XLA ops each paying dispatch overhead (the
    scan costs ~20 ms for a 16-image batch's AC tables; this runs in
    well under a millisecond)."""
    G, Wp = freqw_ref.shape
    slots = jax.lax.broadcasted_iota(jnp.int32, (G, Wp), 1)

    def body(_, st):
        freqw, active, comp, cs, nleft = st
        do = nleft > 1                                     # [G, Wp]
        fm = jnp.where(active > 0, freqw, _BIG)
        f1 = jnp.min(fm, axis=1, keepdims=True)
        i2 = jnp.min(jnp.where((active > 0) & (fm == f1), slots, Wp),
                     axis=1, keepdims=True)
        not2 = slots != i2
        fm2 = jnp.where((active > 0) & not2, freqw, _BIG)
        f2 = jnp.min(fm2, axis=1, keepdims=True)
        i1 = jnp.min(jnp.where((active > 0) & not2 & (fm2 == f2),
                               slots, Wp), axis=1, keepdims=True)
        freqw = jnp.where(do & (slots == i1), freqw + f1, freqw)
        active = jnp.where(do & (slots == i2), 0, active)
        m = do & ((comp == i1) | (comp == i2))
        cs = cs + m.astype(jnp.int32)
        comp = jnp.where(m, i1, comp)
        nleft = nleft - do.astype(jnp.int32)
        return freqw, active, comp, cs, nleft

    st = (freqw_ref[:], active_ref[:], comp_ref[:], cs_ref[:],
          nleft_ref[:])
    st = jax.lax.fori_loop(0, steps, body, st)
    out_ref[:] = st[3]


def _merge_codesizes_pallas(freqw, active, comp, cs, nleft, steps: int):
    """[G, W] merge state -> final code sizes, via the in-VMEM kernel.
    Pads W to a lane multiple and G to a sublane multiple; padded slots
    are inactive with unique comp ids, padded rows get nleft=0."""
    G, W = freqw.shape
    Wp = -(-W // 128) * 128
    Gp = -(-G // 8) * 8
    pw, pg = Wp - W, Gp - G

    def pad(x, fill):
        return jnp.pad(x, ((0, pg), (0, pw)), constant_values=fill)

    slots_w = jnp.arange(Wp, dtype=jnp.int32)[None, :]
    freqw_p = pad(freqw, _BIG)
    active_p = pad(active.astype(jnp.int32), 0)
    comp_p = jnp.where(jnp.arange(Wp)[None, :] < W,
                       pad(comp, 0), slots_w)
    comp_p = jnp.broadcast_to(comp_p, (Gp, Wp))
    cs_p = pad(cs, 0)
    nleft_p = jnp.pad(nleft, (0, pg))[:, None] * jnp.ones(
        (1, Wp), jnp.int32)
    out = pl.pallas_call(
        functools.partial(_merge_kernel, steps=steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, Wp), jnp.int32),
    )(freqw_p, active_p, comp_p, cs_p, nleft_p)
    return out[:G, :W]


@functools.partial(jax.jit, static_argnames=("size", "lut_size",
                                             "with_syms"))
def optimal_code_luts(freq, size: int, lut_size: int = 0,
                      with_syms: bool = False):
    """[G, W] int32 frequencies -> (lut [G, lut_size] uint32,
    bits [G, 16] int32, nb_syms [G] int32[, syms [G, size] int32]).

    `size` = symbol count (12 for DC, 256 for AC); W must be >= size+1
    (slot `size` is used for the fake symbol).  Rows with all-zero
    frequencies produce all-zero LUTs (the host path never emits such a
    table).  with_syms additionally returns the symbol-at-position
    array (the DHT emission order, first nb_syms entries meaningful,
    including the host's inserted-0 artifact at the fake position)."""
    if lut_size == 0:
        lut_size = size if size > 16 else 16
    G, W = freq.shape
    assert W >= size + 1
    slots = jnp.arange(W, dtype=jnp.int32)[None, :]
    freq = freq.astype(jnp.int32)

    real0 = (freq > 0) & (slots < size)
    nb_syms = jnp.sum(real0, axis=1).astype(jnp.int32)     # [G]
    freqw = jnp.where(slots == size, 1, jnp.where(real0, freq, 0))
    active0 = real0 | (slots == size)
    empty = nb_syms == 0                                   # no real syms

    # ---- first merge: the host appends the fake symbol to the sorted
    # key list WITHOUT re-sorting, so the first merge always absorbs
    # the fake into the smallest-key real symbol (huffman.py:108-118)
    have = ~empty
    fm0 = jnp.where(real0, freqw, _BIG)
    f1r = jnp.min(fm0, axis=1, keepdims=True)
    i1f = jnp.min(jnp.where(real0 & (fm0 == f1r), slots, W),
                  axis=1, keepdims=True)
    do0 = have[:, None]
    freqw = jnp.where(do0 & (slots == i1f), freqw + 1, freqw)
    active0_m = active0 & ~(do0 & (slots == size))
    cs_init = (do0 & ((slots == i1f) | (slots == size))).astype(jnp.int32)
    comp_init = jnp.where(do0 & (slots == size), i1f,
                          jnp.broadcast_to(slots, (G, W))).astype(
                              jnp.int32)

    # ---- merge loop: nb_active-1 steps, masked ----------------------
    def step(carry, _):
        freqw, active, comp, cs, nleft = carry
        do = (nleft > 1)[:, None]                          # [G, 1]
        fm = jnp.where(active, freqw, _BIG)
        f1 = jnp.min(fm, axis=1, keepdims=True)
        i2 = jnp.min(jnp.where(active & (fm == f1), slots, W),
                     axis=1, keepdims=True)                # smallest key
        not2 = slots != i2
        fm2 = jnp.where(active & not2, freqw, _BIG)
        f2 = jnp.min(fm2, axis=1, keepdims=True)
        i1 = jnp.min(jnp.where(active & not2 & (fm2 == f2), slots, W),
                     axis=1, keepdims=True)                # second smallest
        freqw = jnp.where(do & (slots == i1), freqw + f1, freqw)
        active = active & ~(do & (slots == i2))
        m = do & ((comp == i1) | (comp == i2))
        cs = cs + m.astype(jnp.int32)
        comp = jnp.where(m, i1, comp)
        nleft = nleft - do[:, 0].astype(jnp.int32)
        return (freqw, active, comp, cs, nleft), None

    nleft0 = nb_syms + 1 - have.astype(jnp.int32)
    if jax.default_backend() != "cpu":
        cs = _merge_codesizes_pallas(freqw, active0_m, comp_init, cs_init,
                                     nleft0, max(size - 1, 1))
    else:
        (_, _, _, cs, _), _ = jax.lax.scan(
            step, (freqw, active0_m, comp_init, cs_init, nleft0), None,
            length=max(size - 1, 1))

    cs = jnp.where(active0, jnp.minimum(cs, 32), 0)        # MAX_BITS clamp

    # ---- length histogram + rebalance to <= 16 ----------------------
    ls = jnp.arange(1, 33, dtype=jnp.int32)
    bits32 = jnp.sum((cs[:, :, None] == ls[None, None, :]) & active0[
        :, :, None], axis=1).astype(jnp.int32)             # [G, 32]
    li = jnp.arange(32, dtype=jnp.int32)

    def rebalance_l(l, bits32):
        # move pairs of length l+1 up while any row still has them
        def cond(b):
            return jnp.any(b[:, l] > 0)

        def body(b):
            act = b[:, l] > 0                              # [G]
            # the host's downward walk stops at the first NONZERO count
            # (which can transiently be negative), not the first positive
            k = jnp.max(jnp.where((li[None, :] <= l - 2) & (b != 0),
                                  li[None, :], -1), axis=1)  # [G]
            onek = (li[None, :] == k[:, None])
            onek1 = (li[None, :] == (k + 1)[:, None])
            delta = (-2 * (li[None, :] == l)
                     + 1 * (li[None, :] == l - 1)
                     - 1 * onek + 2 * onek1)
            return jnp.where(act[:, None], b + delta, b)

        return jax.lax.while_loop(cond, body, bits32)

    # static outer walk from length 32 (index 31) down to 17 (index 16)
    for l in range(31, 15, -1):
        bits32 = rebalance_l(l, bits32)

    # drop the fake all-ones symbol from the longest populated length
    # (host walks down over ZERO counts only: first nonzero stops it)
    mx = jnp.max(jnp.where(bits32[:, :16] != 0, li[None, :16], 0), axis=1)
    bits16 = bits32[:, :16] - (li[None, :16] == mx[:, None])
    bits16 = jnp.where(empty[:, None], 0, bits16)          # [G, 16]

    # ---- symbol ranks (stable (codesize, symbol) order) -------------
    cs_r = cs[:, :size]
    real = real0[:, :size]
    csx = jnp.where(real, cs_r, 99)                        # inactive last
    # rank = #(j: cs_j < cs_s) + #(j < s: cs_j == cs_s), real only
    lt = (csx[:, :, None] > csx[:, None, :]) & real[:, None, :]
    eq = ((csx[:, :, None] == csx[:, None, :]) & real[:, None, :]
          & (jnp.arange(size)[None, None, :] < jnp.arange(size)[
              None, :, None]))
    rank = jnp.sum(lt | eq, axis=2).astype(jnp.int32)      # [G, size]
    cs_fake = cs[:, size][:, None]
    fake_pos = jnp.sum(real & (csx <= cs_fake), axis=1,
                       keepdims=True).astype(jnp.int32)
    pos = rank + (rank >= fake_pos)                        # final position

    # ---- canonical codes from the final bits ------------------------
    # first[l] = first code of length l+1; cum[l] = #codes of length <= l+1
    def scan_first(carry, bl):
        first, cum = carry
        out = (first, cum)
        first = (first + bl) << 1
        cum = cum + bl
        return (first, cum), out

    (_, _), (firsts, cume) = jax.lax.scan(
        scan_first, (jnp.zeros(G, jnp.int32), jnp.zeros(G, jnp.int32)),
        bits16.T)
    firsts, cume = firsts.T, cume.T                        # [G, 16]
    cums = cume + bits16         # scan emits the EXCLUSIVE prefix sums

    # length at position p: smallest l with cums[l] > p
    p_ok = real & (pos < nb_syms[:, None])
    len_p = jnp.sum((cums[:, None, :] <= pos[:, :, None]).astype(
        jnp.int32), axis=2) + 1                            # [G, size]
    lidx = jnp.clip(len_p - 1, 0, 15)
    code_p = (jnp.take_along_axis(firsts, lidx, axis=1)
              + pos - jnp.take_along_axis(cume, lidx, axis=1))
    packed = ((code_p.astype(jnp.uint32) << 16)
              | len_p.astype(jnp.uint32))
    packed = jnp.where(p_ok, packed, 0)

    # scatter by symbol (already symbol-indexed) — except the fake
    # inserts symbol 0 at fake_pos when fake_pos < nb_syms, and numpy's
    # fancy assignment gives the LAST write (the higher position) to
    # the duplicated symbol 0
    fp = fake_pos[:, 0]
    fake_in = fp < nb_syms
    f_lidx = jnp.clip(jnp.sum((cums <= fp[:, None]).astype(jnp.int32),
                              axis=1), 0, 15)
    f_code = (jnp.take_along_axis(firsts, f_lidx[:, None], axis=1)[:, 0]
              + fp - jnp.take_along_axis(cume, f_lidx[:, None],
                                         axis=1)[:, 0])
    f_packed = ((f_code.astype(jnp.uint32) << 16)
                | (f_lidx + 1).astype(jnp.uint32))
    sym0_use_fake = fake_in & (~p_ok[:, 0] | (fp > pos[:, 0]))
    lut = packed
    lut = lut.at[:, 0].set(jnp.where(sym0_use_fake, f_packed,
                                     packed[:, 0]))
    if lut_size > size:
        lut = jnp.pad(lut, ((0, 0), (0, lut_size - size)))
    else:
        lut = lut[:, :lut_size]
    if not with_syms:
        return lut, bits16, nb_syms
    # symbol-at-position (DHT order): scatter each in-range symbol to
    # its position; the fake position keeps the initialized 0 (exactly
    # the host's np.insert(..., fake_pos, 0) artifact)
    symid = jnp.broadcast_to(jnp.arange(size, dtype=jnp.int32)[None, :],
                             (G, size))
    pos_c = jnp.where(p_ok, pos, size)         # out-of-range drops
    syms = jnp.zeros((G, size + 1), jnp.int32).at[
        jnp.arange(G)[:, None], pos_c].set(symid)[:, :size]
    return lut, bits16, nb_syms, syms


def luts_and_desc_from_freqs(freq_dc, freq_ac, nb_tables: int = 2):
    """luts_from_freqs plus the device-resident DHT description:
    (dc_luts [B, 2, 16], ac_luts [B, 2, 256], nb_syms [B, 4],
    desc = (dc_bits [B, 2, 16], ac_bits [B, 2, 16],
            dc_syms [B, 2, 12], ac_syms [B, 2, 256])).
    A single end-of-encode fetch of `desc` + nb_syms reconstructs the
    emission HuffmanTables (tables_from_desc) without ever fetching the
    frequencies."""
    B = freq_dc.shape[0]
    fdc = freq_dc.reshape(B * 2, -1)[:, :12].astype(jnp.int32)
    fac = freq_ac.reshape(B * 2, -1)[:, :256].astype(jnp.int32)
    if nb_tables == 1:
        keep = (jnp.arange(B * 2) % 2) == 0
        fdc = jnp.where(keep[:, None], fdc, 0)
        fac = jnp.where(keep[:, None], fac, 0)
    fdc = jnp.pad(fdc, ((0, 0), (0, 16 - 12)))
    fac = jnp.pad(fac, ((0, 0), (0, 257 + 63 - 256)))
    dc_luts, dc_bits, nb_dc, dc_syms = optimal_code_luts(
        fdc, 12, 16, with_syms=True)
    ac_luts, ac_bits, nb_ac, ac_syms = optimal_code_luts(
        fac, 256, 256, with_syms=True)
    nb = jnp.stack([nb_dc.reshape(B, 2)[:, 0], nb_dc.reshape(B, 2)[:, 1],
                    nb_ac.reshape(B, 2)[:, 0], nb_ac.reshape(B, 2)[:, 1]],
                   axis=1)
    desc = (dc_bits.reshape(B, 2, 16), ac_bits.reshape(B, 2, 16),
            dc_syms.reshape(B, 2, 12), ac_syms.reshape(B, 2, 256))
    return dc_luts.reshape(B, 2, 16), ac_luts.reshape(B, 2, 256), nb, desc


def desc_to_flat(nbs, desc):
    """(nb_syms [B, 4], desc arrays) -> one [B, 604] int32 array so the
    whole DHT description rides a single fetch."""
    dc_bits, ac_bits, dc_syms, ac_syms = desc
    B = nbs.shape[0]
    return jnp.concatenate(
        [nbs.astype(jnp.int32), dc_bits.reshape(B, -1),
         ac_bits.reshape(B, -1), dc_syms.reshape(B, -1),
         ac_syms.reshape(B, -1)], axis=1)


def tables_from_flat(flat_np, i: int, nb_tables: int = 2):
    """Fetched [B, 604] desc_to_flat array -> image i's HuffmanTables."""
    nbs = flat_np[:, 0:4]
    desc = (flat_np[:, 4:36].reshape(-1, 2, 16),
            flat_np[:, 36:68].reshape(-1, 2, 16),
            flat_np[:, 68:92].reshape(-1, 2, 12),
            flat_np[:, 92:604].reshape(-1, 2, 256))
    return tables_from_desc(nbs, desc, i, nb_tables)


def tables_from_desc(nbs_np, desc_np, i: int, nb_tables: int = 2):
    """Fetched nb_syms [B, 4] + desc arrays -> image i's four
    HuffmanTables ([dc_l, dc_c, ac_l, ac_c]; chroma entries are the K.3
    defaults when nb_tables == 1), identical to the host
    optimal_tables_from_freqs result for the same frequencies."""
    from ..huffman import HuffmanTable, k3_default_tables
    dc_bits, ac_bits, dc_syms, ac_syms = desc_np
    tables = [None] * 4
    for c in range(nb_tables):
        ndc = int(nbs_np[i, c])
        nac = int(nbs_np[i, 2 + c])
        tables[c] = HuffmanTable(
            bits=dc_bits[i, c].astype(np.uint8),
            syms=dc_syms[i, c, :ndc].astype(np.uint8), nb_syms=ndc)
        tables[2 + c] = HuffmanTable(
            bits=ac_bits[i, c].astype(np.uint8),
            syms=ac_syms[i, c, :nac].astype(np.uint8), nb_syms=nac)
    if nb_tables == 1:
        defaults = k3_default_tables()
        tables[1], tables[3] = defaults[1], defaults[3]
    return tables


def luts_from_freqs(freq_dc, freq_ac, nb_tables: int = 2):
    """[B, 2, 12+] DC and [B, 2, 256+] AC frequency stacks -> device
    (dc_luts [B, 2, 16] uint32, ac_luts [B, 2, 256] uint32,
    nb_syms [B, 4] int32) matching huffman.optimal_tables_from_freqs +
    build_code_lut on every populated table.  With nb_tables == 1
    (grayscale) the chroma rows get zero frequencies and produce zero
    LUTs (never read by the pack)."""
    B = freq_dc.shape[0]
    fdc = freq_dc.reshape(B * 2, -1)[:, :12].astype(jnp.int32)
    fac = freq_ac.reshape(B * 2, -1)[:, :256].astype(jnp.int32)
    if nb_tables == 1:
        keep = (jnp.arange(B * 2) % 2) == 0
        fdc = jnp.where(keep[:, None], fdc, 0)
        fac = jnp.where(keep[:, None], fac, 0)
    fdc = jnp.pad(fdc, ((0, 0), (0, 16 - 12)))
    fac = jnp.pad(fac, ((0, 0), (0, 257 + 63 - 256)))
    dc_luts, _, nb_dc = optimal_code_luts(fdc, 12, 16)
    ac_luts, _, nb_ac = optimal_code_luts(fac, 256, 256)
    nb = jnp.stack([nb_dc.reshape(B, 2)[:, 0], nb_dc.reshape(B, 2)[:, 1],
                    nb_ac.reshape(B, 2)[:, 0], nb_ac.reshape(B, 2)[:, 1]],
                   axis=1)
    return (dc_luts.reshape(B, 2, 16), ac_luts.reshape(B, 2, 256), nb)
