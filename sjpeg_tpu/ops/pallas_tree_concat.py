"""Pallas TPU kernels: parallel log-tree bitstream concatenation.

A fully parallel merge tree (successor of an earlier sequential append
concat): level by level, adjacent per-block bit streams are
merged pairwise until each image is one contiguous stream.  Every level
is a uniform row-parallel kernel — no sequential grid, no cross-step
scratch state — so wall time scales with HBM traffic (one read + one
write of the ~constant-size unit array per level), not with the number
of blocks.

Layout invariant: a row of the unit array holds 4 consecutive streams in
its lanes ([u0 u1 u2 u3], each left-aligned in W words with exact bit
length carried separately).  The kernel merges them into one left-aligned
stream of 4W words (two pair merges + one final merge); an XLA row-major
reshape [M, 4W] -> [M/4, 16W] then regroups 4 consecutive merged streams
per row for the next level.  Merging a stream of L_A bits with one of
L_B bits: phase-shift B right by L_A mod 32 (per-row broadcast shifts),
then place at word offset L_A >> 5 with a log-step ladder of static
`pltpu.roll`s + per-row selects.  Zero-length padding streams merge as
no-ops, so per-image unit counts are padded to powers of two.

The reference writes its stream strictly serially (src/bit_writer.h
PutBits / src/enc.cc:1240-1259); this is the TPU-shaped equivalent with
bit-identical results.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_vlc_pack import cols_from_lanes, lanes_from_cols

WORDS = 64                   # words per block stream (level-0 unit)


def _place(b, la, w):
    """Shift stream `b` [R, W(=w)] right by `la` bits into a [R, 2W] frame.

    b is left-aligned; returns the frame with b starting at bit la
    (la <= w * 32).  Static rolls only; `la` is a per-row [R, 1] int32.
    """
    R = b.shape[0]
    s = (la & 31).astype(jnp.uint32)
    b_prev = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.uint32), b[:, :-1]], axis=1)
    inv = jnp.uint32(32) - s
    hi = b >> s
    lo = jnp.where(s > 0, b_prev << inv, jnp.uint32(0))
    tail = jnp.where(s > 0, b[:, -1:] << inv, jnp.uint32(0))
    frame = jnp.concatenate(
        [hi | lo, tail, jnp.zeros((R, w - 1), jnp.uint32)], axis=1)
    o = la >> 5                               # word offset in [0, w]

    # log-step placement ladder as a fori_loop (dynamic roll shifts) so
    # Mosaic reuses the frame's VMEM slot instead of materializing one
    # temporary per unrolled step.  The bound is data-dependent: real
    # streams fill a small fraction of their frame, so the high offset
    # bits are zero tile-wide and those ladder steps are skipped.
    def body(k, f):
        sh = jnp.int32(1) << k
        rolled = pltpu.roll(f, shift=sh, axis=1)
        return jnp.where((o & sh) > 0, rolled, f)

    omax = jnp.max(o)
    ks = jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1)
    nsteps = jnp.sum(jnp.where((omax >> ks) > 0, 1, 0))
    return jax.lax.fori_loop(0, jnp.minimum(nsteps, w.bit_length()),
                             body, frame)


def _merge2(x, la, w):
    """[R, 2w]: left-aligned A in lanes [0,w), B in [w,2w) -> merged."""
    a = jax.lax.slice_in_dim(x, 0, w, axis=1)
    b = jax.lax.slice_in_dim(x, w, 2 * w, axis=1)
    placed = _place(b, la, w)
    apad = jnp.concatenate([a, jnp.zeros_like(a)], axis=1)
    return apad | placed


def _make_merge4_kernel(w: int, out_w: int):
    def kernel(units_ref, lens_ref, out_ref):
        x = units_ref[:]                       # [R, 4w] uint32
        l = lens_ref[:]                        # [R, 4] int32
        l0 = jax.lax.slice_in_dim(l, 0, 1, axis=1)
        l1 = jax.lax.slice_in_dim(l, 1, 2, axis=1)
        l2 = jax.lax.slice_in_dim(l, 2, 3, axis=1)
        m0 = _merge2(jax.lax.slice_in_dim(x, 0, 2 * w, axis=1), l0, w)
        m1 = _merge2(jax.lax.slice_in_dim(x, 2 * w, 4 * w, axis=1), l2, w)
        y = jnp.concatenate([m0, m1], axis=1)  # [R, 4w]
        m = _merge2(y, l0 + l1, 2 * w)
        out_ref[:] = (m if out_w == 4 * w
                      else jax.lax.slice_in_dim(m, 0, out_w, axis=1))

    return kernel


def _make_merge2_kernel(w: int, out_w: int):
    def kernel(units_ref, lens_ref, out_ref):
        l0 = jax.lax.slice_in_dim(lens_ref[:], 0, 1, axis=1)
        m = _merge2(units_ref[:], l0, w)
        out_ref[:] = (m if out_w == 2 * w
                      else jax.lax.slice_in_dim(m, 0, out_w, axis=1))

    return kernel


def _dotf(x, m):
    return jax.lax.dot_general(x, m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _sel_matmul(lb, sel, passes: int):
    """Exact int32 `lb @ sel` for a 0/1 selection matrix: split lb into
    8-bit parts (bf16-exact) and run `passes` default-precision MXU
    passes, recombined in int32 (same scheme as pallas_fdct._imatmul)."""
    acc = None
    for p in range(passes):
        part = ((lb >> (8 * p)) & 0xFF).astype(jnp.float32)
        r = _dotf(part, sel).astype(jnp.int32) << (8 * p)
        acc = r if acc is None else acc + r
    return acc


def _make_merge4_kernel_ll(w: int, out_w: int, mw_out: int, passes: int):
    """Radix-4 merge kernel with lane-packed lens I/O: lens arrive as
    [R*4/mw_in, mw_in] rows (unit-order flat) instead of a [R, 4] block —
    [*, 4]-shaped HBM arrays tile to (8, 128) on TPU (32x inflated) and
    XLA materializes them through multi-ms strided async-slice chains.
    In-kernel the four per-slot columns are regrouped with one-hot MXU
    matmuls and transposed to sublanes; totals leave lane-packed the same
    way (mw_out lanes) for the next level."""

    def kernel(units_ref, lens_ref, out_ref, lout_ref):
        x = units_ref[:]                       # [R, 4w] uint32
        lb = lens_ref[:]                       # [rows_b, mw_in] int32
        mw_in = lb.shape[1]
        per = mw_in // 4
        i0 = jax.lax.broadcasted_iota(jnp.int32, (mw_in, per), 0)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (mw_in, per), 1)
        cols = []
        for k in range(4):
            sel = (i0 == 4 * i1 + k).astype(jnp.float32)
            g = _sel_matmul(lb, sel, passes)   # [rows_b, per], slot k
            cols.append(cols_from_lanes(g))    # [R, 1]
        l0, l1, l2, l3 = cols
        m0 = _merge2(jax.lax.slice_in_dim(x, 0, 2 * w, axis=1), l0, w)
        m1 = _merge2(jax.lax.slice_in_dim(x, 2 * w, 4 * w, axis=1), l2, w)
        y = jnp.concatenate([m0, m1], axis=1)  # [R, 4w]
        m = _merge2(y, l0 + l1, 2 * w)
        out_ref[:] = (m if out_w == 4 * w
                      else jax.lax.slice_in_dim(m, 0, out_w, axis=1))
        lout_ref[:] = lanes_from_cols(l0 + l1 + l2 + l3, mw_out)

    return kernel


def _level_tile_rows(rows: int, lanes: int) -> int:
    """Rows per grid step: ~4 MB unit tiles within the Mosaic block rule
    (sublane dim divisible by 8, or equal to the array's)."""
    if rows % 8 or rows <= 8:
        return rows
    max_r = max(8, (1 << 20) // (lanes * 4))
    R = 8
    while R * 2 <= max_r and rows % (R * 2) == 0:
        R *= 2
    return R


def _merge_level_ll(units, lens_packed, w: int, out_w: int, R: int,
                    mw_out: int, passes: int):
    """Radix-4 tree level with lane-packed lens: [rows, 4w] units +
    [rows*4/mw_in, mw_in] lens -> ([rows, out_w], [rows/mw_out, mw_out])."""
    rows, lanes = units.shape
    mw_in = lens_packed.shape[1]
    spec_u = pl.BlockSpec((R, lanes), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_l = pl.BlockSpec((R * 4 // mw_in, mw_in), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out, lout = pl.pallas_call(
        _make_merge4_kernel_ll(w, out_w, mw_out, passes),
        grid=(rows // R,),
        in_specs=[spec_u, spec_l],
        out_specs=(
            pl.BlockSpec((R, out_w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R // mw_out, mw_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, out_w), jnp.uint32),
            jax.ShapeDtypeStruct((rows // mw_out, mw_out), jnp.int32),
        ),
    )(units, lens_packed)
    return out, lout


def _merge_level(units, lens, w: int, radix: int, out_w: int):
    """One tree level: [M, radix*w] rows (+ per-unit lens [M, radix]) ->
    ([M, out_w] merged rows, [M] total bits).  The whole lens block
    rides into the kernel (XLA column slices of [M, radix] arrays lower
    to multi-ms async-slice chains on TPU).  out_w < radix*w truncates
    each merged frame — valid only while the true content fits out_w*32
    bits; the caller detects violations from the exact lens and flags
    the image for the slow path."""
    M = units.shape[0]
    lanes = radix * w
    R = _level_tile_rows(M, lanes)
    spec_u = pl.BlockSpec((R, lanes), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_l = pl.BlockSpec((R, radix), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    kernel = (_make_merge4_kernel(w, out_w) if radix == 4
              else _make_merge2_kernel(w, out_w))
    out = pl.pallas_call(
        kernel,
        grid=(M // R,),
        in_specs=[spec_u, spec_l],
        out_specs=pl.BlockSpec((R, out_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, out_w), jnp.uint32),
    )(units, lens)
    return out, jnp.sum(lens, axis=1)


# Stop growing tree units once the dynamic-store Pallas finisher places
# the remaining units cheaper than further merge levels would (measured
# sweep on chip, 16x1024^2: 2048 -> 7.1 ms vs 32768 -> 8.2 ms; below 1024
# the finisher's per-unit fixed cost takes over: 512 -> 10.3 ms).
W_STOP = 2048

# Number of early radix-4 levels whose merged frames are truncated to
# half width (2w instead of 4w).  Real streams average ~50-150 bits per
# 2048-bit level-0 frame, so halving keeps ~8-30x slack while halving
# every later level's HBM traffic; a unit whose exact length exceeds the
# truncated frame flags its image for the engine's (host) slow path.
SLICED_LEVELS = 3

# Truncation only pays on large levels; small images (few units) gain
# nothing and — with dense content (~300 bits/block) — overflow the
# halved frames almost surely, pushing every image to the slow path.
SLICED_MIN_UNITS = 4096


def _finish_units(units, lens, n_images: int, bucket: int):
    """Place the per-image unit sequences at their exact bit offsets.

    units: [M, W] uint32 left-aligned (zero beyond each unit's content),
    lens: [M] bits, M = n_images * k image-major.  A lax.scan of
    dynamic-update-slices writes each unit's phase-shifted segment at its
    word offset (in-place on the donated carry); the straddling boundary
    word is composed by OR-ing with the already-written prefix, which is
    zero beyond the previous unit's content."""
    M, W = units.shape
    k = M // n_images
    l2 = lens.reshape(n_images, k)
    off = jnp.cumsum(l2, axis=1) - l2              # exclusive bit offsets
    totals = jnp.sum(l2, axis=1)

    s = (off.reshape(-1, 1) & 31).astype(jnp.uint32)
    prev = jnp.concatenate(
        [jnp.zeros((M, 1), jnp.uint32), units[:, :-1]], axis=1)
    inv = jnp.uint32(32) - s
    hi = units >> s
    lo = jnp.where(s > 0, prev << inv, jnp.uint32(0))
    tail = jnp.where(s > 0, units[:, -1:] << inv, jnp.uint32(0))
    shifted = jnp.concatenate([hi | lo, tail], axis=1)   # [M, W + 1]

    cap = max(bucket, 128)
    out0 = jnp.zeros((n_images, cap + W + 1), jnp.uint32)
    img_ids = jnp.repeat(jnp.arange(n_images, dtype=jnp.int32), k)
    wo = jnp.minimum(off.reshape(-1) >> 5, cap)    # clamp overflow writes

    def body(out, x):
        img, o, seg = x
        cur = jax.lax.dynamic_slice(out, (img, o), (1, W + 1))
        out = jax.lax.dynamic_update_slice(out, cur | seg[None, :],
                                           (img, o))
        return out, None

    out, _ = jax.lax.scan(body, out0, (img_ids, wo, shifted))
    return out[:, :bucket], totals.astype(jnp.int32)


def _make_finish_kernel(k: int, wr: int, out_rows: int):
    """Per-image finisher: merge k wide units into one stream by
    dynamic-sublane read-modify-write placement.

    Units arrive as [k * wr, 128] sublane-major word rows; each unit is
    phase-shifted by its bit offset (o & 31), lane-rotated by the word
    offset's lane part (wo & 127, one dynamic pltpu.roll + row-carry
    select), and OR-stored at sublane row wo >> 7.  Replaces the XLA
    scan finisher whose n_images * k sequential dynamic-update-slice
    steps dominated the concat (4.8 ms -> DMA-bound)."""

    def kernel(units_ref, off_ref, out_ref):
        out_ref[:] = jnp.zeros((out_rows, LANE_F), jnp.uint32)

        def unit_step(j, carry):
            o = off_ref[j >> 7, j & (LANE_F - 1)]
            u = units_ref[pl.ds(j * wr, wr), :]            # [wr, 128]
            row_u = jax.lax.broadcasted_iota(jnp.int32, (wr, LANE_F), 0)
            lane_u = jax.lax.broadcasted_iota(jnp.int32, (wr, LANE_F), 1)
            s = (o & 31).astype(jnp.uint32)
            inv = jnp.uint32(32) - s
            # previous flat word: lane roll by 1 + sublane-roll row carry
            # (fresh iotas + rolls only: sublane slices / [1, 128] concats
            # of loop-carried values abort the Mosaic compiler here)
            pr = pltpu.roll(u, shift=1, axis=1)
            pr_dn = jnp.where(row_u > 0, pltpu.roll(pr, shift=1, axis=0),
                              jnp.uint32(0))
            prev = jnp.where(lane_u > 0, pr, pr_dn)
            ph = (u >> s) | jnp.where(s > 0, prev << inv, jnp.uint32(0))
            # tail word (content spilling past the unit's last word)
            last = jnp.sum(jnp.where(
                (row_u == wr - 1) & (lane_u == LANE_F - 1),
                u.astype(jnp.int32), 0)).astype(jnp.uint32)
            row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE_F), 0)
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE_F), 1)
            tailblk = jnp.where(
                (row8 == 0) & (lane8 == 0),
                jnp.where(s > 0, last << inv, jnp.uint32(0)),
                jnp.uint32(0))
            frame = jnp.concatenate([ph, tailblk], axis=0)  # [wr + 8, 128]
            wo = o >> 5
            c0 = wo & (LANE_F - 1)
            row_f = jax.lax.broadcasted_iota(jnp.int32,
                                             (wr + 8, LANE_F), 0)
            lane_f = jax.lax.broadcasted_iota(jnp.int32,
                                              (wr + 8, LANE_F), 1)
            fr = pltpu.roll(frame, shift=c0, axis=1)
            fr_dn = jnp.where(row_f > 0, pltpu.roll(fr, shift=1, axis=0),
                              jnp.uint32(0))
            placed = jnp.where(lane_f >= c0, fr, fr_dn)
            r0 = jnp.minimum(wo >> 7, out_rows - (wr + 8))
            cur = out_ref[pl.ds(r0, wr + 8), :]
            out_ref[pl.ds(r0, wr + 8), :] = cur | placed
            return carry

        jax.lax.fori_loop(0, k, unit_step, 0)

    return kernel


LANE_F = 128


def _finish_units_pallas(units, lens, n_images: int, bucket: int):
    """Pallas finisher (see _make_finish_kernel); units [M, w] with
    w % 128 == 0.  Falls back to the XLA scan via the caller for other
    shapes."""
    M, w = units.shape
    k = M // n_images
    wr = w // LANE_F
    l2 = lens.reshape(n_images, k).astype(jnp.int32)
    offs = jnp.cumsum(l2, axis=1) - l2
    totals = jnp.sum(l2, axis=1)
    out_rows = -(-(-(-bucket // LANE_F) + wr + 8) // 8) * 8
    units_r = units.reshape(M * wr, LANE_F)
    # SMEM blocks obey the same (8, 128) block rule: carry each image's
    # offsets as a lane-packed (rows8, 128) block
    kr = -(-k // LANE_F)
    rows8 = -(-kr // 8) * 8
    offs = jnp.pad(offs, ((0, 0), (0, kr * LANE_F - k)))
    offs = offs.reshape(n_images, kr, LANE_F)
    offs = jnp.pad(offs, ((0, 0), (0, rows8 - kr), (0, 0)))
    offs = offs.reshape(n_images * rows8, LANE_F)
    out = pl.pallas_call(
        _make_finish_kernel(k, wr, out_rows),
        grid=(n_images,),
        in_specs=[
            pl.BlockSpec((k * wr, LANE_F), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows8, LANE_F), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((out_rows, LANE_F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_images * out_rows, LANE_F),
                                       jnp.uint32),
    )(units_r, offs)
    out = out.reshape(n_images, out_rows * LANE_F)[:, :bucket]
    return out, totals.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_images", "bucket",
                                             "sliced", "sliced_min_units"))
def concat_block_streams_tree(words, bit_lens, n_images: int, bucket: int,
                              sliced: bool = True,
                              sliced_min_units: int = SLICED_MIN_UNITS):
    """[N, WORDS] uint32 + [N] int32 -> ([n_images, bucket] uint32,
    [n_images] int32 total bits).  N is image-major; per-image block
    counts are padded to a power of two with zero-length streams.

    With `sliced` (default), the first SLICED_LEVELS radix-4 levels
    truncate merged frames to half width; an image whose content
    overflows a truncated frame gets totals=INT32_MAX so the engine's
    existing per-image refetch fallback re-encodes it exactly.  Pass
    sliced=False on paths that must be overflow-proof (the per-image
    fallback itself).  `sliced_min_units` (static) is the level size
    below which truncation is skipped; tests inject a small value to
    exercise the overflow flag on small batches."""
    N, W = words.shape
    assert W == WORDS
    per_img = N // n_images
    u = 1 << max(per_img - 1, 1).bit_length()       # pow2 >= per_img
    if u < per_img:
        u <<= 1
    pad = u - per_img
    if pad:
        words = jnp.pad(words.reshape(n_images, per_img, W),
                        ((0, 0), (0, pad), (0, 0))).reshape(-1, W)
        bit_lens = jnp.pad(bit_lens.reshape(n_images, per_img),
                           ((0, 0), (0, pad))).reshape(-1)

    out, totals = _run_tree(words, bit_lens.astype(jnp.int32), W,
                            n_images, bucket, sliced, sliced_min_units,
                            level=0, max_bits=W * 32)
    return out, totals


def _run_tree(units, lens, w: int, n_images: int, bucket: int,
              sliced: bool, sliced_min_units: int, level: int,
              max_bits: int):
    """The merge-tree level loop + finisher over per-image pow2-padded
    units ([n_units, w] left-aligned, [n_units] exact bit lens; `level`
    counts block-level tree levels already consumed upstream, `max_bits`
    bounds any entering unit's exact length)."""
    # lens carrier: 1-D [n_units] (carrier_mw == 0) or lane-packed
    # [n_units/carrier_mw, carrier_mw]; both flatten to unit order for
    # free (row-major bitcasts), so transitions between the packed and
    # legacy level kernels never relayout big arrays
    carrier_mw = 0
    n_units = units.shape[0]
    overflow = jnp.zeros((n_images,), jnp.bool_)
    while n_units > n_images:
        per = n_units // n_images                    # units per image
        radix = (4 if per % 4 == 0 and per >= 4 and w * 4 <= W_STOP
                 else 2)
        # `per` is a power of two >= 2 here (u is a pow2 and each level
        # divides it by the radix), so per % radix == 0 always holds
        assert per % radix == 0, per
        # past W_STOP, only a tree-completing pair merge is worth the
        # wider tiles; anything else goes to the XLA scan finisher
        if w >= W_STOP and not (radix == 2 and per == 2):
            break
        # VMEM guard: an 8-row in+out tile must stay ~4 MB
        if (radix * w + radix * w) * 4 * 8 > (1 << 22):
            break
        rows = n_units // radix
        out_w = radix * w
        if (sliced and radix == 4 and level < SLICED_LEVELS
                and n_units >= sliced_min_units):
            out_w = 2 * w
        R = _level_tile_rows(rows, radix * w)
        # lane-packed lens path: big radix-4 levels only (R >= 256 keeps
        # every lens block's sublane count a multiple of 8 and mw >= 32);
        # a 1-D lens carrier packs to 128-wide rows at entry
        use_ll = (radix == 4 and R >= 256 and max_bits < (1 << 16)
                  and (carrier_mw or n_units % 128 == 0))
        if use_ll:
            lens_p = lens if carrier_mw else lens.reshape(-1, 128)
            mw_out = min(128, R // 8)
            passes = (max_bits.bit_length() + 7) // 8
            units, lens = _merge_level_ll(
                units.reshape(rows, radix * w), lens_p, w, out_w, R,
                mw_out, passes)
            carrier_mw = mw_out
            if out_w < radix * w:
                ov = (lens > out_w * 32).reshape(n_images, -1).any(axis=1)
                overflow = overflow | ov
        else:
            lens2 = (lens.reshape(-1) if carrier_mw else lens)
            lens2 = lens2.reshape(rows, radix)
            units, lens = _merge_level(units.reshape(rows, radix * w),
                                       lens2, w, radix, out_w)
            carrier_mw = 0
            if out_w < radix * w:
                ov = (lens > out_w * 32).reshape(n_images, -1).any(axis=1)
                overflow = overflow | ov
        w = out_w
        n_units = rows
        max_bits *= radix
        level += 1

    if n_units == n_images:
        totals = lens.reshape(n_images)
        out = units.reshape(n_images, w)
        if w < bucket:
            out = jnp.pad(out, ((0, 0), (0, bucket - w)))
        out, totals = out[:, :bucket], totals.astype(jnp.int32)
    elif w % LANE_F == 0:
        out, totals = _finish_units_pallas(units.reshape(-1, w),
                                           lens.reshape(-1), n_images,
                                           bucket)
    else:
        out, totals = _finish_units(units.reshape(-1, w), lens.reshape(-1),
                                    n_images, bucket)
    totals = jnp.where(overflow, jnp.int32(0x7FFFFFFF), totals)
    return out, totals


@functools.partial(jax.jit, static_argnames=("n_images", "bucket",
                                             "sliced", "sliced_min_units"))
def concat_units_tree(units, ulens_packed, n_images: int, bucket: int,
                      sliced: bool = True,
                      sliced_min_units: int = SLICED_MIN_UNITS):
    """Tree concat entry for pre-merged multi-block units (the fused
    pack kernel's sample_vlc_pack_units_pallas output): [U, uw] units
    + lane-packed [U/mw, mw] int32 exact unit lens -> the same
    ([n_images, bucket], [n_images] totals) contract as
    concat_block_streams_tree.  Units whose exact length exceeds their
    truncated frame flag their image as INT32_MAX exactly like a
    sliced-level overflow.  Unit width 128 = 4-block units (one fused
    tree level consumed), 256 = 16-block units (two)."""
    U, W2 = units.shape
    assert W2 in (2 * WORDS, 4 * WORDS)
    levels_done = 1 if W2 == 2 * WORDS else 2
    blocks_per_unit = 4 if W2 == 2 * WORDS else 16
    lens = ulens_packed.reshape(-1).astype(jnp.int32)[:U]
    per_u = U // n_images
    overflow = (lens.reshape(n_images, per_u) > W2 * 32).any(axis=1)
    u2 = 1 << max(per_u - 1, 1).bit_length()
    if u2 < per_u:
        u2 <<= 1
    pad = u2 - per_u
    if pad:
        units = jnp.pad(units.reshape(n_images, per_u, W2),
                        ((0, 0), (0, pad), (0, 0))).reshape(-1, W2)
        lens = jnp.pad(lens.reshape(n_images, per_u),
                       ((0, 0), (0, pad))).reshape(-1)
    out, totals = _run_tree(units, lens, W2, n_images, bucket, sliced,
                            sliced_min_units, level=levels_done,
                            max_bits=blocks_per_unit * WORDS * 32)
    return out, jnp.where(overflow, jnp.int32(0x7FFFFFFF), totals)
