"""Device bitstream packing: per-block entry packing and global compaction.

The reference's serial BitWriter (src/bit_writer.h:114-139) becomes a
two-stage parallel program:

1. `pack_block_entries`: each block's <=191 variable-length entries land in a
   fixed [WORDS_PER_BLOCK] uint32 buffer.  Entry bit offsets are an in-block
   cumulative sum; every entry touches at most two 32-bit words, contributed
   via disjoint-bit adds (add == bitwise-or here because each output bit has
   exactly one producer).

2. `compact_stream`: per-block bit lengths prefix-sum into global bit
   offsets; every block word barrel-shifts into at most two output words and
   scatter-adds into the contiguous stream.  The result plus the total bit
   count is everything the host needs (it appends the 1-padding, applies
   0xFF stuffing, and splices between markers).

0xFF byte stuffing is deliberately *not* done on device: it is a cheap
byte-level expansion on the already-compressed stream (~bits/8 bytes), done
in one vectorized host pass (src/bit_writer.h:99-110 semantics).
"""

import jax
import jax.numpy as jnp

# 2048 bits per block covers the worst case stream for one 8x8 block
# (DC <=27 + 63 * <=27 + escapes <=128 + EOB <=16 < 1984).
WORDS_PER_BLOCK = 64


def _shift_contributions(vals, lens, offs):
    """Split right-aligned (vals, lens) entries at bit offsets `offs` into
    per-entry (hi, lo) word contributions: hi lands in word offs >> 5, lo
    spills into the next word when the entry straddles a word boundary."""
    b = offs & 31
    end = b + lens                                   # <= 63
    active = lens > 0
    # All shift amounts clamped into [0, 31]; the unselected where-branch may
    # otherwise compute an out-of-range shift (undefined in XLA).
    sh_hi_l = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
    sh_hi_r = jnp.clip(end - 32, 0, 31).astype(jnp.uint32)
    sh_lo = jnp.clip(64 - end, 0, 31).astype(jnp.uint32)
    hi = jnp.where(end <= 32, vals << sh_hi_l, vals >> sh_hi_r)
    hi = jnp.where(active, hi, jnp.uint32(0))
    lo = jnp.where(end > 32, vals << sh_lo, jnp.uint32(0))
    return hi, lo


def _searchsorted_rows(offs, limits):
    """Per-row binary search: b[n, k] = #{i : offs[n, i] < limits[k]}.

    `offs`: [N, E] row-sorted int32; `limits`: [K] int32 grid.  Returns
    [N, K] int32.  log2(E) rounds of gather+compare — no scatters.
    """
    N, E = offs.shape
    K = limits.shape[0]
    lo = jnp.zeros((N, K), dtype=jnp.int32)
    hi = jnp.full((N, K), E, dtype=jnp.int32)
    for _ in range(E.bit_length() + 1):
        active = hi > lo
        mid = (lo + hi) >> 1
        vm = jnp.take_along_axis(offs, jnp.clip(mid, 0, E - 1), axis=1)
        less = vm < limits[None, :]
        lo = jnp.where(active & less, mid + 1, lo)
        hi = jnp.where(active & ~less, mid, hi)
    return lo


def _segment_sums_from_prefix(prefix, b):
    """Telescoped modular segment sums.

    `prefix`: [N, E] inclusive cumsum (mod 2^32) of per-entry contributions;
    `b`: [N, K+1] monotone boundaries (entry counts).  Returns [N, K] sums of
    entries in [b[k], b[k+1]).  Exact because each segment's true sum fits
    32 bits (disjoint-bit adds), so the modular telescoping cancels.
    """
    N, E = prefix.shape
    padded = jnp.concatenate(
        [jnp.zeros((N, 1), prefix.dtype), prefix], axis=1)   # [N, E+1]
    at_b = jnp.take_along_axis(padded, b, axis=1)            # [N, K+1]
    return at_b[:, 1:] - at_b[:, :-1]


def pack_block_entries(vals, lens):
    """[N, E] entries -> ([N, WORDS_PER_BLOCK] uint32, [N] int32 bit counts).

    Bits are MSB-first: the stream's first bit is bit 31 of word 0.
    Scatter-free: entry offsets are monotone within a block, so each output
    word's contribution is a contiguous entry range recovered by prefix sums
    + a per-row binary search over the 32-bit word grid.
    """
    N, E = vals.shape
    offs = jnp.cumsum(lens, axis=1) - lens           # exclusive prefix sum
    total = offs[:, -1] + lens[:, -1]
    hi, lo = _shift_contributions(vals, lens, offs)

    limits = (32 * jnp.arange(WORDS_PER_BLOCK + 1, dtype=jnp.int32))
    b = _searchsorted_rows(offs, limits)             # [N, W+1]
    h_sum = _segment_sums_from_prefix(jnp.cumsum(hi, axis=1), b)
    l_sum = _segment_sums_from_prefix(jnp.cumsum(lo, axis=1), b)
    # word w: own entries' hi plus the previous word's entries' lo spill
    l_prev = jnp.pad(l_sum[:, :-1], ((0, 0), (1, 0)))
    return h_sum + l_prev, total


def _concat_rows(words, bit_lens, out_words: int):
    """Merge row-wise block streams into per-row contiguous streams.

    `words`: [R, n, W] uint32 — R independent streams, each the
    concatenation of n blocks of W words; `bit_lens`: [R, n].  Returns
    ([R, out_words] uint32, [R] int32 totals).  Scatter-free: per-block
    word entries are given clamped monotone global offsets, then the same
    prefix-sum + binary-search segment reduction as the entry packer.
    """
    R, n, W = words.shape
    offs = jnp.cumsum(bit_lens, axis=1) - bit_lens      # [R, n] bit offsets
    totals = offs[:, -1] + bit_lens[:, -1]

    s = (offs & 31)[:, :, None]
    su = s.astype(jnp.uint32)
    hi = (words >> su).reshape(R, n * W)
    lo = jnp.where(s > 0,
                   words << jnp.clip(32 - s, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0)).reshape(R, n * W)

    # Entry (block, j) occupies output word base + j with base = offs >> 5
    # (in-block words never carry across the block's 32-bit phase).  The
    # number of entries below the word boundary 32m therefore has a closed
    # form from two block-level binary searches:
    #   e(m) = 64 * #{ends < 32m}                        (fully passed blocks)
    #        + sum over straddling blocks of (m - base)  (partial prefixes)
    limits = 32 * jnp.arange(out_words + 1, dtype=jnp.int32)
    ends = offs + bit_lens
    n1 = _searchsorted_rows(ends, limits)               # [R, out+1]
    n2 = _searchsorted_rows(offs, limits)
    base = offs >> 5
    sb = jnp.concatenate(
        [jnp.zeros((R, 1), jnp.int32), jnp.cumsum(base, axis=1)], axis=1)
    sb_n1 = jnp.take_along_axis(sb, n1, axis=1)
    sb_n2 = jnp.take_along_axis(sb, n2, axis=1)
    m_grid = jnp.arange(out_words + 1, dtype=jnp.int32)[None, :]
    e = W * n1 + (n2 - n1) * m_grid - (sb_n2 - sb_n1)   # [R, out+1]

    h_sum = _segment_sums_from_prefix(jnp.cumsum(hi, axis=1), e)
    l_sum = _segment_sums_from_prefix(jnp.cumsum(lo, axis=1), e)
    l_prev = jnp.pad(l_sum[:, :-1], ((0, 0), (1, 0)))
    return h_sum + l_prev, totals


def concat_block_streams(words, bit_lens):
    """Merge per-block bit streams into one contiguous stream.

    `words`: [N, W] uint32 (bits beyond each block's length are zero);
    `bit_lens`: [N] int32.  Returns ([N * W] uint32 words of which only the
    first ceil(total/32) are meaningful, total_bits int32 scalar).
    """
    N, W = words.shape
    out, totals = _concat_rows(words[None], bit_lens[None], N * W)
    return out[0], totals[0]


def concat_block_streams_batched(words, bit_lens, n_images: int,
                                 bucket: int):
    """Per-image stream compaction for a batched encode.

    `words`: [N, W] with N = n_images * blocks_per_image (image-major);
    `bit_lens`: [N].  Each image's blocks merge into its own `bucket`-word
    slot; words past the bucket are dropped (detected via the exact totals).
    Returns ([n_images, bucket] uint32, [n_images] int32 total bits).
    """
    N, W = words.shape
    per_img = N // n_images
    out, totals = _concat_rows(words.reshape(n_images, per_img, W),
                               bit_lens.reshape(n_images, per_img), bucket)
    return out, totals


def interleave_components(comp_vals, comp_lens, nb_blocks):
    """Reorder per-component entry arrays into MCU-interleaved block order.

    `comp_vals[c]`: [N_c, E]; `nb_blocks[c]`: blocks per MCU.  Component
    arrays are already in per-component scan order, so the interleave is a
    static reshape/concat: for each MCU, nb_blocks[0] rows of comp 0, then
    comp 1, ...  Returns ([N_total, E] vals, lens).
    """
    n_mcu = comp_vals[0].shape[0] // nb_blocks[0]
    vs, ls = [], []
    for v, l, nb in zip(comp_vals, comp_lens, nb_blocks):
        vs.append(v.reshape(n_mcu, nb, -1))
        ls.append(l.reshape(n_mcu, nb, -1))
    vals = jnp.concatenate(vs, axis=1).reshape(-1, comp_vals[0].shape[1])
    lens = jnp.concatenate(ls, axis=1).reshape(-1, comp_lens[0].shape[1])
    return vals, lens
