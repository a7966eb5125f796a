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


def pack_block_entries(vals, lens):
    """[N, E] entries -> ([N, WORDS_PER_BLOCK] uint32, [N] int32 bit counts).

    Bits are MSB-first: the stream's first bit is bit 31 of word 0.
    """
    N, E = vals.shape
    offs = jnp.cumsum(lens, axis=1) - lens           # exclusive prefix sum
    total = offs[:, -1] + lens[:, -1]

    b = offs & 31
    q = offs >> 5
    end = b + lens                                   # <= 63
    active = lens > 0
    # All shift amounts clamped into [0, 31]; the unselected where-branch may
    # otherwise compute an out-of-range shift (undefined in XLA).
    sh_hi_l = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
    sh_hi_r = jnp.clip(end - 32, 0, 31).astype(jnp.uint32)
    sh_lo = jnp.clip(64 - end, 0, 31).astype(jnp.uint32)
    hi = jnp.where(end <= 32, vals << sh_hi_l, vals >> sh_hi_r)
    hi = jnp.where(active, hi, jnp.uint32(0))
    # low word: spill into word q+1 when the entry straddles
    lo = jnp.where(end > 32, vals << sh_lo, jnp.uint32(0))

    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    flat_hi = (rows * WORDS_PER_BLOCK + q).reshape(-1)
    flat_lo = (rows * WORDS_PER_BLOCK + q + 1).reshape(-1)
    words = jnp.zeros(N * WORDS_PER_BLOCK + 1, dtype=jnp.uint32)
    words = words.at[flat_hi].add(hi.reshape(-1), mode="drop")
    # `lo` is zero whenever q+1 would cross into the next block's buffer,
    # so the stray index is harmless; still drop out-of-range for safety.
    words = words.at[flat_lo].add(lo.reshape(-1), mode="drop")
    return words[:-1].reshape(N, WORDS_PER_BLOCK), total


def concat_block_streams(words, bit_lens):
    """Merge per-block bit streams into one contiguous stream.

    `words`: [N, W] uint32 (bits beyond each block's length are zero);
    `bit_lens`: [N] int32.  Returns ([N * W + 1] uint32 words of which only
    the first ceil(total/32) are meaningful, total_bits int32 scalar).
    """
    N, W = words.shape
    offs = jnp.cumsum(bit_lens) - bit_lens           # global bit offsets
    total = offs[-1] + bit_lens[-1]

    word_bit = offs[:, None] + 32 * jnp.arange(W, dtype=jnp.int32)[None, :]
    s = (offs & 31)[:, None]                         # per-block shift
    q = word_bit >> 5
    w = words
    su = s.astype(jnp.uint32)
    hi = w >> su
    lo = jnp.where(s > 0, w << jnp.clip(32 - s, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0))

    out = jnp.zeros(N * W + 2, dtype=jnp.uint32)
    out = out.at[q.reshape(-1)].add(hi.reshape(-1), mode="drop")
    out = out.at[(q + 1).reshape(-1)].add(lo.reshape(-1), mode="drop")
    return out[:-2], total


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
    bl = bit_lens.reshape(n_images, per_img)
    offs = jnp.cumsum(bl, axis=1) - bl               # in-image bit offsets
    totals = offs[:, -1] + bl[:, -1]

    offs_flat = offs.reshape(-1)
    word_bit = offs_flat[:, None] + 32 * jnp.arange(W, dtype=jnp.int32)[None]
    s = (offs_flat & 31)[:, None]
    q = word_bit >> 5                                # in-image word index
    su = s.astype(jnp.uint32)
    hi = words >> su
    lo = jnp.where(s > 0,
                   words << jnp.clip(32 - s, 0, 31).astype(jnp.uint32),
                   jnp.uint32(0))

    img = jnp.repeat(jnp.arange(n_images, dtype=jnp.int32), per_img)[:, None]
    oob = n_images * bucket                          # dropped via mode=drop
    idx_hi = jnp.where(q < bucket, img * bucket + q, oob)
    idx_lo = jnp.where(q + 1 < bucket, img * bucket + q + 1, oob)
    out = jnp.zeros(n_images * bucket, dtype=jnp.uint32)
    out = out.at[idx_hi.reshape(-1)].add(hi.reshape(-1), mode="drop")
    out = out.at[idx_lo.reshape(-1)].add(lo.reshape(-1), mode="drop")
    return out.reshape(n_images, bucket), totals


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
