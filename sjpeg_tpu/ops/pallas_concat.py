"""Pallas TPU kernel for bitstream concatenation.

Merges N per-block bit streams (64-word buffers + exact bit lengths, as
produced by the pack kernel) into per-image contiguous streams.

Design: the TPU grid is sequential, so the running stream state lives
across grid steps.  Three levels keep every memory access aligned to
Mosaic's tiling rules:

1. append window `open` [1, 256] (VMEM, full-ref accesses only): each
   block's words are bit-phase shifted in registers and positioned with a
   dynamic lane roll, then OR-ed in.
2. completed 128-word chunks are placed into an in-register [8, 128]
   superchunk accumulator with a dynamic sublane roll (registers have no
   alignment constraints).
3. every 8th chunk the accumulator is stored to a [8, 128] VMEM scratch
   (full-ref store) and DMA-ed to its row-aligned [8, 128] slot of the
   2-D HBM output.

Overflowing images clamp inside their slot and are detected via the exact
totals (the caller refetches them through the unbatched path).  Replaces
the XLA scatter/search formulations whose ~10 ns/element gather/scatter
lowering dominated the whole encode.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WORDS = 64                  # words per block stream
TILE = 512                  # blocks appended per grid step
CHUNK = 128                 # chunk granularity (words, = one lane row)
WIN = 2 * CHUNK             # open window size
SUPER_ROWS = 8              # rows per superchunk
SUPER = SUPER_ROWS * CHUNK  # HBM DMA granularity (words)


def _make_concat_kernel(bucket_rows: int, tiles: int):
    max_super = bucket_rows // SUPER_ROWS - 1

    def kernel(words_ref, lens_ref, out_ref, pos_ref, chunk_ref,
               open_ref, buf_ref, dma_sem):
        i = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            pos_ref[0] = 0
            chunk_ref[0] = 0
            open_ref[:] = jnp.zeros((1, WIN), jnp.uint32)
            buf_ref[:] = jnp.zeros((SUPER_ROWS, CHUNK), jnp.uint32)

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIN), 1)
        row_id = jax.lax.broadcasted_iota(jnp.int32, (SUPER_ROWS, CHUNK), 0)

        def dma_super(k):
            k = jnp.minimum(k, max_super)
            row0 = pl.multiple_of(i * bucket_rows + k * SUPER_ROWS,
                                  SUPER_ROWS)
            copy = pltpu.make_async_copy(
                buf_ref, out_ref.at[pl.ds(row0, SUPER_ROWS), :], dma_sem)
            copy.start()
            copy.wait()

        def place(w, bitpos, chunk):
            """Position one block's words at `bitpos` within the window."""
            s = (bitpos & 31).astype(jnp.uint32)
            local = (bitpos >> 5) - chunk * CHUNK
            hi = w >> s
            prev = jnp.concatenate(
                [jnp.zeros((1, 1), jnp.uint32), w[:, :WORDS - 1]], axis=1)
            inv = jnp.uint32(32) - s
            lo = jnp.where(s > 0, prev << inv, jnp.uint32(0))
            shifted = hi | lo
            tail = jnp.where(s > 0, w[:, WORDS - 1:] << inv, jnp.uint32(0))
            frame = jnp.concatenate(
                [shifted, tail, jnp.zeros((1, WIN - WORDS - 1), jnp.uint32)],
                axis=1)                               # [1, WIN]
            placed = pltpu.roll(frame, shift=local, axis=1)
            return jnp.where(lane >= local, placed, jnp.uint32(0))

        def append(p, carry):
            # two blocks per iteration: their combined stream spans at most
            # 127 + 2*64 + 1 <= 256 window words, so a single crossing check
            # (and window shift) still suffices
            bitpos, chunk = carry
            b = p * 2
            w1 = words_ref[pl.ds(b, 1), :]            # [1, WORDS] uint32
            w2 = words_ref[pl.ds(b + 1, 1), :]
            L1 = lens_ref[b, 0]
            L2 = lens_ref[b + 1, 0]
            placed = (place(w1, bitpos, chunk)
                      | place(w2, bitpos + L1, chunk))
            open_ref[:] = open_ref[:] | placed

            new_bits = bitpos + L1 + L2
            crossed = ((new_bits >> 5) - chunk * CHUNK) >= CHUNK

            # chunk completion is rare (every ~25 appends at typical rates):
            # every superchunk op hides behind this branch, and the
            # accumulator lives in buf_ref (full-ref accesses are aligned)
            @pl.when(crossed)
            def _():
                slot = chunk % SUPER_ROWS
                chunk_row = jnp.concatenate(
                    [open_ref[:, :CHUNK],
                     jnp.zeros((SUPER_ROWS - 1, CHUNK), jnp.uint32)],
                    axis=0)
                placed_row = pltpu.roll(chunk_row, shift=slot, axis=0)
                buf_ref[:] = buf_ref[:] | jnp.where(
                    row_id == slot, placed_row, jnp.uint32(0))

                @pl.when(slot == SUPER_ROWS - 1)
                def _():
                    dma_super(chunk // SUPER_ROWS)
                    buf_ref[:] = jnp.zeros((SUPER_ROWS, CHUNK), jnp.uint32)

                rolled = pltpu.roll(open_ref[:], shift=WIN - CHUNK, axis=1)
                open_ref[:] = jnp.where(lane < CHUNK, rolled, jnp.uint32(0))

            new_chunk = jnp.where(crossed, chunk + 1, chunk)
            return new_bits, new_chunk

        bits, chunk = jax.lax.fori_loop(
            0, TILE // 2, append, (pos_ref[0], chunk_ref[0]))
        pos_ref[0] = bits
        chunk_ref[0] = chunk

        # end of image: flush both window chunks + trailing superchunk
        @pl.when(t == tiles - 1)
        def _():
            def place(chunk_idx, words_1x):
                slot = chunk_idx % SUPER_ROWS
                cr = jnp.concatenate(
                    [words_1x,
                     jnp.zeros((SUPER_ROWS - 1, CHUNK), jnp.uint32)], axis=0)
                pr = pltpu.roll(cr, shift=slot, axis=0)
                return jnp.where(row_id == slot, pr, jnp.uint32(0))

            buf_ref[:] = buf_ref[:] | place(chunk, open_ref[:, :CHUNK])

            @pl.when(chunk % SUPER_ROWS == SUPER_ROWS - 1)
            def _():
                dma_super(chunk // SUPER_ROWS)
                buf_ref[:] = jnp.zeros((SUPER_ROWS, CHUNK), jnp.uint32)

            c1 = chunk + 1
            buf_ref[:] = buf_ref[:] | place(c1, open_ref[:, CHUNK:])

            @pl.when(c1 % SUPER_ROWS == SUPER_ROWS - 1)
            def _():
                dma_super(c1 // SUPER_ROWS)
                buf_ref[:] = jnp.zeros((SUPER_ROWS, CHUNK), jnp.uint32)

            dma_super((c1 // SUPER_ROWS)
                      + jnp.where(c1 % SUPER_ROWS == SUPER_ROWS - 1, 1, 0))

    return kernel


@functools.partial(jax.jit, static_argnames=("n_images", "bucket"))
def concat_block_streams_pallas(words, bit_lens, n_images: int,
                                bucket: int):
    """[N, WORDS] uint32 + [N] int32 -> ([n_images, bucket] uint32,
    [n_images] int32 total bits).  N is image-major; blocks per image are
    padded here to a multiple of TILE with zero-length blocks."""
    N, W = words.shape
    assert W == WORDS
    per_img = N // n_images
    pad = (-per_img) % TILE
    if pad:
        words = jnp.pad(words.reshape(n_images, per_img, W),
                        ((0, 0), (0, pad), (0, 0))).reshape(-1, W)
        bit_lens = jnp.pad(bit_lens.reshape(n_images, per_img),
                           ((0, 0), (0, pad))).reshape(-1)
        per_img += pad
    tiles = per_img // TILE

    totals = jnp.sum(bit_lens.reshape(n_images, per_img), axis=1)

    # slot size in 128-word rows: bucket rounded up + 2 spare superchunks
    bucket_rows = ((bucket + SUPER - 1) // SUPER + 2) * SUPER_ROWS
    out = pl.pallas_call(
        _make_concat_kernel(bucket_rows, tiles),
        grid=(n_images, tiles),
        in_specs=[
            pl.BlockSpec((TILE, WORDS),
                         lambda i, t, tiles=tiles: (i * tiles + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1),
                         lambda i, t, tiles=tiles: (i * tiles + t, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((n_images * bucket_rows, CHUNK),
                               lambda i, t: (0, 0),
                               memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n_images * bucket_rows, CHUNK),
                                       jnp.uint32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, WIN), jnp.uint32),
            pltpu.VMEM((SUPER_ROWS, CHUNK), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(words, bit_lens.reshape(-1, 1))
    out = out.reshape(n_images, bucket_rows * CHUNK)
    return out[:, :bucket], totals.astype(jnp.int32)
