"""Pallas TPU kernel for per-block bit packing.

Packs each block's <=192 variable-length entries (value, bit length) into a
fixed 64-word bit buffer, entirely in VMEM: one HBM read of the entry
arrays, one write of the packed words.  Replaces the XLA formulation
(cumsum + binary-search gathers) whose scatter/gather lowering dominates
the encode on TPU.

Algorithm per block tile [T, 192]:
  offs  = exclusive cumsum of lens along the entry axis (log-step adds)
  hi/lo = entry bits shifted into their word-straddling halves
  out[:, w] = sum_e hi * (q == w) + lo * (q == w - 1)   for w in 0..63
The w-loop is 64 predicated reductions on the VPU; contributions have
disjoint bits so integer adds compose them exactly.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pack as xla_pack

ENTRIES = 192          # padded entry lanes (vlc.NUM_ENTRIES = 191)
WORDS = 64
DEFAULT_TILE = 256     # blocks per grid step


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


def _pack_kernel(vals_ref, lens_ref, words_ref, total_ref):
    vals = vals_ref[:]                       # [T, E] uint32
    lens = lens_ref[:]                       # [T, E] int32
    offs = _cumsum_lanes_exclusive(lens)
    E = lens.shape[1]
    last = jax.lax.slice_in_dim(offs, E - 1, E, axis=1) + \
        jax.lax.slice_in_dim(lens, E - 1, E, axis=1)
    total_ref[:] = last

    b = offs & 31
    end = b + lens
    active = lens > 0
    sh_hi_l = jnp.clip(32 - end, 0, 31).astype(jnp.uint32)
    sh_hi_r = jnp.clip(end - 32, 0, 31).astype(jnp.uint32)
    sh_lo = jnp.clip(64 - end, 0, 31).astype(jnp.uint32)
    hi = jnp.where(end <= 32, vals << sh_hi_l, vals >> sh_hi_r)
    hi = jnp.where(active, hi, jnp.uint32(0)).astype(jnp.int32)
    lo = jnp.where(end > 32, vals << sh_lo, jnp.uint32(0)).astype(jnp.int32)

    q = offs >> 5                            # word index per entry
    for w in range(WORDS):
        acc = jnp.sum(jnp.where(q == w, hi, 0), axis=1)
        acc = acc + jnp.sum(jnp.where(q == w - 1, lo, 0), axis=1)
        words_ref[:, w] = acc.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("tile",))
def pack_block_entries_pallas(vals, lens, tile: int = DEFAULT_TILE):
    """[N, E] entries -> ([N, 64] uint32 words, [N] int32 bit counts).

    Drop-in replacement for ops.pack.pack_block_entries; N must be padded
    to a multiple of `tile` by the caller (zero-length rows pack to zero).
    """
    N, E = vals.shape
    if E < ENTRIES:
        pad = ENTRIES - E
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        lens = jnp.pad(lens, ((0, 0), (0, pad)))
    rem = (-N) % tile
    if rem:
        vals = jnp.pad(vals, ((0, rem), (0, 0)))
        lens = jnp.pad(lens, ((0, rem), (0, 0)))
    NP = N + rem

    words, totals = pl.pallas_call(
        _pack_kernel,
        grid=(NP // tile,),
        in_specs=[
            pl.BlockSpec((tile, ENTRIES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, ENTRIES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, WORDS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP, WORDS), jnp.uint32),
            jax.ShapeDtypeStruct((NP, 1), jnp.int32),
        ),
    )(vals, lens)
    return words[:N], totals[:N, 0]


def pack_block_entries(vals, lens):
    """Pallas-if-available wrapper (falls back to the XLA formulation)."""
    try:
        return pack_block_entries_pallas(vals, lens)
    except Exception:
        return xla_pack.pack_block_entries(vals, lens)
