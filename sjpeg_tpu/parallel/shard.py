"""Sharded encode: batch data-parallel x intra-image MCU-row parallel.

The reference is strictly serial; the only cross-MCU state in baseline JPEG
is (a) the three DC predictors and (b) the bitstream position (SURVEY §2.4,
§5.7).  Both have exact parallel decompositions, so the encode shards over a
2-D mesh:

  dp — images of a batch (across hosts this axis rides DCN)
  sp — horizontal stripes of whole MCU rows within an image (rides ICI)

Per (dp, sp) shard: color conversion, fDCT, quantization, run/levels and
per-block packing are purely local (stripes are MCU-aligned, so no halo).
Cross-shard state:

- DC predictors: each shard computes its blocks' DCs locally, passes its
  *last* DC per component to the right neighbor with `lax.ppermute`, and
  differences locally (a shifted subtraction — identical bits to the serial
  scan).
- histograms / Huffman symbol frequencies: `lax.psum` over sp (adaptive
  quantization and the two-pass table build then happen once per image).
- bitstream: each shard emits a compacted (words, bit_length) stream;
  stitching shard streams is one more level of the same barrel-shift merge
  used for blocks, done after an all-gather (or on host).

The scan order of the full image equals the concatenation of stripe scan
orders, so the stitched stream is bit-identical to the single-chip encode.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from ..ops import colorspace, fdct, pack, quantize, vlc


def _local_blocks(rgb, yuv_mode, sub_h, width):
    """Stripe [sub_h, W, 3] -> per-component block arrays (no edge cases:
    stripes are MCU-aligned; padding happens before sharding)."""
    if yuv_mode == C.YUV_420:
        y, u, v = colorspace.rgb_to_yuv420_planes(rgb)
        return [colorspace.blockize_420_luma(y), colorspace.blockize(u),
                colorspace.blockize(v)]
    if yuv_mode == C.YUV_444:
        y, u, v = colorspace.rgb_to_yuv444_planes(rgb)
        return [colorspace.blockize(y), colorspace.blockize(u),
                colorspace.blockize(v)]
    if yuv_mode == C.YUV_400:
        return [colorspace.blockize(colorspace.rgb_to_y_plane(rgb))]
    raise ValueError(f"unsupported yuv_mode {yuv_mode}")


def _dc_codes_sharded(dc_local, axis_name):
    """DC differencing with the predecessor DC fetched from the left shard."""
    n_sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    last_local = dc_local[-1]
    # shift each shard's last DC to its right neighbor
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]
    prev_from_left = jax.lax.ppermute(last_local, axis_name, perm)
    prev0 = jnp.where(idx == 0, 0, prev_from_left)
    prev = jnp.concatenate([prev0[None], dc_local[:-1]])
    diff = dc_local - prev
    n = jnp.where(diff == 0, 0, vlc.calc_log2(jnp.abs(diff)))
    suff = jnp.where(diff < 0, (diff - 1) & ((1 << n) - 1), diff)
    return jnp.where(diff == 0, 0, n | (suff << 4)).astype(jnp.int32)


def encode_shard(rgb_stripe, iquant, ibias, dc_luts, ac_luts, *,
                 yuv_mode: int, nb_blocks, axis_name: str = "sp"):
    """Per-shard encode of one MCU-aligned image stripe.

    Returns (words [Nw] uint32, total_bits i32, histo_l, histo_c,
    freq_dc [2,12], freq_ac [2,256]); histograms/freqs are already psummed
    over the stripe axis.
    """
    sub_h, width = rgb_stripe.shape[:2]
    blocks = _local_blocks(rgb_stripe, yuv_mode, sub_h, width)
    coeffs = [fdct.fdct_blocks(b) for b in blocks]

    histo_l = quantize.store_histo(coeffs[0])
    if len(coeffs) > 1:
        histo_c = (quantize.store_histo(coeffs[1])
                   + quantize.store_histo(coeffs[2]))
    else:
        histo_c = jnp.zeros_like(histo_l)
    histo_l = jax.lax.psum(histo_l, axis_name)
    histo_c = jax.lax.psum(histo_c, axis_name)

    rls, dcs = [], []
    freq_dc = jnp.zeros((2, 12), dtype=jnp.int32)
    freq_ac = jnp.zeros((2, 256), dtype=jnp.int32)
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        qb = quantize.quantize_blocks(coef, iquant[g], ibias[g])
        rl = vlc.run_levels(qb)
        dc = _dc_codes_sharded(qb[:, 0], axis_name)
        rls.append(rl)
        dcs.append(dc)
        fdc, fac = vlc.entropy_stats(rl, dc)
        freq_dc = freq_dc.at[g].add(fdc)
        freq_ac = freq_ac.at[g].add(fac)
    freq_dc = jax.lax.psum(freq_dc, axis_name)
    freq_ac = jax.lax.psum(freq_ac, axis_name)

    if jax.default_backend() != "cpu":
        # per-shard bitstream through the flagship Pallas kernels
        # (vlc+pack, parallel tree merge) — shard_map bodies run them
        # per device just like the unsharded engine
        from ..ops import pallas_tree_concat, pallas_vlc_pack
        n_mcu = rls[0]["run"].shape[0] // nb_blocks[0]

        def inter(field):
            return jnp.concatenate(
                [rl[field].reshape(n_mcu, nb, 64)
                 for rl, nb in zip(rls, nb_blocks)], axis=1).reshape(-1, 64)

        dc_i = jnp.concatenate(
            [dc.reshape(n_mcu, nb) for dc, nb in zip(dcs, nb_blocks)],
            axis=1).reshape(-1)
        slot_group = np.zeros(sum(nb_blocks), dtype=np.int32)
        slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
        group = jnp.tile(jnp.asarray(slot_group), n_mcu)
        words, bit_lens = pallas_vlc_pack.vlc_pack_pallas(
            inter("run"), inter("size"), inter("code"), dc_i, group,
            dc_luts, ac_luts)
        out, totals = pallas_tree_concat.concat_block_streams_tree(
            words, bit_lens, n_images=1,
            bucket=words.shape[0] * pack.WORDS_PER_BLOCK, sliced=False)
        return out[0], totals[0], histo_l, histo_c, freq_dc, freq_ac

    comp_vals, comp_lens = [], []
    for c, (rl, dc) in enumerate(zip(rls, dcs)):
        g = 0 if c == 0 else 1
        v, l = vlc.block_entries(rl, dc, dc_luts[g], ac_luts[g])
        comp_vals.append(v)
        comp_lens.append(l)
    vals, lens = pack.interleave_components(comp_vals, comp_lens,
                                            list(nb_blocks))
    words, bit_lens = pack.pack_block_entries(vals, lens)
    stream, total = pack.concat_block_streams(words, bit_lens)
    return stream, total, histo_l, histo_c, freq_dc, freq_ac


def make_sharded_encode(mesh: Mesh, yuv_mode: int, height: int, width: int,
                        nb_blocks):
    """Build the jitted sharded encode step over a (dp, sp) mesh.

    Input: batch [B, H, W, 3] uint8 with B divisible by dp and H divisible
    by 16 * sp.  Output per image: per-shard compacted streams + bit counts
    (stitch with `stitch_shard_streams`), plus histograms and symbol
    frequencies reduced over sp.
    """
    n_sp = mesh.shape["sp"]
    mcu_h = 16 if yuv_mode == C.YUV_420 else 8
    assert height % (mcu_h * n_sp) == 0, (
        f"H={height} must divide into {n_sp} MCU-aligned stripes")

    def step(batch, iquant, ibias, dc_luts, ac_luts):
        def per_shard(rgb_shard, iq, ib, dcl, acl):
            # rgb_shard: [B/dp, H/sp, W, 3]; vmap over the local batch.
            def one(img):
                return encode_shard(img, iq, ib, dcl, acl,
                                    yuv_mode=yuv_mode, nb_blocks=nb_blocks)
            s, t, hl, hc, fd, fa = jax.vmap(one)(rgb_shard)
            # add an sp axis to per-shard outputs so out_specs can
            # concatenate shard streams along it
            return s[:, None], t[:, None], hl, hc, fd, fa

        s, t, hl, hc, fd, fa = _shard_map(
            per_shard, mesh,
            in_specs=(P("dp", "sp"), P(), P(), P(), P()),
            out_specs=(P("dp", "sp"), P("dp", "sp"), P("dp"), P("dp"),
                       P("dp"), P("dp")),
        )(batch, iquant, ibias, dc_luts, ac_luts)
        return s, t, hl, hc, fd, fa

    return jax.jit(step)


def _shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: the shard bodies run pallas_call kernels whose
    # ShapeDtypeStruct outputs carry no varying-mesh-axes annotation,
    # which newer JAX rejects under the default check_vma=True
    if hasattr(jax, "shard_map"):
        try:
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)
        except TypeError:                      # older jax: no check_vma
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs)
    from jax.experimental.shard_map import shard_map as _sm
    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def stitch_shard_streams(stream_shards, totals):
    """Merge per-shard compacted streams of one image into one bitstream.

    `stream_shards`: [S, Nw] uint32; `totals`: [S] int32.  One more level of
    the block-concat barrel shift.  Returns (words, total_bits).
    """
    return pack.concat_block_streams(stream_shards, totals)
