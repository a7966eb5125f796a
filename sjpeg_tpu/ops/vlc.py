"""Device VLC preparation: run/levels, DC prediction, symbol statistics,
and per-block (value, length) entry streams ready for bit packing.

The reference walks each block serially emitting bits (src/enc.cc:882-911);
here every quantity is computed for all blocks at once:

- zigzag gather + zero-run lengths via a running maximum,
- DC differencing as a shifted subtraction over the component scan order,
- Huffman code lookup as a [256] LUT gather,
- each block becomes a fixed 191-lane entry stream (DC, then per AC position
  an escape-pair lane, an escape-single lane and a symbol+value lane, then
  EOB), every lane <= 32 bits with its bit length; lanes pack densely later.

Symbol frequencies for the two-pass Huffman optimization are scatter-adds
over the same arrays (the device-side equivalent of AddEntropyStats,
src/enc.cc:1283-1302) and shard-reduce with a plain psum.
"""

import jax
import jax.numpy as jnp

from .. import constants as C

# per-block entry-stream layout
NUM_ENTRIES = 1 + 63 * 3 + 1
_DC_LANE = 0
_EOB_LANE = NUM_ENTRIES - 1


def calc_log2(v):
    """Bit length of v for v >= 1 (int32), elementwise."""
    v = v.astype(jnp.int32)
    out = jnp.zeros_like(v)
    x = v
    for shift in (8, 4, 2, 1):
        hit = x >= (1 << shift)
        out = out + jnp.where(hit, shift, 0)
        x = jnp.where(hit, x >> shift, x)
    return out + (v > 0).astype(jnp.int32)


def run_levels(qblocks):
    """[N, 64] quantized blocks (raster) -> zigzag-layout VLC fields.

    Returns dict of [N, 64] arrays: nz (bool, AC nonzero), run (zero run
    before), size (bit length), code (suffix bits), plus last [N] (zigzag
    index of last nonzero AC, 0 if none).
    """
    zz = jnp.take(qblocks, jnp.asarray(C.ZIGZAG), axis=1).astype(jnp.int32)
    pos = jnp.arange(64, dtype=jnp.int32)[None, :]
    nz = (zz != 0) & (pos > 0)
    mag = jnp.abs(zz)
    size = jnp.where(nz, calc_log2(jnp.maximum(mag, 1)), 0)
    mask = jnp.where(zz < 0, -1, 0)
    code = (mag ^ mask) & ((1 << size) - 1)
    # running max via 6 log-step shifted maxima: lax.cummax lowers to a
    # reduce_window that alone cost ~4.4 ms on a 16x1024^2 batch
    prev = jnp.where(nz, pos, 0)
    s = 1
    while s < 64:
        prev = jnp.maximum(prev, jnp.pad(prev[:, :-s], ((0, 0), (s, 0))))
        s <<= 1
    prev_before = jnp.pad(prev[:, :-1], ((0, 0), (1, 0)))
    run = jnp.where(nz, pos - prev_before - 1, 0)
    last = prev[:, -1]
    return {"nz": nz, "run": run, "size": size, "code": code, "last": last}


def dc_diff_codes(dc, n_images: int = 1):
    """[N] signed quantized DC (component scan order) -> uint16-style codes.

    code = n | (suffix << 4); predictor starts at 0 (src/enc.cc:482-499).
    With `n_images` > 1 (batched encode: N = n_images * blocks_per_image,
    image-major) the predictor resets at every image boundary.
    """
    dc = dc.astype(jnp.int32)
    if n_images > 1:
        d2 = dc.reshape(n_images, -1)
        prev = jnp.pad(d2[:, :-1], ((0, 0), (1, 0))).reshape(-1)
    else:
        prev = jnp.pad(dc[:-1], (1, 0))
    diff = dc - prev
    n = jnp.where(diff == 0, 0, calc_log2(jnp.abs(diff)))
    suff = jnp.where(diff < 0, (diff - 1) & ((1 << n) - 1), diff)
    return jnp.where(diff == 0, 0, n | (suff << 4)).astype(jnp.int32)


def entropy_stats(rl, dc_codes):
    """Frequencies for optimal-table construction: ([12], [256]) int32."""
    nz = rl["nz"]
    sym = ((rl["run"] & 15) << 4) | rl["size"]
    sym = jnp.where(nz, sym, 256)                    # park non-coded lanes
    freq_ac = jnp.zeros(257, dtype=jnp.int32)
    freq_ac = freq_ac.at[sym.reshape(-1)].add(1)
    freq_ac = freq_ac.at[0xF0].add(
        jnp.sum(jnp.where(nz, rl["run"] >> 4, 0)))
    freq_ac = freq_ac.at[0x00].add(jnp.sum(rl["last"] < 63))
    freq_dc = jnp.zeros(13, dtype=jnp.int32)
    freq_dc = freq_dc.at[dc_codes & 0x0F].add(1)
    return freq_dc[:12], freq_ac[:256]


def block_entries_grouped(rl, dc_codes, dc_luts, ac_luts, group):
    """Like `block_entries` for rows of mixed luma/chroma tables.

    `dc_luts` [2, 16] / `ac_luts` [2, 256] uint32; `group` [N] int32 row
    table index.  Lookups go through flattened LUTs with a per-row offset,
    so interleaved (MCU-ordered) block arrays need no component split.
    """
    N = dc_codes.shape[0]
    dc_flat = dc_luts.reshape(-1)
    ac_flat = ac_luts.reshape(-1)
    g16 = (group * 16)[:, None]
    g256 = (group * 256)[:, None]

    vals = jnp.zeros((N, NUM_ENTRIES), dtype=jnp.uint32)
    lens = jnp.zeros((N, NUM_ENTRIES), dtype=jnp.int32)

    dc_len = (dc_codes & 0x0F)[:, None]
    packed = jnp.take(dc_flat, g16 + dc_len)
    h_code = (packed >> 16).astype(jnp.uint32)
    h_len = (packed & 0xFF).astype(jnp.int32)
    suffix = (dc_codes >> 4).astype(jnp.uint32)[:, None]
    vals = vals.at[:, _DC_LANE].set(
        ((h_code << dc_len.astype(jnp.uint32)) | suffix)[:, 0])
    lens = lens.at[:, _DC_LANE].set((h_len + dc_len)[:, 0])

    nz = rl["nz"][:, 1:]
    run = rl["run"][:, 1:]
    size = rl["size"][:, 1:]
    code = rl["code"][:, 1:].astype(jnp.uint32)

    esc_packed = jnp.take(ac_flat, g256 + 0xF0)          # [N, 1]
    esc_code = (esc_packed >> 16).astype(jnp.uint32)
    esc_len = (esc_packed & 0xFF).astype(jnp.int32)

    n_esc = jnp.where(nz, run >> 4, 0)
    pair = jnp.minimum(n_esc, 2)
    single = n_esc - pair
    pair_val = jnp.where(
        pair == 2, (esc_code << esc_len.astype(jnp.uint32)) | esc_code,
        jnp.where(pair == 1, esc_code, jnp.uint32(0)))
    sym = ((run & 15) << 4) | size
    sym_packed = jnp.take(ac_flat, g256 + sym)
    s_code = (sym_packed >> 16).astype(jnp.uint32)
    s_len = (sym_packed & 0xFF).astype(jnp.int32)
    sym_val = (s_code << size.astype(jnp.uint32)) | code
    sym_len = jnp.where(nz, s_len + size, 0)

    vals = vals.at[:, 1:190:3].set(pair_val)
    lens = lens.at[:, 1:190:3].set(pair * esc_len)
    vals = vals.at[:, 2:190:3].set(jnp.where(single == 1, esc_code, 0))
    lens = lens.at[:, 2:190:3].set(single * esc_len)
    vals = vals.at[:, 3:190:3].set(jnp.where(nz, sym_val, 0))
    lens = lens.at[:, 3:190:3].set(sym_len)

    eob_packed = jnp.take(ac_flat, g256[:, 0] + 0x00)
    has_eob = rl["last"] < 63
    vals = vals.at[:, _EOB_LANE].set(
        jnp.where(has_eob, (eob_packed >> 16).astype(jnp.uint32), 0))
    lens = lens.at[:, _EOB_LANE].set(
        jnp.where(has_eob, (eob_packed & 0xFF).astype(jnp.int32), 0))
    return vals, lens


def block_entries(rl, dc_codes, dc_lut, ac_lut):
    """Build the [N, 191] (value, bit-length) entry streams for one component.

    `dc_lut` int32[16], `ac_lut` int32[256]: packed (code << 16) | length
    Huffman LUTs for this component's table pair.
    """
    N = dc_codes.shape[0]
    vals = jnp.zeros((N, NUM_ENTRIES), dtype=jnp.uint32)
    lens = jnp.zeros((N, NUM_ENTRIES), dtype=jnp.int32)

    # DC lane: huffman(size) ++ suffix bits
    dc_len = dc_codes & 0x0F
    packed = jnp.take(dc_lut, dc_len)
    h_code = (packed >> 16).astype(jnp.uint32)
    h_len = (packed & 0xFF).astype(jnp.int32)
    suffix = (dc_codes >> 4).astype(jnp.uint32)
    vals = vals.at[:, _DC_LANE].set(
        (h_code << dc_len.astype(jnp.uint32)) | suffix)
    lens = lens.at[:, _DC_LANE].set(h_len + dc_len)

    # AC lanes
    nz = rl["nz"][:, 1:]                      # [N, 63]
    run = rl["run"][:, 1:]
    size = rl["size"][:, 1:]
    code = rl["code"][:, 1:].astype(jnp.uint32)

    esc_packed = ac_lut[0xF0]
    esc_code = (esc_packed >> 16).astype(jnp.uint32)
    esc_len = (esc_packed & 0xFF).astype(jnp.int32)

    n_esc = jnp.where(nz, run >> 4, 0)        # 0..3
    pair = jnp.minimum(n_esc, 2)
    single = n_esc - pair
    pair_val = jnp.where(
        pair == 2, (esc_code << esc_len.astype(jnp.uint32)) | esc_code,
        jnp.where(pair == 1, esc_code, jnp.uint32(0)))
    sym = ((run & 15) << 4) | size
    sym_packed = jnp.take(ac_lut, sym)
    s_code = (sym_packed >> 16).astype(jnp.uint32)
    s_len = (sym_packed & 0xFF).astype(jnp.int32)
    sym_val = (s_code << size.astype(jnp.uint32)) | code
    sym_len = jnp.where(nz, s_len + size, 0)

    vals = vals.at[:, 1:190:3].set(pair_val)
    lens = lens.at[:, 1:190:3].set(pair * esc_len)
    vals = vals.at[:, 2:190:3].set(jnp.where(single == 1, esc_code, 0))
    lens = lens.at[:, 2:190:3].set(single * esc_len)
    vals = vals.at[:, 3:190:3].set(jnp.where(nz, sym_val, 0))
    lens = lens.at[:, 3:190:3].set(sym_len)

    # EOB lane
    eob_packed = ac_lut[0x00]
    has_eob = rl["last"] < 63
    vals = vals.at[:, _EOB_LANE].set(
        jnp.where(has_eob, (eob_packed >> 16).astype(jnp.uint32), 0))
    lens = lens.at[:, _EOB_LANE].set(
        jnp.where(has_eob, (eob_packed & 0xFF).astype(jnp.int32), 0))
    return vals, lens
