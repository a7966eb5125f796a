"""Device trellis (rate-distortion Viterbi) quantization.

Vectorizes the reference's per-block node search (src/enc.cc:692-761,
methods 7/8) over all blocks at once: the sparse node list becomes a
dense 128-lane lattice (2 candidate slots x 63 zigzag positions + sink),
and the sequential "search every previous node" loop becomes one
`lax.scan` over the 63 positions whose step evaluates every (candidate,
predecessor) pair as a masked [N, 2, 128] uint32 tensor op.  All score
arithmetic wraps mod 2^32 exactly like the reference's uint32 scores;
outputs are bit-identical to the host oracle `spec.trellis_quantize_block`.

Lattice layout (lane index k, "reversed append order"):
    k = 127 - 2*i - c  for the candidate c in {0 (full), 1 (one bit
    shorter)} at zigzag position i in 1..63; k = 126 is the sink; 127 pad.
Ascending k enumerates nodes in the exact order the reference's
`for cur in reversed(nodes)` visits them, so a first-occurrence argmin
reproduces its strict-< tie-breaking (later-appended node wins ties,
sink loses all ties), both in the predecessor search and in the final
best-node selection.

Huffman rate costs come in as a per-block [N, 16, 16] length table
LT[n, run15, size] (built from the 2-group AC tables by a luma/chroma
select — no gathers), and the per-step cost lookup is a masked
accumulation over the 16 possible `run & 15` values.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

# np scalar, NOT jnp: a module-level device-array constant gets reused
# as a tracing constant across contexts; after a shard_map trace the
# shared buffer desyncs the jit fastpath ("supplied N buffers but
# compiled program expected M") on identically-shaped eager reruns
_KMAX = np.uint32(0xFFFFFFFF)
_SINK = 126


def _bit_length(v):
    """Bit length of v (0 -> 0), v < 4096."""
    n = jnp.zeros_like(v)
    for k in range(12):
        n = n + (v > ((1 << k) - 1)).astype(v.dtype)
    return n


def ac_len_table(ac_lut_lens, group):
    """[G, 256] AC code lengths + [N] group -> [N, 16, 16] LT[n, r15, s].

    G == 2 selects per row (no gather); the symbol layout is
    sym = (r15 << 4) | s."""
    t = ac_lut_lens.astype(jnp.int32).reshape(-1, 16, 16)
    if t.shape[0] == 1:
        return jnp.broadcast_to(t, (group.shape[0], 16, 16))
    grp0 = (group == 0).reshape(-1, 1, 1)
    return jnp.where(grp0, t[0][None], t[1][None])


@jax.jit
def trellis_quantize_blocks_jax(coeffs, iquant, ibias, quant, lt):
    """[N, 64] int32 raster fDCT coeffs (x16) -> [N, 64] signed
    trellis-quantized values (raster order).

    iquant/ibias/quant: [N, 64] int32 per-block rows (raster order,
    from finalize_quant_matrix, already group-/image-selected);
    lt: [N, 16, 16] AC code-length table from `ac_len_table`.
    DC is plain bias-quantized (reference quantizes DC outside the
    trellis, src/enc.cc:763-766).
    """
    N = coeffs.shape[0]
    zz = jnp.asarray(C.ZIGZAG, jnp.int32)
    cz = coeffs[:, zz].astype(jnp.int32)            # zigzag order
    iqz = iquant[:, zz].astype(jnp.uint32)
    ibz = ibias[:, zz].astype(jnp.uint32)
    qz = quant[:, zz].astype(jnp.int32)

    V = jnp.abs(cz)
    neg = cz < 0
    # plain bias quantizer (uint32 wrap exactly like ops.quantize)
    v0 = ((V.astype(jnp.uint32) + ibz) * iqz >> C.FP_BITS).astype(
        jnp.int32) >> C.AC_BITS
    q16 = (qz << C.AC_BITS).astype(jnp.uint32)       # quant << 4
    lam = (q16 * q16) // jnp.uint32(32)              # mod 2^32
    vv = V.astype(jnp.uint32) * V.astype(jnp.uint32)
    vv = vv.at[:, 0].set(0)
    disto0 = jnp.cumsum(vv, axis=1)                  # wrapping prefix sums
    nb0 = _bit_length(v0)
    esc_len = lt[:, 15, 0]                           # sym 0xF0

    # static per-lane predecessor positions: pos_k = (127 - k) // 2 for
    # real nodes, 0 for the sink (k=126) and the pad (k=127, masked)
    ks = jnp.arange(128, dtype=jnp.int32)
    pos_k = jnp.where(ks <= 125, (127 - ks) // 2, 0)
    D = disto0[:, pos_k]                             # [N, 128] uint32

    sign = jnp.where(neg, -1, 1).astype(jnp.int32)

    # carry packing: (valid, prev, level) ride one int32 per lane —
    # valid<<19 | prev<<12 | (level + 2048) — halving the scan's
    # HBM-resident carry traffic (prev < 128, |level| <= 2047)
    def _pack_vpl(valid, prev, level):
        return ((valid.astype(jnp.int32) << 19) | (prev << 12)
                | (level + 2048))

    def step(carry, x):
        S, vpl = carry
        valid = (vpl >> 19) > 0
        prev = (vpl >> 12) & 0x7F
        level = (vpl & 0xFFF) - 2048
        (i, V_i, v0_i, nb0_i, q_i, lam_i, d0p_i, sg_i) = x
        # candidates: c=0 full value, c=1 largest one bit shorter
        nb1 = nb0_i - 1
        v1 = (jnp.int32(1) << jnp.maximum(nb1, 0)) - 1
        vc = jnp.stack([v0_i, v1], axis=1)           # [N, 2]
        nbc = jnp.stack([nb0_i, nb1], axis=1)
        exist = jnp.stack([v0_i > 0, (v0_i > 0) & (nb0_i > 1)], axis=1)

        err = V_i[:, None] - vc * (q_i[:, None] << C.AC_BITS)
        cd = err.astype(jnp.uint32) * err.astype(jnp.uint32)
        base = cd + d0p_i.astype(jnp.uint32)[:, None]          # [N, 2]

        # per-candidate AC lengths for each run&15 (masked accumulate
        # over the 11 possible size classes; LT[n, r15, s])
        aclen = jnp.zeros((N, 2, 16), jnp.int32)
        for s in range(1, 12):
            aclen = aclen + jnp.where(
                (nbc == s)[:, :, None], lt[:, None, :, s], 0)

        run = (i - 1) - pos_k                        # [128] traced
        run15 = run & 15
        resc = run >> 4
        # bits[n,c,k] = aclen[n,c,run15[k]]: a lane gather expressed as an
        # exact one-hot matmul (lengths <= 16 and 0/1 one-hots are
        # bf16-exact, 16-term dots stay integral) — one MXU pass instead
        # of 16 masked accumulates over the full [N, 2, 128] tensor
        oh = (run15[None, :]
              == jnp.arange(16, dtype=jnp.int32)[:, None])   # [16, 128]
        bits = jax.lax.dot_general(
            aclen.astype(jnp.float32), oh.astype(jnp.float32),
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        bits = (bits + nbc[:, :, None]
                + resc[None, None, :] * esc_len[:, None, None])

        score = (base[:, :, None] - D[:, None, :]
                 + lam_i.astype(jnp.uint32)[:, None, None]
                 * bits.astype(jnp.uint32) + S[:, None, :])
        ok = valid[:, None, :] & (ks >= 128 - 2 * i)[None, None, :]
        score = jnp.where(ok, score, _KMAX)
        best = jnp.min(score, axis=2)                # [N, 2]
        arg = jnp.argmin(score, axis=2).astype(jnp.int32)
        newv = exist & (best < _KMAX)

        lvl = sg_i[:, None] * vc
        # write the two lanes (cand0 at 127-2i, cand1 at 126-2i) with
        # elementwise selects — a dynamic-lane-offset update_slice inside
        # the scan wedges the TPU runtime (axon backend) after program
        # switches, and lowers poorly anyway
        sel0 = (ks == 127 - 2 * i)[None, :]
        sel1 = (ks == 126 - 2 * i)[None, :]

        def upd(a, x2):
            return jnp.where(sel0, x2[:, 0:1],
                             jnp.where(sel1, x2[:, 1:2], a))

        S = upd(S, best)
        valid = upd(valid, newv)
        prev = upd(prev, arg)
        level = upd(level, lvl)
        return (S, _pack_vpl(valid, prev, level)), None

    ii = jnp.arange(1, 64, dtype=jnp.int32)
    xs = (ii, V.T[1:], v0.T[1:], nb0.T[1:], qz.T[1:], lam.T[1:],
          disto0.T[:63], sign.T[1:])
    S0 = jnp.zeros((N, 128), jnp.uint32)
    valid0 = jnp.zeros((N, 128), jnp.bool_).at[:, _SINK].set(True)
    prev0 = jnp.zeros((N, 128), jnp.int32)
    level0 = jnp.zeros((N, 128), jnp.int32)
    (S, vpl), _ = jax.lax.scan(
        step, (S0, _pack_vpl(valid0, prev0, level0)), xs)
    valid = (vpl >> 19) > 0
    prev = (vpl >> 12) & 0x7F
    level = (vpl & 0xFFF) - 2048

    # backward pass: add the tail distortion, pick the best end node
    tail = disto0[:, 63:64] - D
    fin = jnp.where(valid, S + tail, _KMAX)
    a = jnp.argmin(fin, axis=1).astype(jnp.int32)
    minv = jnp.min(fin, axis=1)
    cur = jnp.where(minv < _KMAX, a, jnp.int32(_SINK))

    # backtrace: emit each chosen node's level at its zigzag position
    out_z = jnp.zeros((N, 64), jnp.int32)
    lane = jnp.arange(64, dtype=jnp.int32)

    def back(_, st):
        out_z, cur = st
        sel = (ks[None, :] == cur[:, None])
        lvl = jnp.sum(jnp.where(sel, level, 0), axis=1)
        nxt = jnp.sum(jnp.where(sel, prev, 0), axis=1)
        p = (127 - cur) // 2
        p = jnp.where(cur >= _SINK, 0, p)
        act = p > 0
        out_z = out_z + jnp.where(
            act[:, None] & (lane[None, :] == p[:, None]), lvl[:, None], 0)
        cur = jnp.where(act, nxt, cur)
        return out_z, cur

    out_z, _ = jax.lax.fori_loop(0, 63, back, (out_z, cur))

    # DC: plain bias quantization
    dmag = ((jnp.abs(coeffs[:, 0]).astype(jnp.uint32) + ibias[:, 0]
             .astype(jnp.uint32)) * iquant[:, 0].astype(jnp.uint32)
            >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
    dc = jnp.where(coeffs[:, 0] < 0, -dmag, dmag)
    out_z = out_z.at[:, 0].set(dc)

    # un-zigzag back to raster order
    inv = jnp.zeros(64, jnp.int32).at[zz].set(
        jnp.arange(64, dtype=jnp.int32))
    return out_z[:, inv]


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------
# On TPU both drivers hand the whole batch to the VMEM-resident Pallas
# lattice (ops.pallas_trellis) in ONE device program; the lax.scan
# formulation above remains the CPU/test oracle.  (A round-3 axon-relay
# runtime defect forced all trellis calls through one fixed-shape 8192-row
# executable — ~2 ms of per-dispatch overhead x 48 chunks per 16-image
# batch; the defect no longer reproduces on the current stack, re-checked
# with big/small/big executable alternation before this was simplified.)


def trellis_quantize_tiled(cinter, iquant, ibias, quant, group, lt_lens):
    """[N, 64] blocks -> [N, 64] trellis-quantized, shared rate table.

    iquant/ibias/quant are per-block [N, 64] rows, group is the [N]
    table-group row, lt_lens the [2, 256] AC code-length table."""
    if jax.default_backend() == "cpu":
        lt = ac_len_table(lt_lens, group)
        return trellis_quantize_blocks_jax(cinter, iquant, ibias, quant, lt)
    from .pallas_trellis import trellis_quantize_pallas
    return trellis_quantize_pallas(cinter, iquant, ibias, quant, group,
                                   jnp.asarray(lt_lens))


def _rows_from_mats(m, group, n_images):
    """[2, 64] / [B, 2, 64] matrices -> per-block [N, 64] rows.  Image
    -major block layout lines up with the leading axis, so the per-image
    select is a broadcast where, not a gather."""
    m = m.astype(jnp.int32)
    g0 = (group == 0)[:, None]
    if m.ndim == 2:
        return jnp.where(g0, m[0][None], m[1][None])
    per_img = group.shape[0] // n_images
    g3 = g0.reshape(n_images, per_img, 1)
    r = jnp.where(g3, m[:, 0][:, None, :], m[:, 1][:, None, :])
    return r.reshape(-1, 64)


@functools.partial(jax.jit, static_argnames=("n_images", "tile",
                                             "tiles_per_img", "pad"))
def _pallas_mats(cinter, iquant, ibias, quant, group, lt_lens,
                 n_images: int, tile: int, tiles_per_img: int, pad: int):
    from .pallas_trellis import trellis_quantize_pallas

    if pad:
        per = cinter.shape[0] // n_images

        def padrows(x, fill=0):
            x2 = x.reshape((n_images, per) + x.shape[1:])
            cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x2, cfg, constant_values=fill).reshape(
                (-1,) + x.shape[1:])

        cinter, group = padrows(cinter), padrows(group)
    # expanding the matrices INSIDE the device program keeps the three
    # [N, 64] broadcast rows as fusion inputs instead of HBM round trips
    q = trellis_quantize_pallas(
        cinter, _rows_from_mats(iquant, group, n_images),
        _rows_from_mats(ibias, group, n_images),
        _rows_from_mats(quant, group, n_images), group, lt_lens,
        tile=tile, tiles_per_img=tiles_per_img)
    if pad:
        padded = per + pad
        q = q.reshape(n_images, padded, 64)[:, :per].reshape(-1, 64)
    return q


def trellis_quantize_matrices_inline(cinter, iquant, ibias, quant, group,
                                     lt_lens, n_images: int = 1):
    """trellis_quantize_matrices without the nested jit, for use INSIDE
    shard_map / jit bodies: a nested jit's cache entry compiled under a
    mesh trace context can collide with an identically-shaped eager call
    ("supplied N buffers but compiled program expected M")."""
    iq_r = _rows_from_mats(iquant, group, n_images)
    ib_r = _rows_from_mats(ibias, group, n_images)
    qq_r = _rows_from_mats(quant, group, n_images)
    if jax.default_backend() == "cpu":
        lt = ac_len_table(lt_lens, group)
        return trellis_quantize_blocks_jax.__wrapped__(
            cinter, iq_r, ib_r, qq_r, lt)
    from .pallas_trellis import trellis_quantize_pallas
    return trellis_quantize_pallas.__wrapped__(
        cinter, iq_r, ib_r, qq_r, group, jnp.asarray(lt_lens))


@functools.partial(jax.jit, static_argnames=("n_images",))
def _scan_mats(cinter, iquant, ibias, quant, group, lt_lens,
               n_images: int):
    """CPU path: rows + rate table + lattice scan as ONE program.  (A
    top-level jit of its own: after the sharded pipeline traces the scan
    body under a mesh context, re-executing the bare
    trellis_quantize_blocks_jax wrapper hits an executable whose hoisted
    constants no longer match — "supplied 5 buffers but compiled program
    expected 7"; keeping the serial CPU entry in a separate jit whose
    constants live inside the program sidesteps that.)"""
    return trellis_quantize_matrices_inline(
        cinter, iquant, ibias, quant, group, lt_lens, n_images)


def trellis_quantize_matrices(cinter, iquant, ibias, quant, group,
                              lt_lens, n_images: int = 1):
    """Trellis-quantize [N, 64] image-major blocks straight from the
    quantizer MATRICES — [2, 64] shared or [B, 2, 64] per image (raster
    order) — with the per-block row expansion fused into the device
    program.  lt_lens: [2, 256] shared or [B, 2, 256] per-image rate
    tables (tiles sized so each grid step reads one image's table)."""
    lt_lens = jnp.asarray(lt_lens)
    per_image_tables = lt_lens.ndim == 3
    if jax.default_backend() == "cpu":
        iquant = jnp.asarray(iquant)
        ibias = jnp.asarray(ibias)
        quant = jnp.asarray(quant)
        if not per_image_tables:
            return _scan_mats(cinter, iquant, ibias, quant, group,
                              lt_lens, n_images)
        per = cinter.shape[0] // n_images
        outs = []
        for i in range(n_images):
            sl = slice(i * per, (i + 1) * per)
            outs.append(_scan_mats(
                cinter[sl], iquant[i] if iquant.ndim == 3 else iquant,
                ibias[i] if ibias.ndim == 3 else ibias,
                quant[i] if quant.ndim == 3 else quant,
                group[sl], lt_lens[i], 1))
        return jnp.concatenate(outs, axis=0)
    from .pallas_trellis import DEFAULT_TILE
    if per_image_tables:
        per = cinter.shape[0] // n_images
        tile = min(DEFAULT_TILE, -(-per // 128) * 128)
        padded = -(-per // tile) * tile
        return _pallas_mats(cinter, iquant, ibias, quant, group, lt_lens,
                            n_images, tile, padded // tile, padded - per)
    return _pallas_mats(cinter, iquant, ibias, quant, group, lt_lens,
                        n_images, DEFAULT_TILE, 0, 0)


def trellis_quantize_tiled_per_image(cinter, iquant, ibias, quant, group,
                                     lt_lens3, n_images: int):
    """Per-image rate tables (a dichotomy's evolving optimized tables,
    src/dichotomy.cc:83-85,144): rows are image-major with equal block
    counts; each image's rows pad to a whole number of kernel tiles so
    every grid step maps to exactly one image's [2, 256] length table."""
    from .pallas_trellis import DEFAULT_TILE, trellis_quantize_pallas

    N = cinter.shape[0]
    per = N // n_images
    if jax.default_backend() == "cpu":
        outs = []
        for i in range(n_images):
            sl = slice(i * per, (i + 1) * per)
            lt = ac_len_table(lt_lens3[i], group[sl])
            outs.append(trellis_quantize_blocks_jax(
                cinter[sl], iquant[sl], ibias[sl], quant[sl], lt))
        return jnp.concatenate(outs, axis=0)
    tile = min(DEFAULT_TILE, -(-per // 128) * 128)
    padded = -(-per // tile) * tile
    pad = padded - per

    def padrows(x, fill=0):
        if not pad:
            return x
        x2 = x.reshape((n_images, per) + x.shape[1:])
        cfg = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x2, cfg,
                       constant_values=fill).reshape((-1,) + x.shape[1:])

    q = trellis_quantize_pallas(
        padrows(cinter), padrows(iquant, 1), padrows(ibias),
        padrows(quant, 1), padrows(group), jnp.asarray(lt_lens3),
        tile=tile, tiles_per_img=padded // tile)
    if pad:
        q = q.reshape(n_images, padded, 64)[:, :per].reshape(-1, 64)
    return q
