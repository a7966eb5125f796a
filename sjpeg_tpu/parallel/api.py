"""Public sharded encode API: JPEGs out of a (dp, sp) device mesh.

`encode_batch_sharded` runs the full encode pipeline — including adaptive
quantization and per-image two-pass Huffman optimization — under
`shard_map` over a 2-D mesh (dp = images, sp = MCU-row stripes within an
image; SURVEY §5.7-8), producing byte streams identical to the serial
`engine.encode_batch`.  The three sharded stages mirror the unsharded
engine's staged pipeline and reuse its kernels (incl. the Pallas VLC/pack
and tree-concat kernels per shard on TPU):

  1. color + fDCT per stripe (+ per-image coefficient histograms,
     `lax.psum` over sp)                            -> host lambda-fit
  2. quantize + run/levels; DC chains carry across stripes with a
     `lax.ppermute` of each stripe's last DC (bit-identical to the serial
     scan, reference src/enc.cc:482-499); per-image symbol frequencies
     psum over sp                                   -> host table build
  3. VLC + per-block pack + per-stripe compaction   -> one batched
     cross-stripe stitch + host marker splice

Cross-host: the dp axis is the data-parallel axis (DCN); sp rides ICI.
Configurations the stripe decomposition cannot hold bit-identically
(mixed AUTO modes, sharp YUV, multi-pass search)
delegate to the unsharded engine rather than approximate.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import constants as C
from .. import engine, pipeline, spec
from ..adaptive import analyse_histo
from ..huffman import k3_default_tables, optimal_tables_from_freqs
from ..ops import colorspace, fdct, pack, quantize, vlc
from ..params import EncoderParam, method_flags
from .shard import _dc_codes_sharded, _shard_map

_AXIS = "sp"


def default_mesh(devices=None) -> Mesh:
    """All local devices on the stripe (sp) axis; dp=1."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices).reshape(1, -1), ("dp", "sp"))


def _multiproc() -> bool:
    return jax.process_count() > 1


def _fetch_dp(arr):
    """Host fetch of a dp-sharded device array.

    Single-process: plain `np.asarray` over the full batch.  Multi-process
    (dp laid across hosts, SURVEY §5.8): only this process's addressable
    dp rows come back — the DCN axis never moves image data between hosts.
    Returns (rows ndarray, global row indices)."""
    if not _multiproc():
        a = np.asarray(arr)
        return a, list(range(a.shape[0]))
    out = np.zeros(arr.shape, arr.dtype)
    rows = set()
    for s in arr.addressable_shards:
        out[s.index] = np.asarray(s.data)
        sl = s.index[0] if s.index else slice(None)
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else arr.shape[0]
        rows.update(range(start, stop))
    idxs = sorted(rows)
    return out[idxs], idxs


def _global_dp(mesh: Mesh, local_rows: np.ndarray, spec=None):
    """Lift this process's rows into a global dp-sharded array."""
    spec = spec if spec is not None else P("dp")
    sharding = NamedSharding(mesh, spec)
    if not _multiproc():
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(sharding, local_rows)


def _stripe_quantize(coeffs, iq, ib, nb_blocks, b_l: int, qq=None,
                     trellis_lens=None):
    """Shard-local quantize + MCU interleave with cross-stripe DC chains.

    `coeffs`: per-component [B_l, nlb_c, 64]; `iq`/`ib`: [B_l, 2, 64].
    With `qq`/`trellis_lens` set, AC coefficients go through the trellis
    quantizer instead of the plain bias quantizer (methods 7/8; stripes
    are block-independent, so the trellis shards trivially — the DC rule
    is the plain quantizer either way, src/enc.cc:763-766).
    `trellis_lens` is [2, 256] shared, or [B_l, 2, 256] per image (a
    sharded dichotomy's evolving rate tables, src/dichotomy.cc:83-104).
    Returns (rl, dc_codes, group) over the local flat block axis.
    """
    from ..ops import trellis as trellis_ops

    qbs, dc_cols = [], []
    n_mcu = coeffs[0].shape[1] // nb_blocks[0]
    for c, coef in enumerate(coeffs):
        g = 0 if c == 0 else 1
        if trellis_lens is not None and trellis_lens.ndim == 3:
            cimg = coef.reshape(b_l, -1, 64)
            grp = jnp.full(cimg.shape[1], g, jnp.int32)
            qb = jnp.concatenate([
                trellis_ops.trellis_quantize_matrices_inline(
                    cimg[i], iq[i], ib[i], qq[i], grp,
                    trellis_lens[i], 1)
                for i in range(b_l)], axis=0)
        elif trellis_lens is not None:
            cflat = coef.reshape(-1, 64)
            grp = jnp.full(cflat.shape[0], g, jnp.int32)
            qb = trellis_ops.trellis_quantize_matrices_inline(
                cflat, iq, ib, qq, grp, trellis_lens, b_l)
        else:
            qb = engine._per_image_quantize(coef.reshape(-1, 64),
                                            iq[:, g], ib[:, g], b_l)
        qbs.append(qb)
        dcq = qb[:, 0].reshape(b_l, -1)
        codes = jax.vmap(lambda d: _dc_codes_sharded(d, _AXIS))(dcq)
        dc_cols.append(codes.reshape(b_l, n_mcu, nb_blocks[c]))
    mcu_blocks = sum(nb_blocks)
    qinter = jnp.concatenate(
        [qb.reshape(b_l, n_mcu, nb, 64)
         for qb, nb in zip(qbs, nb_blocks)], axis=2).reshape(-1, 64)
    rl = vlc.run_levels(qinter)
    dc_codes = jnp.concatenate(dc_cols, axis=2).reshape(-1)
    slot_group = np.zeros(mcu_blocks, dtype=np.int32)
    slot_group[nb_blocks[0]:] = 1 if len(nb_blocks) > 1 else 0
    group = jnp.tile(jnp.asarray(slot_group), b_l * n_mcu)
    return rl, dc_codes, group


def _build_stages(mesh, yuv_mode: int, width: int, height: int,
                  nb_blocks, b: int, with_histo: bool, with_stats: bool,
                  per_image_tables: bool, bucket: int,
                  rows_per_stripe: int, ragged: bool, sub_h_partial: int,
                  use_trellis: bool = False, src_kind: str = "rgb",
                  trellis_lens_arg: bool = False):
    """The three jitted shard_map stage programs.

    Ragged geometry (image MCU rows not divisible by sp, and/or a partial
    last MCU row): images arrive host-padded to rows_per_stripe * sp MCU
    rows; each stage takes per-stripe [sp] scalars (sharded over sp) —
    `vrows` = number of real MCU rows in the stripe, `crow` = stripe-local
    index of the image's partial MCU row.  Padding blocks are masked out
    of histograms, symbol frequencies, and the bitstream (zero bits), so
    the stitched stream is bit-identical to the unsharded encode."""
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    b_l = b // dp
    mcu_h = 16 if yuv_mode == C.YUV_420 else 8
    stripe_h = rows_per_stripe * mcu_h
    n_comps = len(nb_blocks)
    mb_w = -(-width // mcu_h)
    mcu_blocks = sum(nb_blocks)

    def comp_valid(v, c):
        """[b_l * stripe blocks of component c] mask: MCU row < v."""
        per_row = nb_blocks[c] * mb_w
        rowi = jnp.arange(rows_per_stripe * per_row,
                          dtype=jnp.int32) // per_row
        return jnp.tile(rowi < v, b_l)

    def inter_valid(v):
        """Mask over MCU-interleaved blocks (all components)."""
        per_row = mb_w * mcu_blocks
        rowi = jnp.arange(rows_per_stripe * per_row,
                          dtype=jnp.int32) // per_row
        return jnp.tile(rowi < v, b_l)

    def coeffs_shard(src, vrows, crow):
        if src_kind == "planes":
            blocks = list(colorspace.planes_to_blocks(
                src, yuv_mode, width, stripe_h))
        else:
            blocks = list(colorspace.rgb_to_blocks(src, yuv_mode, width,
                                                   stripe_h))
        if ragged and yuv_mode == C.YUV_420 and sub_h_partial:
            # the image's partial MCU row lands at a stripe-local index
            # known only per shard: apply the AverageExtraLuma flatten
            # dynamically (bit-identical to the static fixup)
            blocks[0] = colorspace.average_extra_luma_dynamic_row(
                blocks[0], rows_per_stripe, mb_w, width, sub_h_partial,
                crow[0])
        coeffs = [fdct.fdct_blocks(x) for x in blocks]
        out = tuple(c.reshape(b_l, -1, 64) for c in coeffs)
        if not with_histo:
            return out
        # 2-D [B_l, 64*bins]: dense fetch layout (see engine._stage_coeffs)
        vl = comp_valid(vrows[0], 0) if ragged else None
        hl = quantize.store_histo(coeffs[0], b_l,
                                  valid=vl).reshape(b_l, -1)
        if n_comps > 1:
            vc = comp_valid(vrows[0], 1) if ragged else None
            hc = (quantize.store_histo(coeffs[1], b_l, valid=vc)
                  + quantize.store_histo(coeffs[2], b_l,
                                         valid=vc)).reshape(b_l, -1)
        else:
            hc = jnp.zeros_like(hl)
        return out + (jax.lax.psum(hl, _AXIS), jax.lax.psum(hc, _AXIS))

    cspec = tuple(P("dp", "sp", None) for _ in range(n_comps))
    coeffs_out = cspec + ((P("dp"), P("dp")) if with_histo else ())
    sspec = P("sp")
    src_spec = (tuple(P("dp", "sp") for _ in range(n_comps))
                if src_kind == "planes" else P("dp", "sp"))
    stage_coeffs = jax.jit(_shard_map(
        coeffs_shard, mesh, in_specs=(src_spec, sspec, sspec),
        out_specs=coeffs_out))

    trellis_lens = (jnp.asarray(engine._trellis_cost_lens())
                    if use_trellis and not trellis_lens_arg else None)

    def quant_shard_lens(coeffs, iq, ib, qq, lens, vrows):
        return quant_body(coeffs, iq, ib, qq, lens, vrows)

    def quant_shard(coeffs, iq, ib, qq, vrows):
        return quant_body(coeffs, iq, ib, qq, trellis_lens, vrows)

    def quant_body(coeffs, iq, ib, qq, lens, vrows):
        rl, dc_codes, group = _stripe_quantize(
            list(coeffs), iq, ib, tuple(nb_blocks), b_l,
            qq=qq if use_trellis else None, trellis_lens=lens)
        per_l = dc_codes.shape[0] // b_l
        out = ({k: v.reshape(b_l, per_l, -1) for k, v in rl.items()},
               dc_codes.reshape(b_l, per_l),
               group.reshape(b_l, per_l))
        if not with_stats:
            return out
        vmask = inter_valid(vrows[0]) if ragged else None
        fdc, fac = engine._grouped_stats(rl, dc_codes, group, b_l,
                                         valid=vmask)
        fdc = jax.lax.psum(fdc.reshape(b_l, 2, -1), _AXIS)
        fac = jax.lax.psum(fac.reshape(b_l, 2, -1), _AXIS)
        return out, fdc, fac

    st_spec = ({k: P("dp", "sp", None)
                for k in ("nz", "run", "size", "code", "last")},
               P("dp", "sp"), P("dp", "sp"))
    qout = (st_spec, P("dp"), P("dp")) if with_stats else st_spec
    if trellis_lens_arg:
        stage_quant = jax.jit(_shard_map(
            quant_shard_lens, mesh,
            in_specs=(cspec, P("dp"), P("dp"), P("dp"), P("dp"), sspec),
            out_specs=qout))
    else:
        stage_quant = jax.jit(_shard_map(
            quant_shard, mesh,
            in_specs=(cspec, P("dp"), P("dp"), P("dp"), sspec),
            out_specs=qout))

    def pack_shard(state, dc_luts, ac_luts, vrows):
        rl, dc_codes, group = state
        per_l = dc_codes.shape[1]
        flat = ({k: v.reshape(b_l * per_l, -1) for k, v in rl.items()},
                dc_codes.reshape(-1), group.reshape(-1))
        flat[0]["last"] = flat[0]["last"].reshape(-1)
        vmask = inter_valid(vrows[0]) if ragged else None
        words, totals = engine._stage_batch_pack(
            flat, dc_luts, ac_luts, n_images=b_l, bucket=bucket,
            per_image_tables=per_image_tables, block_valid=vmask)
        return (words.reshape(b_l, 1, bucket),
                totals.reshape(b_l, 1))

    lut_spec = P("dp") if per_image_tables else P()
    stage_pack = jax.jit(_shard_map(
        pack_shard, mesh,
        in_specs=(st_spec, lut_spec, lut_spec, sspec),
        out_specs=(P("dp", "sp", None), P("dp", "sp"))))
    return stage_coeffs, stage_quant, stage_pack


def _make_sharp_stage(mesh, w: int, h: int, h_pad: int):
    """Sharded sharp-YUV conversion: each dp shard runs the iterative
    RGB->YUV420 refinement (sharp_yuv_device._sharp_core, bit-identical
    to the unsharded engine's) over its local images, then edge-pads the
    planes to whole stripes for the planes-in coeffs stage.  The sp axis
    replicates the conversion (images are the parallel unit; the
    refinement's row recurrence would need a 2-row halo exchange per
    iteration to stripe, for no wall-clock gain at these batch sizes)."""
    from .. import sharp_yuv_device
    core = functools.partial(sharp_yuv_device._sharp_core,
                             width=w, height=h)

    def conv_shard(rgb):
        y, u, v = jax.vmap(core)(rgb)

        def padp(p, target):
            d = target - p.shape[1]
            return p if d <= 0 else jnp.pad(
                p, ((0, 0), (0, d), (0, 0)), mode="edge")

        return (padp(y, h_pad), padp(u, h_pad // 2),
                padp(v, h_pad // 2))

    return jax.jit(_shard_map(
        conv_shard, mesh, in_specs=(P("dp"),),
        out_specs=(P("dp"), P("dp"), P("dp"))))


@functools.lru_cache(maxsize=8)
def _make_stitch(mesh):
    """[B, S, bucket] per-(image, stripe) streams -> [B, S*bucket] images.

    shard_map over dp only: each image's stripe streams all-gather over sp
    (ICI) into its dp group, which barrel-shift-merges them locally; image
    rows never cross the dp (DCN) axis."""
    def stitch_shard(words, totals):
        b_l, s, bucket = words.shape
        return pack.concat_block_streams_batched(
            words.reshape(b_l * s, bucket), totals.reshape(b_l * s),
            n_images=b_l, bucket=s * bucket)
    return jax.jit(_shard_map(
        stitch_shard, mesh,
        in_specs=(P("dp", None, None), P("dp", None)),
        out_specs=(P("dp"), P("dp"))))


def encode_batch_sharded(rgbs, param=None, mesh: Mesh = None,
                         bits_per_pixel_budget: float = 4.0,
                         share_statistics: bool = False):
    """Encode a uint8 batch [B, H, W, 3] over a (dp, sp) device mesh.

    Returns a list of JPEG byte strings, byte-identical to
    `engine.encode_batch` / per-image `encode_rgb`.  Requirements for the
    sharded fast path: a pinned or uniformly-auto-decided YUV mode and
    single-pass methods 0-6.  Ragged geometry is handled natively: images
    whose MCU rows don't divide by sp (e.g. 1080p on sp=8) are edge-padded
    to whole stripes with the padding rows masked out of statistics and
    the bitstream, and a batch not divisible by dp is padded with dummy
    images whose outputs are dropped.  Anything else (sharp/mixed-auto
    modes, trellis, searches, ragged multi-process batches) transparently
    delegates to the unsharded engine (same bytes, no mesh).

    Multi-host (`jax.process_count() > 1`, dp laid across processes via
    `mesh.make_mesh`): `rgbs` is each process's LOCAL images (equal count
    per process); the returned list holds the local images' JPEGs, in
    order.  Image data and bitstreams stay host-local on the dp/DCN axis;
    only stripe-level collectives ride sp/ICI.  With share_statistics the
    shared tables span each host's local batch (the dp axis never moves
    statistics between hosts).
    """
    param = param or EncoderParam()
    mesh = mesh or default_mesh()
    b_local, h, w = rgbs.shape[:3]
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    flags = method_flags(param.method)
    n_proc = jax.process_count()
    b = b_local * n_proc if _multiproc() else b_local

    yuv_mode = param.yuv_mode
    if yuv_mode == C.YUV_AUTO and not _multiproc():
        from .. import riskiness as host_risk
        if host_risk.exact_table_active():
            rn = np.asarray(rgbs)
            modes = [host_risk.riskiness(rn[i])[0] for i in range(b)]
        else:
            from ..ops import riskiness as dev_risk
            ss, cc, gg = jax.device_get(
                dev_risk.risk_stats(jnp.asarray(rgbs)))
            modes = [dev_risk.finish_riskiness(ss[i], cc[i], gg[i],
                                               w, h)[0]
                     for i in range(b)]
        groups = {}
        for i, m in enumerate(modes):
            groups.setdefault(m, []).append(i)
        if len(groups) > 1:
            # mixed AUTO decisions: each resolved-mode group runs as its
            # own sharded sub-batch (reference per-image semantics,
            # src/enc.cc:2132-2154; the dp-pad path absorbs ragged
            # group sizes)
            rn = np.asarray(rgbs)
            out = [None] * b
            for m, idxs in groups.items():
                sub = np.ascontiguousarray(rn[idxs])
                p2 = dataclasses.replace(param, yuv_mode=m)
                res = encode_batch_sharded(sub, p2, mesh,
                                           bits_per_pixel_budget,
                                           share_statistics)
                for j, i in enumerate(idxs):
                    out[i] = res[j]
            return out
        yuv_mode = modes[0]
    sharp = yuv_mode == C.YUV_SHARP
    if sharp and min(w, h) <= 4:
        # tiny-image simple path: not worth a mesh (reference
        # ApplySharpYUVConversion small-image branch)
        return engine.encode_batch(
            rgbs, dataclasses.replace(param, yuv_mode=yuv_mode),
            bits_per_pixel_budget, share_statistics)
    layout = pipeline.component_layout(
        yuv_mode if yuv_mode not in (C.YUV_SHARP, C.YUV_AUTO) else C.YUV_420,
        w, h)
    from ..params import TARGET_NONE
    search = param.passes > 1 and param.target_mode != TARGET_NONE
    delegate = (yuv_mode == C.YUV_AUTO
                or (search and param.search_hook is not None))
    if delegate:
        # param/shape-driven (process-consistent) fallback; under
        # multi-process each host encodes its local images unsharded
        # (remaining delegates: multi-process AUTO, stateful custom
        # search hooks, ragged multi-process batches)
        p2 = (param if yuv_mode == C.YUV_AUTO
              else dataclasses.replace(param, yuv_mode=yuv_mode))
        return engine.encode_batch(rgbs, p2, bits_per_pixel_budget,
                                   share_statistics)

    # ragged batch: pad to a dp multiple with copies of image 0 (their
    # outputs are dropped).  Multi-process: each process pads its LOCAL
    # rows by the same count (uniform b_local is the API contract), so
    # the global batch stays dp-divisible without moving image data
    # across hosts
    b_real_local = b_local
    rgbs_np = np.asarray(rgbs)
    if b % dp != 0:
        if _multiproc():
            import math
            step = dp // math.gcd(dp, n_proc)
            pad_b = -(-b_local // step) * step - b_local
        else:
            pad_b = -(-b // dp) * dp - b
        rgbs_np = np.concatenate(
            [rgbs_np, np.broadcast_to(rgbs_np[:1],
                                      (pad_b,) + rgbs_np.shape[1:])])
        b_local = b_local + pad_b
        b = b_local * (n_proc if _multiproc() else 1)

    if search and sharp:
        # sharp searches: the conversion shards but the search plumbing
        # is rgb-in; keep the engine's byte-exact path for now
        return engine.encode_batch(
            rgbs_np[:b_real_local],
            dataclasses.replace(param, yuv_mode=yuv_mode),
            bits_per_pixel_budget, share_statistics)
    if search:
        # multi-pass dichotomy over the mesh (stripe-sharded passes,
        # device tables, one eval fetch per pass)
        return _encode_search_sharded(rgbs_np, param, mesh, yuv_mode,
                                      w, h, bits_per_pixel_budget,
                                      b_real_local)

    nb_blocks = tuple(layout.nb_blocks)
    n_groups = 2 if layout.nb_comps > 1 else 1
    min_qmats = param.resolved_min_quant_matrices()
    base_qms = [spec.finalize_quant_matrix(
        param.resolved_quant_matrices()[i], min_qmats[i],
        param.quantization_bias) for i in range(2)]
    defaults = k3_default_tables()

    # ragged rows: stripes hold ceil(mb_h / sp) whole MCU rows; images are
    # edge-padded to sp full stripes and the padding rows masked out
    yuv_eff = C.YUV_420 if sharp else yuv_mode
    mcu_h = layout.block_h
    rows_per_stripe = -(-layout.mb_h // sp)
    h_pad = rows_per_stripe * mcu_h * sp
    ragged = h_pad != h
    sub_h_partial = h - (layout.mb_h - 1) * mcu_h if h % mcu_h else 0
    if h_pad != rgbs_np.shape[1] and not sharp:
        # sharp keeps the original rows: the conversion consumes the
        # full image and pads its output planes on device
        rgbs_np = np.pad(
            rgbs_np, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)),
            mode="edge")
    srows = np.arange(sp, dtype=np.int32) * rows_per_stripe
    vrows_np = np.clip(layout.mb_h - srows, 0, rows_per_stripe)
    crow_np = ((layout.mb_h - 1) - srows if sub_h_partial
               else np.full(sp, -1, np.int32)).astype(np.int32)

    per_img_blocks = layout.mb_w * rows_per_stripe * sp * sum(nb_blocks)
    bucket = int(min(per_img_blocks // sp * pack.WORDS_PER_BLOCK,
                     max(1024, w * h * bits_per_pixel_budget / 32 / sp)))
    # per-image LUT arrays also carry per-HOST shared tables multi-process
    # (replicated device LUTs would require identical values on every host)
    per_image_tables = flags["optimize_size"] and (
        not share_statistics or _multiproc())

    stage_coeffs, stage_quant, stage_pack = _build_stages(
        mesh, yuv_eff, w, h, nb_blocks, b,
        with_histo=flags["use_adaptive_quant"],
        with_stats=flags["optimize_size"],
        per_image_tables=per_image_tables, bucket=bucket,
        rows_per_stripe=rows_per_stripe, ragged=ragged,
        sub_h_partial=sub_h_partial,
        use_trellis=flags["use_trellis"],
        src_kind="planes" if sharp else "rgb")

    def default_luts():
        dc0, ac0 = engine._host_luts(defaults)
        dcl = _global_dp(mesh, np.broadcast_to(
            dc0, (b_local, 2, 16)).copy())
        acl = _global_dp(mesh, np.broadcast_to(
            ac0, (b_local, 2, 256)).copy())
        return dcl, acl, _global_dp(mesh, np.zeros((b_local, 4),
                                                   np.int32))

    sp_sharding = NamedSharding(mesh, P("sp"))
    vrows_g = jax.device_put(vrows_np, sp_sharding)
    crow_g = jax.device_put(crow_np, sp_sharding)
    if sharp:
        batch_g = _make_sharp_stage(mesh, w, h, h_pad)(
            _global_dp(mesh, rgbs_np, P("dp")))
    else:
        batch_g = _global_dp(mesh, rgbs_np, P("dp", "sp"))
    outs = stage_coeffs(batch_g, vrows_g, crow_g)
    if flags["use_adaptive_quant"]:
        coeffs = outs[:layout.nb_comps]
        hl, _ = _fetch_dp(outs[-2])
        hc, _ = _fetch_dp(outs[-1])
        n_local = hl.shape[0]
        hl = hl.astype(np.int64).reshape(n_local, 64, -1)
        hc = hc.astype(np.int64).reshape(n_local, 64, -1)
        if share_statistics:       # shared across this host's local batch
            hist = [hl.sum(axis=0), hc.sum(axis=0)]
            hists = [hist] * n_local
        else:
            hists = [[hl[i], hc[i]] for i in range(n_local)]
        per_qms, seen = [], {}
        for i in range(n_local):
            key = id(hists[i]) if share_statistics else i
            if key in seen:
                per_qms.append(seen[key])
                continue
            qms = list(base_qms)
            for g in range(n_groups - 1, -1, -1):
                qd = (param.qdelta_max_luma if g == 0
                      else param.qdelta_max_chroma)
                tuned = analyse_histo(hists[i][g], qms[g]["quant"],
                                      min_qmats[g], qd)
                qms[g] = spec.finalize_quant_matrix(
                    tuned, min_qmats[g], param.quantization_bias)
            seen[key] = qms
            per_qms.append(qms)
    else:
        coeffs = outs if isinstance(outs, tuple) else (outs,)
        per_qms = [base_qms] * b_local
    iq = _global_dp(mesh, np.stack([[q["iquant"] for q in qms]
                                    for qms in per_qms]).astype(np.int32))
    ib = _global_dp(mesh, np.stack([[q["bias"] for q in qms]
                                    for qms in per_qms]).astype(np.int32))
    qq = _global_dp(mesh, np.stack([[q["quant"] for q in qms]
                                    for qms in per_qms]).astype(np.int32))

    qouts = stage_quant(tuple(coeffs), iq, ib, qq, vrows_g)
    if flags["optimize_size"]:
        state, fdc, fac = qouts
        fdc, _ = _fetch_dp(fdc)
        fac, _ = _fetch_dp(fac)
        fdc = fdc.astype(np.int64)
        fac = fac.astype(np.int64)
        if share_statistics:       # shared across this host's local batch
            tables = optimal_tables_from_freqs(fdc.sum(axis=0),
                                               fac.sum(axis=0), n_groups)
            if n_groups == 1:
                tables[1], tables[3] = defaults[1], defaults[3]
            per_tables = [tables] * b_local
        else:
            per_tables = []
            for i in range(b_local):
                t = optimal_tables_from_freqs(fdc[i], fac[i], n_groups)
                if n_groups == 1:
                    t[1], t[3] = defaults[1], defaults[3]
                per_tables.append(t)
        if per_image_tables:
            dc_np = np.zeros((b_local, 2, 16), np.uint32)
            ac_np = np.zeros((b_local, 2, 256), np.uint32)
            for i, t in enumerate(per_tables):
                dc_np[i], ac_np[i] = engine._host_luts(t)
            dc_luts = _global_dp(mesh, dc_np)
            ac_luts = _global_dp(mesh, ac_np)
        else:
            dc_luts, ac_luts = engine._device_luts(per_tables[0])
    else:
        state = qouts
        tables = k3_default_tables()
        per_tables = [tables] * b_local
        dc_luts, ac_luts = engine._device_luts(tables)

    words, totals = stage_pack(state, dc_luts, ac_luts, vrows_g)
    shard_totals, _ = _fetch_dp(totals)                   # [B_local, S]
    overflow = (shard_totals > bucket * 32).any(axis=1)
    img_words_g, img_totals_g = _make_stitch(mesh)(words, totals)
    img_words, _ = _fetch_dp(img_words_g)
    img_totals, _ = _fetch_dp(img_totals_g)

    out = []
    for i in range(min(b_local, b_real_local)):
        if overflow[i]:        # per-stripe bucket overflow: host fallback
            # (engine._host_fallback_one rationale: no fresh smaller
            # device executables on the overflow path)
            from .. import host_encoder
            p2 = dataclasses.replace(param, yuv_mode=yuv_mode)
            out.append(host_encoder.encode_rgb(rgbs_np[i, :h], p2))
            continue
        scan = engine._finalize_scan_bytes(img_words[i], int(img_totals[i]))
        out.append(engine._assemble_jpeg(layout, param, per_qms[i],
                                         per_tables[i], scan))
    return out


def _make_qerr_stage(mesh, yuv_mode, width, nb_blocks, b, rows_per_stripe,
                     ragged):
    """Per-(image, stripe) exact squared quantization error for sharded
    PSNR-target searches (SURVEY §5.8: per-stripe distortion scalars
    combined across sp; the uint64 fold happens on host from the [S]
    (hi, lo) pairs so no carry is lost)."""
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    b_l = b // dp
    mcu_h = 16 if yuv_mode == C.YUV_420 else 8
    mb_w = -(-width // mcu_h)

    def comp_valid(v, c):
        per_row = nb_blocks[c] * mb_w
        rowi = jnp.arange(rows_per_stripe * per_row,
                          dtype=jnp.int32) // per_row
        return jnp.tile(rowi < v, b_l)

    def qerr_shard(coeffs, iq, ib, qq, vrows):
        per_rows = []
        for c, coef in enumerate(coeffs):
            g = 0 if c == 0 else 1
            cb = jnp.abs(coef.reshape(b_l, -1, 64).astype(jnp.int32))
            t = (cb + ib[:, None, g, :]).astype(jnp.uint32)
            q = ((t * iq[:, None, g, :].astype(jnp.uint32))
                 >> C.FP_BITS).astype(jnp.int32) >> C.AC_BITS
            deq = qq[:, None, g, :] * q
            v0 = cb >> C.AC_BITS
            err = jnp.sum((v0 - deq) * (v0 - deq), axis=2)  # [B_l, n]
            if ragged:
                err = err * comp_valid(vrows[0], c).reshape(
                    b_l, -1).astype(jnp.int32)
            per_rows.append(err)
        hi, lo = quantize.sum_u64_rows(
            jnp.concatenate(per_rows, axis=1))
        return jnp.stack([hi, lo], axis=1).reshape(b_l, 1, 2)

    cspec = tuple(P("dp", "sp", None) for _ in range(len(nb_blocks)))
    return jax.jit(_shard_map(
        qerr_shard, mesh,
        in_specs=(cspec, P("dp"), P("dp"), P("dp"), P("sp")),
        out_specs=P("dp", "sp", None)))


def _encode_search_sharded(rgbs_np, param, mesh, yuv_mode, w, h,
                           bits_per_pixel_budget, b_real_local):
    """Multi-pass target-size / target-PSNR dichotomy over the (dp, sp)
    mesh (SURVEY §5.8 third deliverable): per pass, re-quantization +
    symbol statistics run per stripe (frequencies psum over sp), the
    optimal Huffman tables build ON DEVICE (dp-partitioned
    ops.huffman_device), the stripes pack and stitch, and one fetch
    returns (size bits, stuffing, nb_syms, overflow) per image — exactly
    the engine's single-fetch pass structure, sharded.  PSNR passes
    psum-free: per-stripe (hi, lo) error pairs fold exactly on host.
    Bytes identical to engine._encode_batch_search / the reference
    LoopScan (src/dichotomy.cc:106-192)."""
    from ..dichotomy import get_psnr, header_size_bits, \
        header_size_bits_nbsyms
    from ..ops import huffman_device as hd
    from ..params import SearchHook, TARGET_SIZE
    from ..tools import estimate_quality

    flags = method_flags(param.method)
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    b_local = rgbs_np.shape[0]
    n_proc = jax.process_count() if _multiproc() else 1
    b = b_local * n_proc
    layout = pipeline.component_layout(yuv_mode, w, h)
    nb_blocks = tuple(layout.nb_blocks)
    n_groups = 2 if layout.nb_comps > 1 else 1
    min_qmats = param.resolved_min_quant_matrices()
    defaults = k3_default_tables()
    for_size = param.target_mode == TARGET_SIZE
    n_blocks_img = layout.mb_w * layout.mb_h * sum(nb_blocks)

    initial_q = min(max(estimate_quality(
        param.resolved_quant_matrices()[0]), 0.0), 100.0)
    hooks = []
    for _ in range(b_local):
        hk = SearchHook()
        hk.setup(param, initial_q)
        hooks.append(hk)

    # geometry + stages (same ragged handling as the single-shot path)
    mcu_h = 16 if yuv_mode == C.YUV_420 else 8
    rows_per_stripe = -(-layout.mb_h // sp)
    h_pad = rows_per_stripe * mcu_h * sp
    ragged = h_pad != h
    sub_h_partial = h - (layout.mb_h - 1) * mcu_h if h % mcu_h else 0
    if h_pad != rgbs_np.shape[1]:
        rgbs_np = np.pad(rgbs_np, ((0, 0), (0, h_pad - h), (0, 0),
                                   (0, 0)), mode="edge")
    srows = np.arange(sp, dtype=np.int32) * rows_per_stripe
    vrows_np = np.clip(layout.mb_h - srows, 0, rows_per_stripe)
    crow_np = ((layout.mb_h - 1) - srows if sub_h_partial
               else np.full(sp, -1, np.int32)).astype(np.int32)
    per_img_words = (layout.mb_w * rows_per_stripe * sp * sum(nb_blocks)
                     // sp * pack.WORDS_PER_BLOCK)
    tv = param.target_value if for_size else 0
    bucket = int(min(per_img_words,
                     max(1024, w * h * bits_per_pixel_budget / 32 / sp,
                         (tv * 2 * 8) / 32 / sp + 4096)))

    trellis = flags["use_trellis"]
    stage_coeffs, stage_quant, stage_pack = _build_stages(
        mesh, yuv_mode, w, h, nb_blocks, b,
        with_histo=flags["use_adaptive_quant"],
        with_stats=flags["optimize_size"],
        per_image_tables=True, bucket=bucket,
        rows_per_stripe=rows_per_stripe, ragged=ragged,
        sub_h_partial=sub_h_partial,
        use_trellis=trellis, trellis_lens_arg=trellis)
    stitch = _make_stitch(mesh)
    dp_sh = NamedSharding(mesh, P("dp"))

    # per-image trellis rate-table state (methods 7/8): lens evolve on
    # device exactly like the engine's batched search (reference
    # persistent ac_codes_ across LoopScan passes,
    # src/dichotomy.cc:83-85,144); lens_prev holds each image's
    # last-executed-pass ENTRY state for last-pass-is-best reuse
    if trellis:
        base_lens = np.broadcast_to(
            np.asarray(engine._trellis_cost_lens()),
            (b_local, 2, 256)).astype(np.int32)
        lens_dev = _global_dp(mesh, base_lens.copy())
        lens_prev_dev = lens_dev
        last_best = [False] * b_local

        @jax.jit
        def lens_update(lens, lens_prev, acl, upd):
            upd3 = upd[:, None, None]
            lens_prev = jnp.where(upd3, lens, lens_prev)
            new = (acl & 0xFF).astype(jnp.int32)
            lens = jnp.where(upd3 & (new > 0), new, lens)
            return lens, lens_prev

    @functools.partial(jax.jit, out_shardings=(dp_sh, dp_sh, dp_sh))
    def luts_sharded(fdc, fac):
        return hd.luts_from_freqs(fdc, fac, n_groups)

    @jax.jit
    def eval_sharded(stripe_totals, img_words, img_totals, nbs):
        stuffs = engine._stage_count_stuffing_batch(img_words, img_totals)
        over = jnp.max(stripe_totals, axis=1)
        return jnp.stack([img_totals.astype(jnp.int32), stuffs,
                          over.astype(jnp.int32)], axis=1), nbs

    def default_luts():
        dc0, ac0 = engine._host_luts(defaults)
        dcl = _global_dp(mesh, np.broadcast_to(
            dc0, (b_local, 2, 16)).copy())
        acl = _global_dp(mesh, np.broadcast_to(
            ac0, (b_local, 2, 256)).copy())
        return dcl, acl, _global_dp(mesh, np.zeros((b_local, 4),
                                                   np.int32))

    sp_sharding = NamedSharding(mesh, P("sp"))
    vrows_g = jax.device_put(vrows_np, sp_sharding)
    crow_g = jax.device_put(crow_np, sp_sharding)
    batch_g = _global_dp(mesh, rgbs_np, P("dp", "sp"))
    outs = stage_coeffs(batch_g, vrows_g, crow_g)
    if flags["use_adaptive_quant"]:
        coeffs = outs[:layout.nb_comps]
        hl, _ = _fetch_dp(outs[-2])
        hc, _ = _fetch_dp(outs[-1])
        hl = hl.astype(np.int64).reshape(b_local, 64, -1)
        hc = hc.astype(np.int64).reshape(b_local, 64, -1)
    else:
        coeffs = outs if isinstance(outs, tuple) else (outs,)
        hl = hc = None
    qerr_stage = (None if for_size else _make_qerr_stage(
        mesh, yuv_mode, w, nb_blocks, b, rows_per_stripe, ragged))

    def make_qms(i):
        qmats = np.stack([hooks[i].next_matrices()[c] for c in range(2)])
        qms = [spec.finalize_quant_matrix(qmats[g], min_qmats[g],
                                          param.quantization_bias)
               for g in range(2)]
        if flags["use_adaptive_quant"]:
            for g in range(n_groups - 1, -1, -1):
                qd = (param.qdelta_max_luma if g == 0
                      else param.qdelta_max_chroma)
                tuned = analyse_histo(hl[i] if g == 0 else hc[i],
                                      qms[g]["quant"], min_qmats[g], qd)
                qms[g] = spec.finalize_quant_matrix(
                    tuned, min_qmats[g], param.quantization_bias)
        return qms

    def uploads(per_qms):
        iq = _global_dp(mesh, np.stack(
            [[q["iquant"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        ib = _global_dp(mesh, np.stack(
            [[q["bias"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        qq = _global_dp(mesh, np.stack(
            [[q["quant"] for q in qms] for qms in per_qms]
        ).astype(np.int32))
        return iq, ib, qq

    from concurrent.futures import ThreadPoolExecutor

    best = [0.0] * b_local
    best_q = [0.0] * b_local
    best_result = [0.0] * b_local
    opt_qms = [None] * b_local
    done = [False] * b_local
    overflow = [False] * b_local
    passes = min(max(param.passes, 1), 20)

    for p in range(passes):
        with ThreadPoolExecutor(max_workers=min(8, b_local)) as pool:
            per_qms = list(pool.map(make_qms, range(b_local)))
        iq, ib, qq = uploads(per_qms)

        if for_size:
            if trellis:
                state, fdc, fac = stage_quant(tuple(coeffs), iq, ib, qq,
                                              lens_dev, vrows_g)
                dcl, acl, nbs_dev = luts_sharded(fdc, fac)
                upd = _global_dp(mesh, np.asarray(
                    [not (done[i] or overflow[i])
                     for i in range(b_local)]))
                lens_dev, lens_prev_dev = lens_update(
                    lens_dev, lens_prev_dev, acl, upd)
            elif flags["optimize_size"]:
                state, fdc, fac = stage_quant(tuple(coeffs), iq, ib, qq,
                                              vrows_g)
                dcl, acl, nbs_dev = luts_sharded(fdc, fac)
            else:
                state = stage_quant(tuple(coeffs), iq, ib, qq, vrows_g)
                dcl, acl, nbs_dev = default_luts()
            words, totals = stage_pack(state, dcl, acl, vrows_g)
            img_words_g, img_totals_g = stitch(words, totals)
            ev, nbs_d = eval_sharded(totals.reshape(totals.shape[0], -1),
                                     img_words_g, img_totals_g, nbs_dev)
            ev_np, _ = _fetch_dp(ev)
            nbs_np, _ = _fetch_dp(nbs_d)
            results = []
            for i in range(b_local):
                if int(ev_np[i, 2]) > bucket * 32:
                    overflow[i] = True
                    results.append(None)
                    continue
                if flags["optimize_size"]:
                    hdr = header_size_bits_nbsyms(
                        param, layout.nb_comps, nbs_np[i])
                else:
                    hdr = header_size_bits(param, layout.nb_comps,
                                           defaults)
                bits = hdr + int(ev_np[i, 0]) + 8 * int(ev_np[i, 1])
                results.append(float(np.float32(bits / 8.0)))
        else:
            hilo = qerr_stage(tuple(coeffs), iq, ib, qq, vrows_g)
            hilo_np, _ = _fetch_dp(hilo)        # [B_local, sp, 2]
            results = []
            for i in range(b_local):
                err = 0
                for s in range(hilo_np.shape[1]):
                    err += (int(hilo_np[i, s, 0]) << 32) | int(
                        hilo_np[i, s, 1])
                results.append(get_psnr(err, 64 * n_blocks_img))

        all_done = True
        for i in range(b_local):
            if done[i] or overflow[i]:
                continue
            hooks[i].pass_count = p
            result = results[i]
            is_best = p == 0 or abs(result - hooks[i].target) < best[i]
            if trellis:
                last_best[i] = is_best
            if is_best:
                opt_qms[i] = [per_qms[i][0]["quant"].copy(),
                              per_qms[i][1]["quant"].copy()]
                best[i] = abs(result - hooks[i].target)
                best_q[i] = hooks[i].q
                best_result[i] = result
            if hooks[i].update(result):
                done[i] = True
            else:
                all_done = False
        if all_done:
            break

    # final pass at each image's best matrices; host tables for the DHT
    final_qms = []
    for i in range(b_local):
        if overflow[i]:
            final_qms.append(make_qms(i))
            continue
        qms = [spec.finalize_quant_matrix(opt_qms[i][g], min_qmats[g],
                                          param.quantization_bias)
               for g in range(2)]
        final_qms.append(qms)
        hooks[i].q = best_q[i]
        hooks[i].value = best_result[i]
    iq, ib, qq = uploads(final_qms)
    if trellis:
        # best-pass == last-executed-pass reuses that pass's ENTRY rate
        # tables (engine semantics; src/dichotomy.cc:144)
        final_lens = (jnp.where(
            _global_dp(mesh, np.asarray(last_best))[:, None, None],
            lens_prev_dev, lens_dev) if for_size else lens_dev)
    if flags["optimize_size"]:
        if trellis:
            state, fdc, fac = stage_quant(tuple(coeffs), iq, ib, qq,
                                          final_lens, vrows_g)
        else:
            state, fdc, fac = stage_quant(tuple(coeffs), iq, ib, qq,
                                          vrows_g)
        fdc_np, _ = _fetch_dp(fdc)
        fac_np, _ = _fetch_dp(fac)
        per_tables = []
        for i in range(b_local):
            t = optimal_tables_from_freqs(fdc_np[i].astype(np.int64),
                                          fac_np[i].astype(np.int64),
                                          n_groups)
            if n_groups == 1:
                t[1], t[3] = defaults[1], defaults[3]
            per_tables.append(t)
        dc_np = np.zeros((b_local, 2, 16), np.uint32)
        ac_np = np.zeros((b_local, 2, 256), np.uint32)
        for i, t in enumerate(per_tables):
            dc_np[i], ac_np[i] = engine._host_luts(t)
        dc_luts = _global_dp(mesh, dc_np)
        ac_luts = _global_dp(mesh, ac_np)
    else:
        state = stage_quant(tuple(coeffs), iq, ib, qq, vrows_g)
        per_tables = [defaults] * b_local
        dc_luts, ac_luts, _ = default_luts()
    words, totals = stage_pack(state, dc_luts, ac_luts, vrows_g)
    shard_totals, _ = _fetch_dp(totals)
    over_f = (shard_totals.reshape(b_local, -1) > bucket * 32).any(axis=1)
    img_words_g, img_totals_g = stitch(words, totals)
    img_words, _ = _fetch_dp(img_words_g)
    img_totals, _ = _fetch_dp(img_totals_g)

    out = []
    for i in range(min(b_local, b_real_local)):
        if overflow[i] or over_f[i]:
            from .. import host_encoder
            p2 = dataclasses.replace(param, yuv_mode=yuv_mode)
            out.append(host_encoder.encode_rgb(rgbs_np[i, :h], p2))
            continue
        scan = engine._finalize_scan_bytes(img_words[i],
                                           int(img_totals[i]))
        out.append(engine._assemble_jpeg(layout, param, final_qms[i],
                                         per_tables[i], scan))
    return out
