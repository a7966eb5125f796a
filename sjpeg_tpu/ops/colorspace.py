"""Device color conversion + block layout.

Whole-image array programs replacing the reference's per-MCU conversion
(src/colors_rgb.cc:505-603): fixed-point BT.601 full-range RGB->YUV with the
exact rounding/shift order, MCU padding by edge replication, and the
extra-luma flattening of clipped 4:2:0 MCUs (src/enc.cc:1703-1754).

Every function accepts an optional leading batch dimension ([B, H, W, ...]);
batching is plain data parallelism on the block axis — a batch of images is
just more 8x8 blocks, with per-image state (DC chains, bit offsets) handled
downstream by reshaping the flat block axis.  All shapes are static under
jit; the clipped-edge fixups compile away for MCU-aligned images.
"""

import jax
import jax.numpy as jnp

from .. import constants as C


def pad_edge(img, block_w: int, block_h: int):
    """Replicate last row/column up to MCU multiples ([..., H, W] or
    [..., H, W, 3]; static shapes)."""
    # identify H, W axes: last two for planes, (-3, -2) for RGB
    if img.shape[-1] == 3 and img.ndim >= 3:
        ha, wa = img.ndim - 3, img.ndim - 2
    else:
        ha, wa = img.ndim - 2, img.ndim - 1
    h, w = img.shape[ha], img.shape[wa]
    ph = (-h) % block_h
    pw = (-w) % block_w
    if ph == 0 and pw == 0:
        return img
    pad = [(0, 0)] * img.ndim
    pad[ha] = (0, ph)
    pad[wa] = (0, pw)
    return jnp.pad(img, pad, mode="edge")


def blockize(plane):
    """[..., H, W] -> [..., H/8 * W/8, 64] flattened over leading dims."""
    *lead, h, w = plane.shape
    out = (plane.reshape(*lead, h // 8, 8, w // 8, 8)
           .swapaxes(-3, -2)
           .reshape(*lead, (h // 8) * (w // 8), 64))
    return out.reshape(-1, 64)


def blockize_420_luma(plane):
    """[..., H, W] -> [prod(lead) * n_mcu * 4, 64]; row-major 2x2 block
    order per MCU."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 16, 2, 8, w // 16, 2, 8)
    # [..., mbY, suby, row, mbX, subx, col] -> [..., mbY, mbX, suby, subx,
    # row, col]
    n = x.ndim
    perm = (list(range(n - 6))
            + [n - 6, n - 3, n - 5, n - 2, n - 4, n - 1])
    return x.transpose(perm).reshape(-1, 64)


def _channel_planes(rgb):
    """[..., H, W, 3] uint8 -> three [..., H, W] int32 planes.

    Slicing the uint8 channels before widening keeps XLA from
    materializing (and re-laying-out) an int32 copy of the whole
    interleaved image — the relayout copy alone cost ~2.6 ms per
    16x1024^2 batch in traces."""
    return (rgb[..., 0].astype(jnp.int32), rgb[..., 1].astype(jnp.int32),
            rgb[..., 2].astype(jnp.int32))


def rgb_to_yuv444_planes(rgb):
    """[..., H, W, 3] uint8 -> (y, u, v) [..., H, W] int32, centered on 0."""
    r, g, b = _channel_planes(rgb)
    y = (19595 * r + 38469 * g + 7471 * b + C.ROUND_Y) >> C.YUV_FRAC
    u = (-11059 * r - 21709 * g + 32768 * b + C.YUV_HALF) >> C.YUV_FRAC
    v = (32768 * r - 27439 * g - 5329 * b + C.YUV_HALF) >> C.YUV_FRAC
    return y, u, v


def rgb_to_y_plane(rgb):
    r, g, b = _channel_planes(rgb)
    return (19595 * r + 38469 * g + 7471 * b + C.ROUND_Y) >> C.YUV_FRAC


def _quad_sum(x):
    """Sum of each 2x2 quad of [..., H, W] -> [..., H/2, W/2] int32."""
    *lead, h, w = x.shape
    cols = x.reshape(*lead, h, w // 2, 2).sum(axis=-1)
    return cols.reshape(*lead, h // 2, 2, w // 2).sum(axis=-2)


def rgb_to_yuv420_planes(rgb):
    """[..., H, W, 3] uint8 (16-aligned) -> (y, u, v) int32 planes.

    Chroma derives from the sum of each 2x2 RGB quad with ROUND_UV rounding
    and a FRAC+2 shift, matching the reference's summed-quad fixed point.
    Quad sums run per channel plane (pair-reduce on the minor axis, then
    the row axis) — the interleaved 6-D reshape+reduce formulation forced
    an awkward T(2,128) layout and a multi-ms reduction in traces.
    """
    y = rgb_to_y_plane(rgb)
    r, g, b = _channel_planes(rgb)
    r, g, b = _quad_sum(r), _quad_sum(g), _quad_sum(b)
    u = (-11059 * r - 21709 * g + 32768 * b + C.ROUND_UV) >> (C.YUV_FRAC + 2)
    v = (32768 * r - 27439 * g - 5329 * b + C.ROUND_UV) >> (C.YUV_FRAC + 2)
    return y, u, v


def _block_avg(block):
    """Rounded mean of 8x8 blocks over the last axis: (sum + 32) >> 6."""
    return (block.astype(jnp.int32).sum(axis=-1) + 32) >> 6


def fix_mcu(mcu, sw: int, sh: int):
    """AverageExtraLuma flattening of one clipped 4:2:0 MCU's luma blocks
    (src/enc.cc:1720-1738).  mcu: [..., 4, 64]; sw/sh static sub-sizes."""
    b0, b1 = mcu[..., 0, :], mcu[..., 1, :]
    b2, b3 = mcu[..., 2, :], mcu[..., 3, :]
    dc = _block_avg(b0)[..., None].astype(mcu.dtype)
    if sw <= 8:
        b1 = jnp.broadcast_to(dc, b1.shape)
    if sh <= 8:
        dc2 = (_block_avg(b1)[..., None].astype(mcu.dtype)
               if sw > 8 else dc)
        b2 = jnp.broadcast_to(dc2, b2.shape)
        b3 = jnp.broadcast_to(dc2, b3.shape)
    elif sw <= 8:
        b3 = jnp.broadcast_to(
            _block_avg(b2)[..., None].astype(mcu.dtype), b3.shape)
    return jnp.stack([b0, b1, b2, b3], axis=-2)


def average_extra_luma(y_blocks, mb_w: int, mb_h: int, width: int,
                       height: int):
    """Flatten fully-out-of-frame 4:2:0 luma blocks (static-shape fixup).

    `y_blocks`: [B * mb_h * mb_w * 4, 64] in MCU-nested 2x2 order.  Which
    blocks get flattened is decided by the static geometry; only the
    averages are data-dependent, so under jit this lowers to a few
    slice/concat ops on the last MCU row/column (nothing for aligned
    images).
    """
    mb_x_max = width // 16
    mb_y_max = height // 16
    x_clip = mb_x_max < mb_w
    y_clip = mb_y_max < mb_h
    if not (x_clip or y_clip):
        return y_blocks
    sub_w = width - mb_x_max * 16
    sub_h = height - mb_y_max * 16

    yb = y_blocks.reshape(-1, mb_h, mb_w, 4, 64)

    if x_clip:
        col = yb[:, :, mb_x_max]          # [B, mb_h, 4, 64]
        fixed = fix_mcu(col, sub_w, 16)
        if y_clip:
            corner = fix_mcu(yb[:, mb_y_max, mb_x_max], sub_w, sub_h)
            fixed = fixed.at[:, mb_y_max].set(corner)
        yb = yb.at[:, :, mb_x_max].set(fixed)
    if y_clip:
        row = yb[:, mb_y_max]             # [B, mb_w, 4, 64]
        fixed = fix_mcu(row, 16, sub_h)
        if x_clip:
            fixed = fixed.at[:, mb_x_max].set(yb[:, mb_y_max, mb_x_max])
        yb = yb.at[:, mb_y_max].set(fixed)
    return yb.reshape(-1, 64)


def average_extra_luma_dynamic_row(y_blocks, rows: int, mb_w: int,
                                   width: int, sub_h: int, clip_row):
    """Partial-MCU-row luma flattening at a *traced* row index.

    Sharded stripes of a height-clipped image place the image's partial
    MCU row at a stripe-local index known only per shard (`clip_row`, a
    traced scalar; negative or >= rows means "not in this stripe").
    Applies `fix_mcu` with the static (sub_w, sub_h) geometry to that one
    row via dynamic slice/update — bit-identical to the static
    average_extra_luma's y-clip handling.  `y_blocks`:
    [B * rows * mb_w * 4, 64], already x-clip-fixed by the static path.
    fix_mcu composes idempotently over the static x-fix: b0 is never
    rewritten, b1 recomputes from b0, and the sh<=8 branch overwrites
    b2/b3 unconditionally.
    """
    mb_x_max = width // 16
    x_clip = mb_x_max < mb_w
    sub_w = width - mb_x_max * 16
    yb = y_blocks.reshape(-1, rows, mb_w, 4, 64)
    idx = jnp.clip(clip_row, 0, rows - 1)
    row = jax.lax.dynamic_slice_in_dim(yb, idx, 1, axis=1)[:, 0]
    fixed = fix_mcu(row, 16, sub_h)
    if x_clip:
        corner = fix_mcu(row[:, mb_x_max], sub_w, sub_h)
        fixed = fixed.at[:, mb_x_max].set(corner)
    hit = (clip_row >= 0) & (clip_row < rows)
    fixed = jnp.where(hit, fixed, row)
    yb = jax.lax.dynamic_update_slice_in_dim(yb, fixed[:, None], idx,
                                             axis=1)
    return yb.reshape(-1, 64)


def rgb_to_blocks(rgb, yuv_mode: int, width: int, height: int,
                  out_dtype=jnp.int32):
    """Device layout: RGB [..., H, W, 3] -> list of [N_c, 64] arrays.

    With a leading batch dim, each component array concatenates the images'
    blocks in batch order (image-major, then component scan order).
    `out_dtype=jnp.int8` casts each plane *before* the blockize transposes
    so those relayout copies move a quarter of the bytes (the fused
    samples-in kernel takes int8).  Caution: luma fits int8 exactly
    ([-128, 127]), but chroma spans [-127, +128] (pure blue -> U = +128,
    pure red -> V = +128; the reference keeps unclamped int16,
    src/colors_rgb.cc ToU/ToUV), so the int8 cast wraps +128 to -128 —
    consumers of int8 chroma MUST decode -128 back to +128 after widening
    (engine._interleave_samples / pallas_quant_pack chroma_wrap).  -128 is
    unreachable from RGB chroma (minimum is exactly -127), so the mapping
    is unambiguous.
    """
    cast = lambda p: p.astype(out_dtype)
    if yuv_mode == C.YUV_444:
        img = pad_edge(rgb, 8, 8)
        y, u, v = rgb_to_yuv444_planes(img)
        return [blockize(cast(y)), blockize(cast(u)), blockize(cast(v))]
    if yuv_mode == C.YUV_420:
        img = pad_edge(rgb, 16, 16)
        y, u, v = rgb_to_yuv420_planes(img)
        mb_w = img.shape[-2] // 16
        mb_h = img.shape[-3] // 16
        yb = blockize_420_luma(cast(y))
        yb = average_extra_luma(yb, mb_w, mb_h, width, height)
        return [yb, blockize(cast(u)), blockize(cast(v))]
    if yuv_mode == C.YUV_400:
        img = pad_edge(rgb, 8, 8)
        return [blockize(cast(rgb_to_y_plane(img)))]
    raise ValueError(f"unsupported yuv_mode {yuv_mode}")


def planes_to_blocks(planes, yuv_mode: int, width: int, height: int,
                     out_dtype=jnp.int32):
    """Planar YUV/gray input [..., H, W] -> component block lists (-128)."""
    cast = lambda p: (pad_edge(p, 8, 8).astype(jnp.int32)
                      - 128).astype(out_dtype)
    if yuv_mode == C.YUV_400:
        return [blockize(cast(planes[0]))]
    if yuv_mode == C.YUV_444:
        return [blockize(cast(p)) for p in planes]
    if yuv_mode == C.YUV_420:
        y, u, v = planes
        yp = (pad_edge(y, 16, 16).astype(jnp.int32) - 128).astype(out_dtype)
        mb_w = yp.shape[-1] // 16
        mb_h = yp.shape[-2] // 16
        yb = blockize_420_luma(yp)
        yb = average_extra_luma(yb, mb_w, mb_h, width, height)
        return [yb, blockize(cast(u)), blockize(cast(v))]
    raise ValueError(f"unsupported yuv_mode {yuv_mode}")
