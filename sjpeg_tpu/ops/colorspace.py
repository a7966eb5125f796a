"""Device color conversion + block layout.

Whole-image array programs replacing the reference's per-MCU conversion
(src/colors_rgb.cc:505-603): fixed-point BT.601 full-range RGB->YUV with the
exact rounding/shift order, MCU padding by edge replication, and the
extra-luma flattening of clipped 4:2:0 MCUs (src/enc.cc:1703-1754).

All shapes are static under jit; the clipped-edge fixups compile away
entirely when the image size is MCU-aligned.
"""

import jax
import jax.numpy as jnp

from .. import constants as C


def pad_edge(img, block_w: int, block_h: int):
    """Replicate last row/column up to MCU multiples (static shapes)."""
    h, w = img.shape[:2]
    ph = (-h) % block_h
    pw = (-w) % block_w
    if ph == 0 and pw == 0:
        return img
    return jnp.pad(img, [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2),
                   mode="edge")


def blockize(plane):
    """[H, W] -> [H/8 * W/8, 64] in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 64))


def blockize_420_luma(plane):
    """[H, W] -> [n_mcu*4, 64] with row-major 2x2 block order per MCU."""
    h, w = plane.shape
    return (plane.reshape(h // 16, 2, 8, w // 16, 2, 8)
            .transpose(0, 3, 1, 4, 2, 5)
            .reshape(-1, 64))


def rgb_to_yuv444_planes(rgb):
    """[H, W, 3] uint8 -> (y, u, v) [H, W] int32 planes, centered on 0."""
    rgb = rgb.astype(jnp.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = (19595 * r + 38469 * g + 7471 * b + C.ROUND_Y) >> C.YUV_FRAC
    u = (-11059 * r - 21709 * g + 32768 * b + C.YUV_HALF) >> C.YUV_FRAC
    v = (32768 * r - 27439 * g - 5329 * b + C.YUV_HALF) >> C.YUV_FRAC
    return y, u, v


def rgb_to_y_plane(rgb):
    rgb = rgb.astype(jnp.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (19595 * r + 38469 * g + 7471 * b + C.ROUND_Y) >> C.YUV_FRAC


def rgb_to_yuv420_planes(rgb):
    """[H, W, 3] uint8 (16-aligned) -> (y [H,W], u, v [H/2,W/2]) int32.

    Chroma derives from the sum of each 2x2 RGB quad with ROUND_UV rounding
    and a FRAC+2 shift, matching the reference's summed-quad fixed point.
    """
    y = rgb_to_y_plane(rgb)
    h, w = rgb.shape[:2]
    q = rgb.astype(jnp.int32).reshape(h // 2, 2, w // 2, 2, 3)
    s = q.sum(axis=(1, 3))
    r, g, b = s[..., 0], s[..., 1], s[..., 2]
    u = (-11059 * r - 21709 * g + 32768 * b + C.ROUND_UV) >> (C.YUV_FRAC + 2)
    v = (32768 * r - 27439 * g - 5329 * b + C.ROUND_UV) >> (C.YUV_FRAC + 2)
    return y, u, v


def _block_avg(block):
    """Rounded mean of 8x8 blocks over the last axis: (sum + 32) >> 6."""
    return (block.sum(axis=-1) + 32) >> 6


def average_extra_luma(y_blocks, mb_w: int, mb_h: int, width: int,
                       height: int):
    """Flatten fully-out-of-frame 4:2:0 luma blocks (static-shape fixup).

    `y_blocks`: [mb_h*mb_w*4, 64] in MCU-nested 2x2 order.  Which blocks get
    flattened is decided entirely by the static geometry; only the averages
    are data-dependent, so under jit this lowers to a few slice/concat ops on
    the last MCU row/column (and nothing at all for aligned images).
    """
    mb_x_max = width // 16
    mb_y_max = height // 16
    x_clip = mb_x_max < mb_w
    y_clip = mb_y_max < mb_h
    if not (x_clip or y_clip):
        return y_blocks
    sub_w = width - mb_x_max * 16
    sub_h = height - mb_y_max * 16

    yb = y_blocks.reshape(mb_h, mb_w, 4, 64)

    def fix_mcu(mcu, sw, sh):
        """mcu: [4, 64]; sw/sh static sub-sizes of this MCU."""
        b0, b1, b2, b3 = mcu[0], mcu[1], mcu[2], mcu[3]
        dc = _block_avg(b0)
        if sw <= 8:
            b1 = jnp.full((64,), dc, mcu.dtype)
        if sh <= 8:
            dc2 = _block_avg(b1) if sw > 8 else dc
            b2 = jnp.full((64,), dc2, mcu.dtype)
            b3 = jnp.full((64,), dc2, mcu.dtype)
        elif sw <= 8:
            b3 = jnp.full((64,), _block_avg(b2), mcu.dtype)
        return jnp.stack([b0, b1, b2, b3])

    if x_clip:
        col = yb[:, mb_x_max]          # [mb_h, 4, 64]
        # rows other than the (possibly) y-clipped one
        fixed = jax.vmap(lambda m: fix_mcu(m, sub_w, 16))(col)
        if y_clip:
            corner = fix_mcu(yb[mb_y_max, mb_x_max], sub_w, sub_h)
            fixed = fixed.at[mb_y_max].set(corner)
        yb = yb.at[:, mb_x_max].set(fixed)
    if y_clip:
        row = yb[mb_y_max]             # [mb_w, 4, 64]
        fixed = jax.vmap(lambda m: fix_mcu(m, 16, sub_h))(row)
        if x_clip:
            fixed = fixed.at[mb_x_max].set(yb[mb_y_max, mb_x_max])
        yb = yb.at[mb_y_max].set(fixed)
    return yb.reshape(-1, 64)


def rgb_to_blocks(rgb, yuv_mode: int, width: int, height: int):
    """Full device layout: RGB [H, W, 3] -> list of [N_c, 64] int32 arrays."""
    if yuv_mode == C.YUV_444:
        img = pad_edge(rgb, 8, 8)
        y, u, v = rgb_to_yuv444_planes(img)
        return [blockize(y), blockize(u), blockize(v)]
    if yuv_mode == C.YUV_420:
        img = pad_edge(rgb, 16, 16)
        y, u, v = rgb_to_yuv420_planes(img)
        mb_w = img.shape[1] // 16
        mb_h = img.shape[0] // 16
        yb = blockize_420_luma(y)
        yb = average_extra_luma(yb, mb_w, mb_h, width, height)
        return [yb, blockize(u), blockize(v)]
    if yuv_mode == C.YUV_400:
        img = pad_edge(rgb, 8, 8)
        return [blockize(rgb_to_y_plane(img))]
    raise ValueError(f"unsupported yuv_mode {yuv_mode}")


def planes_to_blocks(planes, yuv_mode: int, width: int, height: int):
    """Planar YUV/gray input -> component block lists (values -128)."""
    if yuv_mode == C.YUV_400:
        y = pad_edge(planes[0], 8, 8).astype(jnp.int32) - 128
        return [blockize(y)]
    if yuv_mode == C.YUV_444:
        return [blockize(pad_edge(p, 8, 8).astype(jnp.int32) - 128)
                for p in planes]
    if yuv_mode == C.YUV_420:
        y, u, v = planes
        yp = pad_edge(y, 16, 16).astype(jnp.int32) - 128
        mb_w = yp.shape[1] // 16
        mb_h = yp.shape[0] // 16
        yb = blockize_420_luma(yp)
        yb = average_extra_luma(yb, mb_w, mb_h, width, height)
        ub = blockize(pad_edge(u, 8, 8).astype(jnp.int32) - 128)
        vb = blockize(pad_edge(v, 8, 8).astype(jnp.int32) - 128)
        return [yb, ub, vb]
    raise ValueError(f"unsupported yuv_mode {yuv_mode}")
