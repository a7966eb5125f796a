"""Shared encode-pipeline structure: component geometry and scan interleave.

Both the host (NumPy oracle) and device (JAX) paths consume this: it converts
an input image into per-component block arrays in component scan order plus
the metadata needed for headers and the MCU interleave (reference geometry:
src/enc.cc:1645-1701).
"""

import dataclasses
from typing import List, Optional

import numpy as np

from . import constants as C
from . import spec


@dataclasses.dataclass
class ComponentLayout:
    yuv_mode: int
    width: int
    height: int
    mb_w: int
    mb_h: int
    nb_comps: int
    quant_idx: List[int]      # per component: 0 = luma table, 1 = chroma
    nb_blocks: List[int]      # blocks per MCU per component
    block_dims: List[int]     # SOF sampling byte per component
    block_w: int              # MCU pixel width
    block_h: int


def component_layout(yuv_mode: int, width: int, height: int) -> ComponentLayout:
    if yuv_mode == C.YUV_444:
        geo = dict(nb_comps=3, quant_idx=[0, 1, 1], nb_blocks=[1, 1, 1],
                   block_dims=[0x11, 0x11, 0x11], block_w=8, block_h=8)
    elif yuv_mode in (C.YUV_420, C.YUV_SHARP):
        geo = dict(nb_comps=3, quant_idx=[0, 1, 1], nb_blocks=[4, 1, 1],
                   block_dims=[0x22, 0x11, 0x11], block_w=16, block_h=16)
    elif yuv_mode == C.YUV_400:
        geo = dict(nb_comps=1, quant_idx=[0], nb_blocks=[1],
                   block_dims=[0x11], block_w=8, block_h=8)
    else:
        raise ValueError(f"unresolved yuv_mode {yuv_mode}")
    mb_w = (width + geo["block_w"] - 1) // geo["block_w"]
    mb_h = (height + geo["block_h"] - 1) // geo["block_h"]
    return ComponentLayout(yuv_mode=yuv_mode, width=width, height=height,
                           mb_w=mb_w, mb_h=mb_h, **geo)


def rgb_to_component_blocks(rgb: np.ndarray, layout: ComponentLayout):
    """RGB [H, W, 3] -> list of [N_c, 64] int32 block arrays (centered),
    each in component scan order (MCU raster; 2x2 luma sub-order for 420)."""
    mode = layout.yuv_mode
    img = spec.pad_edge(rgb, layout.block_w, layout.block_h)
    if mode == C.YUV_444:
        y, u, v = spec.rgb_to_yuv444(img)
        return [spec.blockize(y), spec.blockize(u), spec.blockize(v)]
    if mode == C.YUV_420:
        y, u, v = spec.rgb_to_yuv420(img)
        yb = spec.blockize_420_luma(y)
        yb = spec.average_extra_luma(yb, layout.mb_w, layout.mb_h,
                                     layout.width, layout.height)
        return [yb, spec.blockize(u), spec.blockize(v)]
    if mode == C.YUV_400:
        return [spec.blockize(spec.rgb_to_y(img))]
    raise ValueError(f"unsupported yuv_mode {mode}")


def gray_to_component_blocks(gray: np.ndarray, layout: ComponentLayout):
    """Direct luma-plane input (YUV 4:0:0), values shifted by -128."""
    img = spec.pad_edge(gray, 8, 8).astype(np.int32) - 128
    return [spec.blockize(img)]


def yuv_planes_to_component_blocks(y: np.ndarray, u: np.ndarray,
                                   v: np.ndarray, layout: ComponentLayout):
    """Planar YUV input (4:4:4 or 4:2:0), values shifted by -128."""
    mode = layout.yuv_mode
    if mode == C.YUV_444:
        planes = [spec.pad_edge(p, 8, 8).astype(np.int32) - 128
                  for p in (y, u, v)]
        return [spec.blockize(p) for p in planes]
    if mode in (C.YUV_420, C.YUV_SHARP):
        yp = spec.pad_edge(y, 16, 16).astype(np.int32) - 128
        yb = spec.blockize_420_luma(yp)
        yb = spec.average_extra_luma(yb, layout.mb_w, layout.mb_h,
                                     layout.width, layout.height)
        ub = spec.blockize(spec.pad_edge(u, 8, 8).astype(np.int32) - 128)
        vb = spec.blockize(spec.pad_edge(v, 8, 8).astype(np.int32) - 128)
        return [yb, ub, vb]
    raise ValueError(f"unsupported yuv_mode {mode} for planar input")


def nv12_to_component_blocks(y: np.ndarray, uv: np.ndarray,
                             layout: ComponentLayout, is_nv12: bool = True):
    """Semi-planar NV12/NV21 input: uv is [ceil(H/2), ceil(W/2), 2]."""
    u = uv[..., 0] if is_nv12 else uv[..., 1]
    v = uv[..., 1] if is_nv12 else uv[..., 0]
    return yuv_planes_to_component_blocks(y, u, v, layout)


def scan_order(layout: ComponentLayout):
    """[(component, per-component block index)] in MCU-interleaved order."""
    order = []
    counters = [0] * layout.nb_comps
    for _ in range(layout.mb_w * layout.mb_h):
        for c in range(layout.nb_comps):
            for _b in range(layout.nb_blocks[c]):
                order.append((c, counters[c]))
                counters[c] += 1
    return order
