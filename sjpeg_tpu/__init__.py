"""sjpeg_tpu: a TPU-native baseline-JPEG encode engine.

A from-scratch JAX/XLA/Pallas implementation of the full capability surface
of webmproject/sjpeg (see SURVEY.md): RGB->YUV conversion (4:4:4 / 4:2:0 /
4:0:0 / sharp 4:2:0), fixed-point 8x8 forward DCT, bias and trellis
quantization, adaptive quant-matrix optimization, two-pass optimized Huffman
coding, riskiness-based automatic yuv_mode selection, recompression tools,
target-size/PSNR search, and full metadata emission — producing valid
baseline JPEG bitstreams, with the hot path running batched on TPU.
"""

from .constants import (SJPEG_TPU_VERSION, YUV_400, YUV_420, YUV_444,
                        YUV_AUTO, YUV_SHARP)
from .params import EncoderParam, SearchHook, TARGET_NONE, TARGET_PSNR, TARGET_SIZE
from .host_encoder import encode_gray as host_encode_gray
from .host_encoder import encode_rgb as host_encode_rgb
from .host_encoder import encode_yuv as host_encode_yuv
from .tools import dimensions, estimate_quality, find_quantizer, quant_matrix


def version() -> str:
    return ".".join(map(str, SJPEG_TPU_VERSION))


def encode_batch(rgbs, param=None, **kw) -> list:
    """Encode a uint8 image batch [B, H, W, 3] (throughput path)."""
    from .engine import encode_batch as _eb
    return _eb(rgbs, param, **kw)


def encode_pipelined(batches, param=None, depth=2, **kw):
    """Pipelined encode_batch over an iterable of batches (sustained
    -throughput serving: overlaps one batch's result fetch with the next
    batch's device work).  Yields per-batch JPEG lists in order."""
    from .engine import encode_pipelined as _ep
    yield from _ep(batches, param, depth=depth, **kw)


def encode_many(images, param=None, **kw) -> list:
    """Encode a mixed-shape list of RGB images (grouped per shape)."""
    from .engine import encode_many as _em
    return _em(images, param, **kw)


def encode_batch_yuv(y, u, v, is_420, param=None, **kw) -> list:
    """Encode a batch of planar-YUV images ([B, H, W] y + chroma)."""
    from .engine import encode_batch_yuv as _eby
    return _eby(y, u, v, is_420, param, **kw)


def encode_batch_gray(y, param=None, **kw) -> list:
    """Encode a batch of grayscale planes [B, H, W] as YUV 4:0:0."""
    from .engine import encode_batch_gray as _ebg
    return _ebg(y, param, **kw)


def encode_batch_nv12(y, uv, param=None, **kw) -> list:
    """Encode a batch of semi-planar NV12 frames (interleaved U/V)."""
    from .engine import encode_batch_nv12 as _ebn
    return _ebn(y, uv, param, **kw)


def encode_batch_nv21(y, vu, param=None, **kw) -> list:
    """Encode a batch of semi-planar NV21 frames (interleaved V/U)."""
    from .engine import encode_batch_nv21 as _ebn
    return _ebn(y, vu, param, **kw)


def encode_batch_sharded(rgbs, param=None, mesh=None, **kw) -> list:
    """Encode a batch over a (dp, sp) device mesh (multi-chip path)."""
    from .parallel.api import encode_batch_sharded as _ebs
    return _ebs(rgbs, param, mesh=mesh, **kw)


def encode(rgb, param=None, backend: str = "auto") -> bytes:
    """Encode an RGB uint8 image to baseline JPEG.

    backend: 'tpu' (JAX device path), 'host' (NumPy), or 'auto'.
    """
    if backend == "host":
        return host_encode_rgb(rgb, param)
    from .engine import encode_rgb as device_encode_rgb
    return device_encode_rgb(rgb, param)


__all__ = [
    "EncoderParam", "SearchHook", "encode", "encode_batch", "encode_many",
    "encode_pipelined",
    "encode_batch_yuv", "encode_batch_gray", "encode_batch_nv12",
    "encode_batch_nv21", "encode_batch_sharded", "version",
    "host_encode_rgb", "host_encode_gray", "host_encode_yuv",
    "dimensions", "estimate_quality", "find_quantizer", "quant_matrix",
    "YUV_AUTO", "YUV_420", "YUV_SHARP", "YUV_444", "YUV_400",
    "TARGET_NONE", "TARGET_SIZE", "TARGET_PSNR",
]
