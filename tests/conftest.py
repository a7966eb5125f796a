"""Test configuration.

Tests run JAX on a virtual 8-device CPU mesh so sharding logic is exercised
without TPU hardware; kernels are validated bit-exactly against the NumPy
spec oracle, which itself is validated byte-exactly against the reference
encoder binary (built on demand from /root/reference when available).
"""

import os
import sys
import subprocess
from pathlib import Path

# The accelerator-plugin environment scrub + CPU re-exec lives in
# sjpeg_test_bootstrap.py (loaded via pytest.ini addopts before capture
# starts).  Here we only pin the virtual 8-device CPU mesh.
if not os.environ.get("SJPEG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np
import pytest

REFERENCE_SRC = Path("/root/reference")
REFERENCE_BUILD = Path("/root/build-ref")
REFERENCE_BIN = REFERENCE_BUILD / "sjpeg"


def _ensure_reference_binary():
    if REFERENCE_BIN.exists():
        return REFERENCE_BIN
    if not REFERENCE_SRC.exists():
        return None
    REFERENCE_BUILD.mkdir(parents=True, exist_ok=True)
    try:
        subprocess.run(["cmake", str(REFERENCE_SRC),
                        "-DCMAKE_BUILD_TYPE=Release"],
                       cwd=REFERENCE_BUILD, check=True, capture_output=True)
        subprocess.run(["make", "-j8", "sjpeg-bin"], cwd=REFERENCE_BUILD,
                       check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return REFERENCE_BIN if REFERENCE_BIN.exists() else None


@pytest.fixture(scope="session")
def reference_bin():
    bin_ = _ensure_reference_binary()
    if bin_ is None:
        pytest.skip("reference sjpeg binary not available")
    return bin_


def make_test_image(w, h, seed=42):
    """Deterministic gradient+noise RGB image."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (xx + yy) // 2 % 256,
    ], axis=-1).astype(np.int64)
    img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255)
    return img.astype(np.uint8)


def make_smooth_image(w, h):
    """Smooth gradient (compresses to long zero runs / EOBs)."""
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        np.full_like(xx, 128),
    ], axis=-1)
    return img.astype(np.uint8)


@pytest.fixture(scope="session")
def ppm_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ppm")
    return d


def write_ppm(path, rgb):
    with open(path, "wb") as f:
        f.write(f"P6\n{rgb.shape[1]} {rgb.shape[0]}\n255\n".encode())
        f.write(np.ascontiguousarray(rgb).tobytes())


def reference_encode(reference_bin, ppm_path, out_path, *flags):
    subprocess.run([str(reference_bin), str(ppm_path), "-o", str(out_path),
                    "-quiet", *flags], check=True)
    return out_path.read_bytes()


# ---------------------------------------------------------------------------
# Test tiers.  The default gate (`pytest -m "not slow"`) keeps one
# representative per feature family and must stay under ~5 minutes; the
# heavyweight variants below (big interpret-mode kernels, the sharded /
# multi-process parameter matrix, extra fuzz seeds) carry the same
# coverage at higher cost and run in the slow tier (CI runs both).
_SLOW_TESTS = {
    # engine e2e heavyweights (fast tier keeps
    # test_device_encode_matches_oracle_end_to_end and the per-image /
    # trellis / sharp byte-parity representatives)
    "test_encode_batch_relay_fused_byte_identical",
    "test_encode_many_mixed_shapes",
    "test_encode_batch_auto_mode_per_image",
    "test_encode_batch_sharp_byte_identical",
    "test_stage_batch_freqs_fused_matches_staged",
    "test_sample_pack_saturated_chroma_wrap",
    # interpret-mode Pallas kernel parity (fast tier keeps the tree
    # -concat pair incl. the truncation-overflow safety path)
    "test_pallas_sample_pack_per_image_interpret",
    "test_pallas_quant_pack_matches_xla_interpret",
    "test_pallas_vlc_pack_per_image_luts_interpret",
    "test_pallas_sample_pack_matches_interpret",
    "test_pallas_trellis_kernel_matches_scan_interpret",
    # sharded-API matrix (fast tier keeps the sub-5s cases plus
    # test_sharded_stream_matches_oracle[1-8] / ragged_tiny)
    "test_sharded_byte_identical[True-True-3-1-8]",
    "test_sharded_byte_identical[True-True-1-1-8]",
    "test_sharded_byte_identical[True-True-1-2-4]",
    "test_sharded_byte_identical[True-True-3-2-4]",
    "test_sharded_byte_identical[True-False-4-1-8]",
    "test_sharded_byte_identical[True-False-4-2-4]",
    "test_sharded_byte_identical[False-False-1-1-8]",
    "test_sharded_byte_identical[False-False-1-2-4]",
    "test_sharded_ragged_byte_identical[100-52-3-True]",
    "test_sharded_ragged_byte_identical[270-120-1-False]",
    "test_sharded_ragged_byte_identical[97-65-1-True]",
    "test_sharded_ragged_byte_identical[97-65-1-False]",
    "test_sharded_ragged_byte_identical[120-176-1-False]",
    "test_sharded_ragged_batch",
    "test_sharded_share_statistics_valid",
    "test_sharded_stream_matches_oracle[2-4]",
    "test_sharded_stream_matches_oracle[4-2]",
    # multi-process (fast tier keeps the 2-process method-0 case)
    "test_multiprocess_dp_byte_identical[4-64-48-3-19893]",
    # searches (fast tier keeps matches_single[True] + trellis search)
    "test_batch_search_auto_mode_groups",
    "test_batch_search_planar_gray",
    "test_batch_size_search_matches_single[False]",
    # extra fuzz seeds (fast tier keeps one seed per source kind)
    "test_fuzz_device_planar_matches_oracle[1]",
    "test_fuzz_device_planar_matches_oracle[2]",
    "test_fuzz_device_planar_matches_oracle[5]",
    "test_fuzz_device_nv12_gray_matches_oracle[0]",
    "test_fuzz_device_nv12_gray_matches_oracle[2]",
    "test_fuzz_device_nv12_gray_matches_oracle[3]",
    "test_fuzz_device_rgb_matches_oracle[3]",
    "test_fuzz_device_rgb_matches_oracle[7]",
    "test_fuzz_device_rgb_matches_oracle[9]",
    "test_fuzz_device_search_matches_oracle[2]",
    "test_fuzz_device_batch_matches_oracle[5]",
    "test_encode_batch_per_image_byte_identical[True-True-3]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
