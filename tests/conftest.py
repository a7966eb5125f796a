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
