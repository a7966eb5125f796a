"""Multi-process (multi-host simulation) tests for the dp axis.

Launches real separate Python processes wired through `jax.distributed`
(2 processes x 2 virtual CPU devices each), lays the encode mesh's dp
axis across them (`parallel.mesh.make_mesh`), and verifies every JPEG a
worker produces is byte-identical to the serial per-image encoder —
including reference-default method 4 (adaptive quantization + per-image
two-pass Huffman), whose histogram/frequency psums ride the sp axis while
image data stays host-local on dp (SURVEY §5.8, BASELINE config 5).
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "multihost_demo.py"


@pytest.mark.parametrize("method,hh,ww,batch,port", [
    (0, 32, 32, 2, 19891),
    (4, 64, 48, 3, 19893),
])
def test_multiprocess_dp_byte_identical(tmp_path, method, hh, ww, batch,
                                        port):
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--method", str(method),
         "--outdir", str(tmp_path), "--height", str(hh), "--width",
         str(ww), "--batch", str(batch), "--port", str(port)],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "byte-identical to serial" in out.stdout, out.stdout + out.stderr


@pytest.mark.parametrize("extra,port", [
    # target-size dichotomy sharded across processes (the north-star
    # batched-search config on the dp/DCN axis, src/dichotomy.cc:106-192)
    (["--method", "4", "--target-size", "2500", "--passes", "4",
      "--height", "48", "--width", "48", "--batch", "2"], 19895),
    # ragged local batches (b_local=3 on a dp=4 mesh): per-process
    # padding keeps the global batch dp-divisible, pad outputs dropped
    (["--method", "1", "--height", "32", "--width", "32", "--batch", "3",
      "--dp", "4"], 19897),
])
def test_multiprocess_search_and_ragged(tmp_path, extra, port):
    out = subprocess.run(
        [sys.executable, str(SCRIPT), "--outdir", str(tmp_path),
         "--port", str(port), *extra],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "byte-identical to serial" in out.stdout, out.stdout + out.stderr
