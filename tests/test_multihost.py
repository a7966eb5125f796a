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
