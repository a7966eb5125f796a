"""Parity of the analyse_histo_nodes twins (native C++ / torch / numpy).

The adaptive node fit has three implementations that must stay
bit-identical: `_analyse_histo_nodes_chunk` (numpy, the oracle — itself
pinned to the per-pair `analyse_histo` which matches the reference's
AnalyseHisto, src/enc.cc:993-1182), `_analyse_histo_nodes_chunk_torch`,
and the threaded `native.analyse_histo_nodes` the device-resident search
uses in production.  Each environment ships a different default
(SJPEG_ADAPTIVE_IMPL picks one explicitly), so this test is the only
place all available twins meet.
"""

import numpy as np
import pytest

from sjpeg_tpu import adaptive, constants as C, native
from sjpeg_tpu.params import quant_matrices_for_quality


def _cases():
    rng = np.random.RandomState(7)
    cases = []
    for trial, hi in enumerate((1, 30, 4000, 10 ** 6)):
        B, K = 5, 17
        histos = rng.randint(0, hi + 1,
                             (B, 64, C.MAX_HISTO_DCT_COEFF)).astype(np.int64)
        # sparse rows exercise the density filter
        histos[trial % B, trial % 64] = 0
        quants = np.stack(
            [quant_matrices_for_quality(q)[trial % 2]
             for q in np.linspace(3, 99, K)]).astype(np.uint8)
        minq = np.full(64, int(rng.randint(1, 40)), np.uint8)
        quants = np.maximum(quants, minq)
        cases.append((histos, quants, minq, 12 if trial % 2 == 0 else 1))
    return cases


@pytest.mark.parametrize("case", range(4))
def test_native_torch_numpy_bit_identical(case):
    histos, quants, minq, qd = _cases()[case]
    ref = adaptive._analyse_histo_nodes_chunk(histos, quants, minq, qd)

    nat = native.analyse_histo_nodes(histos, quants, minq, qd,
                                     C.HISTO_WEIGHT)
    if nat is not None:
        np.testing.assert_array_equal(ref, nat, err_msg="native != numpy")

    if adaptive._torch() is not None:
        t = adaptive._analyse_histo_nodes_chunk_torch(histos, quants,
                                                      minq, qd)
        np.testing.assert_array_equal(ref, t, err_msg="torch != numpy")


def test_nodes_match_per_pair_analyse_histo():
    histos, quants, minq, qd = _cases()[2]
    got = adaptive.analyse_histo_nodes(histos, quants, minq, qd)
    for i in (0, 3):
        for k in (0, 9, 16):
            exp = adaptive.analyse_histo(histos[i], quants[k], minq, qd)
            np.testing.assert_array_equal(got[i, k], exp)


def test_env_toggle_forces_impl(monkeypatch):
    monkeypatch.setenv("SJPEG_ADAPTIVE_IMPL", "numpy")
    assert adaptive._impl_choice() == "numpy"
    monkeypatch.setenv("SJPEG_ADAPTIVE_IMPL", "native")
    assert adaptive._impl_choice() == "native"
    monkeypatch.delenv("SJPEG_ADAPTIVE_IMPL")
    assert adaptive._impl_choice() in ("native", "torch", "numpy")
