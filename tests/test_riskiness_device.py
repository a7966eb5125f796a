"""Device riskiness vs the host model: exact table + decision parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from sjpeg_tpu import constants as C
from sjpeg_tpu import riskiness as host_risk
from sjpeg_tpu.ops import riskiness as dev_risk


def test_pair_score_matches_table_exhaustive():
    """The closed-form int32 pair score reproduces every entry of the
    343x343 host sharpness table."""
    tab = host_risk.sharpness_table().reshape(host_risk.KRGB3,
                                              host_risk.KRGB3)
    idx = np.arange(host_risk.KRGB3)
    y = idx % host_risk.KRGB
    u = (idx // host_risk.KRGB) % host_risk.KRGB
    v = idx // (host_risk.KRGB * host_risk.KRGB)
    l0 = tuple(jnp.asarray(np.repeat(c, host_risk.KRGB3)) for c in (y, u, v))
    l1 = tuple(jnp.asarray(np.tile(c, host_risk.KRGB3)) for c in (y, u, v))
    got = np.asarray(dev_risk._pair_score(l0, l1)).reshape(tab.shape)
    np.testing.assert_array_equal(got, tab)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_riskiness_device_matches_host(seed):
    r = np.random.default_rng(seed)
    h, w = 72, 96
    base = r.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if seed == 1:       # mostly gray image exercises the YUV400 branch
        g = r.integers(100, 140, size=(h, w), dtype=np.uint8)
        base = np.stack([g, g, g], axis=-1)
    if seed == 2:       # smooth gradient: low risk -> YUV420 branch
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack([xx * 2 % 256, yy * 2 % 256,
                         (xx + yy) % 256], axis=-1).astype(np.uint8)
    want_mode, want_risk = host_risk.riskiness(base)
    got_mode, got_risk = dev_risk.riskiness_device(base)
    assert got_mode == want_mode
    assert got_risk == pytest.approx(want_risk, abs=1e-9)


def test_risk_stats_batched_matches_single():
    r = np.random.default_rng(7)
    imgs = r.integers(0, 256, size=(3, 40, 48, 3), dtype=np.uint8)
    bs, bc, bg = (np.asarray(x) for x in dev_risk.risk_stats(imgs))
    for i in range(3):
        s, c, g = (np.asarray(x)
                   for x in dev_risk.risk_stats(imgs[i]))
        assert (bs[i], bc[i], bg[i]) == (int(s), int(c), int(g))
