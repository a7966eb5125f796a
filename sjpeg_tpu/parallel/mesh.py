"""Mesh construction and multi-host initialization.

Deployment model (SURVEY §2.4, §5.8): a 2-D `(dp, sp)` mesh where `dp`
shards batches of images (across hosts this axis rides DCN — each host
feeds its local images) and `sp` shards MCU-row stripes within an image
over the chips of one host/slice (ICI).  The encode's collectives are
tiny: `psum` of 64x128 histograms and 2x257 symbol frequencies, a
`ppermute` of 3 DC predictors, and the gather of per-shard bit streams —
all riding ICI; the host-side dichotomy control loop is deterministic and
runs replicated with no communication.

On a single process this builds a local mesh; under multi-host launch it
initializes `jax.distributed` (TPU pods auto-discover via the cluster
environment) and lays `dp` across processes so each host's images stay
host-local.
"""

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op when already initialized or when
    running single-process).  On TPU pods the arguments auto-discover."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass    # already initialized


def make_mesh(dp: Optional[int] = None, sp: Optional[int] = None,
              devices=None) -> Mesh:
    """Build the (dp, sp) encode mesh over all (global) devices.

    Defaults: `dp` = number of processes (hosts) so image batches shard
    per host over DCN, `sp` = local device count so stripe parallelism
    stays on ICI.  Pass explicit dp/sp to override (dp * sp must equal
    the device count used).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and sp is None:
        dp = jax.process_count()
        sp = n // dp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != devices({n})"
    return Mesh(np.array(devices).reshape(dp, sp), ("dp", "sp"))
