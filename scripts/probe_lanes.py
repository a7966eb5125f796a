"""Probe: is [T, 64] elementwise work half-rate vs [T/2, 128]?

Times an identical chain of VPU ops (the rough op mix of the fused
kernel body) over the same total data laid out as [N, 64] one-block
rows vs [N/2, 128] two-block rows, plus matmul variants.

    python scripts/probe_lanes.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, TILE = 393216, 512
OPS = 40


def _force(r):
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])


def timeit(fn, reps=8):
    _force(fn())
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    _force(r)
    return (time.perf_counter() - t0) / reps


def make(lanes, kind="vpu"):
    rows = N * 64 // lanes
    t = TILE * 64 // lanes

    def kernel(x_ref, m_ref, o_ref):
        x = x_ref[:]
        if kind == "vpu":
            acc = x
            for i in range(OPS):
                acc = jnp.where(acc > i, acc + x, acc ^ 3)
            o_ref[:] = acc
        elif kind == "narrow":
            # [T, 1]-shaped scalar chain (per-block scalars today)
            c = jnp.max(x, axis=1, keepdims=True)
            for i in range(OPS):
                c = jnp.where(c > i, c + 1, c ^ 3)
            o_ref[:] = x + c
        else:
            acc = x.astype(jnp.float32)
            m = m_ref[:]
            for i in range(6):
                acc = jnp.dot(acc, m, preferred_element_type=jnp.float32)
            o_ref[:] = acc.astype(jnp.int32)

    @jax.jit
    def run(x):
        x = x.reshape(rows, lanes)
        spec = pl.BlockSpec((t, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((lanes, lanes), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(rows // t,),
            in_specs=[spec, mspec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
        )(x, jnp.eye(lanes, dtype=jnp.float32))

    return run


def main():
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randint(0, 100, (N, 64)).astype(np.int32))
    for kind in ("vpu", "narrow", "mxu"):
        for lanes in (64, 128):
            run = make(lanes, kind)
            dt = timeit(lambda: run(x))
            print(f"{kind:6s} {lanes:3d}L: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
