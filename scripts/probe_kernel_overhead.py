"""Probe: how much of quant_pack's fixed cost is scalar-reduction sync?

Builds throwaway kernel variants (copy-only; body with pinned loop
bounds; body with dynamic bounds) over the same [N, 64] traffic and
times them on the chip.

    python scripts/probe_kernel_overhead.py
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


def _force(r):
    np.asarray(jax.tree.leaves(r)[-1].ravel()[:1])


def timeit(fn, reps=8):
    _force(fn())
    t0 = time.perf_counter()
    _force(fn())
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn()
    _force(r)
    t_n = time.perf_counter() - t0
    return max((t_n - t_one) / (reps - 1), t_n / reps)


def make(kind, tile=TILE, lanes=64, parallel=False, narrow=0):
    def kernel(*refs):
        x_ref, out_ref = refs[0], refs[-1]
        x = x_ref[:]
        if kind == "copy":
            out_ref[:] = x
            return
        acc = jnp.zeros_like(x)
        if kind == "reduce5":
            # five [T,64] -> scalar reductions + tiny dynamic loops,
            # mimicking the real kernel's bound computations
            for i in range(5):
                b = jnp.max(jnp.where(x > i, x & 7, 0))
                acc = jax.lax.fori_loop(
                    0, jnp.minimum(b, 1),
                    lambda k, a: a | (x == k).astype(jnp.int32), acc)
        elif kind == "static5":
            # same tiny loops with static bounds (no scalar sync)
            for i in range(5):
                acc = jax.lax.fori_loop(
                    0, 1, lambda k, a: a | (x == k).astype(jnp.int32),
                    acc)
        out_ref[:] = acc + x

    rows = N * 64 // lanes

    @jax.jit
    def run(x):
        x = x.reshape(rows, lanes)
        t = tile * 64 // lanes
        spec = pl.BlockSpec((t, lanes), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        nspec = pl.BlockSpec((t, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        kwargs = {}
        if parallel:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",))
        extras = [jnp.zeros((rows, 1), jnp.int32)] * narrow
        return pl.pallas_call(
            kernel, grid=(rows // t,),
            in_specs=[spec] + [nspec] * narrow, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.int32),
            **kwargs)(x, *extras)

    return run


def main():
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randint(0, 100, (N, 64)).astype(np.int32))
    cases = [("copy 64L", dict(tile=512)),
             ("copy 128L", dict(tile=512, lanes=128)),
             ("copy 64L par", dict(tile=512, parallel=True)),
             ("copy 128L par", dict(tile=512, lanes=128, parallel=True)),
             ("copy +2narrow", dict(tile=512, narrow=2)),
             ("copy 128L par +2n", dict(tile=512, lanes=128, parallel=True,
                                        narrow=2))]
    for name, kw in cases:
        run = make("copy", **kw)
        dt = timeit(lambda: run(x), reps=8)
        print(f"{name:18s}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
