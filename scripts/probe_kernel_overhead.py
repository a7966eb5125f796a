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


def make(kind, tile=TILE):
    def kernel(x_ref, out_ref):
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

    @jax.jit
    def run(x):
        spec = pl.BlockSpec((tile, 64), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(N // tile,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((N, 64), jnp.int32))(x)

    return run


def main():
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randint(0, 100, (N, 64)).astype(np.int32))
    for kind, tile in (("copy", 512), ("copy", 2048), ("copy", 8192),
                       ("static5", 512), ("reduce5", 512)):
        run = make(kind, tile)
        dt = timeit(lambda: run(x), reps=8)
        print(f"{kind:8s} tile {tile:5d}: {dt*1e3:7.2f} ms "
              f"({dt / (N // tile) * 1e6:5.1f} us/step)")


if __name__ == "__main__":
    main()
