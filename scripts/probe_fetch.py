"""Probe: does the dev-relay transport serve concurrent fetches faster
than one bulk fetch?  Fresh device arrays each rep (no host-copy cache)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import functools
import numpy as np
import jax
import jax.numpy as jnp
from concurrent.futures import ThreadPoolExecutor

B, W = 16, 131072
base = jax.device_put(np.random.randint(0, 2**31, (B, W)).astype(np.uint32))
jax.block_until_ready(base)


@jax.jit
def fresh(x, k):
    return x + k


@functools.partial(jax.jit, static_argnames=("r0", "nr"))
def _slice(x, r0: int, nr: int):
    return jax.lax.slice(x, (r0, 0), (r0 + nr, W))


ctr = [0]


def mk():
    ctr[0] += 1
    y = fresh(base, np.uint32(ctr[0]))
    jax.block_until_ready(y)
    return y


def t(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts)*1e3:8.1f} ms  ({8.4/min(ts):.1f} MB/s)")


def fetch_bulk():
    y = mk()
    return np.asarray(y)


def fetch_chunked(nthreads):
    y = mk()
    per = B // nthreads
    parts = [_slice(y, i * per, per) for i in range(nthreads)]
    jax.block_until_ready(parts)
    with ThreadPoolExecutor(max_workers=nthreads) as pool:
        rows = list(pool.map(np.asarray, parts))
    return np.concatenate(rows, axis=0)


def fetch_jdg(nthreads):
    """jax.device_get on row slices without separate jit slicing."""
    y = mk()
    per = B // nthreads
    parts = [y[i * per:(i + 1) * per] for i in range(nthreads)]
    jax.block_until_ready(parts)
    with ThreadPoolExecutor(max_workers=nthreads) as pool:
        rows = list(pool.map(np.asarray, parts))
    return np.concatenate(rows, axis=0)


t("bulk", fetch_bulk)
for n in (2, 4, 8):
    t(f"row-chunked x{n}", lambda n=n: fetch_chunked(n))
t("getitem-chunk x8", lambda: fetch_jdg(8))
