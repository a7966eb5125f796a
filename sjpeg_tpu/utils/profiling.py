"""Profiling and observability helpers.

The reference ships only a CLI stopwatch; a production TPU engine needs
per-stage throughput counters and device traces:

- `StageTimer`: accumulates wall time + pixel counts per pipeline stage and
  reports Mpixels/s.
- `device_trace`: context manager around `jax.profiler.trace` for capturing
  a TensorBoard-compatible device profile of an encode run.
- `log_jsonl`: append structured metrics records (one JSON object per line).
"""

import contextlib
import json
import time
from collections import defaultdict


class StageTimer:
    def __init__(self):
        self.times = defaultdict(float)
        self.pixels = defaultdict(int)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, pixels: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] += dt
            self.pixels[name] += pixels
            self.counts[name] += 1

    def report(self) -> dict:
        out = {}
        for name, t in self.times.items():
            entry = {"seconds": round(t, 6), "calls": self.counts[name]}
            if self.pixels[name]:
                entry["mpixels_per_s"] = round(self.pixels[name] / t / 1e6, 2)
            out[name] = entry
        return out

    def __str__(self):
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile (view with TensorBoard's profile plugin)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_jsonl(path: str, record: dict) -> None:
    record = dict(record, ts=time.time())
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
