"""Tracing / profiling / observability utilities.

The reference logs per-epoch wall time + peak CUDA memory via CUDACallback
(main.py:530-550) and carries pytorch_memlab imports. TPU-native equivalents:

- `trace(logdir)`: jax.profiler trace context (view in TensorBoard/XProf)
- `device_memory_stats()`: per-device HBM usage (peak/in-use), the
  `torch.cuda.max_memory_allocated` counterpart
- `StepTimer`: rolling steps/sec + epoch wall-time aggregation
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> Dict[str, float]:
    """Bytes in use / peak per device, in MiB. Empty dict if the backend
    doesn't expose memory_stats (e.g. CPU)."""
    dev = device or jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    mib = 1024 * 1024
    out = {}
    for key, name in (("bytes_in_use", "mem_in_use_mib"),
                      ("peak_bytes_in_use", "mem_peak_mib"),
                      ("bytes_limit", "mem_limit_mib")):
        if key in stats:
            out[name] = round(stats[key] / mib, 1)
    return out


class StepTimer:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.count = 0

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        self.count += 1
        return dt

    def steps_per_sec(self) -> float:
        total = time.perf_counter() - self.t0
        return self.count / total if total > 0 else 0.0
