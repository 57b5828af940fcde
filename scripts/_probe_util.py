"""Shared timing harness for the TPU probe scripts.

Timing through the axon tunnel: `.block_until_ready()` under-reports, and a
single fetch carries a ~30 ms dispatch+fetch RPC. All probes therefore use a
1-vs-3 back-to-back slope — run the program once and three times, take
(t3 - t1) / 2 on medians — which cancels the constant RPC term (CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp


def slope_time(fn, args, n=7):
    """Median 1-vs-3 slope of one program invocation, in seconds."""
    def run_k(k):
        out = None
        for _ in range(k):
            out = fn(*args)
        return float(jnp.sum(out))

    run_k(3)  # warm compile + cache
    t1s, t3s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); run_k(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_k(3); t3s.append(time.perf_counter() - t0)
    t1s.sort(); t3s.sort()
    return max((t3s[len(t3s) // 2] - t1s[len(t1s) // 2]) / 2.0, 0.0)


def program_time(fn, args, n=5):
    """slope_time with the historical n=5 default (per-op micro probes)."""
    return slope_time(fn, args, n=n)


def chained(apply_fn, iters):
    """Jit a scan that applies `apply_fn(*params, x)` iters times
    back-to-back (same shape in/out for the last argument), so per-op cost =
    slope_time / iters without any dispatch between ops."""
    @jax.jit
    def run(*args):
        *p, x = args

        def body(c, _):
            return apply_fn(*p, c).astype(c.dtype), None

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c
    return run
