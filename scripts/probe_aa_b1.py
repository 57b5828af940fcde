#!/usr/bin/env python
"""Per-shape batch-1 A/B of the anti-aliased snake activation: XLA shift-add
(FusedActivation1d) vs the Pallas one-pass kernel (ops/pallas_aa_snake), at
the BigVGAN stage shapes. The earlier "Pallas loses at batch 1" call was made
on the full pipeline before the unfold-GEMM conv re-lowering changed the
fusion neighbourhood; this measures the activation alone, chained in a scan
to cancel the axon RPC.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.bigvgan import BigVGANConfig, _act_init, snake_beta
from maa3_tpu.ops.pallas_aa_snake import aa_snake_fused
from maa3_tpu.ops.resample import FusedActivation1d

ITERS = int(os.environ.get("MAA3_ITERS", "16"))
DT = jnp.bfloat16


def program_time(fn, args, n=5):
    def run_k(k):
        out = None
        for _ in range(k):
            out = fn(*args)
        return float(jnp.sum(out))

    run_k(3)
    t1s, t3s = [], []
    for _ in range(n):
        t0 = time.perf_counter(); run_k(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_k(3); t3s.append(time.perf_counter() - t0)
    t1s.sort(); t3s.sort()
    return max((t3s[len(t3s) // 2] - t1s[len(t1s) // 2]) / 2.0, 0.0)


def chained(apply_fn):
    @jax.jit
    def run(p, x):
        def body(c, _):
            return apply_fn(p, c).astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return run


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    out = {"iters": ITERS}

    for C, T in ((768, 2496), (384, 9984), (192, 19968), (96, 39936),
                 (48, 79872), (24, 159744)):
        act = _act_init(C, cfg)
        x = jax.random.normal(key, (1, C, T), DT)
        row = {}

        def xla_aa(p, z):
            return FusedActivation1d(
                lambda v: snake_beta(v, p["alpha"], p["beta"], True))(z)

        def pl_aa(p, z):
            return aa_snake_fused(z, p["alpha"], p["beta"], logscale=True,
                                  has_beta=True)

        row["xla_ms"] = round(program_time(chained(xla_aa), (act, x))
                              / ITERS * 1e3, 3)
        row["pallas_ms"] = round(program_time(chained(pl_aa), (act, x))
                                 / ITERS * 1e3, 3)
        a = np.asarray(xla_aa(act, x), np.float32)
        b = np.asarray(pl_aa(act, x), np.float32)
        row["relerr"] = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
        out[f"C{C}_T{T}"] = row
        print(json.dumps({f"C{C}_T{T}": row}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
