#!/usr/bin/env python
"""b8 vocoder routing A/B after unfold-GEMM + poly sin^2: the pallas fused
path (current auto at batch >= 4) vs the XLA shift-add path. At b1 XLA wins;
these two optimizations may have flipped b8 too."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from _probe_util import slope_time
from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply, bigvgan_init


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    params = bigvgan_init(key, cfg)
    mel8 = jnp.broadcast_to(
        jax.random.normal(key, (1, 80, 624), jnp.float32), (8, 80, 624))
    out = {}
    for name, pa in (("pallas", True), ("xla", False)):

        @jax.jit
        def f(p, m, pa=pa):
            return bigvgan_apply(p, cfg, m, compute_dtype=jnp.bfloat16,
                                 pallas_aa=pa)

        out[f"voc_b8_{name}_ms"] = round(slope_time(f, (params, mel8)) * 1e3, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
