#!/usr/bin/env python
"""Full-BigVGAN A/B of the poly fast sin^2 (MAA3_FAST_SIN2) on top of the
unfold-GEMM conv routing, serving shapes (bf16, 10 s clip), b1 and b8."""

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
    mel = jax.random.normal(key, (1, 80, 624), jnp.float32)
    mel8 = jnp.broadcast_to(mel, (8, 80, 624))
    out = {}
    ref = {}

    for fast in ("0", "1"):
        os.environ["MAA3_FAST_SIN2"] = fast
        for name, m in (("b1", mel), ("b8", mel8)):

            @jax.jit
            def f(p, mm):
                return bigvgan_apply(p, cfg, mm, compute_dtype=jnp.bfloat16)

            out[f"voc_{name}_fast{fast}_ms"] = round(
                slope_time(f, (params, m)) * 1e3, 2)
            wav = np.asarray(f(params, m), np.float32)
            if fast == "0":
                ref[name] = wav
            else:
                out[f"relerr_{name}"] = float(
                    np.abs(wav - ref[name]).max() /
                    (np.abs(ref[name]).max() + 1e-9))
            print(json.dumps(out), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
