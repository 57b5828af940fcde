#!/usr/bin/env python
"""A/B the BigVGAN ConvTranspose lowering on TPU (lax lhs-dilated vs dense
polyphase GEMM) and break down full-pipeline component times. Prints JSON."""

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

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.bigvgan import BigVGANConfig, bigvgan_init, bigvgan_apply
from maa3_tpu.ops import conv as conv_mod


def timeit(fn, *args, n=10):
    fn(*args).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    params = bigvgan_init(key, cfg)
    mel = jax.random.normal(key, (1, 80, 624), jnp.float32)

    res = {}
    # current path (polyphase where eligible)
    f_poly = jax.jit(lambda p, m: bigvgan_apply(p, cfg, m))
    res["vocoder_polyphase_ms"] = timeit(f_poly, params, mel) * 1e3

    # force the old lax lhs-dilated path
    orig = conv_mod.conv_transpose1d_polyphase
    conv_mod.conv_transpose1d_polyphase = None
    import maa3_tpu.models.bigvgan as bv
    saved = bv.conv_transpose1d_polyphase
    bv.conv_transpose1d_polyphase = bv.conv_transpose1d  # same signature-ish

    def lax_apply(p, m):
        return bigvgan_apply(p, cfg, m)

    f_lax = jax.jit(lax_apply)
    res["vocoder_lax_dilated_ms"] = timeit(f_lax, params, mel) * 1e3
    bv.conv_transpose1d_polyphase = saved
    conv_mod.conv_transpose1d_polyphase = orig

    # batch-8 vocoder (throughput shape)
    mel8 = jnp.broadcast_to(mel, (8, 80, 624))
    res["vocoder_polyphase_b8_ms"] = timeit(f_poly, params, mel8) * 1e3

    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
