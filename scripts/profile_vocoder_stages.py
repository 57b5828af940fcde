#!/usr/bin/env python
"""Per-stage BigVGAN timing on TPU: conv_pre, each upsample ConvTranspose,
each stage's AMP resblocks, and the post activation/conv. Prints JSON."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.bigvgan import (BigVGANConfig, bigvgan_init, _make_aa,
                                     _amp1_apply, _get_padding)
from maa3_tpu.ops.conv import (conv1d, conv_transpose1d,
                               conv_transpose1d_polyphase)


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    key = jax.random.PRNGKey(0)
    cfg = BigVGANConfig()
    params = bigvgan_init(key, cfg)
    num_kernels = len(cfg.resblock_kernel_sizes)

    x = jax.random.normal(key, (1, 80, 624), jnp.float32)
    res = {}

    f_pre = jax.jit(lambda p, v: conv1d(p, v, padding=3))
    res["conv_pre"] = timeit(f_pre, params["conv_pre"], x)
    x = f_pre(params["conv_pre"], x)

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        pad = (k - u) // 2
        f_up_poly = jax.jit(lambda p, v, u=u, pad=pad:
                            conv_transpose1d_polyphase(p, v, stride=u,
                                                       padding=pad))
        f_up_lax = jax.jit(lambda p, v, u=u, pad=pad:
                           conv_transpose1d(p, v, stride=u, padding=pad))
        res[f"up{i}_poly"] = timeit(f_up_poly, params["ups"][i], x)
        res[f"up{i}_lax"] = timeit(f_up_lax, params["ups"][i], x)
        x = f_up_poly(params["ups"][i], x)

        def stage_res(rbs, v, i=i):
            xs = None
            for j in range(num_kernels):
                y = _amp1_apply(rbs[j], v, cfg.resblock_kernel_sizes[j],
                                cfg.resblock_dilation_sizes[j], cfg,
                                jnp.float32)
                xs = y if xs is None else xs + y
            return xs / num_kernels

        rbs = params["resblocks"][i * num_kernels:(i + 1) * num_kernels]
        f_res = jax.jit(stage_res)
        res[f"res{i}"] = timeit(f_res, rbs, x)
        x = f_res(rbs, x)
        res[f"shape{i}"] = list(x.shape)

    aa = _make_aa(cfg)
    f_post = jax.jit(lambda pp, ap, v: conv1d(pp, aa(ap)(v), padding=3))
    res["post"] = timeit(f_post, params["conv_post"],
                         params["activation_post"], x)

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
