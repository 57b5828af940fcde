#!/usr/bin/env python
"""NCH vs NHC 1-D conv layout on TPU, at VAE-decoder / BigVGAN shapes.

XLA TPU convolutions want feature-minor ("NHC"/NHWC) layouts; our torch-
compatible NCH layout may be paying transposes around every conv. Prints
JSON with per-shape timings for both layouts (+ a matmul-as-conv variant).
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
from jax import lax

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

DN_NCH = lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NCH", "OIH", "NCH"))
DN_NHC = lax.conv_dimension_numbers((1, 1, 1), (1, 1, 1), ("NHC", "HIO", "NHC"))


def timeit(fn, *args, n=20):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    key = jax.random.PRNGKey(0)
    res = {}
    # (cin, cout, k, T) — VAE decoder mid (1536ch k5 T312), decoder up
    # (384ch k3 T624), BigVGAN early resblock (768ch k11 d5 T2496), late
    # (96ch k11 T39936)
    shapes = [
        ("vae_mid", 1536, 1536, 5, 312, 1),
        ("vae_up", 768, 768, 3, 624, 1),
        ("bv_res0", 768, 768, 11, 2496, 5),
        ("bv_res3", 96, 96, 11, 39936, 5),
    ]
    for name, cin, cout, k, t, dil in shapes:
        x_nch = jax.random.normal(key, (1, cin, t), jnp.float32)
        w_oih = jax.random.normal(key, (cout, cin, k), jnp.float32) * 0.02
        x_nhc = x_nch.transpose(0, 2, 1)
        w_hio = w_oih.transpose(2, 1, 0)
        pad = (k * dil - dil) // 2

        f_nch = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=DN_NCH))
        f_nhc = jax.jit(lambda x, w: lax.conv_general_dilated(
            x, w, (1,), [(pad, pad)], rhs_dilation=(dil,),
            dimension_numbers=DN_NHC))
        res[f"{name}_nch_ms"] = round(timeit(f_nch, x_nch, w_oih), 3)
        res[f"{name}_nhc_ms"] = round(timeit(f_nhc, x_nhc, w_hio), 3)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
