#!/usr/bin/env python
"""A/B the narrow-stage unfold-GEMM conv routing through the FULL BigVGAN
generator at serving shapes (batch 1, bf16, 10 s clip). Times cutoff 0 (stock
lax.conv), 192 (default), 384, and batch-8; spot-checks numerical agreement.
Chained-scan timing is impossible here (shape changes inside), so use the
1-vs-3 back-to-back slope on the jitted full generator to cancel RPC cost.
"""

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
    out = {}
    ref = None

    for cutoff in (0, 96, 192, 384):
        os.environ["MAA3_UNFOLD_CUTOFF"] = str(cutoff)

        @jax.jit
        def f(p, m):
            return bigvgan_apply(p, cfg, m, compute_dtype=jnp.bfloat16)

        out[f"voc_b1_cutoff{cutoff}_ms"] = round(slope_time(f, (params, mel)) * 1e3, 2)
        wav = np.asarray(f(params, mel), np.float32)
        if ref is None:
            ref = wav
        else:
            out[f"relerr_cutoff{cutoff}"] = float(
                np.abs(wav - ref).max() / (np.abs(ref).max() + 1e-9))
        print(json.dumps(out), flush=True)

    # batch 8 (fused pallas narrow path active; unfold applies where not fused)
    mel8 = jnp.broadcast_to(mel, (8, 80, 624))
    for cutoff in (0, 192):
        os.environ["MAA3_UNFOLD_CUTOFF"] = str(cutoff)

        @jax.jit
        def f8(p, m):
            return bigvgan_apply(p, cfg, m, compute_dtype=jnp.bfloat16)

        out[f"voc_b8_cutoff{cutoff}_ms"] = round(slope_time(f8, (params, mel8)) * 1e3, 2)
        print(json.dumps(out), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
