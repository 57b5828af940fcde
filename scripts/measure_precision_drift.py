#!/usr/bin/env python
"""Measure bf16-serving drift vs the fp32 parity path at XL shapes on TPU.

Runs the same 25-step CFG ODE -> VAE decode -> vocoder twice (identical
weights/noise): once fully fp32, once on the bf16 fast path (fp32 islands:
RoPE/norm stats/softmax/adaLN/final layer/mel projection). Prints JSON with
latent/mel/wav MAE — the evidence behind PARITY.md's precision policy.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import dataclasses
import jax.numpy as jnp
import numpy as np

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline


def main():
    small = "--small" in sys.argv  # CPU smoke
    key = jax.random.PRNGKey(0)
    if small:
        dit = DiTConfig(in_channels=20, context_dim=64, hidden_size=128,
                        depth=2, num_heads=4, max_len=256)
        vae, voc = VAEConfig(ch=64, ch_mult=(1, 2)), BigVGANConfig(
            upsample_initial_channel=64)
        latent_len, ctx_len, ctx_dim = 40, 10, 64
    else:
        dit = DiTConfig(in_channels=20, context_dim=1024, hidden_size=1152,
                        depth=28, num_heads=16, max_len=1000)
        vae, voc = VAEConfig(), BigVGANConfig()
        latent_len, ctx_len, ctx_dim = 312, 154, 1024

    pipe32 = T2APipeline.random_init(key, dit, vae, voc,
                                     compute_dtype=jnp.float32)
    # give the zero-init final layer signal so the ODE moves
    w = pipe32.params["dit"]["final_layer"]["linear"]["w"]
    pipe32.params["dit"]["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(key, w.shape))
    pipe16 = dataclasses.replace(pipe32, compute_dtype=jnp.bfloat16)

    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, ctx_len, ctx_dim))
    uc = jnp.zeros_like(ctx)
    k = jax.random.PRNGKey(2)
    z32, mel32, wav32 = (np.asarray(a) for a in pipe32.generate(
        ctx, uc, k, latent_len=latent_len, steps=25))
    z16, mel16, wav16 = (np.asarray(a) for a in pipe16.generate(
        ctx, uc, k, latent_len=latent_len, steps=25))

    out = {
        "latent_mae": float(np.abs(z32 - z16).mean()),
        "mel_mae": float(np.abs(mel32 - mel16).mean()),
        "wav_mae": float(np.abs(wav32 - wav16).mean()),
        "wav_rms": float(np.sqrt((wav32 ** 2).mean())),
        "latent_rms": float(np.sqrt((z32 ** 2).mean())),
        "mel_rms": float(np.sqrt((mel32 ** 2).mean())),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
