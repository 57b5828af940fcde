#!/usr/bin/env python
"""Decompose the XL train step at the measured-best config (save_gemms_lite,
batch 16, bf16 mu): forward-only loss, forward+backward, full step, and a
fused-GEMM forward — showing where the gap between the measured train MFU
and the ~53% lite-policy ceiling (61% hardware MFU x 6/6.9 recompute) goes.
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

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply, dit_param_count
from maa3_tpu.models.vae1d import VAEConfig, vae_init
from maa3_tpu.train.optim import make_optimizer
from maa3_tpu.train.step import create_train_state, make_train_step
from maa3_tpu.diffusion import cfm
from maa3_tpu.utils.nprand import fuse_dit_gemms

BATCH = int(os.environ.get("MAA3_BATCH", "16"))
LATENT = 312
V5E_PEAK_BF16 = 197e12


def timed(fn, args, n=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    ts = []
    for _ in range(n):
        out = None  # drop the previous output before re-running (HBM)
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    if os.environ.get("MAA3_SMALL"):  # CPU smoke
        dit_cfg = DiTConfig(in_channels=20, context_dim=64, hidden_size=128,
                            depth=2, num_heads=4, max_len=400, remat=True,
                            remat_policy="save_gemms_lite")
        ctx_dim = 64
    else:
        dit_cfg = DiTConfig(in_channels=20, context_dim=1024,
                            hidden_size=1152, depth=28, num_heads=16,
                            max_len=1000, remat=True,
                            remat_policy="save_gemms_lite")
        ctx_dim = 1024
    vae_cfg = VAEConfig()
    key = jax.random.PRNGKey(0)
    print(f"[{time.strftime('%H:%M:%S')}] init...", file=sys.stderr, flush=True)
    dit_params = dit_init(key, dit_cfg)
    vae_params = vae_init(jax.random.PRNGKey(1), vae_cfg)
    n_params = dit_param_count(dit_params)

    # production recipe (TRAIN_r05 best point): bf16 mu + factored nu —
    # MAA3_FACTORED=0 reverts to the r04 AdamW fp32-nu phase for comparison
    optimizer = make_optimizer(
        mu_dtype=jnp.bfloat16,
        factored=os.environ.get("MAA3_FACTORED", "1") != "0")
    state = create_train_state({"dit": dit_params}, {"vae": vae_params},
                               optimizer, use_ema=False)
    train_step = jax.jit(make_train_step(dit_cfg, vae_cfg, optimizer,
                                         compute_dtype=jnp.bfloat16),
                         donate_argnums=(0,))

    z = jax.random.normal(key, (BATCH, 20, LATENT), jnp.float32)
    ctx = jax.random.normal(key, (BATCH, 154, ctx_dim), jnp.float32)
    batch = {"mel": jax.random.normal(key, (BATCH, 80, LATENT * 2),
                                      jnp.float32),
             "context": ctx}

    res = {"batch": BATCH, "n_params": n_params}
    tok = BATCH * LATENT

    # 1) pure DiT forward (the CFM loss minus VAE encode), unfused weights
    def loss_only(p, z, ctx, k):
        def vel(x, t_int, c):
            return dit_apply(p["dit"], dit_cfg, x, t_int, c,
                             compute_dtype=jnp.bfloat16)
        loss, _ = cfm.cfm_loss(vel, z, ctx, k)
        return loss

    f_fwd = jax.jit(loss_only)
    t = timed(f_fwd, (state.params, z, ctx, jax.random.PRNGKey(2)))
    res["fwd_ms"] = round(t * 1e3, 1)
    res["fwd_mfu"] = round(2 * n_params * tok / t / V5E_PEAK_BF16, 3)
    print(json.dumps(res), flush=True)

    # 2) same forward on fused wqkv/w13 weights (the serving layout);
    # freed again before the backward measurement (HBM)
    fused = {"dit": fuse_dit_gemms(state.params["dit"])}
    t = timed(f_fwd, (fused, z, ctx, jax.random.PRNGKey(2)))
    res["fwd_fused_ms"] = round(t * 1e3, 1)
    res["fwd_fused_mfu"] = round(2 * n_params * tok / t / V5E_PEAK_BF16, 3)
    print(json.dumps(res), flush=True)
    # free ONLY the arrays fusion created — every other leaf is shared by
    # reference with state.params (fuse_dit_gemms copies dicts, not arrays),
    # so a blanket tree-wide delete() kills the live training params
    fused["dit"]["blocks"]["attention"]["wqkv"]["w"].delete()
    fused["dit"]["blocks"]["feed_forward"]["w13"]["w"].delete()
    del fused

    # 3) forward + backward (grads only, no optimizer)
    f_grad = jax.jit(jax.grad(loss_only))
    t = timed(f_grad, (state.params, z, ctx, jax.random.PRNGKey(2)))
    res["fwd_bwd_ms"] = round(t * 1e3, 1)
    res["fwd_bwd_mfu"] = round(6 * n_params * tok / t / V5E_PEAK_BF16, 3)
    print(json.dumps(res), flush=True)

    # 4) full train step (VAE encode + grads + clip + AdamW + metrics).
    # state is donated, so re-thread it through every call.
    state, m = train_step(state, batch, jax.random.PRNGKey(2))
    float(m["loss"])
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        state, m = train_step(state, batch, jax.random.PRNGKey(3 + i))
        float(m["loss"])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    t = ts[len(ts) // 2]
    res["full_step_ms"] = round(t * 1e3, 1)
    res["full_step_mfu"] = round(6 * n_params * tok / t / V5E_PEAK_BF16, 3)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
