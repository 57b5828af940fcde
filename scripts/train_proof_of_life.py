#!/usr/bin/env python
"""Train->sample proof-of-life: overfit the M-size DiT on 50 synthetic
(mel, caption-embedding) pairs on one TPU chip and show (a) the CFM loss
drops >=10x, (b) CFG samples move toward the memorized latents, and
(c) the training throughput/MFU. Writes TRAIN_r02.json at the repo root.

This proves the capability the reference exists for — `trainer.fit`
(main.py:822) driving CFM.p_losses (cfm1_audio.py:37-58) — end to end on
TPU through the real train_step (frozen-VAE encode -> std-rescale ->
CFM loss -> AdamW -> EMA).

Notes: the frozen VAE is random-init with its posterior logvar forced to
-20 so latents are deterministic per mel — with 50 fixed (x1, ctx) pairs
and x0 recoverable from (x_t, t), the optimal velocity is deterministic and
the loss can approach 0; a sampled posterior would put a noise floor under
the overfit. scale_factor follows the reference's first-batch std rescale
(ddpm_audio.py:88-103).

Usage: python scripts/train_proof_of_life.py [--steps 400] [--depth 16]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n_pairs", type=int, default=50)
    ap.add_argument("--latent_len", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="TRAIN_r02.json")
    args = ap.parse_args()

    if jax.default_backend() != "cpu":
        enable_compile_cache()  # CPU AOT cache entries can SIGILL across hosts
    from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply, dit_param_count
    from maa3_tpu.models.vae1d import VAEConfig, vae_init, vae_encode_moments
    from maa3_tpu.train.optim import make_optimizer
    from maa3_tpu.train.step import create_train_state, make_train_step
    from maa3_tpu.diffusion import cfm

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    dit_cfg = DiTConfig(in_channels=20, context_dim=1024,
                        hidden_size=args.hidden, depth=args.depth,
                        num_heads=args.heads, max_len=1000)
    vae_cfg = VAEConfig()  # real released ddconfig (ch 384, z 20)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    dit_params = dit_init(k1, dit_cfg)
    n_params = dit_param_count(dit_params)
    print(f"DiT params: {n_params/1e6:.1f}M")
    vae_params = vae_init(k2, vae_cfg)
    # deterministic posterior: logvar half of quant_conv bias -> -20
    qb = np.array(vae_params["quant_conv"]["b"])
    qb[vae_cfg.embed_dim:] = -20.0
    vae_params["quant_conv"]["b"] = jnp.asarray(qb)

    # 50 fixed synthetic (mel, caption-embedding) pairs
    mel_t = 2 * args.latent_len
    mels = jax.random.normal(k3, (args.n_pairs, 80, mel_t), jnp.float32)
    ctxs = jax.random.normal(k4, (args.n_pairs, 8, 1024), jnp.float32)

    # reference first-batch std rescale
    moments = vae_encode_moments(vae_params, vae_cfg, mels[:args.batch])
    z0 = moments[:, :vae_cfg.embed_dim]
    scale_factor = float(1.0 / np.asarray(z0).std())
    print(f"### USING STD-RESCALING: scale_factor = {scale_factor:.5f} ###")

    optimizer = make_optimizer(base_lr=args.lr, lr_multiplier=1.0,
                               warm_up_steps=100)
    state = create_train_state({"dit": dit_params}, {"vae": vae_params},
                               optimizer, use_ema=True,
                               scale_factor=scale_factor)
    train_step = jax.jit(make_train_step(dit_cfg, vae_cfg, optimizer,
                                         compute_dtype=jnp.bfloat16),
                         donate_argnums=(0,))

    # -- target latents for the sample-quality metric (deterministic) -------
    all_moments = vae_encode_moments(vae_params, vae_cfg, mels)
    z_targets = np.asarray(all_moments[:, :vae_cfg.embed_dim]) * scale_factor

    def sample_dist(dit_p):
        """Mean L2 from CFG samples to their memorized latents (4 contexts)."""
        def vel(x, t, c):
            return dit_apply(dit_p, dit_cfg, x, t, c,
                             compute_dtype=jnp.bfloat16)
        idx = np.array([0, 1, 2, 3])
        x0 = jax.random.normal(jax.random.PRNGKey(77),
                               (len(idx), 20, args.latent_len))
        z = cfm.sample_cfg(vel, x0, jnp.asarray(np.asarray(ctxs)[idx]),
                           jnp.zeros((len(idx), 8, 1024)), 3.0, steps=25)
        d = np.asarray(z) - z_targets[idx]
        return float(np.sqrt((d ** 2).sum(axis=(1, 2))).mean())

    dist_before = sample_dist(state.params["dit"])
    print(f"sample L2 to target BEFORE training: {dist_before:.2f}")

    rng = np.random.default_rng(0)
    losses = []
    t_start = None
    for step in range(args.steps):
        idx = rng.choice(args.n_pairs, args.batch, replace=False)
        batch = {"mel": jnp.asarray(mels[idx]),
                 "context": jnp.asarray(ctxs[idx])}
        state, metrics = train_step(state, batch, jax.random.PRNGKey(step))
        if step == 0:
            jax.block_until_ready(metrics["loss"])
            t_start = time.perf_counter()  # exclude compile
            n_timed_from = 1
        losses.append(float(metrics["loss"]))
        if step % 20 == 0 or step == args.steps - 1:
            print(f"step {step:4d}  loss {losses[-1]:.4f}  "
                  f"grad_norm {float(metrics['grad_norm']):.3f}", flush=True)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t_start
    steps_per_sec = (args.steps - n_timed_from) / dt

    # train-step MFU: fwd 2*P*tok, bwd 2x fwd => 6*P*tok (+CFM/VAE ~ small)
    tokens = args.batch * args.latent_len
    flops_per_step = 6 * n_params * tokens
    peak = 197e12 if dev.platform != "cpu" else 1e11
    mfu = flops_per_step * steps_per_sec / peak

    loss_initial = float(np.mean(losses[:5]))
    loss_final = float(np.mean(losses[-5:]))
    ratio = loss_initial / max(loss_final, 1e-9)
    print(f"loss {loss_initial:.4f} -> {loss_final:.4f}  ({ratio:.1f}x)")
    print(f"{steps_per_sec:.2f} steps/s, {flops_per_step/1e12:.2f} TFLOP/step, "
          f"MFU {mfu*100:.1f}%")

    dist_after = sample_dist(state.params["dit"])
    rand_dist = float(np.sqrt((z_targets[:4] ** 2).sum(axis=(1, 2))).mean())
    print(f"sample L2 to target AFTER: {dist_after:.2f} "
          f"(before {dist_before:.2f}; |target| {rand_dist:.2f})")

    out = {
        "model": f"dit {args.hidden}x{args.depth}L ({n_params/1e6:.0f}M)",
        "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}",
        "steps": args.steps, "batch": args.batch,
        "latent_len": args.latent_len, "n_pairs": args.n_pairs,
        "loss_initial": round(loss_initial, 4),
        "loss_final": round(loss_final, 4),
        "loss_ratio": round(ratio, 1),
        "steps_per_sec": round(steps_per_sec, 3),
        "tflop_per_step": round(flops_per_step / 1e12, 2),
        "train_mfu": round(mfu, 4),
        "sample_l2_before": round(dist_before, 2),
        "sample_l2_after": round(dist_after, 2),
        "sample_l2_target_norm": round(rand_dist, 2),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ok = ratio >= 10.0 and dist_after < dist_before
    print("PROOF OF LIFE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
