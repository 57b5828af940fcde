#!/usr/bin/env python
"""Stage-1 VAE-GAN training CLI — the AutoencoderKL training path of
`main.py` (two-optimizer hinge GAN; autoencoder1d.py:79-150 +
contperceptual.py).

  python scripts/train_vae.py --tsv train.tsv --steps 100000 \
      [--kl_weight 1e-6] [--disc_start 50001] [--ckpt_dir logs/vae]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True, help="manifest with mel_path column")
    p.add_argument("--mel_len", type=int, default=624)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=4.5e-6)
    p.add_argument("--lr_multiplier", type=float, default=16.0)
    p.add_argument("--kl_weight", type=float, default=1e-6)
    p.add_argument("--disc_start", type=int, default=50001)
    p.add_argument("--disc_weight", type=float, default=0.5)
    p.add_argument("--ch", type=int, default=384)
    p.add_argument("--ckpt_dir", default="logs/vae")
    p.add_argument("--ckpt_every", type=int, default=5000)
    opt = p.parse_args()

    import jax.numpy as jnp
    from maa3_tpu.data.datasets import read_tsv
    from maa3_tpu.native.io import NativeLoader
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.train.vae_gan import (create_vae_gan_state,
                                        make_vae_gan_steps,
                                        make_vae_optimizers)

    cfg = VAEConfig(ch=opt.ch)
    rows = read_tsv(opt.tsv)
    paths = [r["mel_path"] for r in rows]
    loader = NativeLoader(rows=80)

    key = jax.random.PRNGKey(0)
    vae_params = vae_init(key, cfg)
    vae_tx, disc_tx = make_vae_optimizers(opt.lr, opt.lr_multiplier)
    state = create_vae_gan_state(key, vae_params, vae_tx, disc_tx)
    ae_step, disc_step = make_vae_gan_steps(
        cfg, vae_tx, disc_tx, kl_weight=opt.kl_weight,
        disc_weight=opt.disc_weight, disc_start=opt.disc_start)
    ae_step = jax.jit(ae_step)
    disc_step = jax.jit(disc_step)

    rng = np.random.RandomState(0)
    os.makedirs(opt.ckpt_dir, exist_ok=True)
    import time
    t0 = time.time()
    for it in range(opt.steps):
        idx = rng.randint(0, len(rows), opt.batch_size)
        mel = jnp.asarray(loader.load_batch([paths[i] for i in idx],
                                            opt.mel_len, mode="tile"))
        k = jax.random.PRNGKey(it)
        state, m_ae = ae_step(state, mel, k)
        state, m_d = disc_step(state, mel, k)
        if it % 50 == 0 or it == opt.steps - 1:
            print(f"step {it}  aeloss {float(m_ae['aeloss']):.4f}  "
                  f"rec {float(m_ae['rec_loss']):.4f}  "
                  f"kl {float(m_ae['kl_loss']):.1f}  "
                  f"disc {float(m_d['discloss']):.4f}  "
                  f"({it / max(time.time() - t0, 1e-9):.2f} it/s)", flush=True)
        if opt.ckpt_every and it and it % opt.ckpt_every == 0:
            _save(opt.ckpt_dir, state, it)
    _save(opt.ckpt_dir, state, opt.steps)


def _save(ckpt_dir, state, step):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr.save(path, {"vae": state.vae_params, "disc": state.disc_params,
                      "logvar": state.logvar}, force=True)
    ckptr.wait_until_finished()
    print(f"ckpt -> {path}")


if __name__ == "__main__":
    main()
