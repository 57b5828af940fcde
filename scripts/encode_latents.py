#!/usr/bin/env python
"""Offline VAE latent caching: mel .npy -> posterior-moments .npy + manifest.

Precomputes `vae_encode_moments` for every mel in a manifest TSV so training
batches skip the frozen encoder entirely (train/step.py uses the `moments`
batch key). The cache stores the posterior MOMENTS (mean ++ logvar,
(2*embed_dim, T/2)), not a sampled z — the per-step Gaussian sampling that
the reference's training objective relies on is preserved exactly; only the
deterministic encode is hoisted offline. A 4x smaller on-disk footprint than
mel is a side benefit for loader throughput.

The reference has no analogue (its trainer re-encodes every step,
ldm/models/diffusion/ddpm_audio.py get_input); this is a TPU-native
extension in the spirit of its offline mel extraction
(preprocess/mel_spec.py), with the same --num_shards horizontal scaling.

Usage:
  python scripts/encode_latents.py --tsv_path data/train.tsv \
      --save_path data/latents -b configs/txt2audio-cfm-cfg.yaml \
      [-r ckpt] [--batch 32] [--num_shards 1 --shard 0]

Writes <save_path>/<basename>.npy per mel and <tsv>.latents.tsv with a
`moments_path` column appended (TextSpecDataset picks it up automatically).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("-b", "--base", type=str, default="")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="checkpoint with the trained VAE (random init if "
                        "omitted — only useful for smoke tests)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--crop_len", type=int, default=624,
                   help="pad/tile mels to this length before encoding "
                        "(static shape => one XLA compile)")
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard", type=int, default=0)
    opt = p.parse_args()

    from maa3_tpu.utils import enable_compile_cache
    if jax.default_backend() != "cpu":
        enable_compile_cache()

    from maa3_tpu.data.datasets import read_tsv, _load_mel
    from maa3_tpu.models.vae1d import vae_encode_moments
    from maa3_tpu.system import MAA3System

    cfg_paths = [c for c in opt.base.split(",") if c] or [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs", "txt2audio-cfm-cfg.yaml")]
    system = MAA3System.from_config(cfg_paths, ckpt_path=opt.resume or None,
                                    init_cond=False)
    vae_params, vae_cfg = system.params["vae"], system.spec.vae
    mel_num = system.spec.vae.in_channels

    rows = read_tsv(opt.tsv_path)
    shard_rows = rows[opt.shard::opt.num_shards]
    os.makedirs(opt.save_path, exist_ok=True)

    # params are an explicit jit argument — closing over them would bake
    # the VAE weights into the compiled program as constants
    @jax.jit
    def encode(params, mels):
        return vae_encode_moments(params, vae_cfg, mels)

    import math
    done = 0
    for i in range(0, len(shard_rows), opt.batch):
        chunk = shard_rows[i:i + opt.batch]
        mels, lens = [], []
        for r in chunk:
            m = _load_mel(r["mel_path"], mel_num, opt.crop_len, 0.0)
            lens.append(min(m.shape[1], opt.crop_len))
            if m.shape[1] < opt.crop_len:
                m = np.tile(m, math.ceil(opt.crop_len / m.shape[1]))
            mels.append(m[:, :opt.crop_len])
        # pad the ragged tail batch so one compiled shape serves the run
        n = len(mels)
        while len(mels) < opt.batch:
            mels.append(mels[-1])
        moments = np.asarray(encode(vae_params, jnp.asarray(np.stack(mels))),
                             np.float32)
        ds = opt.crop_len // moments.shape[-1]
        for r, mom, ln in zip(chunk, moments[:n], lens):
            name = os.path.splitext(os.path.basename(r["mel_path"]))[0]
            out = os.path.join(opt.save_path, name + ".npy")
            np.save(out, mom[:, : max(1, ln // ds)])
            r["moments_path"] = out
        done += n
        print(f"[{done}/{len(shard_rows)}]", flush=True)

    out_tsv = opt.tsv_path + (".latents.tsv" if opt.num_shards == 1
                              else f".latents.shard{opt.shard}.tsv")
    with open(out_tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(shard_rows[0].keys()),
                           delimiter="\t", lineterminator="\n",
                           quoting=csv.QUOTE_NONE)
        w.writeheader()
        w.writerows(shard_rows)
    print(f"wrote {out_tsv}")


if __name__ == "__main__":
    main()
