#!/usr/bin/env python
"""BigVGAN vocoder GAN training CLI (MPD + MRD + mel-L1; the training recipe
behind the shipped bigvnat checkpoint — vocoder/bigvgan/models.py:218-391).

TSV needs audio_path; wav segments are random-cropped, the input mel comes
from the on-device frontend (ops/stft.py) so vocoder and frontend stay
consistent.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", required=True)
    p.add_argument("--segment_frames", type=int, default=32,
                   help="mel frames per training segment")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--upsample_initial_channel", type=int, default=1536)
    p.add_argument("--ckpt_dir", default="logs/vocoder")
    p.add_argument("--ckpt_every", type=int, default=10000)
    opt = p.parse_args()

    import jax.numpy as jnp
    import optax
    from scipy.io import wavfile
    from maa3_tpu.data.datasets import read_tsv
    from maa3_tpu.models.bigvgan import BigVGANConfig
    from maa3_tpu.ops.stft import MelConfig, mel_spectrogram
    from maa3_tpu.train.vocoder_gan import (create_vocoder_gan_state,
                                            make_vocoder_gan_steps)

    cfg = BigVGANConfig(upsample_initial_channel=opt.upsample_initial_channel)
    mel_cfg = MelConfig()
    hop = mel_cfg.hop_size
    seg = opt.segment_frames * hop

    rows = read_tsv(opt.tsv)
    wavs = []
    for r in rows:
        try:
            sr, w = wavfile.read(r["audio_path"])
            if w.dtype.kind == "i":
                w = w.astype(np.float32) / np.iinfo(w.dtype).max
            if w.ndim == 2:
                w = w.mean(1)
            if len(w) >= seg + hop:
                wavs.append(w.astype(np.float32))
        except Exception as e:
            print(f"skip {r['audio_path']}: {e}")
    if not wavs:
        raise SystemExit("no usable wavs")
    print(f"{len(wavs)} training wavs")

    tx_g = optax.adamw(opt.lr, b1=0.8, b2=0.99)
    tx_d = optax.adamw(opt.lr, b1=0.8, b2=0.99)
    state = create_vocoder_gan_state(jax.random.PRNGKey(0), cfg, tx_g, tx_d)
    gen_step, disc_step = make_vocoder_gan_steps(cfg, mel_cfg, tx_g, tx_d)
    gen_step = jax.jit(gen_step)
    disc_step = jax.jit(disc_step)
    mel_fn = jax.jit(lambda y: mel_spectrogram(y, mel_cfg))

    rng = np.random.RandomState(0)
    os.makedirs(opt.ckpt_dir, exist_ok=True)
    import time
    t0 = time.time()
    for it in range(opt.steps):
        batch_wav = []
        for _ in range(opt.batch_size):
            w = wavs[rng.randint(len(wavs))]
            start = rng.randint(0, len(w) - seg - hop)
            start = (start // hop) * hop
            batch_wav.append(w[start : start + seg])
        wav = jnp.asarray(np.stack(batch_wav))
        mel = mel_fn(wav)[:, :, : opt.segment_frames]
        batch = {"mel": mel, "wav": wav}
        state, mg = gen_step(state, batch)
        state, md = disc_step(state, batch)
        if it % 50 == 0 or it == opt.steps - 1:
            print(f"step {it}  gen {float(mg['gen_loss']):.3f}  "
                  f"mel_l1 {float(mg['mel_l1']):.4f}  "
                  f"fm {float(mg['fm']):.3f}  "
                  f"disc {float(md['disc_loss']):.3f}  "
                  f"({it / max(time.time() - t0, 1e-9):.2f} it/s)", flush=True)
        if opt.ckpt_every and it and it % opt.ckpt_every == 0:
            _save(opt.ckpt_dir, state, it)
    _save(opt.ckpt_dir, state, opt.steps)


def _save(ckpt_dir, state, step):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr.save(path, {"generator": state.gen_params}, force=True)
    ckptr.wait_until_finished()
    print(f"ckpt -> {path}")


if __name__ == "__main__":
    main()
