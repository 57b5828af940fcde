#!/usr/bin/env python
"""Offline mel extraction — preprocess/mel_spec.py equivalent, TPU/CPU-batched.

TSV manifest (audio_path column) -> resample to target sr, mono, pad to
(target_len+1)*hop -> on-device log10-mel (maa3_tpu.ops.stft) -> save
<name>_mel.npy next to --save_path, and optionally a new manifest with
mel_path filled in.

The reference shards this over GPUs with torch.multiprocessing + NCCL
(mel_spec.py:89-105,270-273); here one process feeds the accelerator with
size-bucketed batches (the device does the FFT+mel as two fused matmuls) and
--num_shards/--shard give the same horizontal scaling across hosts.
"""

import argparse
import csv
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def load_audio(path: str, target_sr: int) -> np.ndarray:
    """Read wav via scipy, mono-ize, resample with polyphase filtering."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly
    sr, wav = wavfile.read(path)
    if wav.dtype.kind == "i":
        wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
    elif wav.dtype.kind == "u":
        wav = (wav.astype(np.float32) - 128.0) / 128.0
    else:
        wav = wav.astype(np.float32)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if sr != target_sr:
        g = math.gcd(int(sr), target_sr)
        wav = resample_poly(wav, target_sr // g, sr // g).astype(np.float32)
    return wav


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--audio_sample_rate", type=int, default=16000)
    p.add_argument("--hop_size", type=int, default=256)
    p.add_argument("--fft_size", type=int, default=1024)
    p.add_argument("--win_size", type=int, default=1024)
    p.add_argument("--num_mels", type=int, default=80)
    p.add_argument("--duration", type=float, default=10.0,
                   help="pad/crop target in seconds ('pad' mode)")
    p.add_argument("--mode", choices=["pad", "none"], default="pad")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--out_tsv", default="",
                   help="write a manifest copy with mel_path filled")
    opt = p.parse_args()

    import jax.numpy as jnp
    from maa3_tpu.ops.stft import MelConfig, mel_spectrogram
    from maa3_tpu.data.datasets import read_tsv

    cfg = MelConfig(sample_rate=opt.audio_sample_rate, n_fft=opt.fft_size,
                    win_size=opt.win_size, hop_size=opt.hop_size,
                    num_mels=opt.num_mels)
    os.makedirs(opt.save_path, exist_ok=True)
    rows = read_tsv(opt.tsv_path)[opt.shard :: opt.num_shards]

    target_mel_len = int(opt.duration * opt.audio_sample_rate / opt.hop_size)
    seg = (target_mel_len + 1) * opt.hop_size  # (T+1)*hop (mel_spec.py:55)

    mel_fn = jax.jit(lambda y: mel_spectrogram(y, cfg))

    done, batch, names = 0, [], []

    def flush():
        nonlocal batch, names, done
        if not batch:
            return
        mels = np.asarray(mel_fn(jnp.asarray(np.stack(batch))))
        for name, mel in zip(names, mels):
            np.save(os.path.join(opt.save_path, f"{name}_mel.npy"), mel)
        done += len(batch)
        print(f"[{done}/{len(rows)}]", flush=True)
        batch, names = [], []

    out_rows = []
    for i, row in enumerate(rows):
        name = row.get("name", f"item_{i}")
        try:
            wav = load_audio(row["audio_path"], opt.audio_sample_rate)
        except Exception as e:
            print(f"skip {name}: {e}", flush=True)
            continue
        if opt.mode == "pad":
            if len(wav) < seg:
                wav = np.pad(wav, (0, seg - len(wav)))
            wav = wav[:seg]
        else:  # round down to hop multiple
            wav = wav[: (len(wav) // opt.hop_size) * opt.hop_size + opt.hop_size]
            pad_to = seg  # still bucket to one shape for jit
            wav = np.pad(wav, (0, max(0, pad_to - len(wav))))[:pad_to]
        batch.append(wav)
        names.append(name)
        row = dict(row)
        row["mel_path"] = os.path.join(opt.save_path, f"{name}_mel.npy")
        out_rows.append(row)
        if len(batch) == opt.batch_size:
            flush()
    flush()

    if opt.out_tsv and out_rows:
        with open(opt.out_tsv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(out_rows[0]), delimiter="\t")
            w.writeheader()
            w.writerows(out_rows)
        print(f"manifest -> {opt.out_tsv}")


if __name__ == "__main__":
    main()
