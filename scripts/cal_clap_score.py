#!/usr/bin/env python
"""CLAP-score CLI — wav_evaluation/cal_clap_score.py equivalent.

  python scripts/cal_clap_score.py --wav_dir OUT --tsv test.tsv \
      [--clap_weights CLAP_weights_2022.pth]

Matches generated wavs (named <name>_<n>.wav / <name>.wav) to captions from
the TSV and reports the mean cosine similarity (audiocaps GT ~ 0.479).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_dir", required=True)
    p.add_argument("--tsv", required=True)
    p.add_argument("--clap_weights", default="")
    p.add_argument("--tokenizer_dir", default="")
    p.add_argument("--batch", type=int, default=20)
    opt = p.parse_args()

    from scipy.io import wavfile
    from maa3_tpu.data.datasets import read_tsv
    from maa3_tpu.eval.clap_score import CLAPScorer

    if opt.clap_weights:
        scorer = CLAPScorer.from_torch_ckpt(opt.clap_weights,
                                            opt.tokenizer_dir or None)
    else:
        print("WARNING: no CLAP weights; scoring with random towers "
              "(relative numbers only)")
        scorer = CLAPScorer.random_init(jax.random.PRNGKey(0),
                                        opt.tokenizer_dir or None)

    rows = read_tsv(opt.tsv)
    pairs = []
    for i, r in enumerate(rows):
        name = r.get("name", f"sample_{i}")
        for cand in (f"{name}_0.wav", f"{name}.wav", f"{name}_0_0.wav"):
            path = os.path.join(opt.wav_dir, cand)
            if os.path.exists(path):
                pairs.append((path, r["ori_cap"]))
                break
    if not pairs:
        raise SystemExit(f"no wavs in {opt.wav_dir} matching {opt.tsv} names")

    scores = []
    for i in range(0, len(pairs), opt.batch):
        chunk = pairs[i : i + opt.batch]
        wavs, caps, srs = [], [], set()
        for path, cap in chunk:
            sr, wav = wavfile.read(path)
            if wav.dtype.kind == "i":
                wav = wav.astype(np.float32) / np.iinfo(wav.dtype).max
            wavs.append(wav.astype(np.float32))
            caps.append(cap)
            srs.add(sr)
        assert len(srs) == 1
        scores.extend(scorer.score(wavs, caps, sr=srs.pop()).tolist())
        print(f"[{min(i + opt.batch, len(pairs))}/{len(pairs)}] "
              f"running mean = {np.mean(scores):.4f}", flush=True)

    print(f"\nCLAP score over {len(scores)} pairs: {np.mean(scores):.4f} "
          f"(audiocaps GT reference ~ 0.479)")


if __name__ == "__main__":
    main()
