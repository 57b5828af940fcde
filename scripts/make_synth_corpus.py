#!/usr/bin/env python
"""Synthetic (audio, caption, label) corpus for the local train->eval loop.

Zero egress blocks the released datasets, but nothing blocks closing the
quality loop with a model trained HERE (VERDICT r04 item 5): this script
writes N wav clips across 8 procedurally-generated sound classes with
templated captions, plus ONE manifest TSV carrying both the T2A columns
(name/ori_cap/caption/audio_path/mel_path/duration — datasets.py reads
these) and a `label` column for the eval-classifier trainer
(scripts/train_melclf.py). Classes are chosen to be trivially separable on
a mel spectrogram (pitch bands, sweeps, noise gating, AM rates) so a small
DiT can learn caption->sound structure and a melception/vggishish
classifier can verify it.

After this, run scripts/mel_spec.py --out_tsv to fill mel_path (the same
preprocessing the reference's preprocess/mel_spec.py applies).

Usage: python scripts/make_synth_corpus.py --out_dir data/synth
       [--n_per_class 40] [--duration 10.0] [--val_frac 0.1]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR_DEFAULT = 16000

# class -> (generator name, caption templates)
CLASSES = [
    ("low_tone", ["a low pitched steady tone",
                  "a deep continuous hum",
                  "a sustained bass tone"]),
    ("high_tone", ["a high pitched steady tone",
                   "a shrill continuous whistle",
                   "a piercing sustained beep"]),
    ("rising_sweep", ["a tone rising from low to high",
                      "an upward frequency sweep",
                      "a siren sweeping up in pitch"]),
    ("falling_sweep", ["a tone falling from high to low",
                       "a downward frequency sweep",
                       "a siren sweeping down in pitch"]),
    ("noise_bursts", ["bursts of static noise",
                      "intermittent white noise hissing",
                      "pulses of radio static"]),
    ("harmonic_drone", ["a rich harmonic drone",
                        "a buzzing organ-like chord",
                        "a thick layered drone sound"]),
    ("tremolo", ["a pulsing tremolo tone",
                 "a tone wobbling in loudness",
                 "a vibrating pulsating note"]),
    ("clicks", ["rhythmic clicking sounds",
                "a regular sequence of sharp clicks",
                "steady mechanical ticking"]),
]


def _env(n, sr, rng, attack=0.05, release=0.2):
    e = np.ones(n, np.float32)
    a = int(attack * sr)
    r = int(release * sr)
    e[:a] = np.linspace(0, 1, a, dtype=np.float32)
    e[-r:] = np.linspace(1, 0, r, dtype=np.float32)
    return e


def gen_clip(cls: str, n: int, sr: int, rng: np.random.Generator):
    t = np.arange(n, dtype=np.float32) / sr
    if cls == "low_tone":
        f = rng.uniform(150, 400)
        x = np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    elif cls == "high_tone":
        f = rng.uniform(1500, 3500)
        x = np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    elif cls == "rising_sweep":
        f0, f1 = rng.uniform(150, 300), rng.uniform(2500, 5000)
        phase = 2 * np.pi * f0 * (np.exp(t / t[-1] * np.log(f1 / f0)) - 1) \
            * t[-1] / np.log(f1 / f0)
        x = np.sin(phase)
    elif cls == "falling_sweep":
        f0, f1 = rng.uniform(2500, 5000), rng.uniform(150, 300)
        phase = 2 * np.pi * f0 * (np.exp(t / t[-1] * np.log(f1 / f0)) - 1) \
            * t[-1] / np.log(f1 / f0)
        x = np.sin(phase)
    elif cls == "noise_bursts":
        rate = rng.uniform(1.0, 3.0)
        gate = (np.sin(2 * np.pi * rate * t + rng.uniform(0, 6.28)) > 0)
        x = rng.standard_normal(n).astype(np.float32) * 0.5 * gate
    elif cls == "harmonic_drone":
        f0 = rng.uniform(100, 300)
        x = sum(np.sin(2 * np.pi * f0 * (h + 1) * t + rng.uniform(0, 6.28))
                / (h + 1) for h in range(8))
    elif cls == "tremolo":
        f = rng.uniform(400, 1000)
        am = rng.uniform(4, 8)
        x = np.sin(2 * np.pi * f * t) * (0.55 + 0.45 * np.sin(
            2 * np.pi * am * t))
    elif cls == "clicks":
        rate = rng.uniform(2, 8)
        x = np.zeros(n, np.float32)
        period = int(sr / rate)
        ring_n = int(0.02 * sr)
        ring = (np.exp(-np.arange(ring_n) / (0.004 * sr))
                * np.sin(2 * np.pi * rng.uniform(1500, 2500)
                         * np.arange(ring_n) / sr)).astype(np.float32)
        for s in range(rng.integers(0, period), n - ring_n, period):
            x[s:s + ring_n] += ring
    else:
        raise ValueError(cls)
    x = np.asarray(x, np.float32) * _env(n, sr, rng)
    x = 0.7 * x / max(1e-6, np.abs(x).max())
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--n_per_class", type=int, default=40)
    ap.add_argument("--duration", type=float, default=10.0)
    ap.add_argument("--sr", type=int, default=SR_DEFAULT)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val_frac", type=float, default=0.1,
                    help="tail fraction per class -> manifest_val.tsv")
    args = ap.parse_args()

    from scipy.io import wavfile
    rng = np.random.default_rng(args.seed)
    wav_dir = os.path.join(args.out_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    n = int(args.duration * args.sr)

    cols = ["name", "dataset", "ori_cap", "caption", "audio_path",
            "mel_path", "duration", "label"]
    rows_tr, rows_va = [], []
    n_val = max(1, int(args.n_per_class * args.val_frac))
    for cls, caps in CLASSES:
        for i in range(args.n_per_class):
            name = f"{cls}_{i:03d}"
            wav = gen_clip(cls, n, args.sr, rng)
            path = os.path.join(wav_dir, name + ".wav")
            wavfile.write(path, args.sr,
                          (wav * 32767).astype(np.int16))
            cap = caps[i % len(caps)]
            row = {"name": name, "dataset": "synth", "ori_cap": cap,
                   "caption": cap, "audio_path": os.path.abspath(path),
                   "mel_path": "", "duration": f"{args.duration:.1f}",
                   "label": cls}
            (rows_va if i >= args.n_per_class - n_val else rows_tr).append(row)

    for fname, rows in [("manifest.tsv", rows_tr),
                        ("manifest_val.tsv", rows_va)]:
        with open(os.path.join(args.out_dir, fname), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols, delimiter="\t")
            w.writeheader()
            w.writerows(rows)
    print(f"wrote {len(rows_tr)} train + {len(rows_va)} val clips "
          f"({len(CLASSES)} classes) under {args.out_dir}")


if __name__ == "__main__":
    main()
