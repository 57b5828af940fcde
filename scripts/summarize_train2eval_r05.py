#!/usr/bin/env python
"""Collect the round-5 train->eval quality-loop results into
TRAIN2EVAL_r05.json: train curves (VAE / DiT / melclf), FD + KL of the
trained vs control (1-step) model's generations, melception classifier
accuracy on generated mels vs the intended caption class, and the CLAP
pipeline exercise. Run AFTER scripts/run_train2eval_r05.sh.

Usage: python scripts/summarize_train2eval_r05.py
"""

import csv
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "TRAIN2EVAL_r05.json"


def grep_log(path, pat, n=None):
    if not os.path.exists(path):
        return []
    hits = re.findall(pat, open(path, errors="replace").read())
    return hits[-n:] if n else hits


def gen_label_tsv(gen_dir, out_tsv):
    """Generated mels -> (mel_path, label) TSV; label = class prefix of the
    manifest name embedded in the filename (<class>_<idx>_0_mel.npy)."""
    rows = []
    for f in sorted(os.listdir(gen_dir)):
        if not f.endswith("_mel.npy"):
            continue
        stem = f[:-len("_mel.npy")]           # <class>_<idx>_0
        label = stem.rsplit("_", 2)[0]
        rows.append({"mel_path": os.path.abspath(os.path.join(gen_dir, f)),
                     "label": label})
    with open(out_tsv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["mel_path", "label"],
                           delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    return len(rows)


def predict_acc(tsv, clf, stats):
    cmd = [sys.executable, "scripts/predict_melclf.py", "--tsv", tsv,
           "--clf_ckpt", clf, "--backbone", "melception"]
    if stats:
        cmd += ["--norm_stats", stats]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    txt = r.stdout + r.stderr
    m = re.findall(r'"accuracy_1": ([0-9.]+)', txt)
    return (float(m[-1]) if m else None), txt[-800:]


def main():
    out = {"metric": "train2eval_r05",
           "what": ("Quality loop closed with a locally-trained stack "
                    "(VERDICT r04 item 5): 8-class synthetic corpus "
                    "(scripts/make_synth_corpus.py, 288 train clips) -> "
                    "trained 1-D VAE -> M-config DiT via the real Trainer "
                    "-> txt2audio generations -> melception FD/KL + "
                    "class-accuracy + CLAP pipeline. Control = the same "
                    "recipe stopped at step 1.")}

    # train curves
    vae_rows = grep_log("/tmp/t2e_main.log",
                        r"step (\d+)\s+aeloss ([-\d.]+)\s+rec ([-\d.]+)")
    if vae_rows:
        out["vae_train"] = {
            "first": {"step": int(vae_rows[0][0]),
                      "rec_loss": float(vae_rows[0][2])},
            "last": {"step": int(vae_rows[-1][0]),
                     "rec_loss": float(vae_rows[-1][2])},
        }
    losses = grep_log("/tmp/t2e_dit.log", r"loss=([0-9.]+)")
    if losses:
        out["dit_train"] = {"first_loss": float(losses[0]),
                            "last_loss": float(losses[-1]),
                            "n_logged": len(losses)}

    # melclf validation metrics
    clf_val = grep_log("/tmp/t2e_main.log", r'"accuracy_1": ([0-9.]+)')
    if clf_val:
        out["melclf_val_acc1"] = float(clf_val[-1])

    # FD / KL
    for who in ("trained", "ctrl"):
        fd = grep_log(f"/tmp/t2e_fd_{who}.log",
                      r"'fd': ([0-9.eE+-]+)")
        kl = grep_log(f"/tmp/t2e_fd_{who}.log", r"'kl': ([0-9.eE+-]+)")
        if fd:
            out[f"fd_{who}"] = float(fd[-1])
        if kl:
            out[f"kl_{who}"] = float(kl[-1])
        clap = grep_log(f"/tmp/t2e_clap_{who}.log",
                        r"CLAP score over \d+ pairs: ([0-9.eE+-]+)")
        if clap:
            out[f"clap_{who}_random_towers"] = float(clap[-1])

    # classifier accuracy on generated mels (intended class = caption class)
    stats = ""
    for f in os.listdir("data/synth"):
        if "means_stds" in f:
            stats = os.path.join("data/synth", f)
    clf = "logs/melclf_synth/final"
    for who in ("trained", "ctrl"):
        d = f"outputs/t2e_{who}"
        if not os.path.isdir(d):
            continue
        tsv = f"/tmp/t2e_gen_{who}.tsv"
        n = gen_label_tsv(d, tsv)
        if n and os.path.isdir(clf):
            acc, tail = predict_acc(tsv, clf, stats)
            out[f"gen_class_acc_{who}"] = acc
            if acc is None:
                out[f"gen_class_acc_{who}_log"] = tail

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
