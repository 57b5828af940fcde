#!/usr/bin/env python
"""Manifest tools — preprocess/generate_manifest.py + add_duration.py equivalent.

Scans a directory of wavs (or an input TSV), emits the standard manifest
columns: name / dataset / ori_cap / caption / audio_path / mel_path / duration.
Durations are read from wav headers (scipy).
"""

import argparse
import csv
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST_COLUMNS = ["name", "dataset", "ori_cap", "caption", "audio_path",
                    "mel_path", "duration"]


def wav_duration(path: str) -> float:
    import wave
    try:
        with wave.open(path) as w:
            return w.getnframes() / w.getframerate()
    except Exception:
        from scipy.io import wavfile
        sr, data = wavfile.read(path)
        return len(data) / sr


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wav_dir", default="", help="directory of .wav files")
    p.add_argument("--in_tsv", default="", help="existing TSV to annotate")
    p.add_argument("--out_tsv", required=True)
    p.add_argument("--dataset_name", default="custom")
    p.add_argument("--caption_file", default="",
                   help="optional TSV/CSV name<TAB>caption")
    opt = p.parse_args()

    captions = {}
    if opt.caption_file:
        with open(opt.caption_file) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2:
                    captions[parts[0]] = parts[1]

    rows = []
    if opt.wav_dir:
        for path in sorted(glob.glob(os.path.join(opt.wav_dir, "*.wav"))):
            name = os.path.splitext(os.path.basename(path))[0]
            cap = captions.get(name, "")
            rows.append({
                "name": name, "dataset": opt.dataset_name, "ori_cap": cap,
                "caption": f"<{cap}& all>" if cap else "",
                "audio_path": os.path.abspath(path), "mel_path": "",
                "duration": round(wav_duration(path), 3),
            })
    elif opt.in_tsv:
        from maa3_tpu.data.datasets import read_tsv
        for r in read_tsv(opt.in_tsv):
            r = {c: r.get(c, "") for c in MANIFEST_COLUMNS}
            if not r["duration"] and r["audio_path"]:
                try:
                    r["duration"] = round(wav_duration(r["audio_path"]), 3)
                except Exception:
                    r["duration"] = ""
            rows.append(r)
    else:
        raise SystemExit("need --wav_dir or --in_tsv")

    with open(opt.out_tsv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=MANIFEST_COLUMNS, delimiter="\t")
        w.writeheader()
        w.writerows(rows)
    print(f"{len(rows)} rows -> {opt.out_tsv}")


if __name__ == "__main__":
    main()
