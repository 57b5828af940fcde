#!/usr/bin/env python
"""Structurize a TSV manifest's captions: add/overwrite the `caption`
(struct) column from `ori_cap` — the preprocess/n2s_by_openai.py role,
usable offline.

Modes:
  default        deterministic heuristic (maa3_tpu.data.structurize)
  --llm-cmd CMD  pipe the reference's few-shot prompt + caption to a local
                 command (e.g. a llama.cpp / vLLM CLI) and use its stdout —
                 the pluggable-endpoint hook without any hard dependency
  --openai       live chat-completions endpoint (the reference's
                 n2s_by_openai.py role): OPENAI_API_KEY / OPENAI_BASE_URL
                 env (any OpenAI-compatible server), reference few-shot
                 prompt, resumable per-row progress file + <name>_struct.tsv

Usage: python scripts/structurize_captions.py --tsv_path in.tsv [--out out.tsv]
"""

import argparse
import csv
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maa3_tpu.data.structurize import (PROMPT, OpenAIStructurizer,
                                       heuristic_natural_to_struct,
                                       natural_to_struct, structurize_tsv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv_path", required=True)
    ap.add_argument("--out", default="", help="default: <tsv>.struct.tsv")
    ap.add_argument("--llm-cmd", default="",
                    help="shell command reading the prompt on stdin and "
                         "writing the struct caption to stdout")
    ap.add_argument("--openai", action="store_true",
                    help="use a live OpenAI-compatible endpoint "
                         "(resumable n2s_by_openai.py workflow)")
    ap.add_argument("--model", default="gpt-3.5-turbo")
    ap.add_argument("--base_url", default="",
                    help="override OPENAI_BASE_URL")
    ap.add_argument("--caption_column", default="ori_cap")
    opt = ap.parse_args()

    if opt.openai:
        client = OpenAIStructurizer(base_url=opt.base_url or None,
                                    model=opt.model)
        out = structurize_tsv(opt.tsv_path, client,
                              out_dir=os.path.dirname(opt.out) or None,
                              caption_column=opt.caption_column)
        print(f"wrote {out}")
        return

    llm = None
    if opt.llm_cmd:
        def llm(prompt):
            proc = subprocess.run(opt.llm_cmd, shell=True, input=prompt,
                                  capture_output=True, text=True, timeout=300)
            if proc.returncode != 0:
                raise RuntimeError(f"llm-cmd failed: {proc.stderr[-500:]}")
            return proc.stdout.strip()

    out_path = opt.out or opt.tsv_path.rsplit(".", 1)[0] + ".struct.tsv"
    with open(opt.tsv_path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE,
                                quotechar=None)
        rows = [dict(r) for r in reader]
        fields = list(reader.fieldnames or [])
    if "caption" not in fields:
        fields.append("caption")

    for i, row in enumerate(rows):
        cap = row.get("ori_cap", "")
        row["caption"] = (natural_to_struct(cap, llm) if llm
                          else heuristic_natural_to_struct(cap))
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{len(rows)}", flush=True)

    with open(out_path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=fields, delimiter="\t",
                           quoting=csv.QUOTE_NONE, quotechar=None,
                           lineterminator="\n")
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
