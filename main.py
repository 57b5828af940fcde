#!/usr/bin/env python
"""Training entry shim — the reference's published command surface
(`python main.py -b configs/....yaml -t --gpus 0,1,...`) mapped onto the TPU
trainer (scripts/train.py). `--gpus` is accepted and ignored: device count
comes from the TPU topology / mesh."""

import sys


def main():
    argv = list(sys.argv[1:])
    # strip torch-world flags that have no TPU meaning
    cleaned, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--gpus", "--num_nodes", "--accelerator"):
            skip = True
            continue
        if a.startswith("--gpus=") or a.startswith("--num_nodes="):
            continue
        cleaned.append(a)
    sys.argv = [sys.argv[0]] + cleaned
    import runpy
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "scripts", "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
