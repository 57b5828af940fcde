"""CLAP-score audio tower (Cnn14) parity vs the executed reference (CPU).

The CLAP-score evaluation (wav_evaluation/cal_clap_score.py) embeds generated
wavs with the PANNs Cnn14 (wav_evaluation/models/audio.py:107-185). This
script executes that reference class at the REAL CLAP-2022 configuration
(44.1 kHz, win 1024 / hop 320, 64 mel, 527 classes, 2048-d embedding) on
seeded random weights and compares cnn14_from_torch + cnn14_apply_logmel.

The torchlibrosa spectrogram frontend is absent in this image, so both sides
consume the SAME precomputed logmel tensor — the conv backbone, batch norms,
pooling reductions, fc head and sigmoid are what is anchored here (our own
logmel frontend is separately verified against torch.stft in tests/test_mel.py
and frame-count-checked in tests/test_eval.py).

Writes PARITY_EVAL_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/eval_reference_parity.py   (~1 min)
"""

import json
import os
import sys
import time
import types
import importlib.machinery

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores the env var

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from gen_reference_fixtures import install_stubs, randomize_  # noqa: E402

B, T = 2, 300  # ~ (T*320+pad)/44100 s of audio after the frontend


class _Identity(nn.Module):
    def forward(self, x):
        return x


def _stub_torchlibrosa():
    tl = types.ModuleType("torchlibrosa")
    tl.__spec__ = importlib.machinery.ModuleSpec("torchlibrosa", loader=None)
    st = types.ModuleType("torchlibrosa.stft")
    st.__spec__ = importlib.machinery.ModuleSpec("torchlibrosa.stft",
                                                 loader=None)
    # both sides consume the same precomputed logmel; the frontend modules
    # become pass-throughs (their ctor kwargs are accepted and ignored)
    st.Spectrogram = lambda **kw: _Identity()
    st.LogmelFilterBank = lambda **kw: _Identity()
    tl.stft = st
    sys.modules["torchlibrosa"] = tl
    sys.modules["torchlibrosa.stft"] = st


def main():
    t0 = time.time()
    install_stubs()
    _stub_torchlibrosa()
    from wav_evaluation.models.audio import Cnn14

    torch.manual_seed(51)
    model = Cnn14(sample_rate=44100, window_size=1024, hop_size=320,
                  mel_bins=64, fmin=50, fmax=14000, classes_num=527,
                  out_emb=2048).eval()
    randomize_(model, seed=52)
    n = sum(p.numel() for p in model.parameters())

    g = torch.Generator().manual_seed(53)
    # logmel-scale input (10*log10 power): roughly [-40, 10] dB
    logmel = torch.randn(B, 1, T, 64, generator=g) * 10.0 - 15.0
    with torch.no_grad():
        ref = model(logmel)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model
    print(f"[eval-ref] torch Cnn14 ({n/1e6:.1f}M) done "
          f"({time.time()-t0:.0f}s)", flush=True)

    from maa3_tpu.models.cnn14 import (Cnn14Config, cnn14_apply_logmel,
                                       cnn14_from_torch)

    cfg = Cnn14Config()
    params = cnn14_from_torch(sd, cfg)
    ours = cnn14_apply_logmel(params, cfg, jnp.asarray(logmel.numpy()))

    def stats(o, r):
        o = np.asarray(o, np.float64)
        r = np.asarray(r, np.float64)
        scale = max(float(np.mean(np.abs(r))), 1e-6)
        return {"rel_mae": float(np.mean(np.abs(o - r))) / scale,
                "rel_max": float(np.max(np.abs(o - r))) / scale}

    res = {
        "embedding": stats(ours["embedding"], ref["embedding"].numpy()),
        "clipwise_output": stats(ours["clipwise_output"],
                                 ref["clipwise_output"].numpy()),
        "_meta": {"params_m": round(n / 1e6, 1), "batch": B, "frames": T,
                  "config": "CLAP-2022 Cnn14 (44.1k/1024/320/64mel/527/2048)",
                  "dtype": "float32", "backend": "cpu (torch vs XLA)",
                  "ref": "wav_evaluation/models/audio.py:107-185 executed; "
                         "shared precomputed logmel (torchlibrosa absent)",
                  "wall_s": round(time.time() - t0, 1)},
    }
    out = os.path.join(REPO, "PARITY_EVAL_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[eval-ref] wrote {out} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
