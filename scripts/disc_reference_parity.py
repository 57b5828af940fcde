"""BigVGAN discriminator (MPD/MRD) parity vs the executed reference (CPU).

The vocoder-GAN training signal comes from the MultiPeriodDiscriminator and
MultiResolutionDiscriminator (vocoder/bigvgan/models.py:218-357). This script
executes both reference classes at the real config (5 periods 2/3/5/7/11,
3 STFT resolutions, channel mult 1, weight norm) on seeded random weights and
compares mpd_from_torch/mrd_from_torch + mpd_apply/mrd_apply: per-period and
per-resolution logits AND every feature map (the feature-matching loss
surface).

Writes PARITY_DISC_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/disc_reference_parity.py   (~1 min)
"""

import json
import os
import sys
import time

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores the env var

import jax.numpy as jnp
import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from gen_reference_fixtures import install_stubs, randomize_  # noqa: E402

B, T = 2, 16000  # 1 s of 16 kHz audio
PERIODS = (2, 3, 5, 7, 11)
RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


class _H(dict):
    def __getattr__(self, k):  # hasattr() probes must not raise KeyError
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-6)
    return {"rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
            "rel_max": float(np.max(np.abs(ours - ref))) / scale}


def _worst(pairs):
    """Max rel_mae over a list of (ours, ref) arrays."""
    ss = [_stats(o, r) for o, r in pairs]
    return {"worst_rel_mae": max(s["rel_mae"] for s in ss),
            "worst_rel_max": max(s["rel_max"] for s in ss),
            "n_tensors": len(ss)}


def main():
    t0 = time.time()
    install_stubs()
    from vocoder.bigvgan.models import (MultiPeriodDiscriminator,
                                        MultiResolutionDiscriminator)
    from maa3_tpu.models.discriminators import mpd_apply, mrd_apply
    from maa3_tpu.torch_import import mpd_from_torch, mrd_from_torch

    h = _H(mpd_reshapes=list(PERIODS), use_spectral_norm=False,
           discriminator_channel_mult=1,
           resolutions=[list(r) for r in RESOLUTIONS])

    g = torch.Generator().manual_seed(62)
    wav = torch.randn(B, 1, T, generator=g) * 0.3
    wav_j = jnp.asarray(wav.numpy()[:, 0, :])
    res = {}

    # ---- MPD ---------------------------------------------------------------
    torch.manual_seed(61)
    mpd = MultiPeriodDiscriminator(h).eval()
    randomize_(mpd, seed=63)
    n_mpd = sum(p.numel() for p in mpd.parameters())
    with torch.no_grad():
        ref_logits, _, ref_fmaps, _ = mpd(wav, wav)
    sd = {k: v.numpy() for k, v in mpd.state_dict().items()}
    del mpd

    params = mpd_from_torch(sd, n_discs=len(PERIODS))
    ours_logits, ours_fmaps = mpd_apply(params, wav_j, periods=PERIODS)
    res["mpd_logits"] = _worst(
        [(np.asarray(o), r.numpy()) for o, r in zip(ours_logits, ref_logits)])
    res["mpd_fmaps"] = _worst(
        [(np.asarray(o), r.numpy())
         for of, rf in zip(ours_fmaps, ref_fmaps) for o, r in zip(of, rf)])
    res["mpd_params_m"] = round(n_mpd / 1e6, 1)
    print(f"[disc-ref] MPD ({n_mpd/1e6:.1f}M) done "
          f"({time.time()-t0:.0f}s)", flush=True)

    # ---- MRD ---------------------------------------------------------------
    torch.manual_seed(64)
    mrd = MultiResolutionDiscriminator(h).eval()
    randomize_(mrd, seed=65)
    n_mrd = sum(p.numel() for p in mrd.parameters())
    with torch.no_grad():
        ref_logits, _, ref_fmaps, _ = mrd(wav, wav)
    sd = {k: v.numpy() for k, v in mrd.state_dict().items()}
    del mrd

    params = mrd_from_torch(sd, n_discs=len(RESOLUTIONS))
    ours_logits, ours_fmaps = mrd_apply(params, wav_j,
                                        resolutions=RESOLUTIONS)
    res["mrd_logits"] = _worst(
        [(np.asarray(o), r.numpy()) for o, r in zip(ours_logits, ref_logits)])
    res["mrd_fmaps"] = _worst(
        [(np.asarray(o), r.numpy())
         for of, rf in zip(ours_fmaps, ref_fmaps) for o, r in zip(of, rf)])
    res["mrd_params_m"] = round(n_mrd / 1e6, 1)
    print(f"[disc-ref] MRD ({n_mrd/1e6:.1f}M) done "
          f"({time.time()-t0:.0f}s)", flush=True)

    res["_meta"] = {"batch": B, "wav_len": T, "periods": list(PERIODS),
                    "resolutions": [list(r) for r in RESOLUTIONS],
                    "dtype": "float32", "backend": "cpu (torch vs XLA)",
                    "ref": "vocoder/bigvgan/models.py:218-357 executed",
                    "wall_s": round(time.time() - t0, 1)}
    out = os.path.join(REPO, "PARITY_DISC_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[disc-ref] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
