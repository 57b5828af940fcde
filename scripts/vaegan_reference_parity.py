"""VAE-GAN training-loss parity vs the executed reference (CPU).

Executes ldm/modules/losses_audio/contperceptual.py's LPAPSWithDiscriminator
— the stage-1 autoencoder training objective — through BOTH optimizer passes
on seeded random weights, with a minimal torch last-layer decoder so the
adaptive d_weight's autograd path is real, and compares our pure loss
functions (train/vae_gan.py: ae_loss_terms / adaptive_d_weight /
disc_loss_terms over torch_import.nlayer_disc_from_torch):

  optimizer_idx 0: total loss, nll, kl, g_loss, adaptive d_weight
  optimizer_idx 1: hinge disc loss + R1 gradient penalty, logit means

Writes PARITY_VAEGAN_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/vaegan_reference_parity.py   (~1 min)
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

B, F, T = 2, 80, 64
H_CH = 8               # mini-decoder latent channels
KL_W, DISC_W, R1_W = 1e-6, 0.5, 5.0
STEP = 10              # > disc_start=0 so disc_factor = 1


def _rel(ours, ref):
    ours = float(np.asarray(ours)); ref = float(np.asarray(ref))
    return {"ours": ours, "ref": ref,
            "rel_err": abs(ours - ref) / max(abs(ref), 1e-8)}


def main():
    t0 = time.time()
    install_stubs()
    from ldm.modules.losses_audio.contperceptual import LPAPSWithDiscriminator
    from ldm.modules.distributions.distributions import \
        DiagonalGaussianDistribution
    from maa3_tpu.train.vae_gan import (adaptive_d_weight, ae_loss_terms,
                                        disc_loss_terms)
    from maa3_tpu.models.discriminators import adopt_weight
    from maa3_tpu.torch_import import nlayer_disc_from_torch
    from maa3_tpu.ops.conv import conv1d

    torch.manual_seed(91)
    ref = LPAPSWithDiscriminator(
        disc_start=0, kl_weight=KL_W, disc_num_layers=3, disc_in_channels=1,
        disc_hidden_size=64, disc_factor=1.0, disc_weight=DISC_W,
        perceptual_weight=0.0, disc_loss="hinge", r1_reg_weight=R1_W)
    randomize_(ref, seed=92)
    ref.train()  # GAN-training semantics: disc BN uses batch stats

    g = torch.Generator().manual_seed(93)
    mel = torch.randn(B, F, T, generator=g)
    h = torch.randn(B, H_CH, T, generator=g)
    last = torch.nn.Conv1d(H_CH, F, 3, padding=1)
    randomize_(last, seed=94)
    rec = last(h)                                      # real autograd path
    moments = torch.randn(B, 2 * H_CH, T // 2, generator=g)
    post = DiagonalGaussianDistribution(moments)

    loss0, log0 = ref(mel, rec, post, 0, STEP, last_layer=last.weight,
                      split="train")
    loss1, log1 = ref(mel, rec, post, 1, STEP, split="train")

    disc_sd = {k[len("discriminator."):]: v.numpy()
               for k, v in ref.state_dict().items()
               if k.startswith("discriminator.")}
    logvar_ref = float(ref.logvar.detach())
    del ref

    # ---- ours ---------------------------------------------------------------
    disc = nlayer_disc_from_torch(disc_sd, n_layers=3)
    logvar = jnp.float32(logvar_ref)
    mel_j = jnp.asarray(mel.numpy())
    h_j = jnp.asarray(h.numpy())
    last_p = {"w": jnp.asarray(last.weight.detach().numpy()),
              "b": jnp.asarray(last.bias.detach().numpy())}
    moments_j = jnp.asarray(moments.numpy())
    rec_j = conv1d(last_p, h_j, padding=1)

    def nll_of_w(w):
        r = conv1d({"w": w, "b": last_p["b"]}, h_j, padding=1)
        return ae_loss_terms(disc, logvar, mel_j, r, moments_j)[0]

    def g_of_w(w):
        r = conv1d({"w": w, "b": last_p["b"]}, h_j, padding=1)
        return ae_loss_terms(disc, logvar, mel_j, r, moments_j)[2]

    nll, kl, g_loss, _ = ae_loss_terms(disc, logvar, mel_j, rec_j, moments_j)
    d_weight = adaptive_d_weight(nll_of_w, g_of_w, last_p["w"], DISC_W)
    factor = adopt_weight(1.0, STEP, 0)
    total0 = nll + KL_W * kl + d_weight * factor * g_loss
    d_loss, lr_mean, lf_mean = disc_loss_terms(disc, mel_j, rec_j, factor,
                                               r1_weight=R1_W)

    res = {
        "gen_total": _rel(total0, loss0.detach()),
        "gen_nll": _rel(nll, log0["train/nll_loss"]),
        "gen_kl": _rel(kl, log0["train/kl_loss"]),
        "gen_g_loss": _rel(g_loss, log0["train/g_loss"]),
        "gen_d_weight": _rel(d_weight, log0["train/d_weight"]),
        "disc_total_with_r1": _rel(d_loss, loss1.detach()),
        "disc_logits_real": _rel(lr_mean, log1["train/logits_real"]),
        "disc_logits_fake": _rel(lf_mean, log1["train/logits_fake"]),
        "_meta": {"batch": B, "n_mels": F, "frames": T,
                  "kl_weight": KL_W, "disc_weight": DISC_W,
                  "r1_reg_weight": R1_W, "disc_loss": "hinge",
                  "bn": "train mode (batch stats), as in GAN training",
                  "dtype": "float32", "backend": "cpu (torch vs XLA)",
                  "ref": "losses_audio/contperceptual.py:22-150 executed "
                         "(incl. adaptive-weight autograd + R1 autograd)",
                  "wall_s": round(time.time() - t0, 1)},
    }
    out = os.path.join(REPO, "PARITY_VAEGAN_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[vaegan-ref] wrote {out}", flush=True)


if __name__ == "__main__":
    main()
