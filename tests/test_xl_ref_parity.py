"""Executed-reference parity at REAL production shapes.

PARITY_XL_REF.json is produced by scripts/xl_reference_parity.py: it runs the
reference torch code itself (/root/reference) at the real XL DiT shape
(hidden 1152 x depth 28), the real VAE (ch 384) and the real bigvnat vocoder
(initial channel 1536), and compares our importer + JAX models fp32-vs-fp32
on CPU. This test holds the committed artifact to its tolerances — the
full-shape complement of tests/test_reference_parity.py's toy-scale fixtures.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def artifact():
    path = os.path.join(REPO, "PARITY_XL_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_XL_REF.json not generated — "
                    "run scripts/xl_reference_parity.py")
    with open(path) as f:
        return json.load(f)


def test_meta_is_real_xl_shape(artifact):
    m = artifact["_meta"]
    assert m["hidden_size"] == 1152 and m["depth"] == 28
    assert m["latent_len"] == 312 and m["ctx_len"] == 154
    assert m["vae"]["ch"] == 384 and m["vae"]["z_channels"] == 20
    assert m["vocoder"]["initial_channel"] == 1536
    assert m["dtype"] == "float32"


def test_dit_forward_parity(artifact):
    """One XL forward, both the plain and the planned serving path: fp32
    matmul-reassociation noise only (~2e-6 measured)."""
    for key in ("dit_plain_vs_ref", "dit_plain_vs_ref_shared_t",
                "dit_planned_vs_ref"):
        assert artifact[key]["rel_mae"] < 1e-4, (key, artifact[key])
        assert artifact[key]["rel_max"] < 1e-3, (key, artifact[key])


def test_ode_trajectory_parity(artifact):
    """25 Euler steps amplify per-step roundoff through expansive
    random-weight dynamics — bars are looser than 1-step by design
    (same rationale as PARITY_XL.json's trajectory bars)."""
    s = artifact["ode25_z_vs_ref"]
    assert s["rel_mae"] < 1e-2, s
    assert s["rel_max"] < 1e-1, s


def test_component_decode_and_vocoder_parity(artifact):
    """Same-input component parity at real config sizes."""
    assert artifact["vae_decode_vs_ref"]["rel_mae"] < 1e-4
    assert artifact["bigvgan_vs_ref"]["rel_mae"] < 1e-4


def test_e2e_mel_parity(artifact):
    """Our ODE latent through our decoder vs the reference end-to-end mel —
    the XL-scale analogue of the BASELINE mel gate (fp32 mode)."""
    s = artifact["e2e_mel_vs_ref"]
    assert s["rel_mae"] < 1e-2, s


def test_family_sweep_parity():
    """Every released DiT family at its real config shape vs the executed
    reference (scripts/family_reference_parity.py): M (= music), XXL, and
    the real 4-expert video MoE."""
    path = os.path.join(REPO, "PARITY_FAMILIES_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_FAMILIES_REF.json not generated — "
                    "run scripts/family_reference_parity.py")
    with open(path) as f:
        fam = json.load(f)
    assert fam["M"]["cfg"]["hidden_size"] == 768
    assert fam["XXL"]["cfg"]["hidden_size"] == 1536
    assert fam["XXL"]["cfg"]["depth"] == 32
    assert fam["V2A_MoE"]["cfg"]["num_experts"] == 4
    for name in ("M", "XXL", "V2A_MoE"):
        assert fam[name]["rel_mae"] < 1e-4, (name, fam[name])
        assert fam[name]["rel_max"] < 1e-3, (name, fam[name])


def test_training_gradient_parity():
    """CFM-loss gradients vs torch autograd over the executed reference at
    M scale (scripts/grad_reference_parity.py): the backward pass through
    every op (RoPE, gated cross-attn, adaLN, SwiGLU, scan-stacked blocks)
    anchored to the reference."""
    path = os.path.join(REPO, "PARITY_GRAD_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_GRAD_REF.json not generated — "
                    "run scripts/grad_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["_meta"]["hidden_size"] == 768 and r["_meta"]["depth"] == 16
    assert r["loss_rel_diff"] < 1e-5, r["loss_rel_diff"]
    assert r["global_cosine"] > 1 - 1e-8, r["global_cosine"]
    assert abs(r["global_norm_ratio"] - 1) < 1e-4, r["global_norm_ratio"]
    assert r["worst_leaf_rel_mae"] < 1e-4, r["worst5"]


def test_encoder_real_shape_parity():
    """Conditioning tower at real configs vs executed HF torch classes +
    the reference Projection head (scripts/encoder_reference_parity.py)."""
    path = os.path.join(REPO, "PARITY_ENC_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_ENC_REF.json not generated — "
                    "run scripts/encoder_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["bert_base"]["params_m"] > 100       # real bert-base
    assert r["t5_v1_1_large"]["params_m"] > 300   # real t5-v1.1-large encoder
    for k in ("bert_base", "t5_v1_1_large", "clap_projection"):
        assert r[k]["rel_mae"] < 1e-4, (k, r[k])
        assert r[k]["rel_max"] < 1e-3, (k, r[k])


def test_eval_cnn14_parity():
    """CLAP-score audio tower (PANNs Cnn14) at the real CLAP-2022 config vs
    the executed reference backbone (scripts/eval_reference_parity.py)."""
    path = os.path.join(REPO, "PARITY_EVAL_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_EVAL_REF.json not generated — "
                    "run scripts/eval_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["_meta"]["params_m"] > 70  # real 80.8M Cnn14
    assert r["embedding"]["rel_mae"] < 1e-4, r["embedding"]
    assert r["clipwise_output"]["rel_mae"] < 1e-4, r["clipwise_output"]


def test_vaegan_loss_parity():
    """Stage-1 VAE-GAN objective vs the executed LPAPSWithDiscriminator —
    both optimizer passes, incl. the adaptive d_weight (autograd through the
    patchGAN) and the R1 gradient penalty."""
    path = os.path.join(REPO, "PARITY_VAEGAN_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_VAEGAN_REF.json not generated — "
                    "run scripts/vaegan_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    for k, v in r.items():
        if k == "_meta":
            continue
        assert v["rel_err"] < 1e-4, (k, v)


def test_melclf_parity():
    """VGGishish eval classifier (use_bn=True, eval-mode running stats) vs
    the executed reference — logits and the 4096-d FD embedding."""
    path = os.path.join(REPO, "PARITY_MELCLF_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_MELCLF_REF.json not generated — "
                    "run scripts/melclf_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["_meta"]["use_bn"] is True
    assert r["params_m"] > 100  # the real 137.6M VGGishish
    assert r["logits"]["rel_mae"] < 1e-4, r["logits"]
    assert r["embedding"]["rel_mae"] < 1e-4, r["embedding"]


def test_melception_parity():
    """Melception (Inception3-for-mel FID backbone, train_melception.py:20-34)
    at the real 309-class config vs the executed torch reference — logits,
    the 2048-d FD feature, and the InceptionAux head."""
    path = os.path.join(REPO, "PARITY_MELCEPTION_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_MELCEPTION_REF.json not generated — "
                    "run scripts/melception_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["_meta"]["num_classes"] == 309
    assert r["params_m"] > 20  # the real ~25M Inception3
    for k in ("logits", "fd_features_2048d", "aux_logits"):
        assert r[k]["rel_mae"] < 1e-5, (k, r[k])
        assert r[k]["rel_max"] < 1e-4, (k, r[k])


def test_lpaps_parity():
    """LPAPS perceptual metric vs the executed reference class — the final
    distance and all 5 VGG tap activations (scaling layer + bn-less
    VGGishish16 + learned 1x1 lin weights)."""
    path = os.path.join(REPO, "PARITY_LPAPS_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_LPAPS_REF.json not generated — "
                    "run scripts/lpaps_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["distance"]["rel_mae"] < 1e-4, r["distance"]
    for name, s in r["taps"].items():
        assert s["rel_mae"] < 1e-4, (name, s)


def test_discriminator_parity():
    """BigVGAN MPD/MRD at the real config vs the executed reference —
    logits and every feature map (the GAN + feature-matching loss surface).
    Guards the MRD rectangular-window STFT semantics (torch.stft with no
    window, models.py:325) among other things."""
    path = os.path.join(REPO, "PARITY_DISC_REF.json")
    if not os.path.exists(path):
        pytest.skip("PARITY_DISC_REF.json not generated — "
                    "run scripts/disc_reference_parity.py")
    with open(path) as f:
        r = json.load(f)
    assert r["_meta"]["periods"] == [2, 3, 5, 7, 11]
    for k in ("mpd_logits", "mpd_fmaps", "mrd_logits", "mrd_fmaps"):
        assert r[k]["worst_rel_mae"] < 1e-4, (k, r[k])
