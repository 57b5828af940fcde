"""V2A CLIP-visual + CLAP-text fusion parity tests.

Reference: scripts/video2audio_flow_CLAP.py:660-692 — the CLAP text
embedding (B, Dt) is replicated per visual frame, concatenated AFTER the
CLIP features along the feature dim, and projected by a fusion Linear
(:485) back to the video-conditioning width before
get_learned_conditioning. These tests execute that reference formulation
in torch and assert our clap_fusion_apply matches bit-for-bit (same
weights), then drive the CLI flag end-to-end."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.models.clap import clap_fusion_init, clap_fusion_apply

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_clap_fusion_matches_torch_reference():
    """Execute the reference fusion math in torch (repeat -> cat -> Linear,
    video2audio_flow_CLAP.py:666-675) with OUR weights and compare."""
    import torch

    dv, dt, out, b, lv = 512, 1024, 512, 2, 5
    key = jax.random.PRNGKey(0)
    params = clap_fusion_init(key, visual_dim=dv, text_dim=dt, out_dim=out)
    video = np.random.default_rng(1).normal(size=(b, lv, dv)).astype(np.float32)
    text = np.random.default_rng(2).normal(size=(b, dt)).astype(np.float32)

    ours = np.asarray(clap_fusion_apply(params, jnp.asarray(video),
                                        jnp.asarray(text)))

    lin = torch.nn.Linear(dv + dt, out)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.asarray(params["fuse"]["w"]).T))
        lin.bias.copy_(torch.from_numpy(np.asarray(params["fuse"]["b"])))
        t_video = torch.from_numpy(video)
        t_text = torch.from_numpy(text)
        # reference lines 666-675: unsqueeze(1).repeat(1, T, 1); cat(dim=2)
        replicated = t_text.unsqueeze(1).repeat(1, lv, 1)
        combined = torch.cat((t_video, replicated), dim=2)
        ref = lin(combined).numpy()

    assert ours.shape == (b, lv, out)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_clap_fusion_tiling_semantics():
    """The text embedding must reach EVERY frame (tiled, not summed), and the
    concat order is [video; text] (reference cat order at :670)."""
    dv, dt, out = 4, 3, 6
    params = clap_fusion_init(jax.random.PRNGKey(3), dv, dt, out)
    video = jnp.zeros((1, 4, dv))
    t0 = jnp.zeros((1, dt))
    t1 = jnp.ones((1, dt))
    y0 = np.asarray(clap_fusion_apply(params, video, t0))
    y1 = np.asarray(clap_fusion_apply(params, video, t1))
    # text change must alter all frames identically
    assert (np.abs(y1 - y0) > 1e-7).any()
    np.testing.assert_allclose(y1 - y0, np.broadcast_to((y1 - y0)[:, :1],
                                                        y1.shape), atol=1e-6)
    # concat order: with zero text, output == video part through the first
    # dv rows of the weight matrix (+ bias)
    v = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 4, dv)).astype(np.float32))
    yv = np.asarray(clap_fusion_apply(params, v, t0))
    manual = (np.asarray(v) @ np.asarray(params["fuse"]["w"])[:dv]
              + np.asarray(params["fuse"]["b"]))
    np.testing.assert_allclose(yv, manual, rtol=1e-5, atol=1e-6)


def _tiny_v2a_setup(tmp_path):
    import yaml

    cfg = {
        "model": {
            "base_learning_rate": 3e-6,
            "target": "ldm.models.diffusion.cfm1_audio.CFM",
            "params": {
                "timesteps": 1000, "mel_dim": 4, "mel_length": 50,
                "unet_config": {
                    "target": "ldm.modules.diffusionmodules."
                              "flag_large_dit_moe.VideoFlagLargeDiT",
                    "params": {"in_channels": 4, "context_dim": 32,
                               "hidden_size": 32, "num_heads": 2, "depth": 1,
                               "max_len": 64, "multiple_of": 16,
                               "num_experts": 4}},
                "first_stage_config": {
                    "target": "ldm.models.autoencoder1d.AutoencoderKL",
                    "params": {"embed_dim": 4, "ddconfig": {
                        "double_z": True, "in_channels": 80, "out_ch": 80,
                        "z_channels": 4, "kernel_size": 5, "ch": 32,
                        "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_layers": [], "down_layers": [0]}}},
                "cond_stage_config": {
                    "target": "ldm.modules.encoders.modules."
                              "Video_Feat_Encoder_NoPosembed",
                    "params": {"origin_dim": 512, "embed_dim": 32}},
            },
        }
    }
    cfg_path = tmp_path / "v2a_tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    voc_dir = tmp_path / "voc"
    voc_dir.mkdir()
    (voc_dir / "config.json").write_text(json.dumps({
        "num_mels": 80, "upsample_rates": [4, 4, 2, 2],
        "upsample_kernel_sizes": [8, 8, 4, 4], "upsample_initial_channel": 32,
        "resblock": "1", "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3, 5]], "activation": "snakebeta",
        "snake_logscale": True, "sampling_rate": 16000}))

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    np.savez(feat_dir / "clip1.npz",
             feat=rng.normal(size=(7, 512)).astype(np.float32))
    np.savez(feat_dir / "empty_vid.npz",
             feat=np.zeros((6, 512), np.float32))
    return cfg_path, voc_dir, feat_dir


def test_video2audio_cli_clap_text(tmp_path):
    """--clap_text drives the fusion path end-to-end: CLIP windows fused
    with a CLAP text embedding, projected, then the windowed CFG ODE
    (video2audio_flow_CLAP.py capability)."""
    cfg_path, voc_dir, feat_dir = _tiny_v2a_setup(tmp_path)
    outdir = tmp_path / "out"
    env = dict(os.environ, MAA3_PLATFORM="cpu", HF_HUB_OFFLINE="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "video2audio.py"),
         "--feat_dir", str(feat_dir), "--outdir", str(outdir),
         "--ddim_steps", "2", "--fps", "4", "--duration", "1.6", "--fp32",
         "--clap_text", "a dog barks in the park",
         "-b", str(cfg_path), "--vocoder-ckpt", str(voc_dir)],
        env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-3000:]
    # fusion path actually engaged (a random-init model's zero-init final
    # layer makes the ODE output independent of conditioning, so the
    # conditioning EFFECT is asserted at unit level above with real weights)
    assert "clap fusion: caption" in proc.stdout, proc.stdout[-2000:]

    from scipy.io import wavfile
    sr, wav = wavfile.read(outdir / "clip1.wav")
    assert sr == 16000
    spec_len = int(16000 * 1.6 / 256)
    assert wav.shape[0] == 2 * spec_len * 64
    assert np.abs(wav).max() > 0
