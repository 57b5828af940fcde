"""Video dataset + inpaint sampler tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.data.video_dataset import VideoSpecDataset, VideoSpecInpaintDataset
from maa3_tpu.diffusion import cfm


def _make_assets(tmp_path, n=4):
    data_dir = tmp_path / "vgg"
    (data_dir / "mel_maa2" / "npy").mkdir(parents=True)
    (data_dir / "cavp").mkdir(parents=True)
    split_dir = tmp_path / "split"
    split_dir.mkdir()
    names = [f"vid{i}" for i in range(n)]
    for i, name in enumerate(names):
        np.save(data_dir / "mel_maa2" / "npy" / f"{name}_mel.npy",
                np.random.RandomState(i).randn(80, 625).astype(np.float32))
        np.savez(data_dir / "cavp" / f"{name}.npz",
                 feat=np.random.RandomState(100 + i).randn(40, 512).astype(np.float32))
    np.savez(data_dir / "cavp" / "empty_vid.npz",
             feat=np.zeros((40, 512), np.float32))
    for split in ("Train", "Test"):
        with open(split_dir / f"{split}.txt", "w") as f:
            f.write("\n".join(names))
    return str(data_dir), str(split_dir)


def test_video_dataset_shapes(tmp_path):
    data_dir, split_dir = _make_assets(tmp_path)
    ds = VideoSpecDataset("train", data_dir, split_dir, sr=16000, duration=10,
                          truncate=131072, fps=4, hop_len=256)
    item = ds[0]
    # truncate window: 131072/256 = 512 spec frames; fps*truncate/sr = 32 frames
    assert item["image"].shape == (80, 512)
    assert item["video_feat"].shape == (32, 512)
    batch = ds.collater([ds[0], ds[1]])
    assert batch["image"].shape == (2, 80, 512)
    assert batch["video_feat"].shape == (2, 32, 512)


def test_video_dataset_cfg_dropout(tmp_path):
    data_dir, split_dir = _make_assets(tmp_path)
    ds = VideoSpecDataset("train", data_dir, split_dir, sr=16000, duration=10,
                          truncate=131072, fps=4, hop_len=256, drop=1.0)
    item = ds[0]
    np.testing.assert_allclose(item["video_feat"], 0.0)  # empty_vid fallback


def test_video_inpaint_dataset(tmp_path):
    data_dir, split_dir = _make_assets(tmp_path)
    ds = VideoSpecInpaintDataset("train", data_dir, split_dir, sr=16000,
                                 duration=10, truncate=131072, fps=4,
                                 hop_len=256)
    item = ds[0]
    mask = item["mask"]
    assert mask.sum() % 16 == 0 and 0 < mask.sum() <= 0.5 * 512 + 16
    masked_cols = mask.astype(bool)
    np.testing.assert_allclose(item["masked_spec"][:, masked_cols], 0.0)
    np.testing.assert_allclose(item["masked_spec"][:, ~masked_cols],
                               item["image"][:, ~masked_cols])


def test_inpaint_sampler_preserves_known():
    """With zero velocity, keep_mask=1 regions must land exactly on the known
    latent (analytic OT path at t=1), keep_mask=0 regions stay ~x0."""
    known = jnp.full((1, 4, 16), 2.0)
    keep = jnp.zeros((1, 1, 16)).at[:, :, :8].set(1.0)
    x0 = jnp.zeros((1, 4, 16))

    def vel(x, t, c):
        return jnp.zeros_like(x)

    out = cfm.sample_cfg_inpaint(vel, x0, jnp.zeros((1, 1, 1)),
                                 jnp.zeros((1, 1, 1)), 3.0, known, keep,
                                 steps=9)
    np.testing.assert_allclose(np.asarray(out[:, :, :8]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, :, 8:]), 0.0, atol=1e-6)


def test_video2audio_cli_end_to_end(tmp_path):
    """scripts/video2audio.py main path on CPU: synthetic .npz features ->
    windows -> per-window CFG ODE -> mel chunk concat -> renorm -> vocoder,
    with the frame/length math asserted (video2audio_flow.py:484-628):
    mel frames per window = sr*duration/hop, wav = frames * prod(upsample)."""
    import json
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
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
    import yaml
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
    np.save  # noqa: B018
    # 7 frames at fps=4, duration=1.6 -> window=6 frames -> 2 windows
    np.savez(feat_dir / "clip1.npz", feat=rng.normal(
        size=(7, 512)).astype(np.float32))
    np.savez(feat_dir / "empty_vid.npz", feat=np.zeros((6, 512), np.float32))

    mel_dir = tmp_path / "mels"
    mel_dir.mkdir()
    np.save(mel_dir / "clip1_mel.npy",
            rng.normal(size=(80, 150)).astype(np.float32))

    outdir = tmp_path / "out"
    env = dict(os.environ, MAA3_PLATFORM="cpu", HF_HUB_OFFLINE="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "video2audio.py"),
         "--feat_dir", str(feat_dir), "--mel_gt_dir", str(mel_dir),
         "--outdir", str(outdir), "--ddim_steps", "3", "--fps", "4",
         "--duration", "1.6", "--renorm", "--fp32",
         "-b", str(cfg_path), "--vocoder-ckpt", str(voc_dir)],
        env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-3000:]

    from scipy.io import wavfile
    sr, wav = wavfile.read(outdir / "clip1.wav")
    assert sr == 16000
    # 2 windows x spec_len 100 frames x prod(upsample_rates)=64 samples
    spec_len = int(16000 * 1.6 / 256)
    assert wav.shape[0] == 2 * spec_len * 64
    assert np.abs(wav).max() > 0  # not silence

    # inpaint variant exercises the mask-guided ODE through the CLI
    out2 = tmp_path / "out_inpaint"
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "video2audio.py"),
         "--feat_dir", str(feat_dir), "--mel_gt_dir", str(mel_dir),
         "--outdir", str(out2), "--ddim_steps", "2", "--fps", "4",
         "--duration", "1.6", "--inpaint", "--fp32",
         "-b", str(cfg_path), "--vocoder-ckpt", str(voc_dir)],
        env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out2 / "clip1.wav").exists()
