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
