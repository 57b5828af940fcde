"""Cached-latent training path (scripts/encode_latents.py + `moments`
batches): the train step must be numerically identical to the mel path when
the cached moments come from the same mel, and the dataset/Trainer must route
`moments_path` manifests end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.models.dit import DiTConfig, dit_init
from maa3_tpu.models.vae1d import VAEConfig, vae_encode_moments, vae_init
from maa3_tpu.train.optim import make_optimizer
from maa3_tpu.train.step import create_train_state, make_train_step


def _setup():
    dit_cfg = DiTConfig(in_channels=4, context_dim=32, hidden_size=32,
                        depth=2, num_heads=4, max_len=64, multiple_of=16)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    key = jax.random.PRNGKey(0)
    return dit_cfg, vae_cfg, dit_init(key, dit_cfg), vae_init(key, vae_cfg)


def test_moments_batch_matches_mel_batch():
    dit_cfg, vae_cfg, dit_p, vae_p = _setup()
    optimizer = make_optimizer()
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
    moments = vae_encode_moments(vae_p, vae_cfg, mel)

    losses = {}
    for name, batch in (("mel", {"mel": mel, "context": ctx}),
                        ("moments", {"moments": moments, "context": ctx})):
        state = create_train_state({"dit": dit_p}, {"vae": vae_p}, optimizer)
        step = jax.jit(make_train_step(dit_cfg, vae_cfg, optimizer,
                                       compute_dtype=jnp.float32))
        _, m = step(state, batch, jax.random.PRNGKey(7))
        losses[name] = float(m["loss"])
    np.testing.assert_allclose(losses["moments"], losses["mel"], rtol=1e-6)


def test_dataset_moments_path_routing(tmp_path):
    from maa3_tpu.data.datasets import TextSpecDataset

    mom = np.random.RandomState(0).randn(8, 20).astype(np.float32)
    mp = tmp_path / "clip0.npy"
    np.save(mp, mom)
    tsv = tmp_path / "train.tsv"
    tsv.write_text("name\tdataset\tori_cap\tcaption\tmel_path\tmoments_path\n"
                   f"clip0\td\ta dog\t<dog>\t/nonexistent.npy\t{mp}\n")
    ds = TextSpecDataset("train", str(tsv), spec_crop_len=24, mel_num=8)
    item = ds[0]
    assert "moments" in item and item["moments"].shape == (8, 12)
    batch = ds.collater([ds[0], ds[0]])
    assert batch["moments"].shape == (2, 8, 12)
    assert "image" not in batch

    # tiling: a short clip tiles up to the latent crop length
    np.save(mp, mom[:, :4])
    item = ds[0]
    assert item["moments"].shape == (8, 12)
    np.testing.assert_array_equal(item["moments"][:, :4], item["moments"][:, 4:8])

    # corrupted-file fallback must be MOMENTS-shaped (learned from the first
    # healthy load) so it still stacks with healthy items in the collate —
    # zero moments = unit-Gaussian latent, training survives the bad file
    mp.write_bytes(b"not an npy")
    bad = ds[0]
    assert bad["moments"].shape == (8, 12)
    np.testing.assert_array_equal(bad["moments"], 0.0)
    np.save(mp, mom)
    batch = ds.collater([ds[0], bad])
    assert batch["moments"].shape == (2, 8, 12)


def test_trainer_prepare_batch_passthrough(tmp_path):
    from tests.test_train import _tiny_system
    from maa3_tpu.train.loop import Trainer

    system = _tiny_system(tmp_path)
    tr = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ck"))
    raw = {"moments": np.zeros((8, 8, 16), np.float32),
           "caption": {"ori_caption": ["a"] * 8,
                       "struct_caption": ["a"] * 8}}
    batch = tr.prepare_batch(raw)
    assert "moments" in batch and "mel" not in batch
    assert batch["moments"].shape == (8, 8, 16)


def test_factored_optimizer_runs_and_descends():
    """make_optimizer(factored=True): Adafactor second moment + Adam-style
    momentum must optimize the toy CFM objective (loss decreasing over a
    few steps) and keep state tiny (no full-size nu tensor)."""
    dit_cfg, vae_cfg, dit_p, vae_p = _setup()
    optimizer = make_optimizer(base_lr=1e-3, lr_multiplier=1.0,
                               warm_up_steps=1, factored=True,
                               min_dim_size_to_factor=8)
    state = create_train_state({"dit": dit_p}, {"vae": vae_p}, optimizer)
    step = jax.jit(make_train_step(dit_cfg, vae_cfg, optimizer,
                                   compute_dtype=jnp.float32))
    batch = {"mel": jax.random.normal(jax.random.PRNGKey(1), (2, 8, 32)),
             "context": jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))}
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(7))  # fixed batch+key
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # factored: total optimizer state ~= mu (1x params) + tiny factors,
    # vs AdamW's 2x params
    p_total = sum(x.size for x in jax.tree.leaves(state.params))
    s_total = sum(x.size for x in jax.tree.leaves(state.opt_state)
                  if hasattr(x, "size"))
    assert s_total < 1.5 * p_total, (s_total, p_total)
