"""Training-loop integration: synthetic TSV + mels -> Trainer.fit a few steps,
loss decreases on a fixed batch, checkpoint save/restore roundtrips."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maa3_tpu.config import ModelSpec
from maa3_tpu.models.dit import DiTConfig, dit_init
from maa3_tpu.models.vae1d import VAEConfig, vae_init
from maa3_tpu.models.bert import BertConfig
from maa3_tpu.models.t5 import T5Config
from maa3_tpu.models import clap as clap_mod
from maa3_tpu.system import MAA3System
from maa3_tpu.train.loop import Trainer


def _tiny_system(tmp_path):
    dit_cfg = DiTConfig(in_channels=4, context_dim=24, hidden_size=32,
                        depth=2, num_heads=4, max_len=128, multiple_of=16)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    clap_cfg = clap_mod.CLAPFLANConfig(
        bert=BertConfig(vocab_size=30522, hidden_size=16, num_layers=1,
                        num_heads=2, intermediate_size=32, max_position=128),
        t5=T5Config(vocab_size=32128, d_model=24, d_kv=4, d_ff=32,
                    num_layers=1, num_heads=2),
        d_proj=24, max_length=12)
    spec = ModelSpec(kind="cfm", backbone_kind="text_dit", dit=dit_cfg,
                     vae=vae_cfg, cond_kind="clap_flan", cond_params_cfg={},
                     mel_dim=4, mel_length=16, scale_by_std=True,
                     cond_stage_trainable=True, base_learning_rate=1e-3)
    key = jax.random.PRNGKey(0)
    params = {
        "dit": dit_init(key, dit_cfg),
        "vae": vae_init(key, vae_cfg),
        "cond": clap_mod.clap_flan_init(key, clap_cfg),
    }
    system = MAA3System(spec, params, compute_dtype=jnp.float32,
                        clap_cfg=clap_cfg)
    system.bert_tokenizer.max_length = 12
    system.t5_tokenizer.max_length = 12
    return system


def _batches(n, bs=8):
    rng = np.random.RandomState(0)
    mel = rng.randn(bs, 8, 32).astype(np.float32)  # fixed batch
    for _ in range(n):
        yield {
            "image": mel,
            "caption": {"ori_caption": ["a dog barks"] * bs,
                        "struct_caption": ["<dog& all>"] * bs},
        }


def test_trainer_mechanics(tmp_path):
    """Train step runs, loss/grads finite, params actually move,
    scale_by_std fires on the first batch (CFM loss itself is stochastic —
    fresh flow noise per step — so a 30-step loss-decrease assert is flaky;
    optimization is validated by the overfit test below)."""
    system = _tiny_system(tmp_path)
    w0 = np.asarray(system.params["dit"]["blocks"]["attention"]["wq"]["w"]).copy()
    trainer = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ckpt"),
                      log_every=1, ckpt_every=0, warm_up_steps=1,
                      lr_multiplier=10.0)
    metrics = trainer.fit(_batches(10), max_steps=10)
    assert np.isfinite(metrics["loss"])
    assert metrics["grad_norm"] > 0
    assert metrics["steps_per_sec"] > 0
    w1 = np.asarray(trainer.state.params["dit"]["blocks"]["attention"]["wq"]["w"])
    assert np.abs(w1 - w0).max() > 1e-6
    # scale_by_std fired (ddpm_audio.py:88-103 equivalent)
    assert abs(float(trainer.state.scale_factor) - 1.0) > 1e-3


def test_cfm_overfits_deterministic_velocity():
    """Pure optimization sanity: with FIXED noise and t, SGD on the CFM MSE
    must drive the loss down (deterministic regression)."""
    import optax
    from maa3_tpu.diffusion import cfm
    from maa3_tpu.models.dit import dit_apply

    dit_cfg = DiTConfig(in_channels=4, context_dim=8, hidden_size=32,
                        depth=1, num_heads=4, max_len=32, multiple_of=16)
    params = dit_init(jax.random.PRNGKey(0), dit_cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 16))
    x0 = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 8))
    t = jnp.array([100, 300, 600, 900])
    xt, ut = cfm.cfm_interpolate(x1, x0, t / 1000.0)

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = dit_apply(p, dit_cfg, xt, t, ctx, compute_dtype=jnp.float32)
            return jnp.mean(jnp.square(pred - ut))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params2, opt_state, loss0 = step(params, opt_state)
    for _ in range(60):
        params2, opt_state, loss = step(params2, opt_state)
    assert float(loss) < float(loss0) * 0.8, (float(loss0), float(loss))


def test_checkpoint_roundtrip(tmp_path):
    system = _tiny_system(tmp_path)
    trainer = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ckpt"),
                      log_every=10, ckpt_every=0)
    trainer.fit(_batches(3), max_steps=3)
    path = trainer.save_checkpoint()
    step_before = int(trainer.state.step)
    w_before = np.asarray(
        jax.tree.leaves(trainer.state.params)[0])

    trainer2 = Trainer(_tiny_system(tmp_path), batch_size=8,
                       ckpt_dir=str(tmp_path / "ckpt2"), ckpt_every=0)
    trainer2.restore_checkpoint(path)
    assert int(trainer2.state.step) == step_before
    w_after = np.asarray(jax.tree.leaves(trainer2.state.params)[0])
    np.testing.assert_allclose(w_before, w_after)


def test_trainer_evaluate_and_ckpt_rotation(tmp_path):
    system = _tiny_system(tmp_path)
    trainer = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ckpt"),
                      log_every=10, ckpt_every=0)
    trainer.fit(_batches(2), max_steps=2)
    metrics = trainer.evaluate(_batches(3), max_batches=3)
    assert np.isfinite(metrics["val/loss_simple"])
    assert metrics["val/batches"] == 3

    # rotation: keep only the newest 2 periodic checkpoints
    import os
    for _ in range(4):
        trainer.fit(_batches(1), max_steps=1)
        trainer.save_checkpoint(keep_last_k=2)
    steps = [d for d in os.listdir(tmp_path / "ckpt") if d.startswith("step_")]
    assert len(steps) == 2


def test_remat_matches_plain_gradients():
    """cfg.remat=True must not change loss or gradients — only the backward
    memory strategy (jax.checkpoint on the block scan body)."""
    import dataclasses
    import numpy as np
    from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
    from maa3_tpu.diffusion import cfm

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=32, depth=2,
                    num_heads=4, max_len=64)
    key = jax.random.PRNGKey(0)
    params = dit_init(key, cfg)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16))

    def loss(p, c):
        vel = lambda x, t, cc: dit_apply(p, c, x, t, cc,
                                         compute_dtype=jnp.float32)
        l, _ = cfm.cfm_loss(vel, x1, ctx, jax.random.PRNGKey(3))
        return l

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    cfg_r = dataclasses.replace(cfg, remat=True)
    l1, g1 = jax.value_and_grad(loss)(params, cfg_r)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_grad_accumulation_mechanics(tmp_path):
    """accum_steps=2 (accumulate_grad_batches equivalent): params must NOT
    move after the first micro-batch and MUST move after the second."""
    system = _tiny_system(tmp_path)
    trainer = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ck"),
                      log_every=100, ckpt_every=0, warm_up_steps=1,
                      lr_multiplier=10.0, accum_steps=2,
                      mu_dtype=jnp.bfloat16)
    w0 = np.asarray(system.params["dit"]["blocks"]["attention"]["wq"]["w"]).copy()
    trainer.fit(_batches(1), max_steps=1)
    w1 = np.asarray(trainer.state.params["dit"]["blocks"]["attention"]["wq"]["w"])
    np.testing.assert_array_equal(w1, w0)  # update still accumulating
    # 3 more micro-batches: applies at micro-step 2 (inner LR still at the
    # f_start=1e-6 warmup floor) and at micro-step 4 (full LR)
    trainer.fit(_batches(3), max_steps=3)
    w2 = np.asarray(trainer.state.params["dit"]["blocks"]["attention"]["wq"]["w"])
    assert np.abs(w2 - w0).max() > 1e-6  # updates applied
    # bf16 first moment actually stored in bf16
    mu = trainer.state.opt_state.inner_opt_state[1][0].mu
    leaf = jax.tree.leaves(mu)[0]
    assert leaf.dtype == jnp.bfloat16


def test_checkpoint_carries_frozen_vae(tmp_path):
    """Round-5: checkpoints are self-contained — the frozen first-stage VAE
    travels with the save, and a Trainer built around a DIFFERENT random
    VAE restores the original one (a restored DiT decoded through a
    re-seeded VAE is garbage; loop.py save_checkpoint / system._from_orbax)."""
    system = _tiny_system(tmp_path)
    trainer = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ckptf"),
                      log_every=10, ckpt_every=0)
    trainer.fit(_batches(2), max_steps=2)
    path = trainer.save_checkpoint()
    vae_before = np.asarray(jax.tree.leaves(trainer.state.frozen["vae"])[0])

    sys2 = _tiny_system(tmp_path)
    # perturb the second system's VAE so restore must really overwrite it
    leaves, treedef = jax.tree.flatten(sys2.params["vae"])
    sys2.params["vae"] = jax.tree.unflatten(
        treedef, [l + 1.0 for l in leaves])
    trainer2 = Trainer(sys2, batch_size=8,
                       ckpt_dir=str(tmp_path / "ckptf2"), ckpt_every=0)
    trainer2.restore_checkpoint(path)
    vae_after = np.asarray(jax.tree.leaves(trainer2.state.frozen["vae"])[0])
    np.testing.assert_allclose(vae_before, vae_after)
