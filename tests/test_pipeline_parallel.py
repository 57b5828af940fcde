"""GPipe pipeline parallelism (parallel/pipeline.py) vs the plain scan.

The pipelined DiT must reproduce the unpipelined forward AND its gradients
exactly (same block math, microbatched + ppermuted), composed with TP over
the automatic 'model' axis and DP over 'data' — all on the 8-virtual-device
CPU mesh (data2 x pipe2 x model2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
from maa3_tpu.parallel.mesh import batch_sharding, dit_param_specs, replicated
from maa3_tpu.parallel.pipeline import (add_pipe_specs, dit_apply_pipelined,
                                        make_pipe_mesh)

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=4,
                num_heads=4, max_len=64)


def _setup(cfg=CFG, b=8):
    key = jax.random.PRNGKey(0)
    params = dit_init(key, cfg)
    from maa3_tpu.utils.nprand import unfreeze_zero_init
    params = unfreeze_zero_init(params, jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.in_channels, 32))
    t = jnp.arange(b, dtype=jnp.int32) * 100
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 6, cfg.context_dim))
    ctx_mask = (jnp.arange(6)[None, :] < jnp.array([6, 4, 6, 5, 6, 3, 6, 2])[:b, None])
    return params, x, t, ctx, ctx_mask


def _shard(params, mesh, cfg=CFG):
    specs = add_pipe_specs(dit_param_specs(params))
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)


def test_add_pipe_specs_structure():
    params, *_ = _setup()
    specs = add_pipe_specs(dit_param_specs(params))
    # block leaves: depth dim -> 'pipe', TP dims preserved
    assert specs["blocks"]["attention"]["wq"]["w"] == P("pipe", None, "model")
    assert specs["blocks"]["attention"]["wo"]["w"] == P("pipe", "model", None)
    assert specs["blocks"]["adaLN"]["w"] == P("pipe")
    assert specs["blocks"]["attention_norm"]["weight"] == P("pipe")
    # non-block leaves untouched (replicated)
    assert specs["proj_in"]["w"] == P()
    assert specs["final_layer"]["linear"]["w"] == P()


@requires_8
def test_pipelined_forward_matches_plain():
    params, x, t, ctx, ctx_mask = _setup()
    ref = dit_apply(params, CFG, x, t, ctx, context_mask=ctx_mask,
                    compute_dtype=jnp.float32)

    mesh = make_pipe_mesh(2, 2, 2)
    sharded = _shard(params, mesh)
    xd = jax.device_put(x, batch_sharding(mesh, 3))
    td = jax.device_put(t, batch_sharding(mesh, 1))
    cd = jax.device_put(ctx, batch_sharding(mesh, 3))
    md = jax.device_put(ctx_mask, batch_sharding(mesh, 2))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x, t, c, m: dit_apply_pipelined(
            p, CFG, x, t, c, mesh=mesh, n_micro=2, context_mask=m,
            compute_dtype=jnp.float32))(sharded, xd, td, cd, md)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@requires_8
def test_pipelined_grads_match_plain():
    params, x, t, ctx, ctx_mask = _setup()
    cot = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss_plain(p, x):
        return jnp.sum(dit_apply(p, CFG, x, t, ctx, context_mask=ctx_mask,
                                 compute_dtype=jnp.float32) * cot)

    g_ref, gx_ref = jax.grad(loss_plain, argnums=(0, 1))(params, x)

    mesh = make_pipe_mesh(2, 2, 2)
    sharded = _shard(params, mesh)
    xd = jax.device_put(x, batch_sharding(mesh, 3))
    td = jax.device_put(t, batch_sharding(mesh, 1))
    cd = jax.device_put(ctx, batch_sharding(mesh, 3))
    md = jax.device_put(ctx_mask, batch_sharding(mesh, 2))
    cotd = jax.device_put(cot, batch_sharding(mesh, 3))

    def loss_pipe(p, x, t, c, m):
        return jnp.sum(dit_apply_pipelined(
            p, CFG, x, t, c, mesh=mesh, n_micro=2, context_mask=m,
            compute_dtype=jnp.float32) * cotd)

    with jax.set_mesh(mesh):
        g, gx = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(
            sharded, xd, td, cd, md)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)


@requires_8
def test_pipelined_remat_forward_and_grad():
    """cfg.remat wraps each pipeline stage in jax.checkpoint — numerics
    must be unchanged."""
    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=4,
                    num_heads=4, max_len=64, remat=True)
    params, x, t, ctx, _ = _setup(cfg)
    ref = dit_apply(params, cfg, x, t, ctx, compute_dtype=jnp.float32)
    mesh = make_pipe_mesh(2, 2, 2)
    sharded = _shard(params, mesh, cfg)
    xd = jax.device_put(x, batch_sharding(mesh, 3))
    td = jax.device_put(t, batch_sharding(mesh, 1))
    cd = jax.device_put(ctx, batch_sharding(mesh, 3))

    def f(p, x, t, c):
        return dit_apply_pipelined(p, cfg, x, t, c, mesh=mesh, n_micro=2,
                                   compute_dtype=jnp.float32)

    with jax.set_mesh(mesh):
        out = jax.jit(f)(sharded, xd, td, cd)
        g = jax.jit(jax.grad(lambda p: jnp.sum(f(p, xd, td, cd) ** 2)))(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda p: jnp.sum(
        dit_apply(p, cfg, x, t, ctx, compute_dtype=jnp.float32) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@requires_8
def test_pipelined_train_step_matches_single_device():
    """Full CFM train step through the pipelined backbone == the plain
    single-device step (fp32)."""
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.train.optim import make_optimizer
    from maa3_tpu.train.step import create_train_state, make_train_step

    cfg = CFG
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    dit_cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64,
                        depth=4, num_heads=4, max_len=64)
    key = jax.random.PRNGKey(0)
    params = {"dit": dit_init(key, dit_cfg)}
    frozen = {"vae": vae_init(key, vae_cfg)}
    optimizer = make_optimizer()
    batch = {
        "mel": jax.random.normal(key, (8, 8, 32), jnp.float32),
        "context": jax.random.normal(key, (8, 5, 16), jnp.float32),
    }
    k = jax.random.PRNGKey(1)

    step_ref = make_train_step(dit_cfg, vae_cfg, optimizer,
                               compute_dtype=jnp.float32)
    state1 = create_train_state(params, frozen, optimizer, use_ema=True)
    state1, m1 = jax.jit(step_ref)(state1, batch, k)

    mesh = make_pipe_mesh(2, 2, 2)
    sharded = {"dit": _shard(params["dit"], mesh, dit_cfg)}
    step_pipe = make_train_step(
        dit_cfg, vae_cfg, optimizer, compute_dtype=jnp.float32,
        apply_fn=lambda p, x, t, c: dit_apply_pipelined(
            p, dit_cfg, x, t, c, mesh=mesh, n_micro=2,
            compute_dtype=jnp.float32))
    state2 = create_train_state(sharded,
                                jax.device_put(frozen, replicated(mesh)),
                                optimizer, use_ema=True)
    batch2 = {kk: jax.device_put(v, batch_sharding(mesh, v.ndim))
              for kk, v in batch.items()}
    with jax.set_mesh(mesh):
        state2, m2 = jax.jit(step_pipe)(state2, batch2,
                                        jax.device_put(k, replicated(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-6)
    # params kept their pipe shards (no silent gather into replication)
    wq = state2.params["dit"]["blocks"]["attention"]["wq"]["w"]
    assert wq.sharding.spec == P("pipe", None, "model")


@requires_8
def test_trainer_fit_pipelined_matches_data_parallel():
    """Trainer(n_pipe=2, n_micro=2, n_model=2) == plain data-parallel
    Trainer over 2 Trainer.fit steps, end-to-end (same data + seed)."""
    import tempfile
    from tests.test_train import _tiny_system, _batches
    from maa3_tpu.train.loop import Trainer

    with tempfile.TemporaryDirectory() as td:
        system = _tiny_system(td)
        t_ref = Trainer(system, batch_size=8, ckpt_dir=td + "/a", log_every=1,
                        ckpt_every=0, warm_up_steps=1, lr_multiplier=1.0)
        m_ref = t_ref.fit(_batches(2, bs=8), max_steps=2, seed=0)

        system2 = _tiny_system(td)
        t_pp = Trainer(system2, batch_size=8, ckpt_dir=td + "/b", log_every=1,
                       ckpt_every=0, warm_up_steps=1, lr_multiplier=1.0,
                       n_pipe=2, n_micro=2, n_model=2)
        assert dict(t_pp.mesh.shape) == {"data": 2, "pipe": 2, "model": 2}
        m_pp = t_pp.fit(_batches(2, bs=8), max_steps=2, seed=0)

    assert np.isfinite(m_pp["loss"])
    np.testing.assert_allclose(m_pp["loss"], m_ref["loss"],
                               rtol=2e-3, atol=1e-5)
    for a, b in zip(jax.tree.leaves(t_ref.state.params["dit"]),
                    jax.tree.leaves(t_pp.state.params["dit"])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-4)
