"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maa3_tpu.parallel.mesh import make_mesh, dit_param_specs, batch_sharding
from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_param_specs_cover_moe_experts():
    """MoE expert stacks get real TP shardings (not silent replication), and
    the coverage guard trips on unrecognized large block leaves."""
    from jax.sharding import PartitionSpec as P
    from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_init

    cfg = MoEDiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                       depth=2, num_heads=2, max_len=16, multiple_of=16,
                       num_experts=4)
    params = moe_dit_init(jax.random.PRNGKey(0), cfg)
    specs = dit_param_specs(params)
    ff = specs["blocks"]["feed_forward"]
    assert ff["time_experts"]["w1"]["w"] == P(None, None, None, "model")
    assert ff["freq_experts"]["w2"]["w"] == P(None, None, "model", None)

    # guard: a renamed big leaf must raise instead of silently replicating
    params["blocks"]["mystery"] = {"w": jnp.zeros((2, 1024, 1024))}
    with pytest.raises(ValueError, match="unrecognized large block leaf"):
        dit_param_specs(params)


@requires_8
def test_moe_tp_sharded_forward_matches_single_device():
    """Video MoE DiT forward under a 2x4 (data x model) mesh must equal the
    unsharded result, including the expert-sharded FFN stacks."""
    from jax.sharding import NamedSharding
    from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_init, moe_dit_apply

    cfg = MoEDiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                       depth=2, num_heads=4, max_len=16, multiple_of=16,
                       num_experts=4)
    key = jax.random.PRNGKey(0)
    params = moe_dit_init(key, cfg)
    params["final_layer"]["linear"]["w"] = (
        0.1 * jax.random.normal(key, params["final_layer"]["linear"]["w"].shape))

    x = jax.random.normal(key, (4, 4, 16))
    t = jnp.array([0, 260, 600, 999])
    ctx = jax.random.normal(key, (4, 5, 16))
    ref = moe_dit_apply(params, cfg, x, t, ctx, compute_dtype=jnp.float32)

    mesh = make_mesh(2, 4)
    specs = dit_param_specs(params)
    sharded = jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, a, b, c: moe_dit_apply(
            p, cfg, a, b, c, compute_dtype=jnp.float32))(
            sharded,
            jax.device_put(x, batch_sharding(mesh, 3)),
            jax.device_put(t, batch_sharding(mesh, 1)),
            jax.device_put(ctx, batch_sharding(mesh, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@requires_8
def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_two_rank_sampler_disjoint_coverage():
    """DDP data-path semantics (joinaudiodataset_struct_sample_anylen.py:
    301-306): two ranks see disjoint batches whose union is the full epoch,
    with identical epoch-seeded order across ranks."""
    from maa3_tpu.data.datasets import BucketBatchSampler

    indices = list(range(40))
    r0 = BucketBatchSampler(indices, batch_size=4, num_replicas=2, rank=0,
                            seed=7)
    r1 = BucketBatchSampler(indices, batch_size=4, num_replicas=2, rank=1,
                            seed=7)
    single = BucketBatchSampler(indices, batch_size=4, num_replicas=1, rank=0,
                                seed=7)
    b0, b1, ball = list(r0), list(r1), list(single)
    flat0 = {i for b in b0 for i in b}
    flat1 = {i for b in b1 for i in b}
    assert flat0.isdisjoint(flat1)
    assert flat0 | flat1 == set(indices)
    # the rank split is round-robin over the SAME shuffled batch list
    assert b0 == ball[0::2] and b1 == ball[1::2]
    # epoch reshuffle changes order deterministically and stays disjoint
    r0.set_epoch(1), r1.set_epoch(1)
    assert list(r0) != b0
    assert {i for b in r0 for i in b}.isdisjoint({i for b in r1 for i in b})


@requires_8
def test_two_rank_train_step_matches_single_rank():
    """The 'data'-axis sharded train step must produce the same loss and
    updated params as the same global batch on one device — the DDP
    gradient all-reduce equivalence, via XLA psum from shardings alone."""
    from jax.sharding import NamedSharding
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.parallel.mesh import replicated
    from maa3_tpu.train.optim import make_optimizer
    from maa3_tpu.train.step import create_train_state, make_train_step

    dit_cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64,
                        depth=2, num_heads=4, max_len=64)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    key = jax.random.PRNGKey(0)
    params = {"dit": dit_init(key, dit_cfg)}
    frozen = {"vae": vae_init(key, vae_cfg)}
    optimizer = make_optimizer()
    step_fn = make_train_step(dit_cfg, vae_cfg, optimizer,
                              compute_dtype=jnp.float32)

    batch = {
        "mel": jax.random.normal(key, (8, 8, 32), jnp.float32),
        "context": jax.random.normal(key, (8, 5, 16), jnp.float32),
    }
    k = jax.random.PRNGKey(1)

    # single-rank reference
    state1 = create_train_state(params, frozen, optimizer)
    state1, m1 = jax.jit(step_fn)(state1, batch, k)

    # two 'ranks': the same batch sharded over a data=2 mesh, as the two
    # per-rank shards a 2-process DDP run would feed (BucketBatchSampler
    # rank split + Trainer.prepare_batch batch_sharding)
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    state2 = create_train_state(params, frozen, optimizer)
    state2 = jax.device_put(state2, replicated(mesh))
    batch2 = {kk: jax.device_put(v, batch_sharding(mesh, v.ndim))
              for kk, v in batch.items()}
    with jax.set_mesh(mesh):
        state2, m2 = jax.jit(step_fn)(state2, batch2, jax.device_put(
            k, replicated(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(state1.params)
    l2 = jax.tree.leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_add_fsdp_specs_dim_choice():
    """FSDP augmentation shards exactly one extra (largest, divisible,
    un-sharded) dim over 'data' and leaves small leaves untouched."""
    from jax.sharding import PartitionSpec as P
    from maa3_tpu.parallel.mesh import add_fsdp_specs

    params = {
        "col": jnp.zeros((28, 1152, 3072)),     # (depth, in, out), out on model
        "row": jnp.zeros((28, 3072, 1152)),     # (depth, in, out), in on model
        "plain": jnp.zeros((28, 1152, 6912)),   # adaLN-style, replicated
        "tiny": jnp.zeros((28, 64)),            # below min_size
        "odd": jnp.zeros((7, 11, 13)),          # nothing divisible by 8
    }
    specs = {"col": P(None, None, "model"), "row": P(None, "model", None),
             "plain": P(), "tiny": P(), "odd": P()}
    out = add_fsdp_specs(params, specs, 8)
    assert out["col"] == P(None, "data", "model")    # in-dim is the largest free
    assert out["row"] == P(None, "model", "data")    # out-dim is the largest free
    assert out["plain"] == P(None, None, "data")     # 6912 = largest dim
    assert out["tiny"] == P()
    assert out["odd"] == P()


@requires_8
def test_fsdp_train_step_matches_replicated():
    """ZeRO-3 via annotations: params + AdamW moments + EMA shadows sharded
    1/n over the mesh must store true 1/n shards per device AND reproduce
    the replicated-DP train-step numerics exactly."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.parallel.mesh import add_fsdp_specs, replicated
    from maa3_tpu.train.optim import make_optimizer
    from maa3_tpu.train.step import create_train_state, make_train_step

    dit_cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64,
                        depth=2, num_heads=4, max_len=64)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    key = jax.random.PRNGKey(0)
    params = {"dit": dit_init(key, dit_cfg)}
    frozen = {"vae": vae_init(key, vae_cfg)}
    optimizer = make_optimizer()
    step_fn = make_train_step(dit_cfg, vae_cfg, optimizer,
                              compute_dtype=jnp.float32)
    batch = {
        "mel": jax.random.normal(key, (8, 8, 32), jnp.float32),
        "context": jax.random.normal(key, (8, 5, 16), jnp.float32),
    }
    k = jax.random.PRNGKey(1)

    # replicated single-device reference
    state1 = create_train_state(params, frozen, optimizer, use_ema=True)
    state1, m1 = jax.jit(step_fn)(state1, batch, k)

    # FSDP over data=4 composed with TP over model=2 (tiny leaves, so lower
    # min_size to exercise the path)
    mesh = make_mesh(4, 2)
    specs = add_fsdp_specs(params["dit"], dit_param_specs(params["dit"]),
                           4, min_size=1024)
    assert any("data" in tuple(s) for s in jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P)))
    sharded = {"dit": jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params["dit"], specs)}
    state2 = create_train_state(sharded,
                                jax.device_put(frozen, replicated(mesh)),
                                optimizer, use_ema=True)

    # storage really is 1/n: wq (depth, in, out) -> in/4 ('data'), out/2 ('model')
    wq = state2.params["dit"]["blocks"]["attention"]["wq"]["w"]
    assert wq.sharding.spec == P(None, "data", "model")
    assert wq.addressable_shards[0].data.size == wq.size // 8
    # the eagerly-initialized AdamW moments and EMA shadows inherit the shards
    mu_wq = jax.tree.leaves(  # ScaleByAdamState.mu mirrors the param treedef
        state2.opt_state, is_leaf=lambda x: isinstance(x, jax.Array))
    assert any(getattr(x, "sharding", None) == wq.sharding
               and x.shape == wq.shape for x in mu_wq)
    assert (state2.ema_params["dit"]["blocks"]["attention"]["wq"]["w"]
            .sharding.spec == P(None, "data", "model"))

    out_shards = jax.tree.map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
        else replicated(mesh), state2)
    step2 = jax.jit(step_fn, out_shardings=(out_shards, None))
    batch2 = {kk: jax.device_put(v, batch_sharding(mesh, v.ndim))
              for kk, v in batch.items()}
    with jax.set_mesh(mesh):
        state2, m2 = step2(state2, batch2,
                           jax.device_put(k, replicated(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)
    for a, b in zip(jax.tree.leaves(state1.ema_params),
                    jax.tree.leaves(state2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)
    # updated params kept their 1/n layout (grads were reduce-scattered,
    # not gathered into a replicated update)
    wq2 = state2.params["dit"]["blocks"]["attention"]["wq"]["w"]
    assert wq2.sharding.spec == P(None, "data", "model")
    assert wq2.addressable_shards[0].data.size == wq2.size // 8


@requires_8
def test_trainer_fsdp_wiring():
    """Trainer(fsdp=True) shards the DiT params over the data axis and a fit
    step runs; fsdp=False keeps them replicated over 'data'."""
    import tempfile
    from tests.test_train import _tiny_system, _batches

    with tempfile.TemporaryDirectory() as td:
        system = _tiny_system(td)
        from maa3_tpu.train.loop import Trainer
        trainer = Trainer(system, batch_size=8, ckpt_dir=td, log_every=1,
                          ckpt_every=0, warm_up_steps=1, lr_multiplier=1.0,
                          fsdp=True, fsdp_min_size=512)
        assert trainer.fsdp
        sharded = [x for x in jax.tree.leaves(trainer.state.params["dit"])
                   if "data" in tuple(getattr(x.sharding, "spec", ()))]
        assert sharded, "no leaf picked up an fsdp shard"
        metrics = trainer.fit(_batches(2, bs=8), max_steps=2)
        assert np.isfinite(metrics["loss"])
        wq = trainer.state.params["dit"]["blocks"]["attention"]["wq"]["w"]
        assert "data" in tuple(wq.sharding.spec)


@requires_8
def test_tp_sharded_forward_matches_single_device():
    """DiT forward under a 4x2 (data x model) mesh must equal the
    unsharded result — sharding cannot change numerics."""
    from jax.sharding import NamedSharding

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64,
                    depth=2, num_heads=4, max_len=64)
    key = jax.random.PRNGKey(0)
    params = dit_init(key, cfg)
    # nonzero output
    params["final_layer"]["linear"]["w"] = (
        0.1 * jax.random.normal(key, params["final_layer"]["linear"]["w"].shape))

    x = jax.random.normal(key, (4, 4, 16))
    t = jnp.array([1, 2, 3, 4])
    ctx = jax.random.normal(key, (4, 5, 16))

    ref = dit_apply(params, cfg, x, t, ctx, compute_dtype=jnp.float32)

    mesh = make_mesh(4, 2)
    specs = dit_param_specs(params)
    sharded = jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs)
    xs = jax.device_put(x, batch_sharding(mesh, 3))
    ts = jax.device_put(t, batch_sharding(mesh, 1))
    cs = jax.device_put(ctx, batch_sharding(mesh, 3))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, a, b, c: dit_apply(p, cfg, a, b, c,
                                                   compute_dtype=jnp.float32))(
            sharded, xs, ts, cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@requires_8
def test_tp_serving_matches_single_device():
    """MAA3System.shard_serving: the tensor-parallel sampler (column/row
    sharded per-step GEMMs, XLA-inserted all-reduces) must reproduce the
    single-device sample_cfg numerics, in float and int8 serving modes."""
    from tests.test_train import _tiny_system

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        system = _tiny_system(td)
    system.compute_dtype = jnp.float32
    from maa3_tpu.utils.nprand import unfreeze_zero_init
    system.params["dit"] = unfreeze_zero_init(system.params["dit"],
                                              jax.random.PRNGKey(3))

    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 24), jnp.float32)
    uc = jnp.zeros_like(ctx)
    k = jax.random.PRNGKey(2)

    z1 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))

    system.shard_serving(make_mesh(1, 2, devices=jax.devices()[:2]))
    z2 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    np.testing.assert_allclose(z2, z1, rtol=2e-4, atol=2e-5)

    # data x model: batch rows split over 'data', weights over 'model'
    system.shard_serving(make_mesh(2, 2, devices=jax.devices()[:4]))
    z4 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    np.testing.assert_allclose(z4, z1, rtol=2e-4, atol=2e-5)

    # int8 + TP: per-tensor quantization in the unfused layout
    system.set_serving_quant("int8")
    p = system.serving_dit()
    att = p["blocks"]["attention"]
    assert "wqkv" not in att and att["wq"]["w_q"].dtype == jnp.int8
    z8 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    assert np.isfinite(z8).all()
    rms = float(np.sqrt((z1 ** 2).mean()))
    assert float(np.abs(z8 - z1).mean()) / rms < 5e-2

    # back to single-chip serving
    system.set_serving_quant(None)
    system.shard_serving(None)
    z0 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    np.testing.assert_allclose(z0, z1, rtol=1e-6)


@requires_8
def test_seq_parallel_forward_and_grads_match():
    """DiTConfig.seq_parallel (Megatron SP: residual sharded over seq on
    'model') must not change forward or gradient numerics, and the
    partitioned program must carry the sequence-sharded residual
    (reduce-scatter/all-gather instead of plain all-reduce)."""
    from maa3_tpu.utils.nprand import unfreeze_zero_init

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=2,
                    num_heads=4, max_len=64)
    cfg_sp = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=2,
                       num_heads=4, max_len=64, seq_parallel=True)
    key = jax.random.PRNGKey(0)
    params = unfreeze_zero_init(dit_init(key, cfg), jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32))
    t = jnp.arange(8, dtype=jnp.int32) * 100
    ctx = jax.random.normal(jax.random.PRNGKey(2), (8, 5, 16))

    ref = dit_apply(params, cfg, x, t, ctx, compute_dtype=jnp.float32)
    g_ref = jax.grad(lambda p: jnp.sum(dit_apply(
        p, cfg, x, t, ctx, compute_dtype=jnp.float32) ** 2))(params)

    from jax.sharding import NamedSharding
    mesh = make_mesh(4, 2)
    sharded = jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params, dit_param_specs(params))
    xd = jax.device_put(x, batch_sharding(mesh, 3))
    td = jax.device_put(t, batch_sharding(mesh, 1))
    cd = jax.device_put(ctx, batch_sharding(mesh, 3))

    def f(p, x, t, c):
        return dit_apply(p, cfg_sp, x, t, c, compute_dtype=jnp.float32)

    with jax.set_mesh(mesh):
        out = jax.jit(f)(sharded, xd, td, cd)
        g = jax.jit(jax.grad(lambda p: jnp.sum(f(p, xd, td, cd) ** 2)))(sharded)
        compiled = jax.jit(f).lower(sharded, xd, td, cd).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    assert ("reduce-scatter" in compiled or "dynamic-slice" in compiled), \
        "SP constraint produced no sequence partitioning in the SPMD program"


def test_add_ep_specs():
    """EP augmentation shards exactly the stacked-expert axis (dim 1) of the
    time/freq expert leaves over 'expert', leaves everything else alone, and
    rejects a non-divisible expert count."""
    from jax.sharding import PartitionSpec as P
    from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_init
    from maa3_tpu.parallel.mesh import add_ep_specs

    cfg = MoEDiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                       depth=2, num_heads=2, max_len=16, multiple_of=16,
                       num_experts=4)
    params = moe_dit_init(jax.random.PRNGKey(0), cfg)
    specs = add_ep_specs(params, dit_param_specs(params), 2)
    ff = specs["blocks"]["feed_forward"]
    assert ff["time_experts"]["w1"]["w"] == P(None, "expert", None, "model")
    assert ff["freq_experts"]["w2"]["w"] == P(None, "expert", "model", None)
    assert specs["blocks"]["attention"]["wq"]["w"] == P(None, None, "model")
    assert specs["proj_in"]["w"] == P()
    with pytest.raises(ValueError, match="not divisible"):
        add_ep_specs(params, dit_param_specs(params), 3)


@requires_8
def test_moe_ep_train_step_matches_replicated():
    """Expert parallelism (data2 x model2 x expert2): the video-MoE train
    step with the expert stacks sharded 1/2 over 'expert' (and 1/2 over
    'model' in-dim/out-dim) must store true 1/4 shards per chip AND
    reproduce the single-device numerics."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from maa3_tpu.models.dit_moe import (MoEDiTConfig, moe_dit_init,
                                         moe_dit_apply)
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.parallel.mesh import add_ep_specs, make_moe_mesh, replicated
    from maa3_tpu.train.optim import make_optimizer
    from maa3_tpu.train.step import create_train_state, make_train_step

    dit_cfg = MoEDiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                           depth=2, num_heads=4, max_len=64, multiple_of=16,
                           num_experts=4)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    key = jax.random.PRNGKey(0)
    params = {"dit": moe_dit_init(key, dit_cfg)}
    frozen = {"vae": vae_init(key, vae_cfg)}
    optimizer = make_optimizer()
    step_fn = make_train_step(
        dit_cfg, vae_cfg, optimizer, compute_dtype=jnp.float32,
        apply_fn=lambda p, x, t, c: moe_dit_apply(
            p, dit_cfg, x, t, c, compute_dtype=jnp.float32))
    batch = {
        "mel": jax.random.normal(key, (8, 8, 32), jnp.float32),
        "context": jax.random.normal(key, (8, 5, 16), jnp.float32),
    }
    k = jax.random.PRNGKey(1)

    state1 = create_train_state(params, frozen, optimizer)
    state1, m1 = jax.jit(step_fn)(state1, batch, k)

    mesh = make_moe_mesh(2, 2, 2)
    specs = add_ep_specs(params["dit"], dit_param_specs(params["dit"]), 2)
    sharded = {"dit": jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params["dit"], specs)}
    state2 = create_train_state(sharded,
                                jax.device_put(frozen, replicated(mesh)),
                                optimizer)

    # storage really is 1/4: (depth, E/2 'expert', d, h/2 'model')
    w1 = state2.params["dit"]["blocks"]["feed_forward"]["time_experts"]["w1"]["w"]
    assert w1.sharding.spec == P(None, "expert", None, "model")
    assert w1.addressable_shards[0].data.size == w1.size // 4

    out_shards = jax.tree.map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
        else replicated(mesh), state2)
    step2 = jax.jit(step_fn, out_shardings=(out_shards, None))
    batch2 = {kk: jax.device_put(v, batch_sharding(mesh, v.ndim))
              for kk, v in batch.items()}
    with jax.set_mesh(mesh):
        state2, m2 = step2(state2, batch2,
                           jax.device_put(k, replicated(mesh)))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)
    # updates kept the expert-sharded layout
    w1b = state2.params["dit"]["blocks"]["feed_forward"]["time_experts"]["w1"]["w"]
    assert w1b.sharding.spec == P(None, "expert", None, "model")
    assert w1b.addressable_shards[0].data.size == w1b.size // 4


def _tiny_video_system():
    """Tiny video-MoE MAA3System (fp32, random init) for EP tests."""
    from maa3_tpu.config import ModelSpec
    from maa3_tpu.models import clap as clap_mod
    from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_init
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.system import MAA3System

    dit_cfg = MoEDiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                           depth=2, num_heads=4, max_len=64, multiple_of=16,
                           num_experts=4)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    # mel_dim/mel_length are the LATENT sampling shape (z channels, z len)
    spec = ModelSpec(kind="cfm", backbone_kind="video_moe_dit", dit=dit_cfg,
                     vae=vae_cfg, cond_kind="video_feat", cond_params_cfg={},
                     mel_dim=4, mel_length=16, scale_by_std=False,
                     cond_stage_trainable=True, base_learning_rate=1e-3)
    key = jax.random.PRNGKey(0)
    params = {"dit": moe_dit_init(key, dit_cfg),
              "vae": vae_init(key, vae_cfg),
              "cond": clap_mod.video_feat_encoder_init(key, 12, 16)}
    return MAA3System(spec, params, compute_dtype=jnp.float32)


@requires_8
def test_trainer_ep_wiring():
    """Trainer(n_expert=2, n_model=2) builds the (data, model, expert) mesh,
    shards the expert stacks, and a 2-step video-MoE fit runs finite; the
    text backbone rejects n_expert>1."""
    import tempfile

    from maa3_tpu.train.loop import Trainer

    system = _tiny_video_system()
    rng = np.random.RandomState(0)

    def batches(n, bs=8):
        for _ in range(n):
            yield {"image": rng.randn(bs, 8, 32).astype(np.float32),
                   "video_feat": rng.randn(bs, 5, 12).astype(np.float32)}

    with tempfile.TemporaryDirectory() as td:
        trainer = Trainer(system, batch_size=8, ckpt_dir=td, log_every=1,
                          ckpt_every=0, warm_up_steps=1, lr_multiplier=1.0,
                          n_model=2, n_expert=2)
        assert dict(trainer.mesh.shape) == {"data": 2, "model": 2,
                                            "expert": 2}
        w1 = trainer.state.params["dit"]["blocks"]["feed_forward"][
            "time_experts"]["w1"]["w"]
        assert "expert" in tuple(w1.sharding.spec)
        metrics = trainer.fit(batches(2), max_steps=2)
        assert np.isfinite(metrics["loss"])

    from tests.test_train import _tiny_system
    with tempfile.TemporaryDirectory() as td:
        text_system = _tiny_system(td)
        with pytest.raises(ValueError, match="video MoE backbone"):
            Trainer(text_system, batch_size=8, ckpt_dir=td, n_expert=2)


@requires_8
def test_ep_serving_matches_single_device():
    """shard_serving with an 'expert' mesh axis: the expert-parallel video
    MoE planned sampler must reproduce single-chip sample_cfg numerics,
    with the expert stacks stored 1/(E*TP) per chip."""
    from jax.sharding import PartitionSpec as P
    from maa3_tpu.parallel.mesh import make_moe_mesh
    from maa3_tpu.utils.nprand import unfreeze_zero_init

    system = _tiny_video_system()
    system.params["dit"] = unfreeze_zero_init(system.params["dit"],
                                              jax.random.PRNGKey(3))

    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16), jnp.float32)
    uc = jnp.zeros_like(ctx)
    k = jax.random.PRNGKey(2)

    z1 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))

    system.shard_serving(make_moe_mesh(1, 2, 2, devices=jax.devices()[:4]))
    w1 = system.serving_dit()["blocks"]["feed_forward"]["time_experts"][
        "w1"]["w"]
    assert w1.sharding.spec == P(None, "expert", None, "model")
    assert w1.addressable_shards[0].data.size == w1.size // 4
    z2 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    np.testing.assert_allclose(z2, z1, rtol=2e-4, atol=2e-5)

    # data x model x expert: batch rows additionally split over 'data'
    system.shard_serving(make_moe_mesh(2, 2, 2))
    z8 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    np.testing.assert_allclose(z8, z1, rtol=2e-4, atol=2e-5)

    system.shard_serving(None)
    z0 = np.asarray(system.sample_cfg(ctx, 3.0, uc, k, timesteps=4))
    np.testing.assert_allclose(z0, z1, rtol=1e-6)


@requires_8
def test_trainer_seq_parallel_wiring():
    """Trainer(seq_parallel=True, n_model=2) flips DiTConfig.seq_parallel and
    a fit step runs finite."""
    import tempfile
    from tests.test_train import _tiny_system, _batches
    from maa3_tpu.train.loop import Trainer

    with tempfile.TemporaryDirectory() as td:
        system = _tiny_system(td)
        trainer = Trainer(system, batch_size=8, ckpt_dir=td, log_every=1,
                          ckpt_every=0, warm_up_steps=1, lr_multiplier=1.0,
                          n_model=2, seq_parallel=True)
        assert trainer.spec.dit.seq_parallel
        assert not system.spec.dit.seq_parallel  # serving spec untouched
        metrics = trainer.fit(_batches(2, bs=8), max_steps=2)
        assert np.isfinite(metrics["loss"])
