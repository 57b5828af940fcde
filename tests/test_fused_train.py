"""Fused-GEMM training-layout tests (fuse_dit_gemms / unfuse_dit_gemms).

Training with wqkv/w13 concatenated is a pure layout change — wider MXU
GEMMs in forward AND backward (measured +4% fwd MFU at XL b16) with
per-element-identical math. These tests pin the roundtrip and the gradient
equivalence so the Trainer's fuse_gemms mode can't silently diverge.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.models.dit import DiTConfig, dit_apply, dit_init
from maa3_tpu.utils.nprand import (fuse_dit_gemms, unfuse_dit_gemms,
                                   unfreeze_zero_init)

CFG = DiTConfig(in_channels=6, context_dim=32, hidden_size=64, depth=3,
                num_heads=4, max_len=64, qk_norm=True)


def _params():
    key = jax.random.PRNGKey(5)
    return unfreeze_zero_init(dit_init(key, CFG), key)


def test_fuse_unfuse_roundtrip_exact():
    p = _params()
    rt = unfuse_dit_gemms(fuse_dit_gemms(p), CFG.num_heads, CFG.n_kv_heads)
    flat_a = jax.tree_util.tree_flatten_with_path(p)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(rt)[0]
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (ka, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def test_fused_gradients_match_unfused():
    """d(loss)/d(wqkv) must equal concat(d/d(wq), d/d(wk), d/d(wv)) and the
    forward losses must agree — fused training is the same optimization
    problem in a different parameter layout."""
    p = _params()
    pf = fuse_dit_gemms(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    t = jnp.array([100, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 32))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16))

    def loss(params):
        out = dit_apply(params, CFG, x, t, ctx, compute_dtype=jnp.float32)
        return jnp.mean((out - tgt) ** 2)

    l_u, g_u = jax.value_and_grad(loss)(p)
    l_f, g_f = jax.value_and_grad(loss)(pf)
    np.testing.assert_allclose(float(l_u), float(l_f), rtol=1e-6)

    att_u, att_f = g_u["blocks"]["attention"], g_f["blocks"]["attention"]
    cat = np.concatenate([np.asarray(att_u["wq"]["w"]),
                          np.asarray(att_u["wk"]["w"]),
                          np.asarray(att_u["wv"]["w"])], axis=-1)
    np.testing.assert_allclose(np.asarray(att_f["wqkv"]["w"]), cat,
                               rtol=1e-5, atol=1e-6)
    ffn_u, ffn_f = g_u["blocks"]["feed_forward"], g_f["blocks"]["feed_forward"]
    cat13 = np.concatenate([np.asarray(ffn_u["w1"]["w"]),
                            np.asarray(ffn_u["w3"]["w"])], axis=-1)
    np.testing.assert_allclose(np.asarray(ffn_f["w13"]["w"]), cat13,
                               rtol=1e-5, atol=1e-6)


def test_fused_train_step_runs_and_matches_loss():
    """make_train_step over fused params: losses track the unfused run for a
    couple of steps (AdamW on the concatenated tensors is NOT bitwise equal —
    the global grad-norm clip and per-tensor moments see different trees —
    but step-0 loss is identical and step-1 stays close)."""
    import optax
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.train.optim import make_optimizer
    from maa3_tpu.train.step import create_train_state, make_train_step

    cfg = DiTConfig(in_channels=4, context_dim=32, hidden_size=64, depth=3,
                    num_heads=4, max_len=64, qk_norm=True, multiple_of=16)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    key = jax.random.PRNGKey(5)
    p = unfreeze_zero_init(dit_init(key, cfg), key)
    vae_p = vae_init(jax.random.PRNGKey(9), vae_cfg)
    batch = {
        "mel": jax.random.normal(jax.random.PRNGKey(4), (2, 8, 32)),
        "context": jax.random.normal(jax.random.PRNGKey(5), (2, 9, 32)),
    }

    losses = {}
    for name, dit_p in (("unfused", p), ("fused", fuse_dit_gemms(p))):
        optimizer = make_optimizer()
        state = create_train_state({"dit": dit_p}, {"vae": vae_p}, optimizer)
        step = jax.jit(make_train_step(cfg, vae_cfg, optimizer,
                                       compute_dtype=jnp.float32))
        ls = []
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(7))
            ls.append(float(m["loss"]))
        losses[name] = ls
    np.testing.assert_allclose(losses["fused"][0], losses["unfused"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(losses["fused"][1], losses["unfused"][1],
                               rtol=1e-3)


def test_fused_param_specs_cover():
    """dit_param_specs must give the fused tensors column specs (not raise
    the coverage guard, not silently replicate)."""
    from maa3_tpu.parallel.mesh import dit_param_specs
    from jax.sharding import PartitionSpec as P

    pf = fuse_dit_gemms(_params())
    specs = dit_param_specs(pf)
    assert specs["blocks"]["attention"]["wqkv"]["w"] == P(None, None, "model")
    assert specs["blocks"]["feed_forward"]["w13"]["w"] == P(None, None, "model")


def test_trainer_fuse_gemms_fit_and_sync(tmp_path):
    """Trainer(fuse_gemms=True): fit runs on the fused layout; after
    sync_system_params the system gets canonical unfused params and can
    serve (serving_dit re-fuses its own copy)."""
    from tests.test_train import _batches, _tiny_system

    system = _tiny_system(tmp_path)
    from maa3_tpu.train.loop import Trainer

    tr = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ck"),
                 log_every=1000, ckpt_every=10**6, fuse_gemms=True)
    assert "wqkv" in tr.state.params["dit"]["blocks"]["attention"]
    tr.fit(_batches(3, bs=8), max_steps=3)
    tr.sync_system_params()
    att = system.params["dit"]["blocks"]["attention"]
    assert "wq" in att and "wqkv" not in att
    p = system.serving_dit()
    assert p is not None


def test_trainer_fuse_gemms_rejects_tp(tmp_path):
    from tests.test_train import _tiny_system
    import pytest
    from maa3_tpu.train.loop import Trainer

    system = _tiny_system(tmp_path)
    with pytest.raises(ValueError, match="model-parallel"):
        Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ck"),
                n_model=2, fuse_gemms=True)
