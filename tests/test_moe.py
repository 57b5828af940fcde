"""MoE (time-bucket + freq-slice) parity vs a naive masked-loop oracle
implementing the reference semantics (flag_large_dit_moe.py:493-538)."""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.dit_moe import (
    MoEDiTConfig, moe_init, moe_apply, moe_dit_init, moe_dit_apply)
from maa3_tpu.ops.ffn import swiglu_hidden_dim


def _silu(x):
    return x / (1 + np.exp(-x))


def _naive_moe(params, x, t, cfg):
    """Reference semantics: loop over experts with boolean masks."""
    b, l, d = x.shape
    E = cfg.num_experts
    te = jax.tree.map(np.asarray, params["time_experts"])
    fe = jax.tree.map(np.asarray, params["freq_experts"])

    # time-MoE: token of sample b -> expert t_b // 250
    y = np.zeros_like(x)
    idx = np.clip(np.asarray(t) // cfg.time_bucket, 0, E - 1)
    for e in range(E):
        sel = idx == e
        if not sel.any():
            continue
        xe = x[sel]  # (n, l, d)
        h = _silu(xe @ te["w1"]["w"][e]) * (xe @ te["w3"]["w"][e])
        y[sel] = h @ te["w2"]["w"][e]

    # freq-MoE: z[..., slice_e] = FFN_e(y * mask_e)[..., slice_e]
    z = np.zeros_like(y)
    sl = d // E
    for e in range(E):
        masked = np.zeros_like(y)
        masked[:, :, e * sl:(e + 1) * sl] = y[:, :, e * sl:(e + 1) * sl]
        h = _silu(masked @ fe["w1"]["w"][e]) * (masked @ fe["w3"]["w"][e])
        out = h @ fe["w2"]["w"][e]
        z[:, :, e * sl:(e + 1) * sl] = out[:, :, e * sl:(e + 1) * sl]
    return z


def test_moe_parity_vs_naive():
    cfg = MoEDiTConfig(hidden_size=32, num_heads=4, num_experts=4,
                       multiple_of=16)
    params = moe_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(5, 7, 32).astype(np.float32)
    t = np.array([0, 249, 250, 600, 999])
    ours = moe_apply(params, jnp.asarray(x), jnp.asarray(t), cfg,
                     compute_dtype=jnp.float32)
    ref = _naive_moe(params, x, t, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_moe_dit_forward():
    cfg = MoEDiTConfig(in_channels=4, context_dim=24, hidden_size=32,
                       depth=2, num_heads=4, num_experts=4, multiple_of=16)
    params = moe_dit_init(jax.random.PRNGKey(1), cfg)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (2, 4, 16))
    t = jnp.array([100, 800])
    ctx = jax.random.normal(key, (2, 40, 24))  # 40 video frames
    out = moe_dit_apply(params, cfg, x, t, ctx, compute_dtype=jnp.float32)
    assert out.shape == (2, 4, 16)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init


def test_moe_time_bucket_routing_differs():
    """Different timestep buckets must produce different outputs."""
    cfg = MoEDiTConfig(hidden_size=32, num_heads=4, num_experts=4,
                       multiple_of=16)
    params = moe_init(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 7, 32))
    o1 = moe_apply(params, x, jnp.array([0]), cfg, compute_dtype=jnp.float32)
    o2 = moe_apply(params, x, jnp.array([999]), cfg, compute_dtype=jnp.float32)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4


def test_moe_planned_sampling_matches_plain():
    """moe_dit_sample_plan + moe_dit_apply_planned must reproduce the plain
    CFG sampling exactly (all samples share each step's timestep)."""
    from maa3_tpu.models.dit_moe import (moe_dit_init, moe_dit_apply,
                                         moe_dit_sample_plan,
                                         moe_dit_apply_planned)
    from maa3_tpu.diffusion import cfm

    cfg = MoEDiTConfig(in_channels=4, context_dim=24, hidden_size=32,
                       depth=2, num_heads=4, num_experts=4, max_len=64)
    key = jax.random.PRNGKey(3)
    params = moe_dit_init(key, cfg)
    params["final_layer"]["linear"]["w"] = (
        0.02 * jax.random.normal(key, params["final_layer"]["linear"]["w"].shape))
    params["blocks"]["attention"]["gate"] = (
        0.5 * jnp.ones_like(params["blocks"]["attention"]["gate"]))

    b, tlen, steps = 2, 8, 6
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 4, tlen))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 5, 24))
    uc = jnp.zeros_like(ctx)

    def vel(x, t_int, context):
        return moe_dit_apply(params, cfg, x, t_int, context,
                             compute_dtype=jnp.float32)

    z_plain = cfm.sample_cfg(vel, x0, ctx, uc, 3.0, steps=steps)

    ctx_in = jnp.concatenate([uc, ctx], axis=0)
    plan = moe_dit_sample_plan(params, cfg, cfm.planned_t_ints(steps), ctx_in,
                               compute_dtype=jnp.float32)

    def step_vel(x_in, xs):
        mods, final_mod, tidx = xs
        return moe_dit_apply_planned(params, cfg, x_in, mods, final_mod, tidx,
                                     plan["yk"], plan["yv"],
                                     plan["freq_sliced"],
                                     compute_dtype=jnp.float32)

    z_planned = cfm.sample_cfg_planned(
        step_vel, x0, (plan["mods"], plan["final"], plan["tidx"]), 3.0,
        steps=steps)
    np.testing.assert_allclose(np.asarray(z_planned), np.asarray(z_plain),
                               rtol=2e-5, atol=2e-5)
