"""SmoothQuant scale migration (ops/quant.py::smooth_migrate_dit).

The fold must be EXACT in fp32 (pure reparameterization: x/s into norms and
adaLN shifts, s into GEMM input rows, SwiGLU-product scaling via w3 output
columns) and must reduce int8 per-token quantization error when activations
carry per-channel outliers — the regime DRIFT_R03's per-channel mode loses
accuracy in."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.diffusion import cfm
from maa3_tpu.models.dit import (DiTConfig, dit_apply_planned, dit_init,
                                 dit_sample_plan)
from maa3_tpu.ops.quant import (calibrate_dit_smooth, quantize_dit_serving,
                                smooth_migrate_dit)
from maa3_tpu.utils.nprand import fuse_dit_gemms, unfreeze_zero_init

CFG = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=2,
                num_heads=4, max_len=64)


def _setup(outliers=False, fused=False):
    key = jax.random.PRNGKey(0)
    params = unfreeze_zero_init(dit_init(key, CFG), key)
    if outliers:
        # inject per-channel activation outliers: blow up a few norm-weight
        # channels so the wqkv/w13 inputs have a 50x dynamic-range spread
        blocks = dict(params["blocks"])
        for nk in ("attention_norm", "ffn_norm"):
            w = np.array(blocks[nk]["weight"])
            w[:, ::13] *= 50.0
            blocks[nk] = {"weight": jnp.asarray(w)}
        params = {**params, "blocks": blocks}
    if fused:
        params = fuse_dit_gemms(params)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 24), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16), jnp.float32)
    uc = jnp.zeros_like(ctx)
    return params, x0[:1], ctx, uc


def _planned_forward(params, x, ctx, uc, dtype=jnp.float32):
    ctx_in = jnp.concatenate([uc, ctx], axis=0)
    plan = dit_sample_plan(params, CFG, cfm.planned_t_ints(5), ctx_in,
                           compute_dtype=dtype)
    x_in = jnp.concatenate([x, x], axis=0)
    return dit_apply_planned(params, CFG, x_in, plan["mods"][0],
                             plan["final"][0], plan["yk"], plan["yv"],
                             compute_dtype=dtype)


def test_calibrate_shapes():
    params, x0, ctx, uc = _setup()
    stats = calibrate_dit_smooth(params, CFG, x0, ctx, uc, steps=4,
                                 compute_dtype=jnp.float32)
    assert stats["attn_in"].shape == (2, 64)
    assert stats["ffn_in"].shape == (2, 64)
    assert stats["ffn_prod"].shape[0] == 2
    assert (stats["attn_in"] > 0).all()


def _fold_exactness(fused):
    params, x0, ctx, uc = _setup(outliers=True, fused=fused)
    stats = calibrate_dit_smooth(params, CFG, x0, ctx, uc, steps=4,
                                 compute_dtype=jnp.float32)
    folded = smooth_migrate_dit(params, stats)
    ref = np.asarray(_planned_forward(params, x0, ctx, uc))
    got = np.asarray(_planned_forward(folded, x0, ctx, uc))
    # pure reparameterization: fp32-exact up to association rounding
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_fold_exact_unfused():
    _fold_exactness(fused=False)


def test_fold_exact_fused():
    _fold_exactness(fused=True)


def test_smooth_reduces_int8_error_on_outliers():
    params, x0, ctx, uc = _setup(outliers=True, fused=True)
    stats = calibrate_dit_smooth(params, CFG, x0, ctx, uc, steps=4,
                                 compute_dtype=jnp.float32)
    ref = np.asarray(_planned_forward(params, x0, ctx, uc))

    q_plain = quantize_dit_serving(params)
    err_plain = np.abs(np.asarray(
        _planned_forward(q_plain, x0, ctx, uc)) - ref).mean()

    q_smooth = quantize_dit_serving(smooth_migrate_dit(params, stats))
    err_smooth = np.abs(np.asarray(
        _planned_forward(q_smooth, x0, ctx, uc)) - ref).mean()

    assert err_smooth < err_plain * 0.7, (err_smooth, err_plain)


def test_smooth_harmless_without_outliers():
    """On benign activations the migration must not make things worse."""
    params, x0, ctx, uc = _setup(outliers=False, fused=True)
    stats = calibrate_dit_smooth(params, CFG, x0, ctx, uc, steps=4,
                                 compute_dtype=jnp.float32)
    ref = np.asarray(_planned_forward(params, x0, ctx, uc))
    err_plain = np.abs(np.asarray(_planned_forward(
        quantize_dit_serving(params), x0, ctx, uc)) - ref).mean()
    err_smooth = np.abs(np.asarray(_planned_forward(
        quantize_dit_serving(smooth_migrate_dit(params, stats)),
        x0, ctx, uc)) - ref).mean()
    assert err_smooth < err_plain * 1.5, (err_smooth, err_plain)
