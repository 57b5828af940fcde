"""int8 w8a8 serving-quant tests (ops/quant.py).

The reference has no quantized serving path; this is a TPU-native extension
(v5e int8 MXU runs 2x bf16). These tests pin the quantization math and the
end-to-end dispatch through dense()/the planned sampler on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.ops.basic import dense
from maa3_tpu.ops.quant import (dense_w8a8, quantize_dit_serving,
                                quantize_weight_int8)


def test_weight_quant_roundtrip_error():
    """Per-channel symmetric quant: dequantized weight within scale/2 of the
    original, and each channel's max hits +/-127 exactly."""
    w = np.random.default_rng(0).normal(size=(64, 48)).astype(np.float32)
    q = quantize_weight_int8(jnp.asarray(w))
    assert q["w_q"].dtype == jnp.int8 and q["w_q"].shape == (64, 48)
    assert q["w_scale"].shape == (48,)
    deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["w_scale"])
    np.testing.assert_allclose(deq, w, atol=float(np.max(np.abs(w))) / 127 * 0.51)
    assert (np.abs(np.asarray(q["w_q"])).max(axis=0) == 127).all()


def test_weight_quant_stacked_depth_axis():
    w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 16, 8)),
                    jnp.float32)
    q = quantize_weight_int8(w)
    assert q["w_q"].shape == (3, 16, 8) and q["w_scale"].shape == (3, 8)
    # per (depth, channel) independence: matches quantizing each slice alone
    q0 = quantize_weight_int8(w[1])
    np.testing.assert_array_equal(np.asarray(q["w_q"][1]), np.asarray(q0["w_q"]))


def test_dense_w8a8_approximates_dense():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 64)), jnp.float32)
    exact = np.asarray(dense({"w": w}, x))
    q = quantize_weight_int8(w)
    approx = np.asarray(dense_w8a8(q, x))
    # w8a8 with per-token/per-channel scales: ~1% relative error at K=96
    rel = np.abs(approx - exact).mean() / np.abs(exact).mean()
    assert rel < 0.02, f"w8a8 rel err {rel:.4f}"


def test_grouped_quant_layout_and_error():
    """group_size splits the in-axis: (G, gs, out) weights with (G, out)
    scales, and the grouped path must be strictly MORE accurate than the
    ungrouped one on the same data (finer scales on both sides)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 128)), jnp.float32)
    # heavy-tailed weights: per-group scales matter
    w = jnp.asarray(rng.standard_t(df=3, size=(128, 64)), jnp.float32)
    exact = np.asarray(dense({"w": w}, x))
    q_flat = quantize_weight_int8(w)
    q_grp = quantize_weight_int8(w, group_size=32)
    assert q_grp["w_q"].shape == (4, 32, 64)
    assert q_grp["w_scale"].shape == (4, 64)
    err_flat = np.abs(np.asarray(dense_w8a8(q_flat, x)) - exact).mean()
    err_grp = np.abs(np.asarray(dense_w8a8(q_grp, x)) - exact).mean()
    assert err_grp < err_flat, (err_grp, err_flat)
    # grouped dequant reconstructs w within each group's scale/2
    deq = (np.asarray(q_grp["w_q"], np.float32)
           * np.asarray(q_grp["w_scale"])[:, None, :]).reshape(128, 64)
    assert np.abs(deq - np.asarray(w)).max() <= float(
        np.abs(np.asarray(w)).max()) / 127 * 0.51


def test_grouped_quant_stacked_depth_axis():
    w = jnp.asarray(np.random.default_rng(8).normal(size=(3, 64, 8)),
                    jnp.float32)
    q = quantize_weight_int8(w, group_size=16)
    assert q["w_q"].shape == (3, 4, 16, 8)
    assert q["w_scale"].shape == (3, 4, 8)
    q1 = quantize_weight_int8(w[1], group_size=16)
    np.testing.assert_array_equal(np.asarray(q["w_q"][1]),
                                  np.asarray(q1["w_q"]))


def test_quantize_dit_serving_variants():
    """int8 variant knobs: skip_w2 leaves the down-projection float;
    group_size produces grouped tensors at every quantized site."""
    from maa3_tpu.models.dit import DiTConfig, dit_init
    from maa3_tpu.utils.nprand import fuse_dit_gemms

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=2,
                    num_heads=2, max_len=32)
    params = fuse_dit_gemms(dit_init(jax.random.PRNGKey(5), cfg))
    q = quantize_dit_serving(params, skip_w2=True)
    assert "w" in q["blocks"]["feed_forward"]["w2"]          # stays float
    assert q["blocks"]["feed_forward"]["w13"]["w_q"].dtype == jnp.int8
    qg = quantize_dit_serving(params, group_size=32)
    # stacked depth 2, hidden 64 -> wqkv w_q (2, G=2, 32, out)
    assert qg["blocks"]["attention"]["wqkv"]["w_q"].shape[:3] == (2, 2, 32)


def test_system_quant_mode_variants():
    from maa3_tpu.system import _parse_quant_mode
    assert _parse_quant_mode("int8") == (0, False, False, False)
    assert _parse_quant_mode("int8:g128") == (128, False, False, False)
    assert _parse_quant_mode("int8:now2") == (0, True, False, False)
    assert _parse_quant_mode("int8:g64,now2") == (64, True, False, False)
    assert _parse_quant_mode("int8:voc") == (0, False, True, False)
    assert _parse_quant_mode("int8:smooth") == (0, False, False, True)
    assert _parse_quant_mode("int8:g128,now2,voc,smooth") == (
        128, True, True, True)
    for bad in ("int4", "int8:g", "int8:xyz"):
        try:
            _parse_quant_mode(bad)
            assert False, bad
        except ValueError:
            pass


def test_dense_dispatches_on_quantized_params():
    """dense() must route a {"w_q","w_scale"} dict to the int8 path so call
    sites (attention/ffn) stay mode-agnostic."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 24)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(24, 16)), jnp.float32)
    q = quantize_weight_int8(w)
    np.testing.assert_array_equal(np.asarray(dense(q, x)),
                                  np.asarray(dense_w8a8(q, x)))
    out = dense(q, x, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16


def test_quantized_dit_planned_sampler_close_to_fp32():
    """End-to-end: fuse + int8-quantize a small DiT and run the planned CFG
    sampler; the trajectory must stay close to the fp32 one (8-bit error at
    toy scale compounds over steps — gate loosely on relative error)."""
    from maa3_tpu.diffusion import cfm
    from maa3_tpu.models.dit import (DiTConfig, dit_apply, dit_init,
                                     dit_apply_planned, dit_sample_plan)
    from maa3_tpu.utils.nprand import fuse_dit_gemms, unfreeze_zero_init

    cfg = DiTConfig(in_channels=6, context_dim=32, hidden_size=64, depth=3,
                    num_heads=4, max_len=64, qk_norm=True)
    key = jax.random.PRNGKey(11)
    params = unfreeze_zero_init(dit_init(key, cfg), key)

    b, tlen, steps = 2, 16, 6
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, 6, tlen))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 9, 32))
    uc = jnp.zeros_like(ctx)

    def vel(x, t_int, context):
        return dit_apply(params, cfg, x, t_int, context,
                         compute_dtype=jnp.float32)

    z_fp32 = np.asarray(cfm.sample_cfg(vel, x0, ctx, uc, 3.0, steps=steps))

    qparams = quantize_dit_serving(fuse_dit_gemms(params))
    assert qparams["blocks"]["attention"]["wqkv"]["w_q"].dtype == jnp.int8
    assert qparams["blocks"]["feed_forward"]["w13"]["w_q"].dtype == jnp.int8
    assert qparams["blocks"]["feed_forward"]["w2"]["w_q"].dtype == jnp.int8
    assert "w" in qparams["blocks"]["attention"]["wo"]  # wo stays float

    ctx_in = jnp.concatenate([uc, ctx], axis=0)
    plan = dit_sample_plan(qparams, cfg, cfm.planned_t_ints(steps), ctx_in,
                           compute_dtype=jnp.float32)

    def step_vel(x_in, xs):
        mods, final = xs
        return dit_apply_planned(qparams, cfg, x_in, mods, final,
                                 plan["yk"], plan["yv"],
                                 compute_dtype=jnp.float32)

    z_int8 = np.asarray(cfm.sample_cfg_planned(
        step_vel, x0, (plan["mods"], plan["final"]), 3.0, steps=steps))
    rel = np.abs(z_int8 - z_fp32).mean() / (np.abs(z_fp32).mean() + 1e-8)
    assert np.isfinite(z_int8).all()
    assert rel < 0.15, f"int8 trajectory rel err {rel:.4f}"


def test_system_serving_quant_mode():
    """set_serving_quant("int8") rebuilds the serving copy with quantized hot
    GEMMs and bf16 leftovers; switching back restores the float path."""
    from maa3_tpu.config import ModelSpec
    from maa3_tpu.models.dit import DiTConfig, dit_init
    from maa3_tpu.models.vae1d import VAEConfig
    from maa3_tpu.system import MAA3System

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=32, depth=2,
                    num_heads=2, max_len=32)
    spec = ModelSpec(kind="cfm", backbone_kind="text_dit", dit=cfg,
                     vae=VAEConfig(in_channels=8, out_ch=8, ch=32,
                                   ch_mult=(1, 2), num_res_blocks=1,
                                   down_layers=(0,), kernel_size=5,
                                   z_channels=4, embed_dim=4),
                     cond_kind="clap_flan", cond_params_cfg={},
                     mel_dim=4, mel_length=16)
    params = {"dit": dit_init(jax.random.PRNGKey(0), cfg)}
    sys = MAA3System(spec, params, compute_dtype=jnp.bfloat16)

    sys.set_serving_quant("int8")
    p = sys.serving_dit()
    assert p["blocks"]["attention"]["wqkv"]["w_q"].dtype == jnp.int8
    assert p["blocks"]["attention"]["wo"]["w"].dtype == jnp.bfloat16

    sys.set_serving_quant(None)
    p2 = sys.serving_dit()
    assert "w" in p2["blocks"]["attention"]["wqkv"]

    try:
        sys.set_serving_quant("int4")
        assert False, "expected ValueError"
    except ValueError:
        pass
