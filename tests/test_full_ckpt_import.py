"""End-to-end checkpoint import: synthetic PyTorch-Lightning state_dict with
the reference's exact key naming -> torch .ckpt file -> MAA3System.from_config
-> generation runs and uses the imported weights."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import torch
import yaml

from maa3_tpu.system import MAA3System


def _t(shape):
    g = torch.Generator().manual_seed(sum(shape))
    return torch.randn(*shape, generator=g)


def _build_state_dict(hidden=64, depth=2, heads=4, ctx_dim=1024, in_ch=20,
                      vae_ch=32):
    """Reference PL naming (SURVEY §5): model.diffusion_model.*,
    first_stage_model.*, scale_factor."""
    sd = {}
    p = "model.diffusion_model."
    sd[p + "proj_in.weight"] = _t((hidden, in_ch))
    sd[p + "proj_in.bias"] = _t((hidden,))
    sd[p + "t_embedder.mlp.0.weight"] = _t((hidden, 256))
    sd[p + "t_embedder.mlp.0.bias"] = _t((hidden,))
    sd[p + "t_embedder.mlp.2.weight"] = _t((hidden, hidden))
    sd[p + "t_embedder.mlp.2.bias"] = _t((hidden,))
    sd[p + "cap_embedder.0.weight"] = _t((ctx_dim,))
    sd[p + "cap_embedder.0.bias"] = _t((ctx_dim,))
    sd[p + "cap_embedder.1.weight"] = _t((hidden, ctx_dim))
    sd[p + "cap_embedder.1.bias"] = _t((hidden,))
    ffn_h = 256 * (((2 * 4 * hidden // 3) + 255) // 256)
    for i in range(depth):
        b = p + f"blocks.{i}."
        sd[b + "attention.wq.weight"] = _t((hidden, hidden)) * 0.05
        sd[b + "attention.wk.weight"] = _t((hidden, hidden)) * 0.05
        sd[b + "attention.wv.weight"] = _t((hidden, hidden)) * 0.05
        sd[b + "attention.wo.weight"] = _t((hidden, hidden)) * 0.05
        sd[b + "attention.wk_y.weight"] = _t((hidden, ctx_dim)) * 0.05
        sd[b + "attention.wv_y.weight"] = _t((hidden, ctx_dim)) * 0.05
        sd[b + "attention.gate"] = _t((heads,))
        sd[b + "feed_forward.w1.weight"] = _t((ffn_h, hidden)) * 0.05
        sd[b + "feed_forward.w2.weight"] = _t((hidden, ffn_h)) * 0.05
        sd[b + "feed_forward.w3.weight"] = _t((ffn_h, hidden)) * 0.05
        sd[b + "attention_norm.weight"] = torch.ones(hidden)
        sd[b + "ffn_norm.weight"] = torch.ones(hidden)
        sd[b + "attention_y_norm.weight"] = torch.ones(ctx_dim)
        sd[b + "adaLN_modulation.1.weight"] = _t((6 * hidden, hidden)) * 0.01
        sd[b + "adaLN_modulation.1.bias"] = torch.zeros(6 * hidden)
    sd[p + "final_layer.linear.weight"] = _t((in_ch, hidden)) * 0.05
    sd[p + "final_layer.linear.bias"] = torch.zeros(in_ch)
    sd[p + "final_layer.adaLN_modulation.1.weight"] = _t((2 * hidden, hidden)) * 0.01
    sd[p + "final_layer.adaLN_modulation.1.bias"] = torch.zeros(2 * hidden)

    # minimal VAE (ch_mult (1,2), 1 res block, k5 enc / k3 dec) with the
    # reference naming
    v = "first_stage_model."
    def conv(name, cout, cin, k):
        sd[v + name + ".weight"] = _t((cout, cin, k)) * 0.05
        sd[v + name + ".bias"] = torch.zeros(cout)
    def gn(name, c):
        sd[v + name + ".weight"] = torch.ones(c)
        sd[v + name + ".bias"] = torch.zeros(c)
    c = vae_ch
    conv("encoder.conv_in", c, 80, 5)
    gn("encoder.down.0.block.0.norm1", c); conv("encoder.down.0.block.0.conv1", c, c, 5)
    gn("encoder.down.0.block.0.norm2", c); conv("encoder.down.0.block.0.conv2", c, c, 5)
    conv("encoder.down.0.downsample.conv", c, c, 3)
    gn("encoder.down.1.block.0.norm1", c); conv("encoder.down.1.block.0.conv1", 2 * c, c, 5)
    gn("encoder.down.1.block.0.norm2", 2 * c); conv("encoder.down.1.block.0.conv2", 2 * c, 2 * c, 5)
    sd[v + "encoder.down.1.block.0.nin_shortcut.weight"] = _t((2 * c, c, 1)) * 0.05
    sd[v + "encoder.down.1.block.0.nin_shortcut.bias"] = torch.zeros(2 * c)
    for blk in ("encoder.mid.block_1", "encoder.mid.block_2"):
        gn(blk + ".norm1", 2 * c); conv(blk + ".conv1", 2 * c, 2 * c, 5)
        gn(blk + ".norm2", 2 * c); conv(blk + ".conv2", 2 * c, 2 * c, 5)
    gn("encoder.mid.attn_1.norm", 2 * c)
    for nm in ("q", "k", "v", "proj_out"):
        conv(f"encoder.mid.attn_1.{nm}", 2 * c, 2 * c, 1)
    gn("encoder.norm_out", 2 * c)
    conv("encoder.conv_out", 8, 2 * c, 5)       # 2*z (z=4)
    conv("quant_conv", 8, 8, 1)
    conv("post_quant_conv", 4, 4, 1)
    conv("decoder.conv_in", 2 * c, 4, 5)
    for blk in ("decoder.mid.block_1", "decoder.mid.block_2"):
        gn(blk + ".norm1", 2 * c); conv(blk + ".conv1", 2 * c, 2 * c, 3)
        gn(blk + ".norm2", 2 * c); conv(blk + ".conv2", 2 * c, 2 * c, 3)
    gn("decoder.mid.attn_1.norm", 2 * c)
    for nm in ("q", "k", "v", "proj_out"):
        conv(f"decoder.mid.attn_1.{nm}", 2 * c, 2 * c, 1)
    # up level 1 (2 blocks + upsample), level 0 (2 blocks)
    gn("decoder.up.1.block.0.norm1", 2 * c); conv("decoder.up.1.block.0.conv1", 2 * c, 2 * c, 3)
    gn("decoder.up.1.block.0.norm2", 2 * c); conv("decoder.up.1.block.0.conv2", 2 * c, 2 * c, 3)
    gn("decoder.up.1.block.1.norm1", 2 * c); conv("decoder.up.1.block.1.conv1", 2 * c, 2 * c, 3)
    gn("decoder.up.1.block.1.norm2", 2 * c); conv("decoder.up.1.block.1.conv2", 2 * c, 2 * c, 3)
    conv("decoder.up.1.upsample.conv", 2 * c, 2 * c, 3)
    gn("decoder.up.0.block.0.norm1", 2 * c); conv("decoder.up.0.block.0.conv1", c, 2 * c, 3)
    gn("decoder.up.0.block.0.norm2", c); conv("decoder.up.0.block.0.conv2", c, c, 3)
    sd[v + "decoder.up.0.block.0.nin_shortcut.weight"] = _t((c, 2 * c, 1)) * 0.05
    sd[v + "decoder.up.0.block.0.nin_shortcut.bias"] = torch.zeros(c)
    gn("decoder.up.0.block.1.norm1", c); conv("decoder.up.0.block.1.conv1", c, c, 3)
    gn("decoder.up.0.block.1.norm2", c); conv("decoder.up.0.block.1.conv2", c, c, 3)
    gn("decoder.norm_out", c)
    conv("decoder.conv_out", 80, c, 5)

    sd["scale_factor"] = torch.tensor(0.7)
    return sd


def test_full_lightning_ckpt_import(tmp_path):
    sd = _build_state_dict()
    ckpt_path = str(tmp_path / "model.ckpt")
    torch.save({"state_dict": sd, "global_step": 1234}, ckpt_path)

    cfg = {
        "model": {
            "base_learning_rate": 3e-6,
            "target": "ldm.models.diffusion.cfm1_audio.CFM",
            "params": {
                "timesteps": 1000, "mel_dim": 4, "mel_length": 16,
                "scale_by_std": True, "cond_stage_trainable": True,
                "unet_config": {
                    "target": "ldm.modules.diffusionmodules.flag_large_dit."
                              "TxtFlagLargeImprovedDiTV2",
                    "params": {"in_channels": 20, "context_dim": 1024,
                               "hidden_size": 64, "num_heads": 4, "depth": 2,
                               "max_len": 64}},
                "first_stage_config": {
                    "target": "ldm.models.autoencoder1d.AutoencoderKL",
                    "params": {"embed_dim": 4, "ddconfig": {
                        "double_z": True, "in_channels": 80, "out_ch": 80,
                        "z_channels": 4, "kernel_size": 5, "ch": 32,
                        "ch_mult": [1, 2], "num_res_blocks": 1,
                        "attn_layers": [3], "down_layers": [0]}}},
                "cond_stage_config": {
                    "target": "ldm.modules.encoders.modules."
                              "FrozenCLAPFLANEmbedder",
                    "params": {}},
            },
        }
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    system = MAA3System.from_config([cfg_path], ckpt_path=ckpt_path,
                                    compute_dtype=jnp.float32)
    # scale_factor buffer imported
    assert abs(system.scale_factor - 0.7) < 1e-6
    # weights actually imported (transposed match)
    w = np.asarray(system.params["dit"]["proj_in"]["w"])
    ref = sd["model.diffusion_model.proj_in.weight"].numpy().T
    np.testing.assert_allclose(w, ref, rtol=1e-6)

    # generation runs through imported weights
    ctx = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 1024))
    z = system.sample_cfg(ctx, 3.0, jnp.zeros_like(ctx),
                          jax.random.PRNGKey(1), shape=(1, 20, 16),
                          timesteps=3)
    assert np.isfinite(np.asarray(z)).all()
    # VAE decode through imported weights (z_channels=4)
    mel = system.decode_first_stage(
        jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8)))
    assert mel.shape == (1, 80, 16)
    assert np.isfinite(np.asarray(mel)).all()
