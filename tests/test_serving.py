"""Serving-path tests: batch-data-parallel CFG sampling over the mesh and
bf16 weight-storage equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
from maa3_tpu.diffusion import cfm
from maa3_tpu.parallel.mesh import make_mesh, batch_sharding, replicated

CFG = DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=2,
                num_heads=4, max_len=64)


def _nonzero_params(key):
    params = dit_init(key, CFG)
    params["final_layer"]["linear"]["w"] = 0.1 * jax.random.normal(
        key, params["final_layer"]["linear"]["w"].shape)
    return params


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_batch_parallel_sampling_matches_single_device():
    """CFG sampling with the batch sharded over 'data' must equal the
    unsharded result — serving scales across chips without drift."""
    key = jax.random.PRNGKey(0)
    params = _nonzero_params(key)
    b = 8
    x0 = jax.random.normal(key, (b, 4, 16))
    ctx = jax.random.normal(key, (b, 5, 16))
    uc = jnp.zeros_like(ctx)

    def vel(p):
        return lambda x, t, c: dit_apply(p, CFG, x, t, c,
                                         compute_dtype=jnp.float32)

    ref = cfm.sample_cfg(vel(params), x0, ctx, uc, 3.0, steps=5)

    mesh = make_mesh(8, 1)
    ps = jax.device_put(params, replicated(mesh))
    xs = jax.device_put(x0, batch_sharding(mesh, 3))
    cs = jax.device_put(ctx, batch_sharding(mesh, 3))
    us = jax.device_put(uc, batch_sharding(mesh, 3))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x, c, u: cfm.sample_cfg(vel(p), x, c, u, 3.0,
                                                        steps=5))(ps, xs, cs, us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_bf16_weight_cast_close_to_fp32():
    from maa3_tpu.utils.nprand import cast_matmul_weights
    key = jax.random.PRNGKey(1)
    params = _nonzero_params(key)
    x = jax.random.normal(key, (2, 4, 16))
    t = jnp.array([100, 600])
    ctx = jax.random.normal(key, (2, 5, 16))
    ref = dit_apply(params, CFG, x, t, ctx, compute_dtype=jnp.bfloat16)
    p16 = cast_matmul_weights(params, jnp.bfloat16)
    # norm weights / biases / gates stay fp32
    assert p16["blocks"]["attention_norm"]["weight"].dtype == jnp.float32
    assert p16["blocks"]["attention"]["wq"]["w"].dtype == jnp.bfloat16
    out = dit_apply(p16, CFG, x, t, ctx, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0.05,
                               atol=0.05)


def test_system_sample_uncond_path():
    """MAA3System.sample (no CFG; CFM.sample equivalent) runs and differs
    from sample_cfg at scale>1."""
    from maa3_tpu.config import ModelSpec
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.system import MAA3System

    spec = ModelSpec(kind="cfm", backbone_kind="text_dit", dit=CFG,
                     vae=VAEConfig(in_channels=8, out_ch=8, ch=32,
                                   ch_mult=(1, 2), num_res_blocks=1,
                                   down_layers=(0,), kernel_size=5,
                                   z_channels=4, embed_dim=4),
                     cond_kind="clap_flan", cond_params_cfg={},
                     mel_dim=4, mel_length=16)
    key = jax.random.PRNGKey(0)
    dit_params = _nonzero_params(key)
    # at init the model is provably context-free: adaLN gates AND cross-attn
    # gates are zero-init. Un-zero both so conditioning flows.
    dit_params["blocks"]["attention"]["gate"] = jnp.ones_like(
        dit_params["blocks"]["attention"]["gate"])
    dit_params["blocks"]["adaLN"]["w"] = 0.1 * jax.random.normal(
        key, dit_params["blocks"]["adaLN"]["w"].shape)
    params = {"dit": dit_params, "vae": vae_init(key, spec.vae)}
    system = MAA3System(spec, params, compute_dtype=jnp.float32)
    ctx = jax.random.normal(key, (2, 5, 16))
    z = system.sample(ctx, key, timesteps=4)
    assert z.shape == (2, 4, 16)
    z_cfg = system.sample_cfg(ctx, 3.0, jnp.zeros_like(ctx), key, timesteps=4)
    assert float(jnp.abs(z - z_cfg).max()) > 1e-5


def test_system_serving_dit_fuses_lazily():
    """system.sample_cfg consumes a fused+bf16 copy; canonical params stay
    unfused (the bench fast path is the product fast path)."""
    from maa3_tpu.config import ModelSpec
    from maa3_tpu.system import MAA3System

    spec = ModelSpec(kind="cfm", backbone_kind="text_dit", dit=CFG,
                     vae=None, cond_kind="clap_flan", cond_params_cfg={},
                     mel_dim=4, mel_length=16)
    key = jax.random.PRNGKey(0)
    sys_ = MAA3System(spec, {"dit": _nonzero_params(key)},
                      compute_dtype=jnp.bfloat16)
    sp = sys_.serving_dit()
    assert "wqkv" in sp["blocks"]["attention"]
    assert "wq" not in sp["blocks"]["attention"]
    assert sp["blocks"]["attention"]["wqkv"]["w"].dtype == jnp.bfloat16
    # canonical params untouched
    assert "wq" in sys_.params["dit"]["blocks"]["attention"]
    assert sys_.params["dit"]["blocks"]["attention"]["wq"]["w"].dtype == jnp.float32

    ctx = jax.random.normal(key, (1, 5, 16))
    z = sys_.sample_cfg(ctx, 3.0, jnp.zeros_like(ctx), jax.random.PRNGKey(1),
                        timesteps=3)
    assert z.shape == (1, 4, 16) and bool(jnp.isfinite(z).all())

    # fp32 parity mode keeps the exact unfused weights
    sys32 = MAA3System(spec, {"dit": _nonzero_params(key)},
                       compute_dtype=jnp.float32)
    assert "wq" in sys32.serving_dit()["blocks"]["attention"]
