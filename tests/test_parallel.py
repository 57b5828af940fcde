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


@requires_8
def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


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
