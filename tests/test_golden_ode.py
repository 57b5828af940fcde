"""Golden-vector regression for the full 25-step CFG ODE (SURVEY §4 plan).

Frozen output of a fixed-seed tiny DiT through the complete sampler. If this
moves, sampling semantics changed (interpolant, timestep mapping, CFG
combination, scan order, RoPE, adaLN, ...). Regenerate ONLY for intentional
semantic changes (see the generator snippet in git history).
"""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
from maa3_tpu.diffusion import cfm

GOLDEN_NORM = 6.980819225311279
GOLDEN_HEAD = [0.489265, 1.52172, 0.397204, -0.008802, -1.452585]


def test_golden_25step_cfg_ode():
    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=32, depth=2,
                    num_heads=4, max_len=64, multiple_of=16)
    params = dit_init(jax.random.PRNGKey(42), cfg)
    params["final_layer"]["linear"]["w"] = 0.05 * jax.random.normal(
        jax.random.PRNGKey(43), params["final_layer"]["linear"]["w"].shape)
    x0 = jax.random.normal(jax.random.PRNGKey(44), (1, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(45), (1, 5, 16))
    uc = jnp.zeros_like(ctx)

    def vel(x, t, c):
        return dit_apply(params, cfg, x, t, c, compute_dtype=jnp.float32)

    z = np.asarray(cfm.sample_cfg(vel, x0, ctx, uc, 3.0, steps=25))
    np.testing.assert_allclose(float(np.linalg.norm(z)), GOLDEN_NORM,
                               rtol=1e-4)
    np.testing.assert_allclose(z[0, 0, :5], GOLDEN_HEAD, rtol=1e-3, atol=1e-4)
