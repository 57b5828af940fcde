"""The Pallas flash-attention kernel wired INTO the DiT (long-context path).

Covers the VERDICT gap "flash kernel unreachable from the model": DiTConfig
selects the kernel (use_flash=True/False, or mode-aware auto: training
from seq 2048, inference past 4096), and a
>1248-frame forward through the full model must match the XLA-SDPA path.
On CPU the kernel runs in Pallas interpreter mode (flash_attention.py picks
interpret automatically off-TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
from maa3_tpu.diffusion import cfm


def _mk(use_flash):
    return DiTConfig(in_channels=4, context_dim=16, hidden_size=64, depth=2,
                     num_heads=4, max_len=2048, use_flash=use_flash)


def test_flash_path_matches_sdpa_long_context():
    cfg_flash, cfg_sdpa = _mk(True), _mk(False)
    params = dit_init(jax.random.PRNGKey(0), cfg_sdpa)
    # > 1248 latent frames: beyond the reference's trained max (collater
    # bucket cap, joinaudiodataset_struct_sample_anylen.py:74-92)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 1300), jnp.float32)
    t = jnp.array([321], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 16), jnp.float32)

    out_flash = dit_apply(params, cfg_flash, x, t, ctx,
                          compute_dtype=jnp.float32)
    out_sdpa = dit_apply(params, cfg_sdpa, x, t, ctx,
                         compute_dtype=jnp.float32)
    err = float(jnp.abs(out_flash - out_sdpa).max())
    assert err < 2e-5, f"flash vs sdpa max err {err:.2e}"


def test_flash_auto_threshold():
    cfg = _mk(None)
    assert not cfg.flash_for_len(312)    # default 10 s clip: fused XLA attn
    # inference: forcing the kernel on end-to-end loses serving throughput
    # at every batch (PROBE_FLASH_E2E.json) — flash auto-routes only where
    # dense stops fitting memory
    assert not cfg.flash_for_len(2048)
    assert cfg.flash_for_len(5000)       # long-context: Pallas kernel
    # training (round 4, maskless fused backward): flash wins the XL e2e
    # step 1.12x at the any-len collate cap (TRAIN_r06 b6 x latent 1248)
    # and 1.9x at 2048 — kernel from seq 1248; production seq 312/624 stay
    # dense (0.8x at 624)
    assert not cfg.flash_for_len(624, training=True)
    assert cfg.flash_for_len(1248, training=True)
    assert cfg.flash_for_len(2048, training=True)

    # the MoE config carries a hand-synced copy of the same threshold
    from maa3_tpu.models.dit_moe import MoEDiTConfig
    moe = MoEDiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                       depth=1, num_heads=2, max_len=8192, multiple_of=16)
    assert not moe.flash_for_len(2048)
    assert moe.flash_for_len(5000)
    assert moe.flash_for_len(1248, training=True)


def test_long_context_generation_through_flash():
    """25-step CFG generation at 1300 frames runs through the kernel."""
    cfg = _mk(True)
    params = dit_init(jax.random.PRNGKey(0), cfg)

    def vel(x, t, c):
        return dit_apply(params, cfg, x, t, c, compute_dtype=jnp.float32)

    x0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 1300), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 16), jnp.float32)
    z = cfm.sample_cfg(vel, x0, c, jnp.zeros_like(c), 3.0, steps=3)
    assert z.shape == (1, 4, 1300)
    assert np.isfinite(np.asarray(z)).all()
