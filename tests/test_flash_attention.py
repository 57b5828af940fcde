"""Pallas flash attention vs dense softmax reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maa3_tpu.ops.flash_attention import flash_attention


def _dense_ref(q, k, v, mask=None, scale=None):
    import math
    d = q.shape[-1]
    scale = scale or 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("l,d", [(128, 64), (200, 72), (312, 24)])
def test_flash_matches_dense(l, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 3, l, d))
    k = jax.random.normal(kk, (2, 3, l, d))
    v = jax.random.normal(kv, (2, 3, l, d))
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = _dense_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_flash_with_padding_mask():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (2, 2, 64, 32))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 96, 32))
    v = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 96, 32))
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, 50)), np.zeros((2, 46))], axis=1).astype(bool))
    out = flash_attention(q, k, v, mask=mask, interpret=True)
    ref = _dense_ref(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)
    # masked keys must not influence: perturbing them changes nothing
    v2 = v.at[:, :, 50:, :].set(999.0)
    out2 = flash_attention(q, k, v2, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_flash_multiblock_online_softmax():
    """L > block forces the online max/denominator recurrence across blocks."""
    key = jax.random.PRNGKey(4)
    q = jax.random.normal(key, (1, 1, 256, 16)) * 3  # large logits
    k = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 256, 16)) * 3
    v = jax.random.normal(jax.random.PRNGKey(6), (1, 1, 256, 16))
    out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    ref = _dense_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_flash_gradients_match_dense():
    """flash_attention is differentiable (custom VJP: exact-attention
    backward) — gradients must match autodiff through the dense reference,
    so long-context training (auto flash at seq>4096, or forced
    use_flash=True) works. The VJP runs the O(L)-memory Pallas backward
    kernels (dk/dv and dq), which must agree with dense autodiff."""
    key = jax.random.PRNGKey(4)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 2, 64, 32))
    k = jax.random.normal(kk, (2, 2, 96, 32))
    v = jax.random.normal(kv, (2, 2, 96, 32))
    mask = jnp.asarray(np.concatenate(
        [np.ones((2, 80), bool), np.zeros((2, 16), bool)], axis=1))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask=mask, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dense_ref(q, k, v, mask=mask) ** 2)

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)

    # bf16 inputs (the training default): the kernel uses the standard
    # flash delta-trick, whose ds differs from exact autodiff of the
    # bf16-quantized forward by O(bf16 eps) — assert it stays within a
    # loose tolerance of the fp32 reference gradients
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    gb = jax.grad(lambda a, b_, c: jnp.sum(flash_attention(
        a, b_, c, mask=mask, interpret=True).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(qb, kb, vb)
    for a, b in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b),
                                   rtol=0.1, atol=0.1)


def test_fused_bwd_matches_split():
    """The default FUSED single-pass backward (one score computation feeds
    dq/dk/dv) must agree with the split two-pass kernels it replaced — the
    split form stays as the long-Lq fallback and MAA3_FLASH_BWD=split A/B
    path, so both must stay correct."""
    import os
    from maa3_tpu.ops.flash_attention import _flash_pallas_bwd

    key = jax.random.PRNGKey(7)
    kq, kk, kv, kd = jax.random.split(key, 4)
    b, h, l, d = 2, 4, 200, 64
    q = jax.random.normal(kq, (b, h, l, d))
    k = jax.random.normal(kk, (b, h, l, d))
    v = jax.random.normal(kv, (b, h, l, d))
    do = jax.random.normal(kd, (b, h, l, d))
    o = flash_attention(q, k, v, interpret=True)
    import math
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    lse = jax.nn.logsumexp(s, axis=-1).reshape(b * h, l, 1)
    mask = jnp.ones((b, l), jnp.int32)
    outs = {}
    for mode in ("fused", "split"):
        os.environ["MAA3_FLASH_BWD"] = mode
        try:
            outs[mode] = _flash_pallas_bwd(q, k, v, mask, o, lse, do,
                                           scale, None, None, True)
        finally:
            os.environ.pop("MAA3_FLASH_BWD", None)
    for a, b_ in zip(outs["fused"], outs["split"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_mode_aware_auto_threshold():
    """use_flash=None auto-routes mode-aware: training from seq 1248 (the
    maskless fused backward wins the XL e2e step 1.12x at the collate cap,
    TRAIN_r06; 1.9x at 2048), inference only past 4096 (pallas_call fusion
    barrier loses e2e at serving shapes); an explicit use_flash overrides
    both."""
    from maa3_tpu.models.dit import DiTConfig
    from maa3_tpu.models.dit_moe import MoEDiTConfig

    for cls in (DiTConfig, MoEDiTConfig):
        cfg = cls(in_channels=4, context_dim=16, hidden_size=32, depth=1,
                  num_heads=2)
        assert not cfg.flash_for_len(312, training=True)
        assert not cfg.flash_for_len(624, training=True)
        assert cfg.flash_for_len(1248, training=True)
        assert cfg.flash_for_len(2048, training=True)
        assert not cfg.flash_for_len(2048, training=False)
        assert not cfg.flash_for_len(4096, training=False)
        assert cfg.flash_for_len(4097, training=False)
        pinned = cfg.resolve_flash(2048, True)
        assert pinned.use_flash is True
        assert cls(in_channels=4, context_dim=16, hidden_size=32, depth=1,
                   num_heads=2, use_flash=False).flash_for_len(
                       8192, training=True) is False


def test_flash_trains_in_model():
    """A DiT train-style grad through the auto-routed flash path (use_flash
    True) must run and be finite — the serving kernel cannot be a training
    landmine."""
    from maa3_tpu.models.dit import DiTConfig, dit_init, dit_apply
    from maa3_tpu.utils.nprand import unfreeze_zero_init

    cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=32, depth=1,
                    num_heads=2, max_len=256, multiple_of=16, use_flash=True)
    params = unfreeze_zero_init(dit_init(jax.random.PRNGKey(0), cfg),
                                jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 40))
    t = jnp.array([3, 700])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 16))

    g = jax.grad(lambda p: jnp.sum(dit_apply(
        p, cfg, x, t, ctx, compute_dtype=jnp.float32) ** 2))(params)
    flat = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    assert any(float(jnp.abs(a).max()) > 0 for a in flat)


def test_maskless_bwd_matches_dense():
    """Training callers pass NO key mask; the backward then runs the
    maskless fused kernel (no mask operand, free block_k granularity) whose
    correctness with zero-padded tails rests on k_pad rows being zero.
    Gradients must match dense autodiff, including at a length whose 16-pad
    leaves a padded tail (l=200 -> 208)."""
    key = jax.random.PRNGKey(11)
    kq, kk, kv = jax.random.split(key, 3)
    for l in (64, 200):
        q = jax.random.normal(kq, (2, 2, l, 32))
        k = jax.random.normal(kk, (2, 2, l, 32))
        v = jax.random.normal(kv, (2, 2, l, 32))

        g = jax.grad(lambda a, b_, c: jnp.sum(flash_attention(
            a, b_, c, interpret=True) ** 2), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda a, b_, c: jnp.sum(_dense_ref(
            a, b_, c) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)


def test_maskless_bwd_matches_ones_mask():
    """Maskless backward == all-ones-mask backward (the pre-round-4 path),
    at a block-padding length and with forced small blocks so multiple
    k-blocks (including a padded one) are exercised."""
    import os
    key = jax.random.PRNGKey(12)
    kq, kk, kv = jax.random.split(key, 3)
    l = 200
    q = jax.random.normal(kq, (1, 2, l, 32))
    k = jax.random.normal(kk, (1, 2, l, 32))
    v = jax.random.normal(kv, (1, 2, l, 32))
    mask = jnp.ones((1, l), bool)
    os.environ["MAA3_FLASH_BQ_BWD_CAP"] = "64"
    os.environ["MAA3_FLASH_BK_BWD_CAP"] = "128"
    try:
        import importlib
        from maa3_tpu.ops import flash_attention as fa
        importlib.reload(fa)
        g0 = jax.grad(lambda a: jnp.sum(fa.flash_attention(
            a, k, v, interpret=True) ** 2))(q)
        g1 = jax.grad(lambda a: jnp.sum(fa.flash_attention(
            a, k, v, mask=mask, interpret=True) ** 2))(q)
    finally:
        del os.environ["MAA3_FLASH_BQ_BWD_CAP"]
        del os.environ["MAA3_FLASH_BK_BWD_CAP"]
        importlib.reload(fa)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-5)
