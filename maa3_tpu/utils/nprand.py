"""Host-side parameter initialization RNG.

jax.random on-device is the right tool inside jitted code, but parameter
*initialization* is a one-off host task: routing hundreds of distinctly-shaped
uniform/normal draws through XLA costs one compilation each (minutes of wall
clock for a full system). We instead derive a numpy Philox generator from the
JAX PRNG key — deterministic per key, zero compiles.
"""

from __future__ import annotations

import numpy as np
import jax


def np_rng(key) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key)).ravel().astype(np.uint64)
    seed = (int(data[-2]) << 32) | int(data[-1]) if data.size >= 2 else int(data[-1])
    return np.random.default_rng(np.random.Philox(seed))


def uniform(key, shape, lo: float, hi: float) -> np.ndarray:
    return np_rng(key).uniform(lo, hi, size=shape).astype(np.float32)


def normal(key, shape, std: float = 1.0) -> np.ndarray:
    return (np_rng(key).standard_normal(size=shape) * std).astype(np.float32)


def cast_matmul_weights(params, dtype):
    """Cast large matmul/conv weights ('w' leaves with >=2 dims) to `dtype`
    for inference: halves weight HBM traffic per ODE step, which is a large
    share of small-batch DiT latency. Norm scales, biases and gates stay
    fp32 (numerically sensitive, tiny)."""
    import jax

    def cast(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if names and names[-1] == "w" and leaf.ndim >= 2:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)


def fuse_dit_gemms(dit_params):
    """Serving-time GEMM fusion for the DiT blocks: concatenate wq/wk/wv into
    one `wqkv` projection and w1/w3 into one `w13` — one wide MXU GEMM per
    site instead of 2-3 narrow ones (per-element numerics are identical: each
    output column's dot product is unchanged). The original keys are removed;
    ops/attention.py and ops/ffn.py detect the fused keys.

    Apply AFTER checkpoint import / cast_matmul_weights (inference only —
    the training/TP param specs use the unfused names).
    """
    import jax.numpy as jnp

    p = dict(dit_params)
    blocks = dict(p["blocks"])
    att = dict(blocks["attention"])
    att["wqkv"] = {"w": jnp.concatenate(
        [att.pop("wq")["w"], att.pop("wk")["w"], att.pop("wv")["w"]], axis=-1)}
    blocks["attention"] = att
    ffn = dict(blocks["feed_forward"])
    if "w1" in ffn:  # dense SwiGLU (text DiT); MoE expert stacks stay as-is
        ffn["w13"] = {"w": jnp.concatenate(
            [ffn.pop("w1")["w"], ffn.pop("w3")["w"]], axis=-1)}
        blocks["feed_forward"] = ffn
    p["blocks"] = blocks
    return p


def unfuse_dit_gemms(dit_params, n_heads: int, n_kv_heads=None):
    """Inverse of fuse_dit_gemms: split wqkv back into wq/wk/wv and w13 into
    w1/w3. Used to keep checkpoints canonical when training with fused
    params (Trainer fuse_gemms mode): saved state always uses the unfused
    names, so fused-trained and unfused-trained checkpoints interoperate."""
    import jax.numpy as jnp

    p = dict(dit_params)
    blocks = dict(p["blocks"])
    att = dict(blocks["attention"])
    if "wqkv" in att:
        w = att.pop("wqkv")["w"]
        d = w.shape[-2]
        n_kv = n_heads if n_kv_heads is None else n_kv_heads
        head_dim = d // n_heads
        q_dim, kv_dim = n_heads * head_dim, n_kv * head_dim
        wq, wk, wv = jnp.split(w, [q_dim, q_dim + kv_dim], axis=-1)
        att.update(wq={"w": wq}, wk={"w": wk}, wv={"w": wv})
        blocks["attention"] = att
    ffn = dict(blocks["feed_forward"])
    if "w13" in ffn:
        w1, w3 = jnp.split(ffn.pop("w13")["w"], 2, axis=-1)
        ffn.update(w1={"w": w1}, w3={"w": w3})
        blocks["feed_forward"] = ffn
    p["blocks"] = blocks
    return p


def unfreeze_zero_init(dit_params, key, scale: float = 0.02):
    """Give a RANDOM-INIT DiT non-trivial dynamics for benchmarks/parity
    sweeps. At init the reference zero-inits every adaLN modulation, the
    final layer and the cross-attn gates (flag_large_dit.py:288-297), which
    makes EVERY transformer block a numerical identity (gates/shifts/scales
    all 0): drift or planned-vs-plain comparisons on raw random init never
    see the blocks' internals. This perturbs those zero-init leaves so the
    blocks, cross-attention and modulations all contribute. FLOP/latency
    measurements are value-independent; this matters for NUMERICS only.
    """
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 4)
    p = dict(dit_params)
    blocks = dict(p["blocks"])
    att = dict(blocks["attention"])
    att["gate"] = 0.5 * jnp.ones_like(att["gate"])
    blocks["attention"] = att
    ada = blocks["adaLN"]
    blocks["adaLN"] = {"w": scale * jax.random.normal(ks[0], ada["w"].shape),
                       "b": jnp.zeros_like(ada["b"])}
    p["blocks"] = blocks
    fl = dict(p["final_layer"])
    fl["linear"] = {"w": scale * jax.random.normal(
        ks[1], fl["linear"]["w"].shape),
        "b": jnp.zeros_like(fl["linear"]["b"])}
    fl["adaLN"] = {"w": scale * jax.random.normal(ks[2], fl["adaLN"]["w"].shape),
                   "b": jnp.zeros_like(fl["adaLN"]["b"])}
    p["final_layer"] = fl
    return p
