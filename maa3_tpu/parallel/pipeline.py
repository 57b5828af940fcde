"""Pipeline parallelism (GPipe) over the scan-stacked DiT depth axis.

Capability beyond the reference: its trainer is single-axis DDP only
(main.py:611, `model_parallel_size = 1` at flag_large_dit_moe.py:169), so a
model whose optimizer state exceeds one device's HBM simply cannot train.
Here the *depth* dimension of the stacked block pytree (models/dit.py:111 —
every block leaf has a leading `depth` axis) is sharded over a third mesh
axis 'pipe', and a GPipe microbatch schedule runs inside ONE
`jax.shard_map`:

- manual over {'pipe', 'data'}: each (data-shard, stage) device holds
  depth/S contiguous blocks and loops over M microbatches of its local
  batch; `lax.ppermute` hands the residual stream to the next stage each
  tick (M + S - 1 ticks total, the classic GPipe bubble).
- 'model' stays an *automatic* axis, so Megatron TP (mesh.py::dit_param_specs)
  composes transparently inside the manual region — DP x PP x TP on one mesh.
- backward = plain autodiff through the tick scan: ppermute transposes to
  the reverse permutation, so the backward pipeline runs in the opposite
  direction, and cotangents for the replicated activations are psum'd over
  'data' by shard_map's transpose — no hand-written collectives anywhere.

Numerics match the unpipelined `lax.scan` exactly (same block math, same
order; tests/test_pipeline_parallel.py asserts fwd 1e-5 / grad 1e-4 incl.
masks and remat).

Sizing rationale: XXL-scale training state (1.47B fp32 params + AdamW
moments ~ 23 GB) exceeds one v5e's 16 GB HBM; pipe=2 halves the per-chip
weight+optimizer bytes while FSDP (mesh.py::add_fsdp_specs) covers the
within-stage remainder.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from maa3_tpu.models.dit import (DiTConfig, _block_apply, dit_apply,
                                 final_layer_apply)
from maa3_tpu.ops.basic import (dense, layer_norm, silu,
                                timestep_embedder_apply)
from maa3_tpu.ops.rope import precompute_rope

Array = jax.Array


def make_pipe_mesh(n_data: Optional[int] = None, n_pipe: int = 1,
                   n_model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'pipe', 'model') mesh. 'pipe' sits between data and model so
    stage handoffs ride one ICI hop while TP collectives stay innermost."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_pipe * n_model)
    assert n_data * n_pipe * n_model == len(devices), (
        f"mesh {n_data}x{n_pipe}x{n_model} != {len(devices)} devices")
    arr = np.array(devices).reshape(n_data, n_pipe, n_model)
    return Mesh(arr, ("data", "pipe", "model"))


def add_pipe_specs(specs: dict) -> dict:
    """Shard the leading depth axis of every stacked-block leaf over 'pipe'.

    Input: the PartitionSpec tree from mesh.py::dit_param_specs (depth axis
    is dim 0 of every leaf under "blocks", currently None there). Non-block
    leaves (proj_in/embedders/final_layer) stay replicated — they run
    outside the manual region on every stage.
    """
    def upd_blocks(spec: P, leaf=None) -> P:
        rest = tuple(spec)[1:] if len(spec) else ()
        return P("pipe", *rest)

    out = dict(specs)
    out["blocks"] = jax.tree.map(
        upd_blocks, specs["blocks"],
        is_leaf=lambda s: isinstance(s, P))
    return out


def dit_apply_pipelined(params: dict, cfg: DiTConfig, x: Array, t: Array,
                        context: Array, mesh: Mesh, n_micro: int,
                        x_mask: Optional[Array] = None,
                        context_mask: Optional[Array] = None,
                        compute_dtype=jnp.bfloat16,
                        training: bool = False) -> Array:
    """dit_apply with the block stack executed as a GPipe pipeline.

    Drop-in for models/dit.py::dit_apply (same signature plus mesh/n_micro):
    embedders + proj_in + final_layer run under normal GSPMD; only the
    depth-scan is replaced by the shard_map microbatch schedule. The global
    batch must divide as B = n_data * n_micro * b_micro.
    """
    n_pipe = mesh.shape["pipe"]
    n_data = mesh.shape["data"]
    if n_pipe == 1:
        return dit_apply(params, cfg, x, t, context, x_mask=x_mask,
                         context_mask=context_mask,
                         compute_dtype=compute_dtype, training=training)
    cfg = cfg.resolve_flash(x.shape[2], training)
    depth = params["blocks"]["adaLN"]["w"].shape[0]
    assert depth % n_pipe == 0, (depth, n_pipe)
    b = x.shape[0]
    assert b % (n_data * n_micro) == 0, (
        f"batch {b} must divide data{n_data} x micro{n_micro}")

    # ---- token-independent prologue (replicated-per-data-shard, tiny) ----
    xt = x.transpose(0, 2, 1)                          # (B, T, C)
    h = dense(params["proj_in"], xt, compute_dtype)
    if cfg.fp32_residual:
        h = h.astype(jnp.float32)
    tlen = h.shape[1]

    t_emb = timestep_embedder_apply(params["t_embedder"], t)
    ctx_f = context.astype(jnp.float32)
    if context_mask is not None:
        mf = context_mask.astype(jnp.float32)[:, :, None]
        pooled = (ctx_f * mf).sum(axis=1) / jnp.maximum(mf.sum(axis=1), 1.0)
    else:
        pooled = ctx_f.mean(axis=1)
    ce = params["cap_embedder"]
    cap_emb = dense(ce["linear"],
                    layer_norm(pooled, ce["norm"]["weight"],
                               ce["norm"]["bias"], eps=1e-5))
    adaln = t_emb + cap_emb                            # (B, H) fp32
    cos, sin = precompute_rope(cfg.head_dim, tlen,
                               rope_scaling_factor=cfg.rope_scaling_factor,
                               ntk_factor=cfg.ntk_factor)

    # ---- the manual region: GPipe over ('pipe',), batch over ('data',) ----
    # Boundary tensors cross shard_map in fp32: psums on bf16 operands (the
    # final broadcast AND the transpose-inserted cotangent psums) trip XLA
    # CPU's AllReducePromotion pass ("Invalid binary instruction opcode
    # copy"); fp32 sidesteps the pass. The per-tick ppermute handoffs stay
    # in the residual dtype, so ICI bytes are unaffected.
    S, M = n_pipe, n_micro
    res_dtype = h.dtype

    def pipe_fn(blocks, h_l, y_l, ada_l, xm_l, ym_l):
        stage = jax.lax.axis_index("pipe")
        # the closed-over RoPE tables are constants; without stop_gradient
        # shard_map's transpose psums their (bf16) cotangents over
        # data x pipe, and those all-reduces trip the same XLA CPU
        # AllReducePromotion bug as above
        cos_c = jax.lax.stop_gradient(cos)
        sin_c = jax.lax.stop_gradient(sin)
        h_l = h_l.astype(res_dtype)
        bm = h_l.shape[0] // M
        mb = lambda a: (None if a is None else
                        a.reshape(M, bm, *a.shape[1:]))
        h_mb, y_mb, ada_mb = mb(h_l), mb(y_l), mb(ada_l)
        xm_mb, ym_mb = mb(xm_l), mb(ym_l)

        def stage_apply(state, y_m, ada_m, xm_m, ym_m):
            def body(c, bp):
                return _block_apply(bp, cfg, c, cos_c, sin_c, y_m, ada_m,
                                    xm_m, ym_m, compute_dtype), None
            return jax.lax.scan(body, state, blocks)[0]

        if cfg.remat:
            stage_apply = jax.checkpoint(stage_apply)

        def tick(carry, tk):
            state, outs = carry
            # stage 0 ingests microbatch tk during fill; drain ticks re-run
            # mb M-1 into the bubble lane (never collected)
            inp = jax.lax.dynamic_index_in_dim(
                h_mb, jnp.clip(tk, 0, M - 1), 0, keepdims=False)
            state = jnp.where(stage == 0, inp, state)
            m = jnp.clip(tk - stage, 0, M - 1)
            pick = lambda a: (None if a is None else
                              jax.lax.dynamic_index_in_dim(a, m, 0,
                                                           keepdims=False))
            out = stage_apply(state, pick(y_mb), pick(ada_mb),
                              pick(xm_mb), pick(ym_mb))
            valid = (tk >= stage) & (tk - stage < M) & (stage == S - 1)
            outs = jnp.where(
                valid,
                jax.lax.dynamic_update_index_in_dim(outs, out, m, 0), outs)
            nxt = jax.lax.ppermute(out, "pipe",
                                   [(s, (s + 1) % S) for s in range(S)])
            return (nxt, outs), None

        vary = lambda a: jax.lax.pcast(a, ("data", "pipe"), to="varying")
        init = (vary(jnp.zeros((bm, tlen, h_l.shape[-1]), h_l.dtype)),
                vary(jnp.zeros((M, bm, tlen, h_l.shape[-1]), h_l.dtype)))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # broadcast the last stage's collected outputs to every pipe rank
        outs = outs.astype(jnp.float32)
        outs = jax.lax.psum(jnp.where(stage == S - 1, outs,
                                      jnp.zeros((), outs.dtype)), "pipe")
        return outs.reshape(h_l.shape)

    d_spec = lambda a: None if a is None else P("data")
    in_specs = (P("pipe"), P("data"), P("data"), P("data"),
                d_spec(x_mask), d_spec(context_mask))
    smap = jax.shard_map(pipe_fn, mesh=mesh, axis_names={"data", "pipe"},
                         in_specs=in_specs, out_specs=P("data"))
    h = smap(params["blocks"], h.astype(jnp.float32), context, adaln,
             x_mask, context_mask)

    h = final_layer_apply(params["final_layer"], h, adaln)
    return h.transpose(0, 2, 1).astype(jnp.float32)
