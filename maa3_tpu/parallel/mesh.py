"""Device mesh + sharding rules (the NCCL/DDP replacement).

The reference scales with PyTorch-Lightning DDP over NCCL (main.py:611);
here the same capability is a `jax.sharding.Mesh` with named axes

    ('data', 'model')

- 'data'  : batch sharding (DDP equivalent). Gradients are reduced by XLA
  psum over ICI automatically — no hand-written all-reduce.
- 'model' : tensor parallelism for XL/XXL DiTs — attention heads and SwiGLU
  hidden dim are column/row-sharded Megatron-style; XLA inserts the
  all-reduces at wo / w2 boundaries from the sharding annotations alone.

The reference's vestigial `model_parallel_size = 1` (flag_large_dit_moe.py:169)
becomes a real axis here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def make_moe_mesh(n_data: Optional[int] = None, n_model: int = 1,
                  n_expert: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model', 'expert') mesh for the video MoE backbone.

    'expert' is innermost: the dense MoE formulation (models/dit_moe.py) has
    NO all-to-all — the expert axis appears only as a batch dim of the expert
    einsums plus one gather/concat at the slice boundaries, so its (small)
    collectives belong on the fastest ICI hop, under the TP all-reduces."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_expert)
    assert n_data * n_model * n_expert == len(devices), (
        f"mesh {n_data}x{n_model}x{n_expert} != {len(devices)} devices")
    arr = np.array(devices).reshape(n_data, n_model, n_expert)
    return Mesh(arr, ("data", "model", "expert"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


# ---------------------------------------------------------------------------
# DiT parameter shardings (tensor parallel)
# ---------------------------------------------------------------------------

def dit_param_specs(params: dict, check_coverage: bool = True) -> dict:
    """PartitionSpec tree matching dit_init's pytree (stacked blocks have a
    leading depth axis, hence the extra None; MoE expert stacks an extra
    expert axis).

    Column-parallel: wq/wk/wv/wk_y/wv_y/w1/w3 shard their output dim.
    Row-parallel: wo/w2 shard their input dim (XLA adds the psum).
    Everything small (norms, adaLN, embedders) is replicated.

    Matching is by pytree key names; check_coverage guards the brittleness:
    any >=2D block leaf with more than 1M params that would silently fall
    back to replicated raises (catches renames / new weight classes).
    """

    # wqkv/w13 are the serving/fused-training concatenations (fuse_dit_gemms).
    # Their concat axis is the output dim, so column specs stay valid; note
    # that with model>1 a shard spans the q/k/v (w1/w3) concat boundaries, so
    # GSPMD resharding collectives appear at the downstream split — prefer
    # the unfused layout for TP training (Trainer enforces this).
    COL = ("wq", "wk", "wv", "wk_y", "wv_y", "w1", "w3", "wqkv", "w13")
    ROW = ("wo", "w2")

    def spec_for(path: tuple, leaf) -> P:
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        nd = leaf.ndim
        if "blocks" in names:
            if names[-1] == "w_scale":
                # int8 per-output-channel scales (ops/quant.py): (depth, out)
                # — follow the output dim: sharded for column-parallel,
                # replicated for row-parallel (out is the un-sharded dim)
                if any(n in names for n in COL):
                    return P(*([None] * (nd - 1)), "model")
                return P()
            if any(n in names for n in COL):
                # (depth[, experts], in, out) -> shard output (column)
                return P(*([None] * (nd - 1)), "model")
            if any(n in names for n in ROW):
                # shard input dim (row parallel; XLA inserts the psum)
                return P(*([None] * (nd - 2)), "model", None)
            if "gate" in names:
                return P(None, "model")  # (depth, n_heads) per-head gate
            if "adaLN" in names:
                # deliberately replicated: its (B, 6H) output feeds
                # hidden-dim modulate() on replicated activations; sharding
                # it would insert an all-gather per block for ~2% of FLOPs
                return P()
            if check_coverage and nd >= 2 and leaf.size > 1_000_000:
                raise ValueError(
                    f"dit_param_specs: unrecognized large block leaf "
                    f"{'/'.join(names)} {leaf.shape} would be silently "
                    f"replicated — extend the sharding rules")
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: dict, mesh: Mesh, specs: Optional[dict] = None) -> dict:
    if specs is None:
        specs = dit_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


# ---------------------------------------------------------------------------
# Expert parallelism: shard the stacked-expert axis of the video MoE
# ---------------------------------------------------------------------------

def add_ep_specs(params: dict, specs: dict, n_expert: int,
                 axis: str = "expert") -> dict:
    """Augment the video-MoE DiT PartitionSpecs with expert parallelism.

    The dense MoE (models/dit_moe.py) stacks experts on axis 1 of every
    expert weight — (depth, E, in, out) — so EP is pure data layout: shard
    that axis over `axis`. Each chip then stores and computes 1/n_expert of
    the expert FFN stacks; the expert dim is a batch dim of the freq-MoE
    einsums (compute stays local) and the time-MoE per-sample gather plus
    the output-slice concat are the only collectives — there is no
    all-to-all dispatch anywhere (unlike the token-routing MoEs the usual
    EP recipe is built for; the reference's loop over boolean masks,
    flag_large_dit_moe.py:493-538, has no parallelism at all).

    Composes with the TP specs from dit_param_specs (which shard the in/out
    dims of the same leaves over 'model')."""
    EXPERT_STACKS = ("time_experts", "freq_experts")

    def upd(path: tuple, leaf, spec) -> P:
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if not any(n in names for n in EXPERT_STACKS) or leaf.ndim < 3:
            return spec
        # (depth, E, ...) — expert axis right after the scan-stacked depth
        if leaf.shape[1] % n_expert != 0:
            raise ValueError(
                f"add_ep_specs: expert axis {leaf.shape[1]} of "
                f"{'/'.join(names)} not divisible by n_expert={n_expert}")
        p = list(spec) + [None] * (leaf.ndim - len(spec))
        assert p[1] is None, f"expert axis already sharded: {spec}"
        p[1] = axis
        return P(*p)

    return jax.tree_util.tree_map_with_path(upd, params, specs)


# ---------------------------------------------------------------------------
# FSDP / ZeRO-3: parameter + optimizer-state sharding over the data axis
# ---------------------------------------------------------------------------

def add_fsdp_specs(params: dict, specs: dict, n_fsdp: int,
                   axis: str = "data", min_size: int = 65536) -> dict:
    """Augment tensor-parallel PartitionSpecs with fully-sharded-data-parallel
    sharding over `axis` (normally the batch/'data' axis, ZeRO style).

    Each large leaf gets ONE additional dim sharded over `axis`, so params,
    AdamW moments and EMA shadows are stored 1/n_fsdp per chip; XLA
    all-gathers weights where they are consumed and reduce-scatters the
    gradients — purely from the annotations, no hand-written collectives
    (the GSPMD equivalent of the reference's hypothetical FSDP/ZeRO config;
    its DDP (main.py:611) replicates optimizer state on every rank, which is
    why the 1.47B XXL + AdamW (~23 GB fp32) cannot train on 16 GB chips —
    with this spec it fits at n_fsdp>=2).

    Rule: pick the LARGEST yet-unsharded dim divisible by n_fsdp. Leaves
    smaller than min_size (norms, gates, biases) stay as-is: gathering them
    costs more latency than the bytes saved.
    """
    def upd(leaf, spec) -> P:
        if leaf.size < min_size:
            return spec
        p = list(spec) + [None] * (leaf.ndim - len(spec))
        cands = [d for d in range(leaf.ndim)
                 if p[d] is None and leaf.shape[d] % n_fsdp == 0]
        if not cands:
            return spec
        d = max(cands, key=lambda i: leaf.shape[i])
        p[d] = axis
        return P(*p)

    return jax.tree.map(upd, params, specs)
