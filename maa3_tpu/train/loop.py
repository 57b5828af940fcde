"""Trainer — the main.py / PyTorch-Lightning role, TPU-native.

Capabilities mirrored from the reference trainer stack (SURVEY §2.3, §5):
- config-driven model + data construction (main.py:604-626)
- lr scaling base_lr * accum * ndata * bs (main.py:786-790)
- std-rescale of the latent on the first batch (ddpm_audio.py:88-103)
- grad-clip 1.0, AdamW, LambdaLinear warmup (configs)
- EMA shadow (ldm/modules/ema.py)
- Orbax checkpointing: top-k + last + crash save (main.py:316-320,659-679)
- per-step metrics logging (JSONL + stdout; CUDACallback's epoch time /
  peak-mem equivalent via device memory_stats)
- data+model mesh sharding instead of DDP/NCCL

Process layout: one python process per host; `jax.process_index()` is the
DDP "rank" for the bucketed sampler split.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.config import ModelSpec
from maa3_tpu.models.dit import dit_apply
from maa3_tpu.models.dit_moe import moe_dit_apply
from maa3_tpu.models import clap as clap_mod
from maa3_tpu.models.vae1d import vae_encode_moments, gaussian_sample
from maa3_tpu.parallel.mesh import (batch_sharding, dit_param_specs, make_mesh,
                                    replicated)
from maa3_tpu.train.optim import make_optimizer
from maa3_tpu.train.step import TrainState, create_train_state, make_train_step

Array = jax.Array


def _caps_from_batch(raw: dict) -> list:
    cap = raw.get("caption")
    if not isinstance(cap, dict):
        return []
    return [{"ori_caption": o, "struct_caption": s}
            for o, s in zip(cap.get("ori_caption", []),
                            cap.get("struct_caption", []))]


class Trainer:
    def __init__(self, system, batch_size: int = 16, lr_multiplier: Optional[float] = None,
                 use_ema: bool = False, ema_decay: float = 0.9999,
                 grad_clip: float = 1.0, warm_up_steps: int = 10000,
                 log_every: int = 50, ckpt_every: int = 2000,
                 ckpt_dir: str = "logs/ckpt", n_model: int = 1,
                 train_cond: Optional[bool] = None, accum_steps: int = 1,
                 mu_dtype=None, fuse_gemms: bool = False, fsdp: bool = False,
                 fsdp_min_size: int = 65536, n_pipe: int = 1,
                 n_micro: int = 1, seq_parallel: bool = False,
                 n_expert: int = 1):
        """system: MAA3System (provides spec, params, tokenizers).

        accum_steps: gradient accumulation (the reference's
        accumulate_grad_batches, main.py:786-790) — optimizer updates apply
        every accum_steps micro-batches; the lr multiplier scales with it.
        mu_dtype: AdamW first-moment storage dtype (bfloat16 frees ~1.5 GB
        for the XL).
        fuse_gemms: train on the concatenated wqkv/w13 layout (wider MXU
        GEMMs in fwd AND bwd; same math — tests/test_fused_train.py).
        Single-axis data-parallel only: with model>1 the concat axis spans
        q/k/v shard boundaries and GSPMD inserts reshard collectives.
        Checkpoints saved by a fused trainer use the fused layout (opt_state
        moments are per-tensor); sync_system_params always hands the system
        canonical unfused params.
        fsdp: ZeRO-3 — shard DiT params, AdamW moments and EMA shadows over
        the 'data' axis (1/n_data bytes per chip); XLA all-gathers weights at
        use and reduce-scatters grads from the annotations. Composes with
        n_model (TP) and accum_steps; no-op on a 1-wide data axis.
        n_pipe/n_micro: GPipe pipeline parallelism (parallel/pipeline.py) —
        the DiT block stack is depth-sharded over a 'pipe' mesh axis and the
        train step runs n_micro microbatches through the shard_map schedule;
        composes with n_model (TP stays an automatic axis) and DP.
        seq_parallel: Megatron-style SP for TP training — the inter-block
        residual stream is sharded over the sequence axis on 'model'
        (DiTConfig.seq_parallel), storing activations 1/n_model per chip;
        needs n_model>1 (silently a no-op otherwise).
        n_expert: expert parallelism for the video MoE backbone — the
        stacked-expert axis of the time/freq expert FFNs is sharded over an
        'expert' mesh axis (mesh.py::add_ep_specs; dense MoE, so no
        all-to-all). Composes with n_model (TP) and DP/FSDP."""
        self.system = system
        self.spec: ModelSpec = system.spec
        self.batch_size = batch_size
        self.log_every = log_every
        self.ckpt_every = ckpt_every
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.train_cond = (self.spec.cond_stage_trainable
                           if train_cond is None else train_cond)
        self.accum_steps = max(1, accum_steps)

        n_dev = len(jax.devices())
        self.n_pipe = max(1, n_pipe)
        self.n_micro = max(1, n_micro)
        self.n_expert = max(1, n_expert)
        if self.n_expert > 1:
            if self.spec.backbone_kind != "video_moe_dit":
                raise ValueError("n_expert>1 needs the video MoE backbone "
                                 "(the text DiT has no expert axis)")
            if self.n_pipe > 1 or fuse_gemms:
                raise ValueError("n_expert>1 is incompatible with n_pipe>1 "
                                 "and fuse_gemms")
        if self.n_pipe > 1:
            from maa3_tpu.parallel.pipeline import make_pipe_mesh
            if fsdp:
                raise ValueError("n_pipe>1 + fsdp unsupported: FSDP's 'data' "
                                 "param shards conflict with the manual "
                                 "'data' axis of the pipeline shard_map")
            if fuse_gemms:
                raise ValueError("n_pipe>1 requires the unfused GEMM layout")
            if seq_parallel:
                raise ValueError(
                    "n_pipe>1 + seq_parallel unsupported: the pipelined "
                    "apply (parallel/pipeline.py) runs inside its own "
                    "shard_map and does not place the Megatron SP "
                    "sharding constraints — SP would be silently inert")
            if self.spec.backbone_kind == "video_moe_dit":
                raise ValueError("pipeline parallelism covers the text DiT "
                                 "backbone (the video MoE uses TP+DP)")
            self.mesh = make_pipe_mesh(
                n_dev // (self.n_pipe * n_model), self.n_pipe, n_model)
        elif self.n_expert > 1:
            from maa3_tpu.parallel.mesh import make_moe_mesh
            self.mesh = make_moe_mesh(
                n_dev // (n_model * self.n_expert), n_model, self.n_expert)
        else:
            n_model = n_model if n_dev % max(n_model, 1) == 0 else 1
            self.mesh = make_mesh(n_dev // n_model, n_model)

        if (seq_parallel and self.mesh.shape["model"] > 1
                and self.spec.backbone_kind == "text_dit"):
            import dataclasses
            self.spec = dataclasses.replace(
                self.spec,
                dit=dataclasses.replace(self.spec.dit, seq_parallel=True))

        # reference recipe: lr = base_lr * accum * ngpu * per_rank_bs
        # (main.py:786-790) = base_lr * accum * global_batch. Here
        # `batch_size` is already the per-host GLOBAL batch (the sampler
        # yields batch_size rows which prepare_batch shards over the local
        # 'data' chips), so only multi-host replication scales it further —
        # multiplying by the mesh data-axis size would overcount local chips.
        lr_mult = lr_multiplier if lr_multiplier is not None else (
            self.accum_steps * jax.process_count() * batch_size)
        self.optimizer = make_optimizer(self.spec.base_learning_rate,
                                        lr_multiplier=lr_mult,
                                        warm_up_steps=warm_up_steps,
                                        grad_clip=grad_clip,
                                        mu_dtype=mu_dtype)
        if self.accum_steps > 1:
            import optax
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=self.accum_steps)

        self.fuse_gemms = fuse_gemms
        if fuse_gemms and self.mesh.shape["model"] > 1:
            raise ValueError("fuse_gemms training requires model-parallel "
                             "size 1 (the qkv concat axis does not align "
                             "with TP shard boundaries)")

        # trainable vs frozen split
        trainable = {"dit": system.params["dit"]}
        if fuse_gemms and "wq" in trainable["dit"]["blocks"]["attention"]:
            from maa3_tpu.utils.nprand import fuse_dit_gemms
            trainable["dit"] = fuse_dit_gemms(trainable["dit"])
        if self.train_cond and "cond" in system.params:
            trainable["cond"] = system.params["cond"]
        frozen = {"vae": system.params["vae"]}

        # shard: DiT tensor-parallel specs; everything else replicated.
        # fsdp=True additionally shards params (and hence, via eager optax
        # init, the AdamW moments and EMA shadows) over the 'data' axis —
        # ZeRO-3 from annotations alone. This is what lets the 1.47B XXL
        # (fp32 params + AdamW ~23 GB replicated) train on 16 GB chips.
        from jax.sharding import NamedSharding
        dit_specs = dit_param_specs(trainable["dit"])
        if self.n_pipe > 1:
            from maa3_tpu.parallel.pipeline import add_pipe_specs
            dit_specs = add_pipe_specs(dit_specs)
        if self.n_expert > 1:
            from maa3_tpu.parallel.mesh import add_ep_specs
            dit_specs = add_ep_specs(trainable["dit"], dit_specs,
                                     self.n_expert)
        self.fsdp = fsdp and self.mesh.shape["data"] > 1
        if self.fsdp:
            from maa3_tpu.parallel.mesh import add_fsdp_specs
            dit_specs = add_fsdp_specs(trainable["dit"], dit_specs,
                                       self.mesh.shape["data"],
                                       min_size=fsdp_min_size)
        trainable["dit"] = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            trainable["dit"], dit_specs)
        if "cond" in trainable:
            trainable["cond"] = jax.device_put(trainable["cond"],
                                               replicated(self.mesh))
        frozen = jax.device_put(frozen, replicated(self.mesh))

        self.state = create_train_state(trainable, frozen, self.optimizer,
                                        use_ema=use_ema,
                                        scale_factor=self.spec.scale_factor)

        conditioner = self._make_conditioner()
        # train in the system's compute dtype (bf16 default; tests and
        # debugging runs construct fp32 systems and train fp32)
        cdt = getattr(system, "compute_dtype", jnp.bfloat16)
        apply_fn = None
        if self.spec.backbone_kind == "video_moe_dit":
            dit_cfg = self.spec.dit
            apply_fn = (lambda p, x, t, c:
                        moe_dit_apply(p, dit_cfg, x, t, c, compute_dtype=cdt,
                                      training=True))
        elif self.n_pipe > 1:
            from maa3_tpu.parallel.pipeline import dit_apply_pipelined
            dit_cfg, mesh, n_micro = self.spec.dit, self.mesh, self.n_micro
            apply_fn = (lambda p, x, t, c:
                        dit_apply_pipelined(p, dit_cfg, x, t, c,
                                            mesh=mesh, n_micro=n_micro,
                                            compute_dtype=cdt, training=True))
        step_fn = make_train_step(
            self.spec.dit, self.spec.vae, self.optimizer,
            num_timesteps=self.spec.timesteps, ema_decay=ema_decay,
            compute_dtype=cdt, conditioner=conditioner, apply_fn=apply_fn)
        if self.fsdp:
            # Pin the output state to the FSDP shardings: gradients then
            # reduce-scatter back to 1/n_data shards instead of XLA choosing
            # an all-reduce + replicated update (which would defeat ZeRO).
            out_shards = jax.tree.map(
                lambda x: x.sharding if isinstance(x.sharding, NamedSharding)
                else replicated(self.mesh), self.state)
            self._train_step = jax.jit(step_fn, out_shardings=(out_shards, None))
        else:
            self._train_step = jax.jit(step_fn)
        self._scale_by_std_done = not self.spec.scale_by_std
        self._metrics_path = os.path.join(self.ckpt_dir, "metrics.jsonl")
        self._tb = None
        self._tb_failed = False
        self._eval_step = None
        os.makedirs(self.ckpt_dir, exist_ok=True)

    # -- conditioning ------------------------------------------------------

    def _make_conditioner(self):
        kind = self.spec.cond_kind
        clap_cfg = self.system.clap_cfg
        if not self.train_cond:
            return None  # batches carry precomputed "context"
        if kind == "clap_flan":
            def cond(params, batch):
                return clap_mod.clap_flan_encode(
                    params["cond"], clap_cfg, batch["ori_ids"],
                    batch["struct_ids"], batch.get("ori_mask"),
                    batch.get("struct_mask"))
            return cond
        if kind == "flan":
            def cond(params, batch):
                return clap_mod.flan_encode(params["cond"], clap_cfg,
                                            batch["struct_ids"],
                                            batch.get("struct_mask"))
            return cond
        if kind.startswith("video_feat"):
            def cond(params, batch):
                return clap_mod.video_feat_encoder_apply(params["cond"],
                                                         batch["video_feat"])
            return cond
        return None

    def prepare_batch(self, raw: dict) -> Dict[str, Array]:
        """Host collate output -> device arrays on the data-sharded mesh."""
        batch: Dict[str, np.ndarray] = {}
        if "moments" in raw:  # cached VAE posteriors (encode_latents.py)
            batch["moments"] = np.asarray(raw["moments"], np.float32)
        else:
            batch["mel"] = np.asarray(raw["image"], np.float32)
        if self.train_cond and self.spec.cond_kind in ("clap_flan", "flan"):
            cap = raw["caption"]
            ori_ids, ori_mask = self.system.bert_tokenizer(cap["ori_caption"])
            st_ids, st_mask = self.system.t5_tokenizer(cap["struct_caption"])
            batch.update(ori_ids=ori_ids, ori_mask=ori_mask,
                         struct_ids=st_ids, struct_mask=st_mask)
        elif self.spec.cond_kind.startswith("video_feat"):
            batch["video_feat"] = np.asarray(raw["video_feat"], np.float32)
        elif "context" in raw:
            batch["context"] = np.asarray(raw["context"], np.float32)
        elif "caption" in raw:
            # frozen cond stage: encode outside the train step
            batch["context"] = np.asarray(
                self.system.get_learned_conditioning(raw["caption"]), np.float32)
        return {k: self._to_global(np.asarray(v)) for k, v in batch.items()}

    def _to_global(self, v: np.ndarray) -> Array:
        """Host-local batch rows -> a global data-sharded array.

        Single-process: plain device_put onto the data-sharded NamedSharding.
        Multi-process (scripts/train.py --distributed): each process loads
        only its sampler shard (BucketBatchSampler rank/num_replicas), so the
        local rows are this process's slice of the global batch —
        make_array_from_process_local_data assembles the global Array from
        per-process shards without any cross-host transfer. A plain
        device_put here would try to place the GLOBAL array from one host
        and fail (or misplace shards) on a multi-host mesh. Exercised by
        tests/test_multihost.py (2-process CPU cluster)."""
        sharding = batch_sharding(self.mesh, v.ndim)
        if jax.process_count() == 1:
            return jax.device_put(v, sharding)
        return jax.make_array_from_process_local_data(sharding, v)

    # -- scale_by_std (ddpm_audio.py:88-103) ------------------------------

    def maybe_rescale_by_std(self, batch: Dict[str, Array], key: Array) -> None:
        if self._scale_by_std_done:
            return
        if "moments" in batch:
            moments = batch["moments"]
        else:
            moments = vae_encode_moments(self.state.frozen["vae"],
                                         self.spec.vae, batch["mel"])
        z = gaussian_sample(moments, key)
        scale = 1.0 / float(jnp.std(z.flatten()))
        print(f"### USING STD-RESCALING: scale_factor = {scale:.5f} ###")
        self.state = self.state._replace(scale_factor=jnp.float32(scale))
        self.system.scale_factor = scale
        self._scale_by_std_done = True

    # -- the loop ----------------------------------------------------------

    def fit(self, loader: Iterator[dict], max_steps: int = 1000,
            seed: int = 0, audio_logger=None,
            sample_captions: Optional[list] = None) -> Dict[str, float]:
        key = jax.random.PRNGKey(seed)
        step0 = int(self.state.step)
        t_start = time.time()
        last_metrics: Dict[str, float] = {}
        with jax.set_mesh(self.mesh):
            for raw in loader:
                if int(self.state.step) - step0 >= max_steps:
                    break
                batch = self.prepare_batch(raw)
                key, sub = jax.random.split(key)
                self.maybe_rescale_by_std(batch, sub)
                try:
                    self.state, metrics = self._train_step(self.state, batch, sub)
                except Exception:
                    self.save_checkpoint(tag="crash")  # SetupCallback.on_exception
                    raise
                step = int(self.state.step)
                if step % self.log_every == 0 or step - step0 >= max_steps:
                    last_metrics = {k: float(v) for k, v in metrics.items()}
                    last_metrics["step"] = step
                    last_metrics["steps_per_sec"] = (
                        (step - step0) / max(time.time() - t_start, 1e-9))
                    # CUDACallback peak-mem equivalent
                    from maa3_tpu.utils.profiling import device_memory_stats
                    last_metrics.update(device_memory_stats())
                    self._log(last_metrics)
                if self.ckpt_every and step % self.ckpt_every == 0:
                    self.save_checkpoint()
                if audio_logger is not None and audio_logger.should_log(step):
                    self.sync_system_params()
                    caps = sample_captions or _caps_from_batch(raw)
                    if caps:
                        key, sub = jax.random.split(key)
                        audio_logger.log_samples(self.system, step, caps, sub)
        return last_metrics

    def sync_system_params(self) -> None:
        """Push the trained params back into the inference system (always in
        the canonical unfused layout — serving_dit re-fuses its own copy)."""
        dit = self.state.params["dit"]
        if "wqkv" in dit["blocks"]["attention"]:
            from maa3_tpu.utils.nprand import unfuse_dit_gemms
            dit = unfuse_dit_gemms(dit, self.spec.dit.num_heads,
                                   getattr(self.spec.dit, "n_kv_heads", None))
        self.system.params["dit"] = dit
        self.system._serving_dit = None  # invalidate the fused serving copy
        if "cond" in self.state.params:
            self.system.params["cond"] = self.state.params["cond"]
        self.system.scale_factor = float(self.state.scale_factor)

    def _log(self, metrics: Dict[str, float]) -> None:
        print("  ".join(f"{k}={v:.5g}" for k, v in metrics.items()), flush=True)
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if self._tb is None and not self._tb_failed:
            try:  # TensorBoard logger (main.py default logger equivalent)
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(self.ckpt_dir, "tb"))
            except Exception:
                self._tb_failed = True
        if self._tb is not None:
            step = int(metrics.get("step", 0))
            for k, v in metrics.items():
                if k != "step":
                    self._tb.add_scalar(f"train/{k}", v, step)

    # -- checkpointing (Orbax) --------------------------------------------

    def save_checkpoint(self, tag: Optional[str] = None,
                        keep_last_k: int = 10) -> str:
        """Orbax save + rotation (ModelCheckpoint save_top_k equivalent,
        main.py:659-679: periodic checkpoints keep the newest k; tagged
        saves — last/crash/usr1 — are never rotated)."""
        import orbax.checkpoint as ocp
        step = int(self.state.step)
        name = tag or f"step_{step:08d}"
        path = os.path.join(self.ckpt_dir, name)
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": self.state.step,
                   "scale_factor": self.state.scale_factor,
                   # frozen first stage travels with the checkpoint: a
                   # restored DiT decoded through a DIFFERENT (re-seeded)
                   # VAE produces garbage — self-contained ckpts make
                   # train -> txt2audio -> eval reproducible (round 5)
                   "frozen": self.state.frozen}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        if tag is None and keep_last_k > 0:
            import shutil
            steps = sorted(d for d in os.listdir(self.ckpt_dir)
                           if d.startswith("step_"))
            for old in steps[:-keep_last_k]:
                shutil.rmtree(os.path.join(self.ckpt_dir, old),
                              ignore_errors=True)
        return path

    # -- validation (val loss logging, ddpm.py:344-367 sync_dist role) -----

    def evaluate(self, loader: Iterator[dict], max_batches: int = 50,
                 seed: int = 0) -> Dict[str, float]:
        """Mean CFM val loss over up to max_batches (no grad, no update)."""
        if self._eval_step is None:
            conditioner = self._make_conditioner()
            cdt = getattr(self.system, "compute_dtype", jnp.bfloat16)
            apply_fn = None
            if self.spec.backbone_kind == "video_moe_dit":
                dit_cfg = self.spec.dit
                apply_fn = (lambda p, x, t, c:
                            moe_dit_apply(p, dit_cfg, x, t, c,
                                          compute_dtype=cdt, training=True))
            elif self.n_pipe > 1:
                # mirror __init__: the blocks are 'pipe'-sharded — a plain
                # dit_apply here would make GSPMD all-gather the full block
                # stack onto every chip per eval step
                from maa3_tpu.parallel.pipeline import dit_apply_pipelined
                dit_cfg, mesh, n_micro = self.spec.dit, self.mesh, self.n_micro
                apply_fn = (lambda p, x, t, c:
                            dit_apply_pipelined(p, dit_cfg, x, t, c,
                                                mesh=mesh, n_micro=n_micro,
                                                compute_dtype=cdt,
                                                training=True))
            from maa3_tpu.train.step import make_eval_step
            self._eval_step = jax.jit(make_eval_step(
                self.spec.dit, self.spec.vae,
                num_timesteps=self.spec.timesteps, compute_dtype=cdt,
                conditioner=conditioner, apply_fn=apply_fn))
        key = jax.random.PRNGKey(seed)
        losses = []
        with jax.set_mesh(self.mesh):
            for i, raw in enumerate(loader):
                if i >= max_batches:
                    break
                batch = self.prepare_batch(raw)
                key, sub = jax.random.split(key)
                # keep losses on device: a float() here would sync the host
                # every step and stall the prefetch pipeline
                losses.append(self._eval_step(self.state, batch, sub))
            mean_loss = (float(jnp.mean(jnp.stack(losses)))
                         if losses else float("nan"))
        metrics = {"val/loss_simple": mean_loss,
                   "val/batches": float(len(losses))}
        self._log(metrics | {"step": int(self.state.step)})
        return metrics

    def restore_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": self.state.params,
                   "opt_state": self.state.opt_state,
                   "step": self.state.step,
                   "scale_factor": self.state.scale_factor,
                   "frozen": self.state.frozen}
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        try:
            restored = ckptr.restore(path, target=payload)
        except Exception:
            # pre-round-5 checkpoints have no "frozen" section
            payload.pop("frozen")
            restored = ckptr.restore(path, target=payload)
        self.state = self.state._replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"], scale_factor=restored["scale_factor"],
            frozen=restored.get("frozen", self.state.frozen),
            ema_params=restored.get("ema_params", self.state.ema_params))
        self._scale_by_std_done = True
