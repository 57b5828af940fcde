#!/usr/bin/env python
"""Training entry — the reference `main.py` CLI surface on the TPU stack.

  python scripts/train.py -b configs/txt2audio-cfm-cfg.yaml -t \
      [--max_steps N] [--ckpt_dir D] [--resume PATH] [key.sub=value ...]

Builds the model + data from YAML (reference main.py:604-626), scales the lr
by ndata*bs (main.py:786-790), runs the jitted CFM train step over the
data(x model) mesh, Orbax-checkpoints, and logs metrics JSONL.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

if os.environ.get("MAA3_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MAA3_PLATFORM"])

from maa3_tpu.utils import enable_compile_cache

if jax.default_backend() != "cpu":
    enable_compile_cache()  # CPU AOT cache entries can SIGILL across hosts


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="*", default=[])
    p.add_argument("-t", "--train", action="store_true")
    p.add_argument("-r", "--resume", type=str, default="")
    p.add_argument("--vae_ckpt", type=str, default="",
                   help="Orbax dir saved by scripts/train_vae.py; replaces "
                        "the frozen first-stage VAE before training (the "
                        "checkpoint then carries it, so txt2audio -r "
                        "decodes through the SAME VAE)")
    p.add_argument("--torch_ckpt", type=str, default="",
                   help="warm-start from a reference .ckpt")
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--ckpt_dir", type=str, default="logs/maa3")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_model", type=int, default=1,
                   help="tensor-parallel axis size")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient accumulation (accumulate_grad_batches)")
    p.add_argument("--n_pipe", type=int, default=1,
                   help="GPipe pipeline-parallel stages: shard the DiT "
                        "block stack depth-wise over a 'pipe' mesh axis "
                        "(parallel/pipeline.py); composes with --n_model")
    p.add_argument("--n_micro", type=int, default=1,
                   help="microbatches per pipeline step (fill/drain bubble "
                        "fraction = (n_pipe-1)/(n_micro+n_pipe-1))")
    p.add_argument("--seq_parallel", action="store_true",
                   help="Megatron-style sequence parallelism: shard the "
                        "inter-block residual over the sequence axis on "
                        "'model' (activations 1/n per chip; requires "
                        "--n_model > 1)")
    p.add_argument("--n_expert", type=int, default=1,
                   help="expert-parallel axis size for the video MoE: shard "
                        "the stacked-expert FFN axis over an 'expert' mesh "
                        "axis (mesh.py::add_ep_specs; dense MoE, no "
                        "all-to-all); composes with --n_model")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard params/AdamW moments/EMA over the "
                        "'data' mesh axis (1/n bytes per chip; XLA "
                        "all-gathers weights and reduce-scatters grads). "
                        "Required to fit the 1.47B XXL recipe on 16 GB chips.")
    p.add_argument("--fuse_gemms", action="store_true",
                   help="train on the fused wqkv/w13 layout (wider MXU "
                        "GEMMs; single-axis data-parallel only)")
    p.add_argument("--mu_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="AdamW first-moment dtype (bfloat16 frees ~1.5 GB)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize DiT blocks in backward (activation "
                        "memory ~depth-fold smaller; needed for XL+ on 16GB)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (multi-host pods; "
                        "coordinator/process env vars per JAX conventions)")
    p.add_argument("--audio_log_every", type=int, default=0,
                   help="AudioLogger sample dump interval (0 = off)")
    p.add_argument("--val_every", type=int, default=0,
                   help="validation interval in steps (0 = off)")
    p.add_argument("--val_batches", type=int, default=20)
    p.add_argument("overrides", nargs="*", default=[])
    return p.parse_known_args()


def build_loader(cfg: dict, system, batch_size: int, seed: int,
                 split: str = "train"):
    """Map the config's data subtree onto our dataset classes."""
    from maa3_tpu.data.datasets import (TextSpecDataset, AnyLenSpecDataset,
                                        BucketBatchSampler, PrefetchLoader,
                                        collate_spec)
    data = cfg.get("data", {}).get("params", {})
    train = data.get(split if split in data else "train", {})
    target = train.get("target", "")
    params = train.get("params", {})
    dcfg = params.get("dataset_cfg", params.get("specs_dataset_cfg", params))

    ds_split = "train" if split == "train" else "valid"
    if "txt_spec_dataset" in target or "dataset_name" in dcfg:
        # lazy=True batches npy reads through the native C++ loader
        ds = TextSpecDataset(ds_split, dcfg["dataset_name"],
                             dcfg.get("spec_crop_len", 624),
                             dcfg.get("drop", 0.0) if ds_split == "train" else 0.0,
                             seed=seed, lazy=True,
                             # corrupted-moments fallback shape: known from
                             # the VAE config, not guessed (2*embed_dim)
                             moments_dim=2 * system.spec.vae.embed_dim)
        indices = list(range(len(ds)))
        collate = ds.collater
    else:
        ds = AnyLenSpecDataset(ds_split, dcfg["main_spec_dir_path"],
                               dcfg.get("other_spec_dir_path", ""),
                               drop=dcfg.get("drop", 0.0) if ds_split == "train" else 0.0,
                               spec_crop_len=dcfg.get("spec_crop_len", 1248),
                               seed=seed)
        indices = ds.ordered_indices()
        collate = ds.collater

    nproc = jax.process_count()
    sampler = BucketBatchSampler(indices, batch_size, num_replicas=nproc,
                                 rank=jax.process_index(), seed=seed)

    def epochs():
        epoch = 0
        while True:
            sampler.set_epoch(epoch)
            yield from PrefetchLoader(ds, sampler, collate)
            epoch += 1

    return epochs()


def main():
    opt, _ = parse_args()
    if opt.multihost:
        # NCCL init_process_group equivalent (SURVEY §2.5): one process per
        # host; JAX wires the ICI/DCN topology from the pod environment.
        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}")
    from maa3_tpu import config as config_mod
    from maa3_tpu.system import MAA3System
    from maa3_tpu.train.loop import Trainer
    import jax.numpy as jnp

    cfg = config_mod.load_config(opt.base, opt.overrides)
    system = MAA3System.from_config(opt.base, opt.overrides,
                                    ckpt_path=opt.torch_ckpt or None,
                                    seed=opt.seed)
    if opt.vae_ckpt:
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(opt.vae_ckpt))
        system.params["vae"] = jax.tree.map(jnp.asarray, restored["vae"])
        print(f"frozen VAE <- {opt.vae_ckpt}")
    if opt.remat:
        import dataclasses
        system.spec = dataclasses.replace(
            system.spec, dit=dataclasses.replace(system.spec.dit, remat=True))
    batch_size = opt.batch_size or cfg.get("data", {}).get("params", {}).get(
        "batch_size", 16)
    import jax.numpy as _jnp
    trainer = Trainer(system, batch_size=batch_size, ckpt_dir=opt.ckpt_dir,
                      use_ema=opt.use_ema, n_model=opt.n_model,
                      accum_steps=opt.accum_steps,
                      mu_dtype=_jnp.dtype(opt.mu_dtype),
                      fuse_gemms=opt.fuse_gemms, fsdp=opt.fsdp,
                      n_pipe=opt.n_pipe, n_micro=opt.n_micro,
                      seq_parallel=opt.seq_parallel, n_expert=opt.n_expert)
    if opt.resume:
        trainer.restore_checkpoint(opt.resume)

    # SIGUSR1 -> checkpoint now (main.py:798-815 melk equivalent)
    import signal

    def melk(*_):
        print("SIGUSR1: checkpointing...")
        trainer.save_checkpoint(tag="usr1")

    try:
        signal.signal(signal.SIGUSR1, melk)
    except (ValueError, OSError):
        pass  # non-main thread / platform without SIGUSR1

    loader = build_loader(cfg, system, batch_size, opt.seed)
    audio_logger = None
    if opt.audio_log_every:
        from maa3_tpu.train.audio_logger import AudioLogger
        audio_logger = AudioLogger(opt.ckpt_dir,
                                   every_n_steps=opt.audio_log_every)
    if opt.val_every:
        # interleave fit/evaluate in val_every-sized chunks
        done = 0
        while done < opt.max_steps:
            chunk = min(opt.val_every, opt.max_steps - done)
            metrics = trainer.fit(loader, max_steps=chunk, seed=opt.seed,
                                  audio_logger=audio_logger)
            done += chunk
            val_loader = build_loader(cfg, system, batch_size, opt.seed,
                                      split="validation")
            trainer.evaluate(val_loader, max_batches=opt.val_batches)
    else:
        metrics = trainer.fit(loader, max_steps=opt.max_steps, seed=opt.seed,
                              audio_logger=audio_logger)
    trainer.save_checkpoint(tag="last")
    print("final:", metrics)


if __name__ == "__main__":
    main()
