"""Worker process for tests/test_multihost.py — NOT a test module.

Runs one rank of a 2-process jax.distributed CPU cluster through >=2 real
Trainer.fit steps (DP over a global 4-device mesh, 2 local devices per
process). This is the executable counterpart of the reference's
multi-process DDP scaling story (reference main.py:611 launches one torch
DDP process per GPU); here the cluster is assembled by
jax.distributed.initialize and the batch shards are placed with
jax.make_array_from_process_local_data (Trainer._to_global).

Prints one JSON line per step and a final `MULTIHOST_RESULT {...}` line the
parent test parses.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any jax use (sitecustomize)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    assert jax.process_count() == args.num_processes

    import tempfile

    import jax.numpy as jnp
    import numpy as np

    from maa3_tpu.config import ModelSpec
    from maa3_tpu.models.dit import DiTConfig, dit_init
    from maa3_tpu.models.vae1d import VAEConfig, vae_init
    from maa3_tpu.system import MAA3System
    from maa3_tpu.train.loop import Trainer

    dit_cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=32,
                        depth=2, num_heads=4, max_len=64, multiple_of=16)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    spec = ModelSpec(kind="cfm", backbone_kind="text_dit", dit=dit_cfg,
                     vae=vae_cfg, cond_kind="context", cond_params_cfg={},
                     mel_dim=4, mel_length=16, scale_by_std=False,
                     cond_stage_trainable=False, base_learning_rate=1e-3)
    key = jax.random.PRNGKey(0)
    params = {"dit": dit_init(key, dit_cfg), "vae": vae_init(key, vae_cfg)}
    # CPU XLA cannot run bf16 x bf16 -> f32 einsums (DotThunk) — fp32 system
    system = MAA3System(spec, params, compute_dtype=jnp.float32)

    # per-process local rows (the DP shard this rank contributes); global
    # batch = local_bs * num_processes, assembled in Trainer._to_global
    local_bs = 2 * jax.local_device_count()
    rng = np.random.RandomState(100 + args.process_id)

    def batches(n):
        for _ in range(n):
            yield {"image": rng.randn(local_bs, 8, 32).astype(np.float32),
                   "context": rng.randn(local_bs, 5, 16).astype(np.float32)}

    with tempfile.TemporaryDirectory(prefix="maa3_mh_") as td:
        trainer = Trainer(system, batch_size=local_bs, n_model=1,
                          ckpt_dir=td, log_every=1, ckpt_every=0,
                          warm_up_steps=1, lr_multiplier=1.0)
        assert trainer.mesh.shape["data"] == (
            jax.local_device_count() * args.num_processes)
        metrics = trainer.fit(batches(args.steps + 1), max_steps=args.steps)

    result = {"process_id": args.process_id,
              "process_count": jax.process_count(),
              "global_devices": len(jax.devices()),
              "local_devices": jax.local_device_count(),
              "mesh": dict(trainer.mesh.shape),
              "steps": int(trainer.state.step),
              "loss": float(metrics["loss"])}
    print("MULTIHOST_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
