"""Train -> Orbax checkpoint -> load into MAA3System -> generate.
The full lifecycle glue test."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_train import _tiny_system, _batches
from maa3_tpu.train.loop import Trainer
from maa3_tpu.system import MAA3System


def test_train_save_load_generate(tmp_path):
    system = _tiny_system(tmp_path)
    spec = system.spec
    trainer = Trainer(system, batch_size=8, ckpt_dir=str(tmp_path / "ckpt"),
                      log_every=10, ckpt_every=0)
    trainer.fit(_batches(3), max_steps=3)
    path = trainer.save_checkpoint()
    trained_w = np.asarray(
        trainer.state.params["dit"]["blocks"]["attention"]["wq"]["w"])
    scale = float(trainer.state.scale_factor)

    system2 = MAA3System._from_orbax(spec, path, seed=123,
                                     compute_dtype=jnp.float32,
                                     clap_cfg=system.clap_cfg)
    system2.bert_tokenizer.max_length = 12
    system2.t5_tokenizer.max_length = 12
    # trained weights + scale factor restored (not re-initialized)
    np.testing.assert_allclose(
        np.asarray(system2.params["dit"]["blocks"]["attention"]["wq"]["w"]),
        trained_w)
    assert abs(system2.scale_factor - scale) < 1e-6

    # full generation through the restored system
    c = system2.get_learned_conditioning(
        {"ori_caption": ["a dog barks"], "struct_caption": ["<dog& all>"]})
    uc = system2.get_learned_conditioning(
        {"ori_caption": [""], "struct_caption": [""]})
    z = system2.sample_cfg(c, 3.0, uc, jax.random.PRNGKey(0),
                           shape=(1, 4, 16), timesteps=3)
    mel = system2.decode_first_stage(z)
    assert mel.shape == (1, 8, 32)
    assert np.isfinite(np.asarray(mel)).all()
