"""End-to-end pipeline smoke test on tiny configs."""

import jax
import jax.numpy as jnp
import numpy as np

from maa3_tpu.models.dit import DiTConfig
from maa3_tpu.models.vae1d import VAEConfig
from maa3_tpu.models.bigvgan import BigVGANConfig
from maa3_tpu.pipeline import T2APipeline


def test_e2e_generate_tiny():
    dit_cfg = DiTConfig(in_channels=4, context_dim=16, hidden_size=64,
                        depth=2, num_heads=4, max_len=64)
    vae_cfg = VAEConfig(in_channels=8, out_ch=8, ch=32, ch_mult=(1, 2),
                        num_res_blocks=1, down_layers=(0,), kernel_size=5,
                        z_channels=4, embed_dim=4)
    voc_cfg = BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                            upsample_kernel_sizes=(8, 4),
                            upsample_initial_channel=16,
                            resblock_kernel_sizes=(3,),
                            resblock_dilation_sizes=((1, 3, 5),))
    key = jax.random.PRNGKey(0)
    pipe = T2APipeline.random_init(key, dit_cfg, vae_cfg, voc_cfg,
                                   compute_dtype=jnp.float32)
    ctx = jax.random.normal(key, (2, 5, 16))
    uc = jnp.zeros((2, 5, 16))
    z, mel, wav = pipe.generate(ctx, uc, key, latent_len=16,
                                guidance_scale=3.0, steps=4)
    assert z.shape == (2, 4, 16)
    assert mel.shape == (2, 8, 32)       # VAE upsamples 2x
    assert wav.shape == (2, 32 * 8)      # vocoder upsamples 8x
    assert np.isfinite(np.asarray(wav)).all()
