"""AudioLDM-variant pipeline (audioldm.py:20,635 capability): FiLM-conditioned
2-D UNet + DDIM/PLMS CFG + 2-D VAE decode + HiFiGAN vocoder, assembled."""

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.pipeline_audioldm import AudioLDMPipeline, hifigan_config
from maa3_tpu.models.unet2d import UNet2DConfig, unet2d_init, unet2d_apply
from maa3_tpu.models.vae2d import VAE2DConfig
from maa3_tpu.models.bigvgan import BigVGANConfig


def _tiny():
    return AudioLDMPipeline.random_init(
        jax.random.PRNGKey(0),
        unet_cfg=UNet2DConfig(in_channels=4, out_channels=4, model_channels=16,
                              channel_mult=(1, 2), num_res_blocks=1,
                              attention_levels=(1,), num_heads=2, film_dim=24),
        vae_cfg=VAE2DConfig(ch=16, ch_mult=(1, 2), z_channels=4, embed_dim=4,
                            num_res_blocks=1),
        voc_cfg=BigVGANConfig(num_mels=8, upsample_rates=(4, 2),
                              upsample_kernel_sizes=(8, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3, 5),),
                              activation="lrelu"),
        latent_f=4, latent_t=8)


def test_generate_sample_shapes_and_finite():
    pipe = _tiny()
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24), jnp.float32)
    wav, mel = pipe.generate_sample(cond, jax.random.PRNGKey(2), ddim_steps=4,
                                    unconditional_guidance_scale=2.0)
    # latent (4, 8) -> x2 VAE upsample -> mel (2, M=8?, T=16) ...
    assert mel.shape[0] == 2 and wav.shape[0] == 2
    assert wav.shape[1] == mel.shape[2] * 8  # prod(upsample_rates)
    assert np.isfinite(np.asarray(wav)).all()


def test_generate_sample_best_of_n():
    pipe = _tiny()
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 24), jnp.float32)

    def select_fn(wav):  # prefer quietest candidate, deterministic
        return -jnp.mean(jnp.abs(wav), axis=-1)

    wav, mel = pipe.generate_sample(cond, jax.random.PRNGKey(2), ddim_steps=2,
                                    n_candidate_gen_per_text=3,
                                    unconditional_guidance_scale=1.5,
                                    select_fn=select_fn)
    assert wav.shape[0] == 2 and mel.shape[0] == 2
    assert np.isfinite(np.asarray(wav)).all()


def test_plms_path():
    pipe = _tiny()
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 24), jnp.float32)
    wav, mel = pipe.generate_sample(cond, jax.random.PRNGKey(2), ddim_steps=4,
                                    use_plms=True)
    assert np.isfinite(np.asarray(wav)).all()


def test_film_changes_output():
    """The FiLM embedding must actually modulate the UNet."""
    cfg = UNet2DConfig(in_channels=4, out_channels=4, model_channels=16,
                       channel_mult=(1, 2), num_res_blocks=1,
                       attention_levels=(), num_heads=2, film_dim=12)
    params = unet2d_init(jax.random.PRNGKey(0), cfg)
    # conv_out and every resblock conv2 are zero-init (openaimodel
    # convention), which blocks the temb/film path at raw init: randomize
    params["conv_out"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(9), params["conv_out"]["w"].shape)
    rb = params["down"][0]["res"][0]
    rb["conv2"]["w"] = 0.1 * jax.random.normal(jax.random.PRNGKey(10),
                                               rb["conv2"]["w"].shape)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    t = jnp.array([100])
    f1 = jax.random.normal(jax.random.PRNGKey(2), (1, 12))
    out1 = unet2d_apply(params, cfg, x, t, film=f1)
    out2 = unet2d_apply(params, cfg, x, t, film=10.0 * f1)
    assert float(jnp.abs(out1 - out2).max()) > 1e-6
