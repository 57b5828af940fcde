"""maa3_tpu — a TPU-native latent flow-matching text/video-to-audio framework.

Re-implements the full capability surface of Make-An-Audio-3 (Lumina-Next audio)
as an idiomatic JAX/XLA/Pallas framework:

- Next-DiT flow-matching backbone (text + video-MoE variants)
- 1-D mel-latent KL VAE
- BigVGAN ("bigvnat") vocoder with alias-free snake activations
- CLAP/T5 text encoders, CAVP/CLIP video feature conditioning
- Conditional flow matching (CFM) training + fused 25-step CFG Euler ODE sampling
- SPMD training over a jax.sharding.Mesh (data/tensor axes), Orbax checkpoints
- PyTorch checkpoint importer for the released reference weights

The design is TPU-first: static shapes, `lax.scan` over transformer layers and
ODE steps, bf16 matmuls with fp32 islands (RoPE / norms / softmax), and XLA
collectives over ICI via `jax.sharding` — not a port of the reference's
CUDA/torch patterns.
"""

__version__ = "0.1.0"
