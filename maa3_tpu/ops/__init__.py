from maa3_tpu.ops.basic import (
    dense,
    dense_init,
    layer_norm,
    rms_norm,
    rms_norm_init,
    group_norm,
    modulate,
    silu,
    timestep_embedding,
    timestep_embedder_init,
    timestep_embedder_apply,
)
from maa3_tpu.ops.rope import precompute_rope, apply_rope
from maa3_tpu.ops.ffn import swiglu_hidden_dim, feed_forward_init, feed_forward_apply
from maa3_tpu.ops.attention import attention_init, attention_apply
from maa3_tpu.ops.conv import conv1d, conv1d_init, conv_transpose1d
