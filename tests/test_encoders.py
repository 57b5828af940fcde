"""Parity tests: JAX BERT / T5 encoders vs torch transformers oracles.

The torch models are built offline from local configs (random init), their
state_dicts ported through our importers, and outputs compared.
"""

import os

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import numpy as np
import jax.numpy as jnp
import torch

from maa3_tpu.models import bert as jbert
from maa3_tpu.models import t5 as jt5
from maa3_tpu.models.clap import (
    projection_apply, projection_from_torch, CLAPFLANConfig, clap_flan_init,
    clap_flan_encode)


def test_bert_parity_small():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=24, type_vocab_size=2)
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = jbert.BertConfig(vocab_size=100, hidden_size=32, num_layers=2,
                           num_heads=4, intermediate_size=64, max_position=24)
    params = jbert.bert_from_torch(sd, cfg)

    ids = np.array([[1, 5, 9, 2, 0, 0], [3, 4, 5, 6, 7, 2]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)
    ours = jbert.bert_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_t5_parity_small():
    from transformers import T5Config, T5EncoderModel
    hf_cfg = T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=48,
                      num_layers=3, num_heads=4, relative_attention_num_buckets=8,
                      relative_attention_max_distance=20,
                      feed_forward_proj="gated-gelu", tie_word_embeddings=False)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = jt5.T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=48,
                       num_layers=3, num_heads=4,
                       relative_attention_num_buckets=8,
                       relative_attention_max_distance=20, gated_ff=True)
    params = jt5.t5_from_torch(sd, cfg)

    ids = np.array([[4, 9, 13, 2, 1, 0, 0], [3, 4, 5, 6, 7, 8, 1]], np.int32)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1, 1]], np.int32)
    ours = jt5.t5_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_projection_parity():
    torch.manual_seed(1)
    lin1 = torch.nn.Linear(16, 24, bias=False)
    lin2 = torch.nn.Linear(24, 24, bias=False)
    ln = torch.nn.LayerNorm(24)
    sd = {"linear1.weight": lin1.weight.detach().numpy(),
          "linear2.weight": lin2.weight.detach().numpy(),
          "layer_norm.weight": ln.weight.detach().numpy(),
          "layer_norm.bias": ln.bias.detach().numpy()}
    params = projection_from_torch(sd)
    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    ours = projection_apply(params, jnp.asarray(x))
    with torch.no_grad():
        e1 = lin1(torch.tensor(x))
        e2 = lin2(torch.nn.functional.gelu(e1))
        ref = ln(e1 + e2)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_clap_flan_concat_shape():
    import jax
    cfg = CLAPFLANConfig(
        bert=jbert.BertConfig(vocab_size=50, hidden_size=16, num_layers=1,
                              num_heads=2, intermediate_size=32, max_position=16),
        t5=jt5.T5Config(vocab_size=60, d_model=24, d_kv=4, d_ff=32,
                        num_layers=1, num_heads=2),
        d_proj=24, max_length=8)
    params = clap_flan_init(jax.random.PRNGKey(0), cfg)
    ori = jnp.zeros((2, 8), jnp.int32)
    struct = jnp.ones((2, 8), jnp.int32)
    out = clap_flan_encode(params, cfg, ori, struct)
    assert out.shape == (2, 16, 24)  # concat along seq
