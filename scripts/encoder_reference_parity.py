"""Text-encoder parity vs executed torch at REAL production shapes (CPU).

The conditioning tower (FrozenCLAPFLANEmbedder, ldm/modules/encoders/
modules.py:132-191) = CLAP's BERT-base caption encoder -> the reference
Projection head (768 -> 1024, CLAP/clap.py:18-31) concat along seq with
T5-v1.1-large last_hidden_state. tests/test_encoders.py proves op parity at
toy dims; this script anchors the REAL shapes:

  BERT-base-uncased   (hidden 768, 12L, vocab 30522)  — HF BertModel executed
  T5-v1.1-large enc   (d_model 1024, 24L, d_ff 2816,
                       gated-gelu, vocab 32128)       — HF T5EncoderModel executed
  Projection 768->1024 — the reference class itself executed

each on seeded random weights at caption length 77 (77 + 77 = the (B,154,
1024) conditioning the DiT consumes), compared against bert_from_torch /
t5_from_torch / projection_from_torch + our JAX encoders, fp32 both sides.

Writes PARITY_ENC_REF.json; tests/test_xl_ref_parity.py asserts it.
Run: python scripts/encoder_reference_parity.py   (~4 min, 1-core CPU)
"""

import json
import os
import sys
import time

os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores the env var

import jax.numpy as jnp
import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from gen_reference_fixtures import install_stubs  # noqa: E402

B, L = 2, 77


def _stats(ours, ref):
    ours = np.asarray(ours, np.float64)
    ref = np.asarray(ref, np.float64)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    scale = max(float(np.mean(np.abs(ref))), 1e-6)
    return {"rel_mae": float(np.mean(np.abs(ours - ref))) / scale,
            "rel_max": float(np.max(np.abs(ours - ref))) / scale}


def _ids(vocab, seed):
    rng = np.random.RandomState(seed)
    ids = rng.randint(2, vocab, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[0, 60:] = 0  # one padded row to exercise masking
    ids[0, 60:] = 0
    return ids, mask


def bert_real(t0, res):
    from transformers import BertConfig, BertModel
    import maa3_tpu.models.bert as jbert

    hf_cfg = BertConfig()  # bert-base-uncased defaults (hidden 768, 12L)
    torch.manual_seed(41)
    model = BertModel(hf_cfg).eval()
    n = sum(p.numel() for p in model.parameters())
    ids, mask = _ids(hf_cfg.vocab_size, 42)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model

    cfg = jbert.BertConfig(vocab_size=hf_cfg.vocab_size,
                           hidden_size=hf_cfg.hidden_size,
                           num_layers=hf_cfg.num_hidden_layers,
                           num_heads=hf_cfg.num_attention_heads,
                           intermediate_size=hf_cfg.intermediate_size,
                           max_position=hf_cfg.max_position_embeddings)
    params = jbert.bert_from_torch(sd, cfg)
    ours = jbert.bert_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    res["bert_base"] = {**_stats(ours, ref.numpy()),
                        "params_m": round(n / 1e6, 1)}
    print(f"[enc-ref] bert done ({time.time()-t0:.0f}s)", flush=True)


def t5_real(t0, res):
    from transformers import T5Config, T5EncoderModel
    import maa3_tpu.models.t5 as jt5

    # google/t5-v1_1-large (ldm/modules/encoders/modules.py:149-155)
    hf_cfg = T5Config(vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816,
                      num_layers=24, num_heads=16,
                      feed_forward_proj="gated-gelu",
                      tie_word_embeddings=False)
    torch.manual_seed(43)
    model = T5EncoderModel(hf_cfg).eval()
    n = sum(p.numel() for p in model.parameters())
    ids, mask = _ids(hf_cfg.vocab_size, 44)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids, dtype=torch.long),
                    attention_mask=torch.tensor(mask)).last_hidden_state
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del model

    cfg = jt5.T5Config(vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816,
                       num_layers=24, num_heads=16,
                       relative_attention_num_buckets=
                       hf_cfg.relative_attention_num_buckets,
                       relative_attention_max_distance=
                       hf_cfg.relative_attention_max_distance,
                       gated_ff=True)
    params = jt5.t5_from_torch(sd, cfg)
    ours = jt5.t5_apply(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    res["t5_v1_1_large"] = {**_stats(ours, ref.numpy()),
                            "params_m": round(n / 1e6, 1)}
    print(f"[enc-ref] t5 done ({time.time()-t0:.0f}s)", flush=True)


def projection_real(t0, res):
    # CLAP/audio.py imports torchlibrosa at module top (absent in this
    # image; unused by the Projection class) — stub it
    import types
    import importlib.machinery
    tl = types.ModuleType("torchlibrosa")
    tl.__spec__ = importlib.machinery.ModuleSpec("torchlibrosa", loader=None)
    st = types.ModuleType("torchlibrosa.stft")
    st.__spec__ = importlib.machinery.ModuleSpec("torchlibrosa.stft",
                                                 loader=None)
    st.Spectrogram = st.LogmelFilterBank = object
    tl.stft = st
    sys.modules.setdefault("torchlibrosa", tl)
    sys.modules.setdefault("torchlibrosa.stft", st)

    from ldm.modules.encoders.CLAP.clap import Projection
    from maa3_tpu.models.clap import projection_apply, projection_from_torch

    torch.manual_seed(45)
    proj = Projection(768, 1024).eval()  # CLAP d_proj 1024 (CLAP/config.yml)
    x = torch.randn(B, L, 768, generator=torch.Generator().manual_seed(46))
    with torch.no_grad():
        ref = proj(x)
    sd = {k: v.numpy() for k, v in proj.state_dict().items()}
    params = projection_from_torch(sd)
    ours = projection_apply(params, jnp.asarray(x.numpy()))
    res["clap_projection"] = _stats(ours, ref.numpy())
    print(f"[enc-ref] projection done ({time.time()-t0:.0f}s)", flush=True)


def main():
    t0 = time.time()
    install_stubs()
    res = {}
    bert_real(t0, res)
    t5_real(t0, res)
    projection_real(t0, res)
    res["_meta"] = {
        "batch": B, "seq_len": L, "dtype": "float32",
        "backend": "cpu (torch/HF vs XLA)",
        "ref": "HF BertModel / T5EncoderModel (the classes the reference "
               "loads, modules.py:132-191) + CLAP/clap.py Projection, "
               "executed at bert-base-uncased / t5-v1_1-large configs",
        "wall_s": round(time.time() - t0, 1),
    }
    out = os.path.join(REPO, "PARITY_ENC_REF.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)
    print(f"[enc-ref] wrote {out} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
