"""CLAP-score evaluation: cosine similarity of audio vs caption embeddings.

Capability parity with wav_evaluation/models/CLAPWrapper.py:19-247 and
wav_evaluation/cal_clap_score.py:50-106:
- audio branch: resample to 44.1 kHz, repeat/crop to `duration` (5 s default),
  Cnn14 -> Projection(2048 -> 1024)
- text branch: BERT [CLS] -> Projection(768 -> 1024)  (NOTE: the eval CLAP
  uses the pooled [CLS] token, CLAP/clap.py TextEncoder.forward out[:, 0, :])
- score = cosine(text, audio); audiocaps GT reference ~ 0.479
  (cal_clap_score.py:50)
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from maa3_tpu.models.cnn14 import Cnn14Config, cnn14_apply, cnn14_from_torch, cnn14_init
from maa3_tpu.models.bert import BertConfig, bert_apply, bert_from_torch, bert_init
from maa3_tpu.models.clap import projection_apply, projection_from_torch, projection_init
from maa3_tpu.data.tokenizers import load_tokenizer

Array = jax.Array


@dataclasses.dataclass
class CLAPScorer:
    params: dict            # {audio, audio_proj, text, text_proj}
    audio_cfg: Cnn14Config
    bert_cfg: BertConfig
    tokenizer: object
    duration: float = 5.0

    @classmethod
    def random_init(cls, key: Array, tokenizer_dir: Optional[str] = None):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        audio_cfg = Cnn14Config()
        bert_cfg = BertConfig()
        params = {
            "audio": cnn14_init(k1, audio_cfg),
            "audio_proj": projection_init(k2, 2048, 1024),
            "text": bert_init(k3, bert_cfg),
            "text_proj": projection_init(k4, 768, 1024),
        }
        return cls(params, audio_cfg, bert_cfg,
                   load_tokenizer(tokenizer_dir, "bert", max_length=100))

    @classmethod
    def from_torch_ckpt(cls, weights_path: str,
                        tokenizer_dir: Optional[str] = None):
        """CLAP_weights_2022.pth: {'model': {audio_encoder.*, caption_encoder.*}}"""
        import torch
        sd = torch.load(weights_path, map_location="cpu",
                        weights_only=False)["model"]
        sd = {k: v.numpy() for k, v in sd.items()}
        audio_cfg = Cnn14Config()
        bert_cfg = BertConfig()
        params = {
            "audio": cnn14_from_torch(sd, audio_cfg, prefix="audio_encoder.base."),
            "audio_proj": projection_from_torch(sd, prefix="audio_encoder.projection."),
            "text": bert_from_torch(sd, bert_cfg, prefix="caption_encoder.base."),
            "text_proj": projection_from_torch(sd, prefix="caption_encoder.projection."),
        }
        return cls(params, audio_cfg, bert_cfg,
                   load_tokenizer(tokenizer_dir, "bert", max_length=100))

    # -- embeddings --------------------------------------------------------

    def _prep_audio(self, wav: np.ndarray, sr: int) -> np.ndarray:
        """Resample to 44.1 kHz; repeat-tile or random-crop to duration
        (CLAPWrapper.load_audio_into_tensor semantics, crop start 0)."""
        target_sr = self.audio_cfg.sample_rate
        if sr != target_sr:
            from scipy.signal import resample_poly
            g = math.gcd(sr, target_sr)
            wav = resample_poly(wav, target_sr // g, sr // g)
        need = int(self.duration * target_sr)
        if len(wav) < need:
            reps = int(np.ceil(need / max(len(wav), 1)))
            wav = np.tile(wav, reps)
        return wav[:need].astype(np.float32)

    def audio_embeddings(self, wavs: List[np.ndarray], sr: int = 16000) -> Array:
        batch = np.stack([self._prep_audio(w, sr) for w in wavs])
        out = cnn14_apply(self.params["audio"], self.audio_cfg,
                          jnp.asarray(batch))
        return projection_apply(self.params["audio_proj"], out["embedding"])

    def text_embeddings(self, captions: List[str]) -> Array:
        ids, mask = self.tokenizer(list(captions))
        h = bert_apply(self.params["text"], self.bert_cfg, jnp.asarray(ids),
                       jnp.asarray(mask))
        cls_tok = h[:, 0, :]  # CLAP TextEncoder pools [CLS]
        return projection_apply(self.params["text_proj"], cls_tok)

    def score(self, wavs: List[np.ndarray], captions: List[str],
              sr: int = 16000) -> np.ndarray:
        """Per-pair cosine similarity (cal_clap_score.py cosine path)."""
        a = self.audio_embeddings(wavs, sr)
        t = self.text_embeddings(captions)
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        return np.asarray(jnp.sum(a * t, axis=-1))
