"""Offline tokenizers for the conditioning towers.

The reference uses HF AutoTokenizer/T5Tokenizer pulled from the hub
(ldm/modules/encoders/modules.py:149-155). This environment (and many
production TPU pods) is zero-egress, so everything here loads from local
files:

- `HFTokenizer`: wraps a local `tokenizer.json` via the `tokenizers` Rust lib
  (works for both BERT-wordpiece and T5-sentencepiece exports).
- `WordPieceTokenizer`: pure-python BERT basic+wordpiece from a `vocab.txt`
  (bit-parity with BertTokenizer for standard English text).
- `HashTokenizer`: deterministic fallback for tests/dev with no assets.

All return fixed-length (max_length=77) id/mask arrays, matching the
reference's `padding="max_length", truncation=True` calls.
"""

from __future__ import annotations

import os
import unicodedata
from typing import List, Optional, Tuple

import numpy as np


class HFTokenizer:
    """Local tokenizer.json via the `tokenizers` library."""

    def __init__(self, path: str, max_length: int = 77):
        from tokenizers import Tokenizer
        self.tok = Tokenizer.from_file(path)
        self.max_length = max_length
        self.tok.enable_truncation(max_length)
        pad_id = self.tok.token_to_id("[PAD]")
        if pad_id is None:
            pad_id = self.tok.token_to_id("<pad>") or 0
        self.tok.enable_padding(length=max_length, pad_id=pad_id)

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        encs = self.tok.encode_batch(list(texts))
        ids = np.array([e.ids for e in encs], np.int32)
        mask = np.array([e.attention_mask for e in encs], np.int32)
        return ids, mask


class WordPieceTokenizer:
    """BERT-style tokenization from a vocab.txt: basic (lowercase, punct
    split) + greedy wordpiece, [CLS] ... [SEP], pad to max_length."""

    def __init__(self, vocab_path: str, max_length: int = 77,
                 lowercase: bool = True):
        self.vocab = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.max_length = max_length
        self.lowercase = lowercase
        self.unk = self.vocab.get("[UNK]", 0)
        self.cls = self.vocab.get("[CLS]", 0)
        self.sep = self.vocab.get("[SEP]", 0)
        self.pad = self.vocab.get("[PAD]", 0)

    @staticmethod
    def _is_punct(ch: str) -> bool:
        cp = ord(ch)
        if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
            return True
        return unicodedata.category(ch).startswith("P")

    def _basic(self, text: str) -> List[str]:
        if self.lowercase:
            text = text.lower()
        text = unicodedata.normalize("NFD", text)
        text = "".join(c for c in text if unicodedata.category(c) != "Mn")
        out, cur = [], []
        for ch in text:
            if ch.isspace():
                if cur:
                    out.append("".join(cur))
                    cur = []
            elif self._is_punct(ch):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > 100:
            return [self.unk]
        tokens, start = [], 0
        while start < len(word):
            end, cur_id = len(word), None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur_id = self.vocab[sub]
                    break
                end -= 1
            if cur_id is None:
                return [self.unk]
            tokens.append(cur_id)
            start = end
        return tokens

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        batch_ids, batch_mask = [], []
        for text in texts:
            ids = [self.cls]
            for w in self._basic(text):
                ids.extend(self._wordpiece(w))
            ids = ids[: self.max_length - 1] + [self.sep]
            mask = [1] * len(ids)
            pad = self.max_length - len(ids)
            ids += [self.pad] * pad
            mask += [0] * pad
            batch_ids.append(ids)
            batch_mask.append(mask)
        return np.array(batch_ids, np.int32), np.array(batch_mask, np.int32)


class HashTokenizer:
    """Deterministic dev/test fallback: stable hash per whitespace token."""

    def __init__(self, vocab_size: int = 30522, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        import hashlib
        batch_ids, batch_mask = [], []
        for text in texts:
            words = text.lower().split()[: self.max_length - 2]
            ids = [101]  # CLS-like
            for w in words:
                h = int(hashlib.md5(w.encode()).hexdigest(), 16)
                ids.append(1000 + h % (self.vocab_size - 1100))
            ids.append(102)  # SEP-like
            mask = [1] * len(ids)
            pad = self.max_length - len(ids)
            ids += [0] * pad
            mask += [0] * pad
            batch_ids.append(ids)
            batch_mask.append(mask)
        return np.array(batch_ids, np.int32), np.array(batch_mask, np.int32)


_warned_hash_fallback = False


def _warn_hash_fallback(kind: str, path_or_dir: Optional[str]) -> None:
    """Hash tokenization silently producing garbage conditioning was the
    round-1 footgun: make it loud (once), but stay quiet under pytest."""
    global _warned_hash_fallback
    if _warned_hash_fallback or "PYTEST_CURRENT_TEST" in os.environ:
        return
    _warned_hash_fallback = True
    import sys
    print(
        f"\n{'!' * 72}\n"
        f"WARNING: no real {kind} tokenizer assets found"
        f"{f' under {path_or_dir!r}' if path_or_dir else ''} — falling back\n"
        f"to a hash tokenizer. Token ids will NOT match the trained model:\n"
        f"text conditioning will be garbage. Point MAA3_TOKENIZER_DIR (or\n"
        f"--tokenizer_dir) at a directory with bert/vocab.txt and\n"
        f"t5/tokenizer.json (from bert-base-uncased / t5-v1_1-large).\n"
        f"{'!' * 72}\n", file=sys.stderr)


def load_tokenizer(path_or_dir: Optional[str], kind: str = "bert",
                   max_length: int = 77):
    """Best local asset wins: tokenizer.json > vocab.txt > hash fallback."""
    if path_or_dir:
        tj = os.path.join(path_or_dir, "tokenizer.json")
        if os.path.isfile(path_or_dir) and path_or_dir.endswith(".json"):
            return HFTokenizer(path_or_dir, max_length)
        if os.path.isfile(tj):
            return HFTokenizer(tj, max_length)
        vt = os.path.join(path_or_dir, "vocab.txt")
        if os.path.isfile(vt):
            return WordPieceTokenizer(vt, max_length)
    _warn_hash_fallback(kind, path_or_dir)
    return HashTokenizer(max_length=max_length)
