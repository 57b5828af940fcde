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


class UnigramTokenizer:
    """Pure-python sentencepiece-unigram tokenizer (the T5 family).

    No Rust/C++ deps: reads either a HF `tokenizer.json` (Unigram model) or a
    raw sentencepiece `spiece.model` protobuf (see `parse_spiece_model`), and
    reproduces the reference pipeline (ldm/modules/encoders/modules.py:149-155
    loads T5Tokenizer from the hub):

      NFKC -> Metaspace (every space becomes ▁, split before each, prefix
      one at the start) -> per-pretoken Viterbi maximizing summed piece
      scores (unknown chars: single-char nodes at min_score - 10, consecutive
      unks fused) -> "$A </s>" template -> truncate/pad to max_length.

    Bit-matches the `tokenizers` Rust lib on the same assets
    (tests/test_tokenizers_unigram.py). `collapse_whitespace=True` mirrors
    the SLOW sentencepiece normalizer (remove_extra_whitespaces) used for
    `spiece.model`; the fast tokenizer.json path keeps whitespace runs.
    """

    _UNK_PENALTY = 10.0
    _SP = "▁"  # ▁

    def __init__(self, pieces: List[str], scores: List[float],
                 unk_id: int, special_ids: set, max_length: int = 77,
                 eos_id: int = 1, pad_id: int = 0,
                 collapse_whitespace: bool = False):
        self.scores = scores
        self.unk_id = unk_id
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.max_length = max_length
        self.collapse_whitespace = collapse_whitespace
        # special/control pieces (<pad>, </s>, <unk>) never match raw text
        self.match = {p: i for i, p in enumerate(pieces)
                      if i not in special_ids}
        self.max_piece_len = max(len(p) for p in self.match)
        self.unk_score = min(scores[i] for i in self.match.values()) \
            - self._UNK_PENALTY

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_tokenizer_json(cls, path: str, max_length: int = 77):
        import json
        with open(path, encoding="utf-8") as f:
            spec = json.load(f)
        model = spec["model"]
        if model.get("type") != "Unigram":
            raise ValueError(f"not a Unigram tokenizer.json: {path}")
        pieces = [p for p, _ in model["vocab"]]
        scores = [float(s) for _, s in model["vocab"]]
        special = {t["id"] for t in spec.get("added_tokens", [])
                   if t.get("special")}
        unk_id = model.get("unk_id", 2)
        special = special | {unk_id}
        ids = {p: i for i, p in enumerate(pieces)}
        return cls(pieces, scores, unk_id, special, max_length,
                   eos_id=ids.get("</s>", 1), pad_id=ids.get("<pad>", 0))

    @classmethod
    def from_spiece(cls, path: str, max_length: int = 77):
        pieces = parse_spiece_model(path)
        names = [p for p, _, _ in pieces]
        scores = [s for _, s, _ in pieces]
        # types: 1=NORMAL 2=UNKNOWN 3=CONTROL 4=USER_DEFINED 6=BYTE
        special = {i for i, (_, _, t) in enumerate(pieces) if t in (2, 3)}
        unk = next((i for i, (_, _, t) in enumerate(pieces) if t == 2), 2)
        ids = {p: i for i, p in enumerate(names)}
        return cls(names, scores, unk, special, max_length,
                   eos_id=ids.get("</s>", 1), pad_id=ids.get("<pad>", 0),
                   collapse_whitespace=True)

    # -- pipeline ----------------------------------------------------------

    def _normalize(self, text: str) -> str:
        text = unicodedata.normalize("NFKC", text)
        text = text.replace("\t", " ").replace("\n", " ").replace("\r", " ")
        if self.collapse_whitespace:
            text = " ".join(text.split())
        return text

    def _pretokens(self, text: str) -> List[str]:
        """Metaspace(prepend always, split): replace spaces with ▁, prefix
        one, split BEFORE each ▁ (so "a  b" -> ["▁a", "▁", "▁b"])."""
        if not text:
            return []
        s = self._SP + text.replace(" ", self._SP)
        out, start = [], 0
        for i in range(1, len(s)):
            if s[i] == self._SP:
                out.append(s[start:i])
                start = i
        out.append(s[start:])
        return out

    def _viterbi(self, s: str) -> List[int]:
        """Max-score segmentation; unknown chars become single-char unk nodes
        (score min - 10) only where no piece covers, then fused."""
        n = len(s)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back = [0] * (n + 1)
        bid = [0] * (n + 1)
        best[0] = 0.0
        for e in range(1, n + 1):
            lo = max(0, e - self.max_piece_len)
            for st in range(lo, e):
                if best[st] == NEG:
                    continue
                pid = self.match.get(s[st:e])
                if pid is not None:
                    sc = best[st] + self.scores[pid]
                    if sc > best[e]:
                        best[e], back[e], bid[e] = sc, st, pid
            if best[e] == NEG and best[e - 1] != NEG:
                best[e] = best[e - 1] + self.unk_score
                back[e], bid[e] = e - 1, self.unk_id
        out, e = [], n
        while e > 0:
            out.append(bid[e])
            e = back[e]
        out.reverse()
        fused = []
        for pid in out:
            if fused and pid == self.unk_id and fused[-1] == self.unk_id:
                continue
            fused.append(pid)
        return fused

    def __call__(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        batch_ids, batch_mask = [], []
        for text in texts:
            ids: List[int] = []
            for pt in self._pretokens(self._normalize(text)):
                ids.extend(self._viterbi(pt))
            # truncation reserves the template's </s> slot (Rust semantics)
            ids = ids[: self.max_length - 1] + [self.eos_id]
            mask = [1] * len(ids)
            pad = self.max_length - len(ids)
            ids += [self.pad_id] * pad
            mask += [0] * pad
            batch_ids.append(ids)
            batch_mask.append(mask)
        return np.array(batch_ids, np.int32), np.array(batch_mask, np.int32)


def _skip_proto_field(data: bytes, i: int, wire: int) -> int:
    if wire == 0:
        while data[i] & 0x80:
            i += 1
        return i + 1
    if wire == 1:
        return i + 8
    if wire == 2:
        ln, i = _read_varint(data, i)
        return i + ln
    if wire == 5:
        return i + 4
    raise ValueError(f"unsupported protobuf wire type {wire}")


def _read_varint(data: bytes, i: int) -> Tuple[int, int]:
    result, shift = 0, 0
    while True:
        b = data[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def parse_spiece_model(path: str) -> List[Tuple[str, float, int]]:
    """Minimal protobuf reader for sentencepiece's ModelProto: returns
    [(piece, score, type)] from the repeated `pieces` field (field 1;
    SentencePiece submessage: piece=1 string, score=2 float, type=3 enum).
    No protoc / sentencepiece dependency — the wire format is stable."""
    import struct

    with open(path, "rb") as f:
        data = f.read()
    pieces: List[Tuple[str, float, int]] = []
    i = 0
    while i < len(data):
        tag, i = _read_varint(data, i)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, i = _read_varint(data, i)
            end = i + ln
            piece, score, ptype = "", 0.0, 1
            j = i
            while j < end:
                t2, j = _read_varint(data, j)
                f2, w2 = t2 >> 3, t2 & 7
                if f2 == 1 and w2 == 2:
                    l2, j = _read_varint(data, j)
                    piece = data[j:j + l2].decode("utf-8")
                    j += l2
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", data[j:j + 4])[0]
                    j += 4
                elif f2 == 3 and w2 == 0:
                    ptype, j = _read_varint(data, j)
                else:
                    j = _skip_proto_field(data, j, w2)
            pieces.append((piece, score, ptype))
            i = end
        else:
            i = _skip_proto_field(data, i, wire)
    return pieces


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


def _from_tokenizer_json(path: str, max_length: int):
    """tokenizer.json: Rust `tokenizers` lib when importable, else the
    pure-python UnigramTokenizer (bit-equal for Unigram models)."""
    try:
        return HFTokenizer(path, max_length)
    except ImportError:
        return UnigramTokenizer.from_tokenizer_json(path, max_length)


def load_tokenizer(path_or_dir: Optional[str], kind: str = "bert",
                   max_length: int = 77):
    """Best local asset wins:
    tokenizer.json > spiece.model (T5 sentencepiece) > vocab.txt > hash."""
    if path_or_dir:
        if os.path.isfile(path_or_dir):
            if path_or_dir.endswith(".json"):
                return _from_tokenizer_json(path_or_dir, max_length)
            if path_or_dir.endswith(".model"):
                return UnigramTokenizer.from_spiece(path_or_dir, max_length)
        tj = os.path.join(path_or_dir, "tokenizer.json")
        if os.path.isfile(tj):
            return _from_tokenizer_json(tj, max_length)
        sp = os.path.join(path_or_dir, "spiece.model")
        if os.path.isfile(sp):
            return UnigramTokenizer.from_spiece(sp, max_length)
        vt = os.path.join(path_or_dir, "vocab.txt")
        if os.path.isfile(vt):
            return WordPieceTokenizer(vt, max_length)
    _warn_hash_fallback(kind, path_or_dir)
    return HashTokenizer(max_length=max_length)
