"""Pure-python T5 unigram tokenizer vs the Rust `tokenizers` golden.

The reference loads T5Tokenizer from the HF hub
(ldm/modules/encoders/modules.py:149-155); our UnigramTokenizer must
reproduce the exact ids with no Rust/C++ dependency, from either a
tokenizer.json or a raw sentencepiece spiece.model protobuf."""

import os
import struct

import numpy as np
import pytest

from maa3_tpu.data.tokenizers import (HFTokenizer, UnigramTokenizer,
                                      parse_spiece_model, load_tokenizer)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "t5_unigram",
                       "tokenizer.json")

SENTENCES = [
    "a dog barks",
    "the cat",
    "the dog barksloudly",   # viterbi must split loud+ly inside a word
    "dogs bark",             # '▁bark' segments as '▁'+'bark' (score win)
    "a  dog",                # double space -> lone '▁' pretoken
    "the cat  ",             # trailing spaces preserved (fast semantics)
    "",                      # empty -> [</s>]
    "a Zebra!",              # unknown chars -> unk nodes
    "a ZZQ dog",             # consecutive unknowns fuse into ONE unk
    "aZZa",                  # unk in the middle of a word
    "ﬁsh",              # NFKC: 'ﬁ' ligature -> 'fi'
    "the the the the the the the the the the",  # truncation
]


def test_unigram_bitmatch_rust_tokenizer_json():
    pytest.importorskip("tokenizers")
    max_length = 8
    golden = HFTokenizer(FIXTURE, max_length)
    ours = UnigramTokenizer.from_tokenizer_json(FIXTURE, max_length)
    g_ids, g_mask = golden(SENTENCES)
    o_ids, o_mask = ours(SENTENCES)
    for s, gi, oi in zip(SENTENCES, g_ids, o_ids):
        np.testing.assert_array_equal(oi, gi, err_msg=repr(s))
    np.testing.assert_array_equal(o_mask, g_mask)


def test_unigram_bitmatch_rust_t5_length():
    pytest.importorskip("tokenizers")
    golden = HFTokenizer(FIXTURE, 77)
    ours = UnigramTokenizer.from_tokenizer_json(FIXTURE, 77)
    g_ids, _ = golden(SENTENCES)
    o_ids, _ = ours(SENTENCES)
    np.testing.assert_array_equal(o_ids, g_ids)


# ---------------------------------------------------------------------------
# spiece.model protobuf path
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _spiece_bytes(pieces):
    """Hand-encode a sentencepiece ModelProto: repeated field 1 of
    SentencePiece{piece=1 string, score=2 float, type=3 enum}. Includes an
    unknown field (trainer_spec, field 2) to exercise the parser's skip."""
    blob = b""
    for piece, score, ptype in pieces:
        pb = piece.encode("utf-8")
        sub = (bytes([0x0A]) + _varint(len(pb)) + pb        # field 1, wire 2
               + bytes([0x15]) + struct.pack("<f", score))  # field 2, wire 5
        if ptype != 1:
            sub += bytes([0x18]) + _varint(ptype)           # field 3, wire 0
        blob += bytes([0x0A]) + _varint(len(sub)) + sub
    blob += bytes([0x12]) + _varint(3) + b"xyz"  # unknown submessage: skip
    return blob


def _fixture_pieces():
    import json
    with open(FIXTURE, encoding="utf-8") as f:
        spec = json.load(f)
    out = []
    for i, (piece, score) in enumerate(spec["model"]["vocab"]):
        ptype = {0: 3, 1: 3, 2: 2}.get(i, 1)  # pad/eos control, unk unknown
        out.append((piece, float(score), ptype))
    return out


def test_parse_spiece_model(tmp_path):
    pieces = _fixture_pieces()
    path = tmp_path / "spiece.model"
    path.write_bytes(_spiece_bytes(pieces))
    parsed = parse_spiece_model(str(path))
    assert len(parsed) == len(pieces)
    for (p0, s0, t0), (p1, s1, t1) in zip(pieces, parsed):
        assert p0 == p1 and t0 == t1
        assert abs(s0 - s1) < 1e-6


def test_spiece_path_matches_tokenizer_json(tmp_path):
    """Same vocab through the protobuf reader must tokenize identically to
    the tokenizer.json path on single-spaced text (the slow sentencepiece
    normalizer additionally collapses whitespace runs — by design)."""
    path = tmp_path / "spiece.model"
    path.write_bytes(_spiece_bytes(_fixture_pieces()))
    sp = UnigramTokenizer.from_spiece(str(path), 12)
    tj = UnigramTokenizer.from_tokenizer_json(FIXTURE, 12)
    single_spaced = [s for s in SENTENCES if "  " not in s and s == s.strip()]
    np.testing.assert_array_equal(sp(single_spaced)[0],
                                  tj(single_spaced)[0])
    # slow-normalizer whitespace semantics
    ids_collapsed, _ = sp(["a   dog  barks "])
    ids_plain, _ = sp(["a dog barks"])
    np.testing.assert_array_equal(ids_collapsed, ids_plain)


def test_load_tokenizer_resolves_spiece(tmp_path):
    d = tmp_path / "t5"
    d.mkdir()
    (d / "spiece.model").write_bytes(_spiece_bytes(_fixture_pieces()))
    tok = load_tokenizer(str(d), "t5", max_length=10)
    assert isinstance(tok, UnigramTokenizer)
    ids, mask = tok(["a dog barks"])
    assert ids.shape == (1, 10)
    assert ids[0, 3] == 1  # </s> after ▁a ▁dog ▁barks
