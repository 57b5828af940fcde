"""Data layer tests: collate, bucketed sampler, datasets, structurizer."""

import csv
import os

import numpy as np

from maa3_tpu.data.datasets import (collate_spec, BucketBatchSampler,
                                    TextSpecDataset, TestManifestDataset,
                                    PrefetchLoader, read_tsv)
from maa3_tpu.data.structurize import natural_to_struct, struct_to_natural
from maa3_tpu.data.tokenizers import WordPieceTokenizer, HashTokenizer


def _write_tsv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        w.writeheader()
        w.writerows(rows)


def _make_dataset(tmp_path, n=10):
    rows = []
    for i in range(n):
        mel = np.random.RandomState(i).randn(80, 100 + 37 * i).astype(np.float32)
        mp = str(tmp_path / f"m{i}.npy")
        np.save(mp, mel)
        rows.append({"name": f"s{i}", "dataset": "t", "ori_cap": f"cap {i}",
                     "caption": f"<cap {i}& all>", "audio_path": "x",
                     "mel_path": mp, "duration": str(1.0 + i)})
    tsv = str(tmp_path / "m.tsv")
    _write_tsv(tsv, rows)
    return tsv


def test_collate_spec_pad_and_tile():
    specs = [np.ones((4, 70)), np.ones((4, 100))]
    out = collate_spec(specs, mode="pad", pad_value=-5.0, min_len=64,
                       max_len=1248, min_factor=4)
    assert out.shape == (2, 4, 100)  # 100 is already mult of 4
    assert (out[0, :, 70:] == -5.0).all()
    out_t = collate_spec(specs, mode="tile")
    assert (out_t[0, :, 70:] == 1.0).all()  # tiled, not padded
    # clamps to min/max
    assert collate_spec([np.ones((4, 10))]).shape[-1] == 64
    assert collate_spec([np.ones((4, 2000))]).shape[-1] == 1248
    # rounds to multiple of 4
    assert collate_spec([np.ones((4, 70))]).shape[-1] == 72


def test_bucket_sampler_rank_split_and_epoch_shuffle():
    idx = list(range(100))
    s0 = BucketBatchSampler(idx, 10, num_replicas=4, rank=0, seed=1)
    s1 = BucketBatchSampler(idx, 10, num_replicas=4, rank=1, seed=1)
    b0, b1 = list(s0), list(s1)
    assert len(b0) == 3 and len(b1) == 3  # 10 batches: ranks 0,1 get 3 each
    flat0 = {i for b in b0 for i in b}
    flat1 = {i for b in b1 for i in b}
    assert not flat0 & flat1  # disjoint across ranks
    before = [list(b) for b in s0]
    s0.set_epoch(1)
    after = [list(b) for b in s0]
    assert before != after  # epoch-seeded shuffle changes batch order


def test_text_spec_dataset_and_loader(tmp_path):
    tsv = _make_dataset(tmp_path)
    ds = TextSpecDataset("train", tsv, spec_crop_len=128, drop=0.0)
    item = ds[0]
    assert item["image"].shape == (80, 128)  # tiled up from 100
    assert item["caption"]["ori_caption"] == "cap 0"

    def collate(items):
        return {"image": np.stack([it["image"] for it in items])}

    sampler = BucketBatchSampler(list(range(len(ds))), 4, shuffle=False)
    batches = list(PrefetchLoader(ds, sampler, collate))
    assert len(batches) == 3  # 10 items / bs 4 -> 3 (last partial)
    assert batches[0]["image"].shape == (4, 80, 128)


def test_caption_dropout(tmp_path):
    tsv = _make_dataset(tmp_path)
    ds = TextSpecDataset("train", tsv, spec_crop_len=64, drop=1.0)
    assert ds[0]["caption"]["ori_caption"] == ""


def test_test_manifest_name_numbering(tmp_path):
    rows = [{"name": "a", "dataset": "t", "ori_cap": "x", "caption": "<x& all>",
             "audio_path": "p", "mel_path": str(tmp_path / "nope.npy"),
             "duration": "1"} for _ in range(3)]
    tsv = str(tmp_path / "t.tsv")
    _write_tsv(tsv, rows)
    ds = TestManifestDataset(tsv, spec_crop_len=64)
    names = [ds[i]["f_name"] for i in range(3)]
    assert names == ["a_0", "a_1", "a_2"]
    # corrupted mel tolerance: pad_value fill
    assert (ds[0]["image"] == -5.0).all()


def test_structurizer_roundtrip():
    assert natural_to_struct("a dog barks") == "<a dog barks& all>"
    assert struct_to_natural("<a dog barks& all>") == "a dog barks"
    assert struct_to_natural("<rain& start>@<thunder& end>") == "rain, then thunder"
    assert natural_to_struct("") == ""


def test_structurizer_llm_hook():
    """The pluggable LLM callable (n2s_by_openai.py:7-35 equivalent): the
    hook receives prompt+caption and its structured answer is used verbatim.
    (A live GPT endpoint is out of scope in this zero-egress environment;
    any text->text callable, e.g. a local LLM, slots in here.)"""
    seen = {}

    def fake_llm(prompt: str) -> str:
        seen["prompt"] = prompt
        return "<rain falls& start>@<thunder& end>"

    out = natural_to_struct("rain falls then thunder", llm=fake_llm)
    assert out == "<rain falls& start>@<thunder& end>"
    assert "rain falls then thunder" in seen["prompt"]
    # and the inverse maps it back to natural text
    assert struct_to_natural(out) == "rain falls, then thunder"


def test_wordpiece_tokenizer(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "dog", "bark", "##s",
             "##ing", "."]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(vp), max_length=10)
    ids, mask = tok(["A dog barks."])
    # [CLS] a dog bark ##s . [SEP]
    assert ids.shape == (1, 10)
    assert list(ids[0][:7]) == [2, 4, 5, 6, 7, 9, 3]
    assert mask[0].sum() == 7
    # unknown word -> [UNK]
    ids2, _ = tok(["zebra"])
    assert ids2[0][1] == 1


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer()
    a1, m1 = tok(["hello world"])
    a2, _ = tok(["hello world"])
    np.testing.assert_array_equal(a1, a2)
    assert m1[0].sum() == 4  # cls + 2 words + sep


def test_prefetch_multiworker_order_and_errors(tmp_path):
    """num_workers>1 must preserve sampler batch order exactly and surface
    worker exceptions at the right position."""

    class SlowDS:
        def __getitem__(self, i):
            import time
            time.sleep(0.002 * (7 - i % 8))  # out-of-order completion
            return i

    sampler = [[i, i + 1] for i in range(0, 32, 2)]
    loader = PrefetchLoader(SlowDS(), sampler, collate_fn=list, prefetch=4,
                            num_workers=4)
    out = list(loader)
    assert out == sampler  # order preserved despite reordered completion

    class BadDS:
        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("corrupt shard")
            return i

    loader = PrefetchLoader(BadDS(), sampler, collate_fn=list, num_workers=3)
    got = []
    try:
        for b in loader:
            got.append(b)
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
    assert got == sampler[:2]  # batches before the bad one arrived in order


def test_heuristic_structurizer():
    """Deterministic n2s follows the reference prompt's own examples
    (preprocess/n2s_by_openai.py:20-27): sequential connectives spread
    start/mid/end, simultaneous clauses share their anchor's span."""
    from maa3_tpu.data.structurize import (heuristic_natural_to_struct,
                                           struct_to_natural)

    assert (heuristic_natural_to_struct(
        "Train passing followed by short honks three times")
        == "<Train passing& all>@<short honks three times& end>")
    s = heuristic_natural_to_struct(
        "a bird sings, then a dog barks, then thunder rolls")
    assert s == ("<a bird sings& start>@<a dog barks& mid>"
                 "@<thunder rolls& end>")
    # simultaneous clause inherits the group's time
    s = heuristic_natural_to_struct("rain falls while wind blows")
    assert s == "<rain falls& all>@<wind blows& all>"
    # single event
    assert heuristic_natural_to_struct("a dog barks.") == "<a dog barks& all>"
    assert heuristic_natural_to_struct("") == ""
    # roundtrip through the inverse keeps the events in order
    nat = struct_to_natural(heuristic_natural_to_struct(
        "a bird sings, then a dog barks"))
    assert nat == "a bird sings, then a dog barks"


def test_structurize_captions_cli(tmp_path):
    import subprocess
    import sys as _sys

    tsv = tmp_path / "caps.tsv"
    tsv.write_text("name\tori_cap\nr1\ta dog barks followed by thunder\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(root, "scripts",
                                       "structurize_captions.py"),
         "--tsv_path", str(tsv)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = (tmp_path / "caps.struct.tsv").read_text().splitlines()
    assert out[0] == "name\tori_cap\tcaption"
    assert out[1].endswith("<a dog barks& all>@<thunder& end>")
