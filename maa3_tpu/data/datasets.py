"""Host-side data pipeline: TSV manifests -> numpy batches.

Capability parity with ldm/data/ (SURVEY §2.2), rebuilt without torch:

- `TextSpecDataset`: txt_spec_dataset.py:13-107 — fixed-length crop/tile to
  spec_crop_len (624), CFG caption dropout, test split = first 100 rows.
- `AnyLenSpecDataset` + `collate_spec`: joinaudiodataset_struct_sample_anylen
  .py:14-134. The fork's `collate_1d_or_2d`/`collate_1d_or_2d_tile` import is
  MISSING upstream (broken as shipped) — re-implemented here: pad (with
  pad_value=-5) or tile each (80, T) to the batch max length rounded up to a
  multiple of 4, clipped to [64, spec_crop_len].
- `TestManifestDataset`: eval TSVs with per-name numbering (:150-236).
- `BucketBatchSampler`: DDPIndexBatchSampler (:240-318) — duration-sorted
  batches, epoch-seeded shuffle, `batches[rank::num_replicas]` split. On TPU
  the "rank" is the process index; per-host batches feed the data-sharded
  mesh axis.
- Corruption tolerance: unreadable mels become pad_value-filled specs
  (loader-level fault tolerance instead of crashes, :114-125).

Batches are plain dicts of numpy arrays + caption string lists; device_put
and text encoding happen in the training loop.
"""

from __future__ import annotations

import csv
import glob
import math
import os
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def read_tsv(path: str) -> List[dict]:
    with open(path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f, delimiter="\t", quotechar=None,
                                doublequote=False, lineterminator="\n",
                                quoting=csv.QUOTE_NONE)
        return [dict(r) for r in reader]


def _round_len(t: int, min_len: int, max_len: int, factor: int) -> int:
    t = max(min_len, min(t, max_len))
    return factor * math.ceil(t / factor)


def collate_spec(specs: Sequence[np.ndarray], mode: str = "pad",
                 pad_value: float = -5.0, min_len: int = 64,
                 max_len: int = 1248, min_factor: int = 4) -> np.ndarray:
    """Batch (C, T_i) specs to (B, C, T*) with T* = round4(max T_i) in
    [min_len, max_len]; 'pad' fills pad_value, 'tile' repeats the clip."""
    tgt = _round_len(max(s.shape[1] for s in specs), min_len, max_len, min_factor)
    out = np.full((len(specs), specs[0].shape[0], tgt),
                  pad_value if mode == "pad" else 0.0, np.float32)
    for i, s in enumerate(specs):
        s = s[:, :tgt]
        if mode == "tile" and s.shape[1] < tgt:
            s = np.tile(s, math.ceil(tgt / s.shape[1]))[:, :tgt]
        out[i, :, : s.shape[1]] = s
    return out


def _load_mel(path: str, mel_num: int, fallback_len: int,
              pad_value: float) -> np.ndarray:
    try:
        return np.load(path).astype(np.float32)
    except Exception:
        print(f"corrupted mel: {path}", flush=True)
        return np.full((mel_num, fallback_len), pad_value, np.float32)


class TextSpecDataset:
    """Fixed-length T2A dataset (spec_crop_len crop/tile, caption dropout).

    `lazy=True` defers the npy read to `collater`, which batches it through
    the native C++ loader (maa3_tpu.native) — parallel file I/O off the GIL.
    """

    def __init__(self, split: str, dataset_name: str, spec_crop_len: int = 624,
                 drop: float = 0.0, mel_num: int = 80, seed: int = 0,
                 lazy: bool = False, latent_downsample: int = 2,
                 moments_dim: int = 40):
        self.samples = read_tsv(dataset_name)
        if split in ("valid", "test"):
            self.samples = self.samples[:100]
        self.crop_len = spec_crop_len
        self.drop = drop
        self.mel_num = mel_num
        self.rng = np.random.RandomState(seed)
        self.lazy = lazy
        self.latent_downsample = latent_downsample
        # cached-moments channel count (2*embed_dim) for the corrupted-file
        # fallback. Callers that know the VAE config pass 2*embed_dim
        # (scripts/train.py); it is also confirmed from the first healthy
        # load, and if the FIRST read is the corrupted one, the fallback
        # scans ahead for a healthy file before trusting the default — so
        # the fallback array can never mismatch healthy items in collate.
        self.moments_dim = moments_dim
        self._moments_dim_confirmed = False
        self._native = None

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> dict:
        data = self.samples[idx]
        if self.rng.uniform() > self.drop:
            caption = {"ori_caption": data["ori_cap"],
                       "struct_caption": data.get("caption", data["ori_cap"])}
        else:
            caption = {"ori_caption": "", "struct_caption": ""}
        if "moments_path" in data and data["moments_path"]:
            # cached VAE posterior moments (scripts/encode_latents.py):
            # crop/tile on the latent grid (crop_len // latent_downsample).
            # encode(crop(mel)) == crop(encode(mel)) away from clip edges
            # (the VAE is convolutional); boundary frames differ within the
            # encoder's receptive field — measured negligible vs the saved
            # per-step encode.
            tgt = self.crop_len // self.latent_downsample
            # corrupted-file fallback must be MOMENTS-shaped, not mel-shaped
            # (channels = 2*embed_dim, length on the latent grid) or the
            # collate np.stack dies on the one bad file the fallback exists
            # to survive; all-zero moments = unit-Gaussian latent, harmless
            try:
                m = np.load(data["moments_path"]).astype(np.float32)
                self.moments_dim = m.shape[0]  # learn 2*embed_dim
                self._moments_dim_confirmed = True
            except Exception:
                print(f"corrupted moments: {data['moments_path']}", flush=True)
                if not self._moments_dim_confirmed:
                    # the very first read was the corrupted one: learn the
                    # true channel count from a healthy neighbor before
                    # emitting a fallback that collate must stack
                    for other in self.samples[:32]:
                        mp = other.get("moments_path")
                        if not mp or mp == data["moments_path"]:
                            continue
                        try:
                            self.moments_dim = int(np.load(mp).shape[0])
                            self._moments_dim_confirmed = True
                            break
                        except Exception:
                            continue
                m = np.zeros((self.moments_dim, tgt), np.float32)
            if m.shape[1] < tgt:
                m = np.tile(m, math.ceil(tgt / m.shape[1]))
            return {"caption": caption, "moments": m[:, :tgt]}
        if self.lazy:
            return {"caption": caption, "mel_path": data["mel_path"]}
        spec = _load_mel(data["mel_path"], self.mel_num, self.crop_len, 0.0)
        if spec.shape[1] < self.crop_len:
            spec = np.tile(spec, math.ceil(self.crop_len / spec.shape[1]))
        spec = spec[:, : self.crop_len]
        return {"caption": caption, "image": spec}

    def collater(self, items: List[dict]) -> dict:
        caption = {
            "ori_caption": [it["caption"]["ori_caption"] for it in items],
            "struct_caption": [it["caption"]["struct_caption"] for it in items],
        }
        if "moments" in items[0]:
            return {"moments": np.stack([it["moments"] for it in items]),
                    "caption": caption}
        if self.lazy:
            if self._native is None:
                from maa3_tpu.native import NativeLoader
                self._native = NativeLoader(rows=self.mel_num)
            image = self._native.load_batch(
                [it["mel_path"] for it in items], self.crop_len, mode="tile")
        else:
            image = np.stack([it["image"] for it in items])
        return {"image": image, "caption": caption}


class AnyLenSpecDataset:
    """Variable-length manifest-dir dataset with duration-ordered indices."""

    def __init__(self, split: str, main_spec_dir_path: str,
                 other_spec_dir_path: str = "", mel_num: int = 80,
                 mode: str = "pad", spec_crop_len: int = 1248,
                 pad_value: float = -5.0, drop: float = 0.0, seed: int = 0,
                 **_):
        assert mode in ("pad", "tile")
        rows: List[dict] = []
        for dir_path in main_spec_dir_path.split(","):
            for mf in sorted(glob.glob(f"{dir_path}/*.tsv")):
                rows += read_tsv(mf)
        if split == "train":
            self.samples = rows[100:]
        elif split in ("valid", "val"):
            self.samples = rows[:100]
        elif split == "test":
            self.samples = _add_name_num(rows)
        else:
            raise ValueError(f"unknown split {split}")
        self.split = split
        self.mel_num = mel_num
        self.mode = mode
        self.max_batch_len = spec_crop_len
        self.min_batch_len = 64
        self.min_factor = 4
        self.pad_value = pad_value
        self.drop = drop
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.samples)

    def ordered_indices(self) -> List[int]:
        durs = [float(s.get("duration", 0.0)) for s in self.samples]
        return list(np.argsort(np.asarray(durs), kind="stable"))

    def __getitem__(self, idx: int) -> dict:
        data = self.samples[idx]
        if self.rng.uniform() > self.drop:
            caption = {"ori_caption": data["ori_cap"],
                       "struct_caption": data.get("caption", data["ori_cap"])}
        else:
            caption = {"ori_caption": "", "struct_caption": ""}
        spec = _load_mel(data["mel_path"], self.mel_num, self.min_batch_len,
                         self.pad_value)
        spec = spec[:, : self.max_batch_len]
        item = {"image": spec, "caption": caption}
        if self.split == "test":
            item["f_name"] = data["name"]
        return item

    def collater(self, items: List[dict]) -> dict:
        out = {
            "image": collate_spec([it["image"] for it in items], self.mode,
                                  self.pad_value, self.min_batch_len,
                                  self.max_batch_len, self.min_factor),
            "caption": {
                "ori_caption": [it["caption"]["ori_caption"] for it in items],
                "struct_caption": [it["caption"]["struct_caption"] for it in items],
            },
        }
        if "f_name" in items[0]:
            out["f_name"] = [it["f_name"] for it in items]
        return out


def _add_name_num(rows: List[dict]) -> List[dict]:
    """Suffix duplicate names with _N so each audio-caption pair is unique
    (joinaudiodataset_struct_sample_anylen.py:51-64)."""
    counts: Dict[str, int] = {}
    out = []
    for r in rows:
        r = dict(r)
        name = str(r.get("name", ""))
        n = counts.get(name, 0)
        counts[name] = n + 1
        r["name"] = f"{name}_{n}"
        out.append(r)
    return out


class TestManifestDataset(AnyLenSpecDataset):
    """Single-TSV eval dataset (TestManifest, :150-236)."""

    def __init__(self, manifest: str, mel_num: int = 80, mode: str = "pad",
                 spec_crop_len: int = 1248, pad_value: float = -5.0, **_):
        assert mode in ("pad", "tile")
        self.samples = _add_name_num(read_tsv(manifest))
        self.split = "test"
        self.mel_num = mel_num
        self.mode = mode
        self.max_batch_len = spec_crop_len
        self.min_batch_len = 64
        self.min_factor = 4
        self.pad_value = pad_value
        self.drop = 0.0
        self.rng = np.random.RandomState(0)


class BucketBatchSampler:
    """Duration-bucketed batches, epoch-seeded shuffle, per-rank round-robin
    split (DDPIndexBatchSampler semantics, :240-318)."""

    def __init__(self, indices: Sequence[int], batch_size: int,
                 num_replicas: int = 1, rank: int = 0, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False):
        assert 0 <= rank < num_replicas
        self.indices = list(indices)
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.batches = self._build()

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self.batches = self._build()

    def _build(self) -> List[List[int]]:
        batches, batch = [], []
        for idx in self.indices:
            batch.append(idx)
            if len(batch) == self.batch_size:
                batches.append(batch)
                batch = []
        if not self.drop_last and batch:
            batches.append(batch)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            batches = [batches[i] for i in rng.permutation(len(batches))]
        if self.drop_last and len(batches) % self.num_replicas != 0:
            batches = batches[: len(batches) // self.num_replicas * self.num_replicas]
        if len(batches) >= self.num_replicas:
            batches = batches[self.rank :: self.num_replicas]
        elif batches:
            batches = [batches[0]]
        return batches

    def __iter__(self) -> Iterator[List[int]]:
        return iter(self.batches)

    def __len__(self) -> int:
        return len(self.batches)


class PrefetchLoader:
    """Background-thread batch loader (the torch DataLoader replacement).

    num_workers > 1 loads batches concurrently (npy reads release the GIL
    inside numpy / the C++ loader) while PRESERVING sampler batch order, so
    multi-worker runs stay bit-identical to single-worker ones. A deeper
    C++ loader slots in behind the same interface.
    """

    def __init__(self, dataset, sampler, collate_fn=None, prefetch: int = 4,
                 num_workers: int = 1):
        self.dataset = dataset
        self.sampler = sampler
        self.collate = collate_fn or getattr(dataset, "collater", None)
        self.prefetch = max(prefetch, num_workers)
        self.num_workers = max(1, num_workers)

    def __len__(self) -> int:
        return len(self.sampler)

    def _load(self, batch_idx):
        items = [self.dataset[i] for i in batch_idx]
        return self.collate(items) if self.collate else items

    def __iter__(self):
        if self.num_workers == 1:
            yield from self._iter_single()
        else:
            yield from self._iter_multi()

    def _iter_single(self):
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for batch_idx in self.sampler:
                    q.put(self._load(batch_idx))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def _iter_multi(self):
        in_q: queue_mod.Queue = queue_mod.Queue()
        batches = list(self.sampler)
        for seq, b in enumerate(batches):
            in_q.put((seq, b))
        done: dict = {}
        cond = threading.Condition()
        inflight = threading.Semaphore(self.prefetch)  # bound memory

        def worker():
            while True:
                try:
                    seq, batch_idx = in_q.get_nowait()
                except queue_mod.Empty:
                    return
                inflight.acquire()
                try:
                    out = self._load(batch_idx)
                except BaseException as e:  # surface errors in order
                    out = e
                with cond:
                    done[seq] = out
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        for seq in range(len(batches)):
            with cond:
                cond.wait_for(lambda: seq in done)
                out = done.pop(seq)
            inflight.release()
            if isinstance(out, BaseException):
                raise out
            yield out
