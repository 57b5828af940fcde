"""StandardNormalizeAudio / Crop vs the EXECUTED reference implementation
(ldm/modules/losses_audio/vggishish/transforms.py) on the same temp mels."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from maa3_tpu.data.transforms import Crop, StandardNormalizeAudio

REF = "/root/reference/ldm/modules/losses_audio/vggishish/transforms.py"


def _load_reference_transforms():
    """Import the reference module with its unavailable deps stubbed
    (albumentations is not installed here; StandardNormalizeAudio itself
    never touches it)."""
    if "albumentations" not in sys.modules:
        stub = types.ModuleType("albumentations")
        stub.RandomCrop = stub.CenterCrop = object
        stub.Compose = lambda *a, **k: None
        sys.modules["albumentations"] = stub
    spec = importlib.util.spec_from_file_location("ref_transforms", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def mel_tree(tmp_path):
    """specs dir with ids file: 5 random (80, T) train mels, varying T."""
    rng = np.random.RandomState(0)
    specs = tmp_path / "mels"
    specs.mkdir()
    ids = []
    for i, t in enumerate((120, 200, 64, 310, 150)):
        mel = (rng.randn(80, t) * (1 + i * 0.3) - 2.0).astype(np.float32)
        np.save(specs / f"vid{i}_mel.npy", mel)
        ids.append(f"vid{i}")
    ids_path = tmp_path / "train_ids.txt"
    ids_path.write_text("\n".join(ids) + "\n")
    return specs, ids_path, tmp_path


def test_stats_match_executed_reference(mel_tree):
    specs, ids_path, tmp = mel_tree
    ref_mod = _load_reference_transforms()
    ref_cache = tmp / "ref_cache"
    our_cache = tmp / "our_cache"
    ref_cache.mkdir(), our_cache.mkdir()
    ref = ref_mod.StandardNormalizeAudio(str(specs), str(ids_path),
                                         str(ref_cache))
    ours = StandardNormalizeAudio(str(specs), str(ids_path), str(our_cache))
    np.testing.assert_array_equal(ours.means, ref.train_stats["means"])
    np.testing.assert_array_equal(ours.stds, ref.train_stats["stds"])
    # identical cache file contents (same name mangling, same %0.8f format)
    name = f"train_means_stds_{specs.stem}.txt"
    assert (ref_cache / name).read_text() == (our_cache / name).read_text()


def test_apply_matches_executed_reference(mel_tree):
    import torch
    specs, ids_path, tmp = mel_tree
    ref_mod = _load_reference_transforms()
    ref = ref_mod.StandardNormalizeAudio(str(specs), str(ids_path), str(tmp))
    ours = StandardNormalizeAudio(str(specs), str(ids_path), str(tmp))
    x = np.random.RandomState(1).randn(3, 80, 50).astype(np.float32)
    got = ours(x)
    want = ref(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    # dict form ('image' key, the datasets' mel key)
    d = ours({"image": x[0]})
    np.testing.assert_allclose(d["image"], want[0], rtol=0, atol=1e-6)


def test_cache_roundtrip(mel_tree):
    """Second construction loads the cached txt — values survive the %0.8f
    write/read roundtrip and no mel is re-read (transforms.py:44-48)."""
    specs, ids_path, tmp = mel_tree
    first = StandardNormalizeAudio(str(specs), str(ids_path), str(tmp))
    # remove the mels: a reload MUST come from the cache
    for f in specs.glob("*.npy"):
        f.unlink()
    second = StandardNormalizeAudio(str(specs), str(ids_path), str(tmp))
    np.testing.assert_allclose(second.means, first.means, atol=5e-9)
    np.testing.assert_allclose(second.stds, first.stds, atol=5e-9)
    third = StandardNormalizeAudio.from_stats_file(first.cache_path)
    np.testing.assert_array_equal(third.means, second.means)


def test_train_paths_override(mel_tree):
    """Explicit train_paths (our TSV manifests carry full mel paths) gives
    the same stats as the ids-file route."""
    specs, ids_path, tmp = mel_tree
    a = StandardNormalizeAudio(str(specs), str(ids_path), str(tmp))
    paths = [str(specs / f"vid{i}_mel.npy") for i in range(5)]
    (tmp / "c2").mkdir()
    b = StandardNormalizeAudio(str(specs), cache_path=str(tmp / "c2"),
                               train_paths=paths)
    np.testing.assert_array_equal(a.means, b.means)
    np.testing.assert_array_equal(a.stds, b.stds)


def test_crop_center_and_random():
    x = np.arange(80 * 100, dtype=np.float32).reshape(80, 100)
    c = Crop((80, 96))
    y = c({"input": x})["input"]
    assert y.shape == (80, 96)
    # albumentations CenterCrop: start = (100 - 96) // 2 = 2
    np.testing.assert_array_equal(y, x[:, 2:98])
    r = Crop((64, 50), random_crop=True, rng=np.random.RandomState(0))
    z = r(x)
    assert z.shape == (64, 50)
    assert Crop(None)(x) is x
