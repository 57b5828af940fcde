"""Native C++ batch loader: parity vs numpy, fault tolerance, and speed."""

import time

import numpy as np
import pytest

from maa3_tpu.native.io import NativeLoader, native_available


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    paths, arrays = [], []
    rng = np.random.RandomState(0)
    for i in range(16):
        a = rng.randn(80, 200 + 31 * i).astype(np.float32)
        p = str(d / f"a{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    # one float64 file (mel_spec.py historically saved f8 sometimes)
    a64 = rng.randn(80, 150).astype(np.float64)
    p64 = str(d / "f64.npy")
    np.save(p64, a64)
    return paths, arrays, p64, a64


def test_native_builds():
    assert native_available(), "g++ build of libmaa3io.so failed"


def test_load_batch_pad_parity(assets):
    paths, arrays, _, _ = assets
    loader = NativeLoader(rows=80)
    out = loader.load_batch(paths[:4], target_len=300, mode="pad",
                            pad_value=-5.0)
    assert out.shape == (4, 80, 300)
    for i in range(4):
        a = arrays[i]
        c = min(a.shape[1], 300)
        np.testing.assert_array_equal(out[i, :, :c], a[:, :c])
        if c < 300:
            assert (out[i, :, c:] == -5.0).all()


def test_load_batch_tile(assets):
    paths, arrays, _, _ = assets
    loader = NativeLoader(rows=80)
    out = loader.load_batch(paths[:1], target_len=450, mode="tile")
    a = arrays[0]  # width 200 -> tiles
    np.testing.assert_array_equal(out[0, :, :200], a)
    np.testing.assert_array_equal(out[0, :, 200:400], a)
    np.testing.assert_array_equal(out[0, :, 400:450], a[:, :50])


def test_float64_support(assets):
    _, _, p64, a64 = assets
    loader = NativeLoader(rows=80)
    out = loader.load_batch([p64], target_len=100)
    np.testing.assert_allclose(out[0, :, :100], a64[:, :100].astype(np.float32),
                               rtol=1e-6)


def test_missing_file_fault_tolerance(assets):
    paths, _, _, _ = assets
    loader = NativeLoader(rows=80)
    out = loader.load_batch([paths[0], "/nonexistent/x.npy"], target_len=64,
                            pad_value=-5.0)
    assert (out[1] == -5.0).all()  # corrupted -> pad fill, no crash
    assert np.isfinite(out[0]).all()


def test_npy_shape_probe(assets):
    paths, arrays, _, _ = assets
    loader = NativeLoader(rows=80)
    assert loader.npy_shape(paths[3]) == arrays[3].shape


def test_native_faster_than_sequential_numpy(assets):
    paths, _, _, _ = assets
    if not native_available():
        pytest.skip("no native lib")
    loader = NativeLoader(rows=80)
    loader.load_batch(paths, target_len=624)  # warm cache

    t0 = time.perf_counter()
    for _ in range(20):
        loader.load_batch(paths, target_len=624)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(20):
        batch = np.empty((len(paths), 80, 624), np.float32)
        loader._numpy_fallback(paths, batch, 624, "pad", -5.0)
    t_numpy = time.perf_counter() - t0
    print(f"native {t_native:.3f}s vs numpy {t_numpy:.3f}s")
    # parallel C++ should not be slower (usually 2-6x faster on warm cache)
    assert t_native < t_numpy * 1.5
