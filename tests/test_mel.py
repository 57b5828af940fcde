"""Mel frontend parity vs torch.stft oracle + filterbank structure checks."""

import numpy as np
import jax.numpy as jnp
import torch

from maa3_tpu.ops import stft as stft_mod
from maa3_tpu.ops.stft import MelConfig, mel_filterbank, mel_spectrogram


def _torch_melnet(y: np.ndarray, basis: np.ndarray, n_fft=1024, hop=256,
                  win=1024) -> np.ndarray:
    """Independent oracle following NAT_mel.py:64-85 semantics with torch ops."""
    yt = torch.tensor(y).clamp(-1, 1)
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), [pad, pad], mode="reflect").squeeze(1)
    spec = torch.stft(yt, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      normalized=False, onesided=True, return_complex=True)
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    mel = torch.matmul(torch.tensor(basis), spec)
    return torch.log10(torch.clamp(mel, min=1e-5)).numpy()


def test_stft_magnitude_parity():
    rng = np.random.RandomState(0)
    y = (rng.randn(2, 4096) * 0.1).astype(np.float32)
    mag = stft_mod.stft_magnitude(jnp.asarray(y), 1024, 256, 1024)
    ref = torch.stft(torch.tensor(y), 1024, hop_length=256, win_length=1024,
                     window=torch.hann_window(1024), center=False,
                     normalized=False, onesided=True, return_complex=True).abs()
    assert mag.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(mag), ref.numpy(), rtol=1e-3, atol=2e-4)


def test_mel_spectrogram_parity_and_framing():
    cfg = MelConfig()
    rng = np.random.RandomState(1)
    secs = 1
    L = (secs * 16000 // 256 + 1) * 256  # reference pads wav to (T+1)*hop
    y = (rng.randn(1, L) * 0.05).astype(np.float32)
    mel = mel_spectrogram(jnp.asarray(y), cfg)
    basis = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    ref = _torch_melnet(y, basis)
    assert mel.shape == ref.shape
    # frame count contract: (T+1)*hop samples -> T+1 frames (NAT_mel padding)
    assert mel.shape[-1] == L // 256
    np.testing.assert_allclose(np.asarray(mel), ref, rtol=1e-3, atol=2e-3)


def test_mel_filterbank_structure():
    fb = mel_filterbank(16000, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support; triangles overlap; slaney norm keeps peaks ~2/width
    assert (fb.sum(axis=1) > 0).all()
    # filter centers are monotonically increasing
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    # low-frequency filters are linearly spaced (slaney scale below 1 kHz):
    # spacing between first few centers roughly constant
    d = np.diff(centers[:10]).astype(float)
    assert d.std() <= 1.0
