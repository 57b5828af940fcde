"""On-device STFT + log10-mel frontend.

Parity target: MelNet (preprocess/NAT_mel.py:42-85):
  wav clamp [-1,1] -> reflect pad (n_fft-hop)/2 both sides -> STFT (fft 1024,
  hop 256, win 1024, periodic Hann, center=False) -> |.| = sqrt(re^2+im^2+1e-9)
  -> slaney mel filterbank (fmin 0, fmax sr/2) -> log10(clamp(x, 1e-5)).

TPU-native design: framing is a gather into (frames, n_fft), the windowed DFT
is one real matmul against a precomputed (n_fft, 2*(n_fft/2+1)) cos/sin basis
(MXU-friendly; jnp.fft.rfft is avoided because XLA's TPU FFT lowers poorly for
batched short transforms), and the mel projection is a second matmul. The
whole frontend is 2 GEMMs + elementwise, fully fusable.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    win_size: int = 1024
    hop_size: int = 256
    num_mels: int = 80
    fmin: float = 0.0
    fmax: float = None  # type: ignore  # defaults to sr/2

    def __post_init__(self):
        if self.fmax is None:
            object.__setattr__(self, "fmax", self.sample_rate / 2)


# ---------------------------------------------------------------------------
# Slaney mel filterbank (librosa.filters.mel semantics, htk=False, norm=slaney)
# ---------------------------------------------------------------------------

def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mel = np.where(log_region,
                   min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
                   mel)
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    f = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float,
                   fmax: float) -> np.ndarray:
    """(n_mels, n_fft//2+1) slaney-normalized triangular filterbank."""
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)),
                          n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT basis
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _stft_constants(n_fft: int, win_size: int,
                    window: str = "hann") -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis: (n_fft, n_bins) cos and -sin matrices.

    window="hann" is torch.stft's periodic Hann (the mel frontend);
    window="ones" is torch.stft's window=None default (rectangular, padded
    centered to n_fft when win_size < n_fft) — used by the BigVGAN MRD
    spectrogram (vocoder/bigvgan/models.py:321-329 passes no window)."""
    n_bins = n_fft // 2 + 1
    if window == "ones":
        window = np.ones(win_size)
    else:
        window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(win_size) / win_size)  # periodic hann
    if win_size < n_fft:
        pad = (n_fft - win_size) // 2
        window = np.pad(window, (pad, n_fft - win_size - pad))
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2 * np.pi * n * k / n_fft
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (-np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def frame_signal(y: Array, n_fft: int, hop: int) -> Array:
    """(B, L) -> (B, n_frames, n_fft) frame gather, center=False."""
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return y[:, idx]


def stft_magnitude(y: Array, n_fft: int, hop: int, win_size: int) -> Array:
    """(B, L) -> (B, n_bins, n_frames) magnitude, torch.stft-compatible
    (sqrt(re^2 + im^2 + 1e-9) as in NAT_mel.py:79)."""
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop)
    cos_b, sin_b = _stft_constants(n_fft, win_size)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    mag = jnp.sqrt(re * re + im * im + 1e-9)
    return mag.transpose(0, 2, 1)  # (B, n_bins, n_frames)


# ---------------------------------------------------------------------------
# MelNet-equivalent frontend
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _mel_basis_cached(sr: int, n_fft: int, n_mels: int, fmin: float,
                      fmax: float) -> np.ndarray:
    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax)


def mel_spectrogram(y: Array, cfg: MelConfig) -> Array:
    """(B, L) wav in [-1, 1] -> (B, num_mels, T) log10-mel.

    T = L // hop when L is a multiple of hop (reflect pad (n_fft-hop)/2 each
    side gives L + n_fft - hop samples -> 1 + (L - hop)/hop frames... matching
    MelNet exactly: frames = 1 + (L + n_fft - hop - n_fft)//hop = L//hop... )
    """
    y = jnp.clip(y, -1.0, 1.0)
    pad = (cfg.n_fft - cfg.hop_size) // 2
    y = jnp.pad(y, [(0, 0), (pad, pad)], mode="reflect")
    mag = stft_magnitude(y, cfg.n_fft, cfg.hop_size, cfg.win_size)
    basis = jnp.asarray(_mel_basis_cached(cfg.sample_rate, cfg.n_fft,
                                          cfg.num_mels, cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, mag)
    return jnp.log10(jnp.clip(mel, 1e-5, None))
