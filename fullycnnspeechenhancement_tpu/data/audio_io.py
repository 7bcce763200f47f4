"""WAV read/write and resampling without librosa/soundfile.

The reference leans on librosa.load (decode + float conversion + mono mix
+ resample, `data_utils/data_loader.py:31-33`) and soundfile for writes.
Neither is available here; this module provides the same surface on
scipy + stdlib: PCM/float WAV decode via scipy.io.wavfile, normalisation
to float32 in [-1, 1], mono mixdown, and polyphase resampling
(scipy.signal.resample_poly with a Kaiser window -- same family of
windowed-sinc filters as librosa's default backends; bit-identical output
to librosa is not promised and metric-level parity does not require it).
"""

from __future__ import annotations

import math

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

_PCM_SCALE = {np.dtype(np.int16): 32768.0, np.dtype(np.int32): 2147483648.0}


def resample(signal: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample to target_sr (no-op if rates match)."""
    if orig_sr == target_sr:
        return signal
    g = math.gcd(orig_sr, target_sr)
    return resample_poly(signal, target_sr // g, orig_sr // g).astype(np.float32)


def read_wav(path: str, target_sr: int | None = None) -> tuple[np.ndarray, int]:
    """-> (float32 mono waveform in [-1, 1], sample_rate).

    Matches librosa.load semantics: ints scaled to [-1, 1), multi-channel
    averaged to mono, optional resample to `target_sr`.
    """
    sr, data = wavfile.read(path)
    if data.dtype == np.uint8:  # 8-bit PCM is unsigned
        data = (data.astype(np.float32) - 128.0) / 128.0
    elif data.dtype in _PCM_SCALE:
        data = data.astype(np.float32) / _PCM_SCALE[data.dtype]
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if target_sr is not None and sr != target_sr:
        data = resample(data, sr, target_sr)
        sr = target_sr
    return np.ascontiguousarray(data, dtype=np.float32), sr


def write_wav(path: str, signal: np.ndarray, sample_rate: int) -> None:
    """Write float waveform as 16-bit PCM (the reference's sf.write default
    writes float64 WAVs via soundfile; 16-bit PCM is the interoperable
    choice and what PESQ tooling expects)."""
    clipped = np.clip(np.asarray(signal, dtype=np.float64), -1.0, 1.0)
    wavfile.write(path, sample_rate, (clipped * 32767.0).astype(np.int16))
