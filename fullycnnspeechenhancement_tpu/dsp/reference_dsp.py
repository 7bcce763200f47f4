"""Numpy golden implementation of the reference's exact DSP contract.

This is the float64 host-side ground truth for the analysis chain
(`/root/reference/data_utils/audio_feature.py:22-115`) and the synthesis
chain (`/root/reference/model_utils/utils.py:93-183`), re-implemented from
the behavioural spec in SURVEY.md Appendix B.  Every quirk of the reference
is deliberately preserved (Appendix A):

  * analysis: pre-emphasis 0.97 -> frame (len=round(window_s*sr),
    step=round(stride_s*sr), count=ceil(|L-len|/step+1), zero-pad tail) ->
    window multiply -> ``rfft(., nfft)`` -> magnitude (*not* power, despite
    the reference's naming) -> transpose to [F, T].
  * synthesis: ``irfft(mag*phase, 512)`` on 129-bin spectra (a band-limited
    2x interpolation, NOT a faithful inverse) cropped to the first
    frame_length samples, divide-by-window, concatenative de-framing (first
    frame's first `overlap` samples + every frame's last `step` samples --
    NOT overlap-add), recursive de-emphasis, truncate to original length.

The only intentional departure: de-emphasis uses `scipy.signal.lfilter`
(an IIR 1/(1-0.97 z^-1)), numerically identical to the reference's
per-sample Python recursion (utils.py:104-113) but O(T) vectorised instead
of a Python loop -- the reference's validation CPU hot spot.
"""

from __future__ import annotations

import numpy as np
from scipy.signal import lfilter

from fullycnnspeechenhancement_tpu.dsp.windows import make_window

# ----------------------------------------------------------------------------
# Analysis
# ----------------------------------------------------------------------------


def pre_emphasis(signal: np.ndarray, coef: float = 0.97) -> np.ndarray:
    """y[0] = x[0]; y[n] = x[n] - coef * x[n-1]  (audio_feature.py:46-55)."""
    signal = np.asarray(signal)
    out = np.empty_like(signal, dtype=np.float64)
    out[0] = signal[0]
    out[1:] = signal[1:] - coef * signal[:-1]
    return out


def frame_count(num_samples: int, frame_length: int, frame_step: int) -> int:
    """ceil(|L - frame_length| / step + 1)  (audio_feature.py:70)."""
    return int(np.ceil(abs(num_samples - frame_length) / frame_step + 1))


def frame_signal(
    signal: np.ndarray, frame_length: int, frame_step: int
) -> np.ndarray:
    """Split into overlapping frames with zero-padded tail -> [T, frame_length]."""
    signal = np.asarray(signal, dtype=np.float64)
    n = frame_count(len(signal), frame_length, frame_step)
    padded = np.zeros(n * frame_step + frame_length, dtype=np.float64)
    padded[: len(signal)] = signal
    starts = np.arange(n) * frame_step
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return padded[idx]


def analyze(
    signal: np.ndarray,
    sample_rate: int,
    window_s: float = 0.032,
    stride_s: float = 0.016,
    nfft: int = 256,
    window_name: str | None = None,
    preemph: float = 0.97,
    return_complex: bool = False,
) -> np.ndarray:
    """Full analysis chain -> [F, T] magnitude (float32) or complex spectrum.

    Mirrors `AudioFeature.compute_spectrogram` (audio_feature.py:22-44): the
    complex branch returns the transposed complex rfft frames; the magnitude
    branch returns |rfft| (the reference's `power_spectrum` actually returns
    magnitude, Appendix A.5) as float32.
    """
    if stride_s > window_s:
        raise ValueError("stride must not exceed window size")
    frame_length = int(round(window_s * sample_rate))
    frame_step = int(round(stride_s * sample_rate))
    emphasized = pre_emphasis(signal, preemph)
    frames = frame_signal(emphasized, frame_length, frame_step)
    frames = frames * make_window(window_name, frame_length)[None, :]
    spec = np.fft.rfft(frames, nfft)  # [T, nfft//2+1]
    if return_complex:
        return spec.T  # [F, T] complex
    return np.abs(spec).T.astype(np.float32)  # [F, T]


def magnitude(complex_spec: np.ndarray) -> np.ndarray:
    """|.| of a complex spectrogram (the reference's `power_spectrum`)."""
    return np.abs(complex_spec)


def unit_phase(complex_spec: np.ndarray) -> np.ndarray:
    """e^{j*angle(.)}  (audio_feature.py:112-115)."""
    return np.exp(1j * np.angle(complex_spec))


# ----------------------------------------------------------------------------
# Synthesis (the parity rebuild path)
# ----------------------------------------------------------------------------


def de_emphasis(frames_or_signal: np.ndarray, coef: float = 0.97) -> np.ndarray:
    """y[n] = x[n] + coef * y[n-1] along the last axis.

    Vectorised IIR equivalent of the reference's recursion (utils.py:104-113).
    """
    return lfilter([1.0], [1.0, -coef], frames_or_signal, axis=-1)


def rebuild_batch(
    magnitudes: np.ndarray,
    phases: np.ndarray,
    sample_rate: int,
    window_ms: float,
    stride_ms: float,
    synthesis_nfft: int = 512,
    window_name: str | None = None,
    preemph: float = 0.97,
) -> np.ndarray:
    """Reference synthesis chain on a batch.

    magnitudes/phases: [N, T, F] (time-major, as the model emits).
    Returns [N, overlap + T*step] float64 waveforms (pre-truncation).
    """
    n_window = int(window_ms * sample_rate / 1000)
    n_stride = int(stride_ms * sample_rate / 1000)
    n_overlap = n_window - n_stride

    stft = magnitudes * phases  # [N, T, F] complex
    # irfft at synthesis_nfft (512) over 129-bin spectra, crop to frame length
    # -- the reference's non-inverse quirk (utils.py:115-117,176).
    frames = np.fft.irfft(stft, synthesis_nfft)[:, :, :n_window]
    frames = frames / make_window(window_name, n_window)[None, None, :]
    # Concatenative de-framing (utils.py:139-147): first `overlap` samples of
    # frame 0, then the last `stride` samples of every frame.
    head = frames[:, 0, :n_overlap]
    body = frames[:, :, n_overlap:].reshape(frames.shape[0], -1)
    signal = np.concatenate([head, body], axis=1)
    return de_emphasis(signal, preemph)


def rebuild_audio(
    sig_lengths,
    magnitudes: np.ndarray,
    phases: np.ndarray,
    sample_rate: int,
    window_ms: float,
    stride_ms: float,
    synthesis_nfft: int = 512,
    window_name: str | None = None,
) -> list:
    """Batch rebuild truncated to per-utterance lengths (utils.py:171-183)."""
    batch = rebuild_batch(
        magnitudes,
        phases,
        sample_rate,
        window_ms,
        stride_ms,
        synthesis_nfft,
        window_name,
    )
    return [batch[i][: sig_lengths[i]] for i in range(len(batch))]
