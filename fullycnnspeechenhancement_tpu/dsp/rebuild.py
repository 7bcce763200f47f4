"""Waveform re-synthesis: device (jnp) and host (numpy) paths.

Replicates the reference's rebuild chain exactly
(`/root/reference/model_utils/utils.py:93-183`, quirks in SURVEY.md
Appendix A.2-A.4): 512-point irfft over 129-bin spectra cropped to the frame
length (a band-limited 2x interpolation, not a true inverse),
divide-by-window, concatenative de-framing (NOT overlap-add), recursive
de-emphasis.

Device design: the cropped irfft is a real matmul against a
[2*num_bins, frame_length] inverse-DFT basis with the 1/window division
folded into the basis columns -- one MXU matmul replaces
irfft + crop + de-window.  De-emphasis (the IIR y[n] = x[n] + 0.97 y[n-1],
the reference's per-sample Python hot spot, utils.py:104-113) becomes a
`jax.lax.associative_scan` parallel prefix over the sample axis.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.config import DSPConfig
from fullycnnspeechenhancement_tpu.dsp import reference_dsp
from fullycnnspeechenhancement_tpu.dsp.windows import make_window


def inverse_dft_basis(
    nfft: int, num_bins: int, crop: int, window: np.ndarray
) -> np.ndarray:
    """[2*num_bins, crop] basis: (Re|Im) @ basis == irfft(., nfft)[:crop] / window.

    For spectra with only `num_bins` populated bins (the rest implicitly
    zero), irfft is x[n] = (1/nfft) * sum_k w_k (Re_k cos(2 pi k n / nfft)
    - Im_k sin(...)), with w_k = 1 for the DC and (when populated) Nyquist
    bins and w_k = 2 otherwise.  Computed float64.
    """
    assert num_bins <= nfft // 2 + 1
    k = np.arange(num_bins)[:, None]
    n = np.arange(crop)[None, :]
    ang = 2.0 * np.pi * k * n / nfft
    weight = np.full((num_bins, 1), 2.0)
    weight[0, 0] = 1.0
    if num_bins == nfft // 2 + 1:  # populated Nyquist bin
        weight[-1, 0] = 1.0
    re_basis = weight * np.cos(ang) / nfft
    im_basis = -weight * np.sin(ang) / nfft
    basis = np.concatenate([re_basis, im_basis], axis=0)
    return basis / window[None, :]


@functools.lru_cache(maxsize=None)
def _basis_for(cfg: DSPConfig) -> np.ndarray:
    window = make_window(cfg.window_name, cfg.frame_length)
    return inverse_dft_basis(
        cfg.synthesis_nfft, cfg.num_bins, cfg.frame_length, window
    ).astype(np.float32)


def de_emphasis_scan(signal: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[n] = x[n] + coef * y[n-1] along the last axis via parallel prefix."""
    a = jnp.full_like(signal, coef)
    # Element i encodes y_i = a_i * y_{i-1} + b_i; composition is associative.
    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (a, signal), axis=-1)
    return y


@functools.lru_cache(maxsize=None)
def _ola_constants(cfg: DSPConfig):
    """(synthesis-windowed inverse basis, window) for overlap-add mode.
    The inverse here uses the ANALYSIS nfft (a true ISTFT), unlike the
    reference path's 512-point quirk; synthesis window = analysis window
    with window-power normalization at accumulation time."""
    window = make_window(cfg.window_name, cfg.frame_length)
    basis = inverse_dft_basis(
        cfg.analysis_nfft, cfg.num_bins, cfg.frame_length, np.ones(cfg.frame_length)
    )
    return (
        (basis * window[None, :]).astype(np.float32),
        window.astype(np.float32),
    )


@dataclasses.dataclass(frozen=True)
class WaveformRebuilder:
    """Device rebuild: (mag, phase_re, phase_im) [B,T,F] -> waveform [B, S].

    mode="reference" (default, the parity path): S = overlap + T*step via
    the reference's quirk chain.  mode="overlap_add": a mathematically
    sound ISTFT -- irfft at the ANALYSIS nfft, synthesis-windowed
    overlap-add with window-power normalization -- the corrected DSP mode
    (SURVEY.md SS7 hard part 1) and the basis of the streaming engine.
    """

    cfg: DSPConfig
    mode: str = "reference"

    def __call__(self, mag, phase_re, phase_im):
        cfg = self.cfg
        step = cfg.frame_step
        overlap = cfg.frame_length - step
        if self.mode == "overlap_add":
            return self._overlap_add(mag, phase_re, phase_im)
        basis = jnp.asarray(_basis_for(cfg))
        spec = jnp.concatenate([mag * phase_re, mag * phase_im], axis=-1)
        # [B, T, 2F] @ [2F, frame_length]: irfft + crop + de-window in one
        # matmul.  HIGHEST precision for waveform-level parity (see
        # features.py: the de-emphasis IIR amplifies error ~33x).
        frames = jnp.matmul(spec, basis, precision=jax.lax.Precision.HIGHEST)
        head = frames[:, 0, :overlap]
        body = frames[:, :, overlap:].reshape(frames.shape[0], -1)
        signal = jnp.concatenate([head, body], axis=1)
        return de_emphasis_scan(signal, cfg.preemphasis)

    def _overlap_add(self, mag, phase_re, phase_im):
        cfg = self.cfg
        step = cfg.frame_step
        basis, window = _ola_constants(cfg)
        spec = jnp.concatenate([mag * phase_re, mag * phase_im], axis=-1)
        frames = jnp.matmul(
            spec, jnp.asarray(basis), precision=jax.lax.Precision.HIGHEST
        )  # [B, T, frame_length], synthesis-windowed
        B, T, L = frames.shape
        out_len = (T - 1) * step + L
        # overlap-add: each frame accumulates at offset t*step, normalized
        # by the accumulated squared window
        pos = (np.arange(T)[:, None] * step + np.arange(L)[None, :]).reshape(-1)
        signal = jax.vmap(
            lambda row: jnp.zeros(out_len, jnp.float32).at[pos].add(row)
        )(frames.reshape(B, -1))
        wnorm = jnp.zeros(out_len, jnp.float32).at[pos].add(
            jnp.tile(jnp.asarray(window) ** 2, T)
        )
        signal = signal / jnp.maximum(wnorm, 1e-6)
        return de_emphasis_scan(signal, cfg.preemphasis)


def rebuild_audio_numpy(
    sig_lengths,
    magnitudes,
    phases,
    sample_rate,
    window_ms,
    stride_ms,
    synthesis_nfft: int = 512,
    window_name: str | None = None,
):
    """Host-side batch rebuild, truncated per utterance (the reference's
    `AudioReBuild.rebuild_audio` surface, utils.py:171-183)."""
    return reference_dsp.rebuild_audio(
        sig_lengths,
        magnitudes,
        phases,
        sample_rate,
        window_ms,
        stride_ms,
        synthesis_nfft,
        window_name,
    )
