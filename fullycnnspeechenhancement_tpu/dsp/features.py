"""On-device STFT analysis (batched, static shapes, MXU-friendly).

TPU-first redesign of the reference's host-numpy analysis chain
(`/root/reference/data_utils/audio_feature.py:22-115`): the host loader only
decodes/mixes raw waveforms; pre-emphasis, framing, windowing and the DFT all
run *inside* the jitted step on device.  The rFFT is expressed as a real
matmul against a precomputed [frame_length, 2*num_bins] DFT basis -- a
256x258 matmul per frame batch that maps straight onto the MXU and lets XLA
fuse the window multiply and magnitude into the same kernel.  A
`jnp.fft.rfft` path is kept for cross-checking.

Shapes are static: waveforms arrive as [B, L_pad] with per-utterance sample
counts [B]; the extractor emits [B, T, F] where T = num_frames(L_pad).
Frames at or beyond an utterance's own frame count are exact zeros, matching
the reference's zero-padded collate (data_loader.py:198-209).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.config import DSPConfig
from fullycnnspeechenhancement_tpu.dsp.windows import make_window


def dft_basis(frame_length: int, nfft: int) -> np.ndarray:
    """Real rFFT basis: [frame_length, 2*(nfft//2+1)] (cos block | sin block).

    frames @ basis == concat(Re rfft(frames, nfft), Im rfft(frames, nfft))
    for frame_length <= nfft (the tail of the nfft window is zero padding).
    Computed in float64, cast to float32 at use.
    """
    bins = nfft // 2 + 1
    n = np.arange(frame_length)[:, None]
    k = np.arange(bins)[None, :]
    ang = -2.0 * np.pi * n * k / nfft
    return np.concatenate([np.cos(ang), np.sin(ang)], axis=1)


@functools.lru_cache(maxsize=None)
def _constants(cfg: DSPConfig):
    window = make_window(cfg.window_name, cfg.frame_length)
    basis = dft_basis(cfg.frame_length, cfg.analysis_nfft)
    # Fold the analysis window into the DFT basis: (frames * w) @ B ==
    # frames @ (diag(w) B).  One matmul does window + DFT.
    windowed_basis = (window[:, None] * basis).astype(np.float32)
    return window.astype(np.float32), windowed_basis


@dataclasses.dataclass(frozen=True)
class SpectrogramExtractor:
    """Batched device analysis: waveform [B, L] -> magnitude [B, T, F]."""

    cfg: DSPConfig
    use_fft: bool = False  # True: jnp.fft.rfft path instead of DFT matmul.

    def num_frames(self, num_samples: int) -> int:
        return self.cfg.num_frames(num_samples)

    def _frames(self, signals: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        """Pre-emphasize, zero out beyond per-utterance length, frame.

        signals: [B, L] float32, zero beyond each utterance's length.
        Returns [B, T, frame_length] with T = num_frames(L).
        """
        cfg = self.cfg
        B, L = signals.shape
        # Pre-emphasis y[n] = x[n] - c*x[n-1]; y[0] = x[0]
        # (audio_feature.py:46-55).
        shifted = jnp.pad(signals[:, :-1], ((0, 0), (1, 0)))
        emphasized = signals - cfg.preemphasis * shifted
        # The reference pre-emphasizes each utterance *before* zero padding,
        # so position `len` (first pad sample) is 0, not -c*x[len-1].  Mask to
        # match.
        sample_idx = jnp.arange(L)[None, :]
        emphasized = jnp.where(sample_idx < lengths[:, None], emphasized, 0.0)

        T = cfg.num_frames(L)
        need = (T - 1) * cfg.frame_step + cfg.frame_length
        if need > L:
            emphasized = jnp.pad(emphasized, ((0, 0), (0, need - L)))
        if cfg.frame_length == 2 * cfg.frame_step:
            # Fast path (the reference's 32ms/16ms default): frame t is the
            # concatenation of stride-chunks t and t+1 -> two reshapes, no
            # gather.
            n_chunks = need // cfg.frame_step
            chunks = emphasized[:, : n_chunks * cfg.frame_step].reshape(
                B, n_chunks, cfg.frame_step
            )
            frames = jnp.concatenate([chunks[:, :T], chunks[:, 1 : T + 1]], axis=-1)
        else:
            starts = np.arange(T) * cfg.frame_step
            idx = starts[:, None] + np.arange(cfg.frame_length)[None, :]
            frames = emphasized[:, idx]
        # Zero frames at/after each utterance's own frame count: the
        # reference frames each utterance separately and zero-pads the
        # *spectrogram* at collate (data_loader.py:198-209), so batch-level
        # tail frames that still overlap the utterance's last samples must
        # not appear.
        return frames * self.frame_mask(lengths, T)[:, :, None]

    def __call__(
        self, signals: jnp.ndarray, lengths: jnp.ndarray
    ) -> jnp.ndarray:
        """Magnitude spectrogram [B, T, F] (float32)."""
        re, im = self.complex_parts(signals, lengths)
        return jnp.sqrt(re * re + im * im)

    def complex_parts(self, signals, lengths):
        """(Re, Im) of the windowed rFFT, each [B, T, F]."""
        cfg = self.cfg
        frames = self._frames(signals, lengths)
        if self.use_fft:
            window, _ = _constants(cfg)
            spec = jnp.fft.rfft(frames * window[None, None, :], cfg.analysis_nfft)
            return jnp.real(spec), jnp.imag(spec)
        _, windowed_basis = _constants(cfg)
        # HIGHEST precision: the TPU MXU's default bf16 accumulation is not
        # enough for waveform-level parity (the synthesis de-emphasis IIR
        # amplifies spectral error by up to 1/(1-0.97) ~= 33x).
        both = jnp.matmul(
            frames, jnp.asarray(windowed_basis), precision=jax.lax.Precision.HIGHEST
        )  # [B, T, 2F]
        F = cfg.num_bins
        return both[..., :F], both[..., F:]

    def magnitude_and_phase(self, signals, lengths):
        """(magnitude [B,T,F], phase_re [B,T,F], phase_im [B,T,F]).

        Phase is the unit complex e^{j*angle} of the noisy spectrum
        (audio_feature.py:112-115), kept as separate real planes -- TPU
        arithmetic stays real.
        """
        re, im = self.complex_parts(signals, lengths)
        mag = jnp.sqrt(re * re + im * im)
        safe = jnp.where(mag > 0, mag, 1.0)
        return mag, re / safe, im / safe

    def frame_counts(self, lengths: jnp.ndarray) -> jnp.ndarray:
        """[B] int32 per-utterance frame counts, the reference's formula
        ceil(|L - flen| / step + 1) (audio_feature.py:70)."""
        cfg = self.cfg
        # |L - flen| matters only for L < flen (sub-frame utterances); the
        # duration filter (>=0.4s) makes that impossible in practice, but
        # keep the abs for contract fidelity.
        return jnp.ceil(
            jnp.abs(lengths - cfg.frame_length) / cfg.frame_step + 1
        ).astype(jnp.int32)

    def frame_mask(self, lengths: jnp.ndarray, total_frames: int) -> jnp.ndarray:
        """[B, T] 1.0 where the frame index is < the utterance's own frame
        count, else 0.0 -- for masked losses."""
        counts = self.frame_counts(lengths)
        t = jnp.arange(total_frames)[None, :]
        return (t < counts[:, None]).astype(jnp.float32)

    def batch_max_frame_mask(
        self, lengths: jnp.ndarray, total_frames: int
    ) -> jnp.ndarray:
        """[1, T] 1.0 where the frame index is < the BATCH-MAX frame count.

        This is the region the reference's padded collate materializes
        (data_loader.py:198-225 pads every spectrogram to the longest in
        the batch): frames below the batch max -- including shorter
        utterances' zero-pad frames -- exist and enter the loss and BN
        statistics; frames at/after it (static bucket slack) do not exist
        in the reference at all.

        The mask is identical for every batch row, so it stays [1, T] and
        broadcasts: a materialized [B, T] mask forces XLA to build a full
        [B, T, F-blocks] f32 mask product inside every BN layer's moment
        reduction (fwd AND bwd), a measured 28 ms/step regression on the
        batch-64 blocked V2 step (benchmarks/micro_mask_cost.py: 108.97 ms
        with a [B, T] mask vs 80.61 ms with [1, T]; no-mask 80.40 ms).
        Moment denominators in blocks.py/blocked.py scale by the broadcast
        factor B // mask.shape[0].
        """
        bm = jnp.max(self.frame_counts(lengths))
        t = jnp.arange(total_frames)[None, :]
        return (t < bm).astype(jnp.float32)
