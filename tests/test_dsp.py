"""DSP parity tests.

Three-way verification:
  1. golden numpy (`dsp.reference_dsp`) vs the *actual reference modules*
     imported from /root/reference (numpy-only files, loaded as oracles);
  2. jnp device implementation vs golden numpy;
  3. matmul-DFT path vs jnp.fft path.
"""

import numpy as np
import pytest

from conftest import import_reference_module

from fullycnnspeechenhancement_tpu.config import DSPConfig
from fullycnnspeechenhancement_tpu.dsp import reference_dsp
from fullycnnspeechenhancement_tpu.dsp.features import SpectrogramExtractor
from fullycnnspeechenhancement_tpu.dsp.rebuild import (
    WaveformRebuilder,
    rebuild_audio_numpy,
)

CFG = DSPConfig()  # 8kHz, 32ms/16ms, nfft 256/512, hamming


def _random_signal(rng, seconds=1.3, sr=8000):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    sig = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    return sig.astype(np.float32)


# ---------------------------------------------------------------------------
# 1. golden numpy vs the reference's own modules (oracles)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_audio_feature():
    return import_reference_module("data_utils/audio_feature.py", "ref_audio_feature")


@pytest.fixture(scope="module")
def ref_utils():
    return import_reference_module("model_utils/utils.py", "ref_utils")


def test_golden_magnitude_matches_reference(ref_audio_feature):
    rng = np.random.default_rng(0)
    sig = _random_signal(rng)
    oracle = ref_audio_feature.AudioFeature(None).compute_spectrogram(
        sig, 8000, window_s=0.032, stride_s=0.016, nfft=256, use_complex=False
    )
    mine = reference_dsp.analyze(sig, 8000, 0.032, 0.016, 256)
    assert oracle.shape == mine.shape  # [F, T]
    np.testing.assert_allclose(mine, oracle, rtol=1e-5, atol=1e-6)


def test_golden_complex_matches_reference(ref_audio_feature):
    rng = np.random.default_rng(1)
    sig = _random_signal(rng, seconds=0.73)
    oracle = ref_audio_feature.AudioFeature(None).compute_spectrogram(
        sig, 8000, window_s=0.032, stride_s=0.016, nfft=256, use_complex=True
    )
    mine = reference_dsp.analyze(sig, 8000, 0.032, 0.016, 256, return_complex=True)
    np.testing.assert_allclose(mine, np.asarray(oracle), rtol=1e-5, atol=1e-7)


def test_golden_rebuild_matches_reference(ref_utils):
    rng = np.random.default_rng(2)
    B, T, F = 2, 40, 129
    mag = rng.random((B, T, F)).astype(np.float32) + 0.1
    phase_angle = rng.uniform(-np.pi, np.pi, (B, T, F))
    phase = np.exp(1j * phase_angle)
    lengths = [40 * 128 + 50, 30 * 128]
    oracle = ref_utils.AudioReBuild().rebuild_audio(
        lengths, mag, phase, 8000, 32, 16
    )
    mine = rebuild_audio_numpy(lengths, mag, phase, 8000, 32, 16)
    for o, m in zip(oracle, mine):
        np.testing.assert_allclose(m, np.asarray(o).ravel(), rtol=1e-7, atol=1e-9)


def test_golden_frame_count_small_signal(ref_audio_feature):
    # |L - frame_length| quirk: L < frame_length still produces frames.
    sig = np.ones(100, dtype=np.float32) * 0.3
    oracle = ref_audio_feature.AudioFeature(None).compute_spectrogram(
        sig, 8000, 0.032, 0.016, 256
    )
    mine = reference_dsp.analyze(sig, 8000, 0.032, 0.016, 256)
    assert mine.shape == oracle.shape
    np.testing.assert_allclose(mine, oracle, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 2. jnp device implementation vs golden numpy
# ---------------------------------------------------------------------------


def _batch(signals, pad_to=None):
    lengths = np.array([len(s) for s in signals], dtype=np.int32)
    L = pad_to or max(lengths)
    out = np.zeros((len(signals), L), dtype=np.float32)
    for i, s in enumerate(signals):
        out[i, : len(s)] = s
    return out, lengths


def test_device_magnitude_matches_golden():
    rng = np.random.default_rng(3)
    sigs = [_random_signal(rng, s) for s in (1.1, 0.6)]
    batch, lengths = _batch(sigs)
    ext = SpectrogramExtractor(CFG)
    mags = np.asarray(ext(batch, lengths))  # [B, T, F]
    T = CFG.num_frames(batch.shape[1])
    assert mags.shape == (2, T, CFG.num_bins)
    for i, sig in enumerate(sigs):
        golden = reference_dsp.analyze(sig, 8000, 0.032, 0.016, 256).T  # [T, F]
        t = golden.shape[0]
        np.testing.assert_allclose(mags[i, :t], golden, rtol=1e-4, atol=2e-4)
        # frames past the utterance's own count are exactly zero
        np.testing.assert_array_equal(mags[i, t:], 0.0)


def test_device_fft_path_matches_matmul_path():
    rng = np.random.default_rng(4)
    batch, lengths = _batch([_random_signal(rng, 0.9)])
    m1 = np.asarray(SpectrogramExtractor(CFG, use_fft=False)(batch, lengths))
    m2 = np.asarray(SpectrogramExtractor(CFG, use_fft=True)(batch, lengths))
    np.testing.assert_allclose(m1, m2, rtol=1e-4, atol=2e-4)


def test_device_phase_matches_golden():
    rng = np.random.default_rng(5)
    sig = _random_signal(rng, 0.8)
    batch, lengths = _batch([sig])
    ext = SpectrogramExtractor(CFG)
    mag, pre, pim = ext.magnitude_and_phase(batch, lengths)
    golden_complex = reference_dsp.analyze(
        sig, 8000, 0.032, 0.016, 256, return_complex=True
    ).T  # [T, F]
    golden_phase = reference_dsp.unit_phase(golden_complex)
    t = golden_complex.shape[0]
    np.testing.assert_allclose(
        np.asarray(pre)[0, :t], golden_phase.real, rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(pim)[0, :t], golden_phase.imag, rtol=1e-3, atol=2e-3
    )


def test_device_rebuild_matches_golden():
    rng = np.random.default_rng(6)
    B, T, F = 2, 24, 129
    mag = (rng.random((B, T, F)) + 0.1).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, (B, T, F))
    phase = np.exp(1j * ang)
    golden = reference_dsp.rebuild_batch(mag, phase, 8000, 32, 16)
    rebuilt = np.asarray(
        WaveformRebuilder(CFG)(
            mag, phase.real.astype(np.float32), phase.imag.astype(np.float32)
        )
    )
    assert rebuilt.shape == golden.shape
    np.testing.assert_allclose(rebuilt, golden, rtol=1e-3, atol=2e-3)


def test_device_roundtrip_end_to_end():
    """Analysis -> identity model -> rebuild reproduces the golden host chain."""
    rng = np.random.default_rng(7)
    sig = _random_signal(rng, 1.0)
    batch, lengths = _batch([sig])
    ext = SpectrogramExtractor(CFG)
    mag, pre, pim = ext.magnitude_and_phase(batch, lengths)
    wav = np.asarray(WaveformRebuilder(CFG)(mag, pre, pim))[0]

    golden_complex = reference_dsp.analyze(
        sig, 8000, 0.032, 0.016, 256, return_complex=True
    ).T[None]
    golden = reference_dsp.rebuild_batch(
        np.abs(golden_complex),
        reference_dsp.unit_phase(golden_complex),
        8000,
        32,
        16,
    )[0]
    n = min(len(wav), len(golden))
    np.testing.assert_allclose(wav[:n], golden[:n], rtol=2e-3, atol=5e-3)


def test_frame_mask():
    ext = SpectrogramExtractor(CFG)
    lengths = np.array([256 + 128 * 3, 256], dtype=np.int32)
    mask = np.asarray(ext.frame_mask(lengths, 10))
    assert mask.shape == (2, 10)
    assert mask[0].sum() == 4  # ceil(|640-256|/128+1) = 4
    assert mask[1].sum() == 1
