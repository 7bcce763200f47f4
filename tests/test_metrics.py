"""Metric tests: SDR exactness, STOI anchor behaviours, PESQ gating."""

import numpy as np
import pytest

from conftest import import_reference_module

from fullycnnspeechenhancement_tpu.eval import PESQ, SDR, STOI, AverageMeter, sdr, stoi

SR = 8000


def _speechlike(seconds=3.0, sr=SR, seed=0):
    """Speech-shaped broadband noise with syllabic-rate modulation: STOI
    needs clean energy across its 1/3-octave bands (narrowband tones score
    low in any STOI implementation because noise-only bands decorrelate)."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    carrier = lfilter([1.0], [1.0, -0.9], rng.standard_normal(n))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t)
    return (env * carrier).astype(np.float32)


def test_sdr_matches_reference_formula(tmp_path):
    ref_utils = import_reference_module("model_utils/utils.py", "ref_utils_sdr")
    rng = np.random.default_rng(0)
    y = rng.standard_normal(8000).astype(np.float32)
    y_hat = y + 0.1 * rng.standard_normal(8000).astype(np.float32)
    np.testing.assert_allclose(
        sdr(y, y_hat), float(ref_utils.SDR()(y, y_hat)), rtol=1e-6
    )


def test_sdr_identity_is_large():
    y = _speechlike(1.0)
    assert sdr(y, y) > 80.0


def test_stoi_identity_is_one():
    y = _speechlike()
    assert stoi(y, y, SR) > 0.999


def test_stoi_monotone_in_noise():
    y = _speechlike()
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(y)).astype(np.float32)
    scores = []
    for level in [0.05, 0.3, 1.0, 4.0]:
        scores.append(stoi(y, y + level * noise, SR))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.95
    assert scores[-1] < 0.5


def test_stoi_rejects_too_short():
    y = _speechlike(0.2)
    with pytest.raises(ValueError):
        stoi(y, y, SR)


def test_pesq_gating():
    p = PESQ(sr=SR)
    y = _speechlike(1.0)
    if p.available:
        assert 0.5 < p(y, y) <= 5.0
    else:
        with pytest.raises(RuntimeError):
            p(y, y)


def test_pesq_proxy_monotone():
    p = PESQ(sr=SR, allow_proxy=True)
    if p.available:
        pytest.skip("real PESQ present; proxy unused")
    assert p.is_proxy
    y = _speechlike()
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(len(y)).astype(np.float32)
    clean_score = p(y, y + 0.001 * noise)
    noisy_score = p(y, y + 1.0 * noise)
    assert clean_score > noisy_score
    assert 1.0 <= noisy_score <= clean_score <= 4.5


def test_average_meter():
    m = AverageMeter()
    for v in [1.0, 2.0, 3.0]:
        m.update(v)
    assert m.avg == 2.0 and m.count == 3
    m.reset()
    assert m.avg == 0.0 and m.count == 0
