"""Native runtime (libfcse_runtime.so): parity with the Python host path."""

import numpy as np
import pytest

from conftest import make_corpus

from fullycnnspeechenhancement_tpu.data import audio_io, native, write_wav
from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native runtime not built"
)

SR = 8000


def test_decode_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    sig = (0.8 * rng.standard_normal(12345)).clip(-1, 1).astype(np.float32)
    p = str(tmp_path / "x.wav")
    write_wav(p, sig, 16000)
    a, sr_a = native.decode_wav(p)
    b, sr_b = audio_io.read_wav(p)
    assert sr_a == sr_b == 16000
    np.testing.assert_array_equal(a, b)


def test_resample_matches_scipy():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(1)
    sig = rng.standard_normal(16000).astype(np.float32)
    got = native.resample(sig, 16000, 8000)
    ref = resample_poly(sig, 1, 2).astype(np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # non-integer ratio
    got2 = native.resample(sig, 16000, 11025)
    ref2 = resample_poly(sig, 441, 640).astype(np.float32)
    assert abs(len(got2) - len(ref2)) <= 1
    n = min(len(got2), len(ref2))
    np.testing.assert_allclose(got2[:n], ref2[:n], atol=1e-4)


def test_mix_achieves_snr():
    rng = np.random.default_rng(2)
    sig = (0.5 * np.sin(2 * np.pi * 300 * np.arange(8000) / SR)).astype(np.float32)
    noise = rng.standard_normal(3000).astype(np.float32)  # shorter -> tiling
    mix = native.mix_at_snr(sig, noise, 3.0, seed=7)
    added = mix - sig
    got = 10 * np.log10((sig**2).sum() / (added**2).sum())
    np.testing.assert_allclose(got, 3.0, atol=0.05)
    # determinism
    mix2 = native.mix_at_snr(sig, noise, 3.0, seed=7)
    np.testing.assert_array_equal(mix, mix2)


def test_dataset_native_path(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_corpus"))
    paths = make_corpus(root)
    ds = SpeechDataset(
        paths["clean"], paths["noise"], SR, snr_db=0.0, seed=1, use_native=True
    )
    mix, clean = ds[0]
    assert mix.shape == clean.shape and mix.dtype == np.float32
    added = mix - clean
    got = 10 * np.log10((clean**2).sum() / (added**2).sum())
    np.testing.assert_allclose(got, 0.0, atol=0.05)
    # python path yields same clean signal, same mixing *semantics*
    ds_py = SpeechDataset(paths["clean"], paths["noise"], SR, snr_db=0.0, seed=1)
    _, clean_py = ds_py[0]
    np.testing.assert_allclose(clean, clean_py, atol=1e-6)

    ds_pm = SpeechDataset(paths["premixed"], None, SR, use_native=True)
    mix, clean = ds_pm[1]
    assert mix.shape == clean.shape


def test_use_native_wired_from_config(tmp_path_factory, tmp_path):
    """[data] use_native flows INI -> DataConfig -> SpeechDataset, and the
    premixed (randomness-free) items match the Python path exactly."""
    from fullycnnspeechenhancement_tpu.config import load_ini_config

    root = str(tmp_path_factory.mktemp("native_cfg_corpus"))
    paths = make_corpus(root)
    ini = tmp_path / "native.cfg"
    ini.write_text(
        "[training]\nepochs = 1\n\n[model]\nnet_work = FullyCNN\n\n"
        f"[data]\ntrain_manifest_path = {paths['premixed']}\n"
        "use_native = True\nsample_rate = 8000\n"
    )
    cfg = load_ini_config(str(ini))
    assert cfg.data.use_native is True
    ds = SpeechDataset.from_config(cfg.data, cfg.dsp, "train")
    assert ds.use_native
    mix_n, clean_n = ds[0]
    ds_py = SpeechDataset(paths["premixed"], None, SR)
    mix_p, clean_p = ds_py[0]
    np.testing.assert_array_equal(mix_n, mix_p)
    np.testing.assert_array_equal(clean_n, clean_p)
