"""Data pipeline tests: audio I/O, SNR mixing, manifests, bucketed loader."""

import json
import os

import numpy as np
import pytest

from fullycnnspeechenhancement_tpu.config import DSPConfig
from fullycnnspeechenhancement_tpu.data import (
    DataLoader,
    SpeechDataset,
    mix_at_snr,
    read_manifest,
    read_wav,
    shard_for_host,
    write_manifest,
    write_wav,
)
from fullycnnspeechenhancement_tpu.data.loader import BucketSampler

SR = 8000


def _tone(seconds, freq=440.0, sr=SR, amp=0.4):
    t = np.arange(int(seconds * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Small on-disk corpus: 6 clean wavs, 2 noise wavs, manifests."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    clean_entries, noise_entries, premixed_entries = [], [], []
    for i, sec in enumerate([0.5, 0.8, 1.1, 1.6, 2.2, 3.1]):
        p = str(root / f"clean_{i}.wav")
        write_wav(p, _tone(sec, 300 + 100 * i), SR)
        clean_entries.append({"audio_filepath": p, "duration": sec})
        # premixed pair
        mp = str(root / f"mix_{i}.wav")
        sig = _tone(sec, 300 + 100 * i) + 0.1 * rng.standard_normal(
            int(sec * SR)
        ).astype(np.float32)
        write_wav(mp, sig, SR)
        premixed_entries.append(
            {
                "clean_audio_filepath": p,
                "mix_audio_filepath": mp,
                "duration": sec,
            }
        )
    for i, sec in enumerate([0.7, 2.5]):
        p = str(root / f"noise_{i}.wav")
        write_wav(p, 0.2 * rng.standard_normal(int(sec * SR)).astype(np.float32), SR)
        noise_entries.append({"audio_filepath": p, "duration": sec})
    paths = {
        "clean": str(root / "manifest.clean"),
        "noise": str(root / "manifest.noise"),
        "premixed": str(root / "manifest.premixed"),
    }
    write_manifest(paths["clean"], clean_entries)
    write_manifest(paths["noise"], noise_entries)
    write_manifest(paths["premixed"], premixed_entries)
    return paths


def test_wav_roundtrip(tmp_path):
    sig = _tone(0.5)
    p = str(tmp_path / "x.wav")
    write_wav(p, sig, SR)
    out, sr = read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(out, sig, atol=1.5 / 32767)


def test_read_wav_resamples(tmp_path):
    sig = _tone(0.5, sr=16000)
    p = str(tmp_path / "x16.wav")
    write_wav(p, sig, 16000)
    out, sr = read_wav(p, target_sr=8000)
    assert sr == 8000
    assert abs(len(out) - 4000) <= 1


@pytest.mark.parametrize("snr", [-5.0, 0.0, 10.0])
def test_mix_achieves_target_snr(snr):
    rng = np.random.default_rng(1)
    speech = _tone(1.0)
    noise = rng.standard_normal(12000).astype(np.float32)  # longer -> crop
    mix = mix_at_snr(speech, noise, snr, rng)
    added = mix - speech
    got = 10 * np.log10(np.sum(speech**2) / np.sum(added**2))
    np.testing.assert_allclose(got, snr, atol=0.01)


def test_mix_tiles_short_noise():
    rng = np.random.default_rng(2)
    speech = _tone(2.0)  # 16000 samples
    noise = 0.1 * rng.standard_normal(3000).astype(np.float32)
    mix = mix_at_snr(speech, noise, 0.0, rng)
    assert mix.shape == speech.shape
    added = mix - speech
    assert np.all(np.abs(added) > 0)  # noise covers the whole utterance
    got = 10 * np.log10(np.sum(speech**2) / np.sum(added**2))
    np.testing.assert_allclose(got, 0.0, atol=0.01)


def test_manifest_filter_and_shard(corpus):
    all_entries = read_manifest(corpus["clean"])
    assert len(all_entries) == 6
    filtered = read_manifest(corpus["clean"], min_duration=1.0)
    assert len(filtered) == 4
    s0 = shard_for_host(all_entries, 0, 2)
    s1 = shard_for_host(all_entries, 1, 2)
    assert len(s0) + len(s1) == 6
    assert {e.audio_filepath for e in s0}.isdisjoint(
        {e.audio_filepath for e in s1}
    )


def test_dataset_mixing_mode(corpus):
    ds = SpeechDataset(corpus["clean"], corpus["noise"], SR, snr_db=0.0, seed=3)
    mix, clean = ds[0]
    assert mix.shape == clean.shape
    assert not np.allclose(mix, clean)
    # determinism within an epoch
    mix2, _ = ds[0]
    np.testing.assert_array_equal(mix, mix2)
    # re-pairing across epochs changes the mix
    ds.set_epoch(1)
    mix3, _ = ds[0]
    assert not np.array_equal(mix, mix3)


def test_dataset_premixed_mode(corpus):
    ds = SpeechDataset(corpus["premixed"], None, SR)
    mix, clean = ds[2]
    assert mix.shape == clean.shape
    assert not np.allclose(mix, clean)


def test_bucket_sampler_covers_all_items(corpus):
    dsp = DSPConfig()
    ds = SpeechDataset(corpus["clean"], corpus["noise"], SR)
    sampler = BucketSampler(ds, dsp, batch_size=2, bucket_frames=(64, 128, 256))
    plan = sampler.batches(epoch=0)
    seen = set()
    for bucket, idxs in plan:
        assert len(idxs) == 2
        for i in idxs:
            assert ds.num_frames(dsp, i) <= bucket
            seen.add(i)
    assert seen == set(range(len(ds)))


def test_loader_static_shapes_and_lengths(corpus):
    dsp = DSPConfig()
    ds = SpeechDataset(corpus["clean"], corpus["noise"], SR, seed=4)
    loader = DataLoader(
        ds, dsp, batch_size=2, bucket_frames=(64, 128, 256), num_workers=2, seed=4
    )
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        expect_len = dsp.padded_samples(b.bucket_frames)
        assert b.mix_wav.shape == (2, expect_len)
        assert b.clean_wav.shape == b.mix_wav.shape
        for j in range(2):
            n = int(b.lengths[j])
            assert 0 < n <= expect_len
            assert np.all(b.mix_wav[j, n:] == 0)
            # frame count fits the bucket
            assert dsp.num_frames(n) <= b.bucket_frames


def test_loader_deterministic_across_runs(corpus):
    dsp = DSPConfig()

    def run():
        ds = SpeechDataset(corpus["clean"], corpus["noise"], SR, seed=7)
        loader = DataLoader(
            ds, dsp, batch_size=2, bucket_frames=(128, 256), num_workers=2, seed=7
        )
        loader.set_epoch(3)
        return [(b.bucket_frames, b.indices.tolist(), b.mix_wav.sum()) for b in loader]

    a, b = run(), run()
    for (ba, ia, sa), (bb, ib, sb) in zip(a, b):
        assert ba == bb and ia == ib
        np.testing.assert_allclose(sa, sb)
