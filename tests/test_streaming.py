"""Streaming denoiser: equivalence with whole-utterance (batch) inference
through the overlap-add path, arbitrary chunking, and latency contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.config import Config, ModelConfig
from fullycnnspeechenhancement_tpu.dsp.features import SpectrogramExtractor
from fullycnnspeechenhancement_tpu.dsp.rebuild import WaveformRebuilder
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.streaming import StreamingDenoiser

SR = 8000


@pytest.fixture(scope="module")
def setup():
    config = Config(model=ModelConfig(net_work="FullyCNNV2"))
    model = get_model("FullyCNNV2")
    params, bn = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = int(2.0 * SR)
    t = np.arange(n) / SR
    wav = (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    return config, model, params, bn, wav


def _batch_denoise_ola(config, model, params, bn, wav):
    ext = SpectrogramExtractor(config.dsp)
    reb = WaveformRebuilder(config.dsp, mode="overlap_add")
    batch = wav[None, :]
    lengths = np.array([len(wav)], np.int32)
    mag, pre, pim = ext.magnitude_and_phase(batch, lengths)
    pred, _ = model.apply(params, bn, mag[..., None], is_training=False)
    return np.asarray(reb(pred[..., 0], pre, pim))[0]


def test_streaming_matches_batch(setup):
    config, model, params, bn, wav = setup
    batch_out = _batch_denoise_ola(config, model, params, bn, wav)

    streamer = StreamingDenoiser(config, params, bn, chunk_frames=8)
    out = [streamer.push(wav)]
    out.append(streamer.flush())
    stream_out = np.concatenate(out)

    n = min(len(stream_out), len(batch_out))
    assert n >= len(wav) - config.dsp.frame_length
    np.testing.assert_allclose(
        stream_out[:n], batch_out[:n], rtol=1e-3, atol=2e-3
    )


def test_streaming_chunking_invariance(setup):
    """Output must not depend on how the input is sliced."""
    config, model, params, bn, wav = setup

    def run(pieces):
        s = StreamingDenoiser(config, params, bn, chunk_frames=4)
        outs = [s.push(p) for p in pieces]
        outs.append(s.flush())
        return np.concatenate(outs)

    a = run([wav])
    rng = np.random.default_rng(1)
    cuts = np.sort(rng.choice(len(wav) - 2, size=7, replace=False) + 1)
    b = run(np.split(wav, cuts))
    assert len(a) == len(b)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_streaming_latency_contract(setup):
    """Pushing exactly (history-free) chunk+lookahead frames of audio must
    produce the first chunk of output; less must produce nothing."""
    config, model, params, bn, wav = setup
    s = StreamingDenoiser(config, params, bn, chunk_frames=4)
    step, flen = config.dsp.frame_step, config.dsp.frame_length
    need_frames = 4 + 4  # chunk + lookahead
    need_samples = (need_frames - 1) * step + flen
    out = s.push(wav[: need_samples - 1])
    assert len(out) == 0
    out = s.push(wav[need_samples - 1 : need_samples])
    assert len(out) == 4 * step
