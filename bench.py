"""Throughput benchmark: audio-seconds of speech processed per second of
wall clock by the full V2 train step (device STFT analysis x2, forward,
backward, TF-Adam update) on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` is measured against a faithful torch-CPU re-implementation of
the same train step run in the same process (the reference's own stack is
TF-1.14/GPU, unavailable here; torch-CPU is the honest locally-measurable
stand-in, and the reference's published experiments used batch 2 with a
host-side numpy STFT -- our baseline gives it the same batch size and model
math).  The number is a ratio: TPU audio-seconds/s divided by baseline
audio-seconds/s.
"""

import json
import time

import numpy as np


def _make_batch(rng, batch, samples):
    t = np.arange(samples) / 8000.0
    clean = 0.3 * np.sin(
        2 * np.pi * rng.uniform(100, 1000, (batch, 1)) * t[None, :]
    ).astype(np.float32)
    mix = clean + 0.1 * rng.standard_normal((batch, samples)).astype(np.float32)
    lengths = np.full((batch,), samples, np.int32)
    return mix, clean, lengths


def bench_tpu(batch=64, seconds_per_utt=8.0, iters=50, repeats=3):
    """Times `iters` train steps chained inside ONE jitted scan, fetching a
    scalar at the end.  On this remote-tunneled TPU, `block_until_ready`
    does not actually wait for device completion (measured: it would imply
    >10 PFLOP/s); only a device->host value fetch is a true barrier, and it
    costs ~25 ms of tunnel latency -- hence chaining inside the program and
    amortizing one fetch over `iters` steps."""
    import jax
    import jax.numpy as jnp

    from fullycnnspeechenhancement_tpu.config import Config, TrainConfig
    from fullycnnspeechenhancement_tpu.models import get_model
    from fullycnnspeechenhancement_tpu.train import create_train_state
    from fullycnnspeechenhancement_tpu.train.step import Batch, make_train_step

    from fullycnnspeechenhancement_tpu.config import ModelConfig

    samples = int(seconds_per_utt * 8000)
    # bf16 fast path (the TPU-native training mode; f32-HIGHEST is the
    # numerics-parity mode, ~3.6x slower, same loss trajectory -- see
    # models/rced.py).
    config = Config(
        model=ModelConfig(
            net_work="FullyCNNV2",
            compute_dtype="bfloat16",
            blocked_compute=True,  # freq-to-depth fast path (models/blocked.py)
        ),
        train=TrainConfig(batch_size=batch, lr=1.5e-3),
    )
    model = get_model("FullyCNNV2")
    state = create_train_state(config, model, jax.random.PRNGKey(0))
    step = make_train_step(config, model)

    rng = np.random.default_rng(0)
    mix, clean, lengths = _make_batch(rng, batch, samples)
    b = Batch(jnp.asarray(mix), jnp.asarray(clean), jnp.asarray(lengths))

    @jax.jit
    def run_chain(state, b):
        def body(s, _):
            s, metrics = step(s, b)
            return s, metrics["loss"]

        state, losses = jax.lax.scan(body, state, None, length=iters)
        return state, losses[-1]

    state, last = run_chain(state, b)  # compile + warm
    float(last)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, last = run_chain(state, b)
        float(last)  # true device barrier: value fetch
        times.append(time.perf_counter() - t0)
    dt = min(times)
    audio_seconds = batch * seconds_per_utt * iters
    return audio_seconds / dt


def bench_torch_cpu_baseline(batch=2, seconds_per_utt=8.0, warmup=1, iters=3):
    """Reference-equivalent train step on torch CPU: host numpy STFT (as the
    reference does on host), V2-topology conv stack, L2-sum/batch loss,
    Adam.  Returns audio-seconds/s."""
    import torch
    import torch.nn as nn

    from fullycnnspeechenhancement_tpu.dsp import reference_dsp

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout, k, norm=True, act=True):
            super().__init__()
            kh, kw = k
            self.pad = nn.ZeroPad2d(((kw - 1) // 2, kw // 2, (kh - 1) // 2, kh // 2))
            self.conv = nn.Conv2d(cin, cout, k)
            self.bn = nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01) if norm else None
            self.act = act

        def forward(self, x, skip=None):
            y = self.conv(self.pad(x))
            if self.bn is not None:
                y = self.bn(y)
            if skip is not None:
                y = y + skip
            return torch.relu(y) if self.act else y

    class V2Torch(nn.Module):
        def __init__(self):
            super().__init__()
            ch = [10, 12, 14, 15, 19, 21, 23, 25]
            ks = [(8, 11), (1, 7), (1, 5), (1, 5), (1, 5), (1, 5), (1, 7), (1, 11)]
            self.enc = nn.ModuleList(
                ConvBlock(c0, c1, k)
                for c0, c1, k in zip([1] + ch[:-1], ch, ks)
            )
            dch = [23, 21, 19, 15, 14, 12, 10]
            dks = [(1, 7), (1, 5), (1, 5), (1, 5), (1, 5), (1, 7), (1, 11)]
            self.dec = nn.ModuleList(
                ConvBlock(c0, c1, k)
                for c0, c1, k in zip([25] + dch[:-1], dch, dks)
            )
            self.final = ConvBlock(10, 1, (1, 129), norm=False, act=False)

        def forward(self, x):
            taps = []
            for layer in self.enc:
                x = layer(x)
                taps.append(x)
            for i, layer in enumerate(self.dec):
                x = layer(x, skip=taps[6 - i])
            return self.final(x)

    torch.manual_seed(0)
    model = V2Torch()
    opt = torch.optim.Adam(model.parameters(), lr=1.5e-3)
    rng = np.random.default_rng(0)
    samples = int(seconds_per_utt * 8000)
    mix, clean, _ = _make_batch(rng, batch, samples)

    def one_step():
        # Host STFT per utterance, as the reference's loader does.
        mags = []
        for wavs in (mix, clean):
            m = np.stack(
                [reference_dsp.analyze(w, 8000, 0.032, 0.016, 256).T for w in wavs]
            )
            mags.append(torch.from_numpy(m[:, None]))  # [B,1,T,F]
        x, y = mags
        opt.zero_grad()
        loss = ((model(x) - y) ** 2).sum() / batch
        loss.backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(iters):
        one_step()
    dt = time.perf_counter() - t0
    return batch * seconds_per_utt * iters / dt


def main():
    tpu = bench_tpu()
    try:
        baseline = bench_torch_cpu_baseline()
    except Exception:
        baseline = None
    print(
        json.dumps(
            {
                "metric": "train_audio_seconds_per_second",
                "value": round(tpu, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(tpu / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
