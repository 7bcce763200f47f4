"""Streaming CLI: simulate real-time chunked denoising of a wav file.

The reference lists a real-time demo as TODO
(`/root/reference/readme.md:76-79`); this is that surface.  The file is
pushed through `StreamingDenoiser` one chunk at a time exactly as a live
microphone loop would, the denoised stream is written out, and the
real-time budget report (RTF, per-push latency percentiles) is printed --
the same numbers `benchmarks/bench_streaming.py` records for the bench.

    python -m fullycnnspeechenhancement_tpu.cli.stream \
        --cfg work/aishell_1/cfg/fully_cnn_infer.cfg \
        --audio-file noisy.wav [--chunk-frames 8] [--checkpoint ...]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache
from fullycnnspeechenhancement_tpu.config import load_ini_config


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Denoise a wav file in simulated real time"
    )
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--audio-file", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--chunk-frames",
        default=8,
        type=int,
        help="frames per push (8 = 128 ms at the reference's 16 ms stride)",
    )
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = load_ini_config(args.cfg)

    from fullycnnspeechenhancement_tpu.data.audio_io import read_wav, write_wav
    from fullycnnspeechenhancement_tpu.infer import InferenceEngine
    from fullycnnspeechenhancement_tpu.streaming import StreamingDenoiser

    # Reuse the inference engine's checkpoint resolution (orbax dir / npz).
    engine = InferenceEngine(config, checkpoint=args.checkpoint)
    den = StreamingDenoiser(
        config, engine.params, engine.bn_state, chunk_frames=args.chunk_frames
    )

    sr = config.dsp.sample_rate
    wav, _ = read_wav(args.audio_file, sr)
    push = args.chunk_frames * config.dsp.frame_step

    # prime the compile so the RTF report reflects steady state
    den.push(wav[: 4 * push])
    den.reset()

    out, times = [], []
    t0 = time.perf_counter()
    for i in range(0, len(wav), push):
        c0 = time.perf_counter()
        out.append(den.push(wav[i : i + push]))
        times.append(time.perf_counter() - c0)
    out.append(den.flush())
    wall = time.perf_counter() - t0

    denoised = np.concatenate(out)[: len(wav)]
    # splitext keeps this safe for non-".wav" extensions / extension-less
    # inputs (a bare str.replace could no-op and overwrite the input) and
    # never touches directory components
    base, ext = os.path.splitext(args.audio_file)
    out_path = base + "_de" + (ext or ".wav")
    write_wav(out_path, denoised, sr)

    times_ms = np.asarray(times) * 1e3
    report = {
        "out": out_path,
        "rtf": round(len(wav) / sr / wall, 2),
        "budget_ms": round(push / sr * 1e3, 1),
        "push_p50_ms": round(float(np.percentile(times_ms, 50)), 2),
        "push_p95_ms": round(float(np.percentile(times_ms, 95)), 2),
        "latency_ms": round((den.latency_samples + push) / sr * 1e3, 1),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
