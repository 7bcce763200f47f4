"""Input-pipeline throughput: Python vs native (C++ libfcse_runtime)
item preparation through the real DataLoader, across worker counts.

The loader must outrun the train step's audio consumption (bf16+blocked
V2 step at batch 64 x 8 s: ~80 ms/step ~= 6,400 audio-s/s -- see
PERF_NOTES.md) or the chip starves.  This measures the host side alone:
full epoch iteration over a synthetic on-disk corpus (decode + SNR mix +
bucket collate + prefetch), no device in the loop.

Usage: python benchmarks/bench_input_pipeline.py [n_entries]
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from fullycnnspeechenhancement_tpu.config import DSPConfig
from fullycnnspeechenhancement_tpu.data import write_manifest, write_wav
from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset
from fullycnnspeechenhancement_tpu.data.loader import DataLoader
from fullycnnspeechenhancement_tpu.data import native

SR = 8000
SECONDS = 8.0
BATCH = 64
N_ENTRIES = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def build_corpus(root):
    samples = int(SECONDS * SR)
    t = np.arange(samples) / SR
    rng = np.random.default_rng(0)
    paths = []
    for i in range(8):
        sig = (0.4 * np.sin(2 * np.pi * (250 + 90 * i) * t)).astype(np.float32)
        p = os.path.join(root, f"clean_{i}.wav")
        write_wav(p, sig, SR)
        paths.append(p)
    noise_path = os.path.join(root, "noise.wav")
    write_wav(
        noise_path, (0.2 * rng.standard_normal(2 * samples)).astype(np.float32), SR
    )
    write_manifest(
        os.path.join(root, "manifest.clean"),
        [
            {"audio_filepath": paths[i % 8], "duration": SECONDS}
            for i in range(N_ENTRIES)
        ],
    )
    write_manifest(
        os.path.join(root, "manifest.noise"),
        [{"audio_filepath": noise_path, "duration": 2 * SECONDS}],
    )


def measure(root, use_native, workers):
    ds = SpeechDataset(
        os.path.join(root, "manifest.clean"),
        os.path.join(root, "manifest.noise"),
        SR,
        seed=0,
        use_native=use_native,
    )
    loader = DataLoader(
        ds, DSPConfig(), BATCH, shuffle=True, num_workers=workers, prefetch=4
    )
    # warm one batch (thread pool spin-up, file cache)
    next(iter(loader))
    t0 = time.perf_counter()
    n_items, audio_s = 0, 0.0
    for b in loader:
        n_items += len(b.lengths)
        audio_s += float(b.lengths.sum()) / SR
    dt = time.perf_counter() - t0
    return n_items / dt, audio_s / dt


def main():
    root = tempfile.mkdtemp(prefix="bench_input_")
    build_corpus(root)
    print(f"{N_ENTRIES} entries x {SECONDS:.0f}s, batch {BATCH}")
    print(f"{'path':8} {'workers':>7} {'items/s':>10} {'audio-s/s':>12}")
    for use_native in ([False, True] if native.native_available() else [False]):
        for workers in (1, 2, 4, 8, 16):
            ips, aps = measure(root, use_native, workers)
            label = "native" if use_native else "python"
            print(f"{label:8} {workers:>7} {ips:>10.1f} {aps:>12.0f}", flush=True)


if __name__ == "__main__":
    main()
