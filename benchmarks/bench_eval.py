"""Evaluation throughput: audio-seconds scored per wall-second through
`Evaluator.evaluate` (device forward + rebuild, host truncation, STOI /
SDR / PESQ scoring in a worker pool) on the attached device.

Why it matters (VERDICT r4 weak 5): the evaluator is host-fed -- per
batch H2D over the same link the cached train loop escaped -- and STOI
scoring is GIL-bound numpy.  At every-5-epoch validation on a real
corpus an unmeasured eval loop could dominate wall clock; this bench
pins the number and splits it into the device phase and the scoring
phase so the binding constraint is visible.

Reports:
  eval_audio_s_per_s   end-to-end Evaluator.evaluate throughput
  device_audio_s_per_s the forward+rebuild-only loop on the same batches
                       (loader + H2D + device compute + D2H fetch)
  scoring share        implied scoring+write overhead

Usage: python benchmarks/bench_eval.py [--entries 128] [--workers 8]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def measure(
    n_entries: int = 128,
    seconds_per_utt: float = 8.0,
    batch: int = 16,
    num_workers: int = 8,
) -> dict:
    import jax

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _bench_corpus

    from fullycnnspeechenhancement_tpu.config import Config, ModelConfig
    from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset
    from fullycnnspeechenhancement_tpu.data.loader import DataLoader
    from fullycnnspeechenhancement_tpu.eval.evaluator import Evaluator
    from fullycnnspeechenhancement_tpu.models import get_model

    sr = 8000
    root = tempfile.mkdtemp(prefix="bench_eval_")
    clean_manifest, noise_manifest = _bench_corpus(
        root, seconds_per_utt, n_entries, sr
    )
    config = Config(
        model=ModelConfig(net_work="FullyCNNV2", compute_dtype="bfloat16",
                          blocked_compute=True)
    )
    model = get_model("FullyCNNV2")
    params, bn_state = model.init(jax.random.PRNGKey(0))
    ds = SpeechDataset(clean_manifest, noise_manifest, sr, seed=0)
    loader = DataLoader(
        ds, config.dsp, batch, shuffle=False, num_workers=4, prefetch=4,
        seed=0,
    )
    ev = Evaluator(config, model, num_workers=num_workers)

    # Warmup epoch: pays the per-bucket compiles + scorer imports.
    loader.set_epoch(0)
    ev.evaluate(loader, params, bn_state)

    # Device-only phase at the same batches: loader + H2D + jitted
    # forward/rebuild + the D2H fetch, no scoring.
    loader.set_epoch(0)
    audio_s = 0.0
    t0 = time.perf_counter()
    for b in loader:
        out = np.asarray(ev._fn(params, bn_state, b.mix_wav, b.lengths))
        audio_s += float(np.asarray(b.lengths).sum()) / sr
    device_dt = time.perf_counter() - t0

    loader.set_epoch(0)
    t0 = time.perf_counter()
    results = ev.evaluate(loader, params, bn_state)
    full_dt = time.perf_counter() - t0
    ev.close()

    return {
        "metric": "eval_audio_s_per_s",
        "value": round(audio_s / full_dt, 2),
        "unit": "audio-s/wall-s",
        "backend": jax.default_backend(),
        "device_audio_s_per_s": round(audio_s / device_dt, 2),
        "scoring_overhead_frac": round(
            max(0.0, (full_dt - device_dt)) / full_dt, 3
        ),
        "pesq_implementation": ev.pesq.implementation
        if ev.pesq.available
        else ev.pesq_proxy.implementation,
        "audio_seconds": round(audio_s, 1),
        "metrics": {k: round(v, 4) for k, v in results.items()},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--entries", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    a = ap.parse_args()
    print(json.dumps(measure(a.entries, a.seconds, a.batch, a.workers)))


if __name__ == "__main__":
    main()
