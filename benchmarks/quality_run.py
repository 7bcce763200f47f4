"""End-to-end quality run on the PRODUCTION path: train V2 through
`Trainer` + the device-resident corpus cache on the attached device, then
denoise held-out utterances and score STOI / SDR / native-PESQ against
the untrained model and the noisy mix.

This is the on-hardware counterpart of
tests/test_quality.py::test_training_improves_heldout_stoi_and_sdr (which
runs 200 steps on CPU through the raw step function): here the full
production stack runs -- DeviceCacheLoader metadata batches, scanned
multi-step dispatch, async checkpointing -- and the synthesis side uses
the corrected overlap-add ISTFT (the reference's quirk-chain rebuild is
not a faithful inverse and floors waveform metrics, SURVEY.md SS7).

Usage: python benchmarks/quality_run.py [--epochs 60] [--json]
       python benchmarks/quality_run.py --rotating   # >HBM-path variant
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def speechlike(seed, n, sr):
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    carrier = lfilter([1.0], [1.0, -0.9], rng.standard_normal(n))
    env = 0.55 + 0.45 * np.sin(
        2 * np.pi * rng.uniform(2.5, 5.0) * t + rng.uniform(0, 6)
    )
    return (env * carrier).astype(np.float32) * 0.3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--train-utts", type=int, default=32)
    ap.add_argument(
        "--rotating",
        action="store_true",
        help="train through the RotatingDeviceCacheLoader (the >HBM "
        "production path: multi-shard, per-epoch HBM rotation) instead "
        "of the resident cache -- certifies that path LEARNS end-to-end",
    )
    ap.add_argument("--json", action="store_true")
    a = ap.parse_args()

    import jax

    from fullycnnspeechenhancement_tpu.config import (
        Config,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from fullycnnspeechenhancement_tpu.data import write_manifest, write_wav
    from fullycnnspeechenhancement_tpu.data.device_cache import (
        DeviceCacheLoader,
        RotatingDeviceCacheLoader,
        build_device_corpus,
    )
    from fullycnnspeechenhancement_tpu.dsp import WaveformRebuilder
    from fullycnnspeechenhancement_tpu.eval.metrics import PESQ, sdr, stoi
    from fullycnnspeechenhancement_tpu.models import get_model
    from fullycnnspeechenhancement_tpu.train.step import make_eval_step
    from fullycnnspeechenhancement_tpu.train.trainer import Trainer

    sr = 8000
    sec = 2.0
    n = int(sec * sr)
    root = tempfile.mkdtemp(prefix="quality_run_")
    entries = []
    for i in range(a.train_utts):
        p = os.path.join(root, f"c{i}.wav")
        write_wav(p, speechlike(i, n, sr), sr)
        entries.append({"audio_filepath": p, "duration": sec})
    rng = np.random.default_rng(999)
    noise_p = os.path.join(root, "noise.wav")
    write_wav(
        noise_p, (0.25 * rng.standard_normal(10 * sr)).astype(np.float32), sr
    )
    write_manifest(os.path.join(root, "m.clean"), entries)
    write_manifest(
        os.path.join(root, "m.noise"),
        [{"audio_filepath": noise_p, "duration": 10.0}],
    )

    config = Config(
        model=ModelConfig(
            net_work="FullyCNNV2",
            compute_dtype="bfloat16",
            blocked_compute=True,
        ),
        train=TrainConfig(
            batch_size=8,
            lr=1.5e-3,
            warmup_steps=100,
            steps_per_call=4,
            epochs=a.epochs,
            num_iter_print=10**9,
            checkpoints_path=os.path.join(root, "ckpts"),
            log_dir=os.path.join(root, "logs"),
            continue_train=False,
            max_checkpoints_to_keep=1,
        ),
        data=DataConfig(audio_save_path=os.path.join(root, "denoise")),
    )
    if a.rotating:
        # budget forces >= 2 shards so every epoch crosses real shard
        # rotations (fresh commit buffer, shared noise reuse)
        per_entry = n * 2
        loader = RotatingDeviceCacheLoader(
            os.path.join(root, "m.clean"),
            os.path.join(root, "m.noise"),
            config.dsp,
            batch_size=8,
            hbm_budget_bytes=per_entry * (a.train_utts // 2),
            shuffle=True,
            seed=0,
            spill_dir=os.path.join(root, "spill"),
        )
        assert loader.num_shards >= 2, loader.num_shards
    else:
        corpus = build_device_corpus(
            os.path.join(root, "m.clean"),
            os.path.join(root, "m.noise"),
            config.dsp,
            commit=False,
        )
        loader = DeviceCacheLoader(corpus, config.dsp, 8, shuffle=True, seed=0)

    model = get_model("FullyCNNV2")
    # held-out evaluation set: unseen speech, unseen noise draws
    eval_step = make_eval_step(config, model, is_training=False)
    reb = WaveformRebuilder(config.dsp, mode="overlap_add")
    pesq = PESQ(sr=sr)

    def score(params, bn_state):
        st, sd, pq = [], [], []
        for k in range(4):
            clean = speechlike(10_000 + k, n, sr)
            nz = np.random.default_rng(20_000 + k).standard_normal(n)
            nz = nz * np.sqrt((clean**2).sum() / (nz**2).sum())  # 0 dB
            mix = (clean + nz).astype(np.float32)
            pred, phre, phim = eval_step(
                params,
                bn_state,
                mix[None, :],
                np.asarray([n], np.int32),
            )
            den = np.asarray(reb(pred, phre, phim))[0][:n]
            st.append(stoi(clean, den, sr))
            sd.append(sdr(clean, den))
            if pesq.available:
                pq.append(pesq(clean, den))
        out = {"stoi": float(np.mean(st)), "sdr": float(np.mean(sd))}
        if pq:
            out["pesq_native"] = float(np.mean(pq))
        return out

    def score_mix():
        st, sd, pq = [], [], []
        for k in range(4):
            clean = speechlike(10_000 + k, n, sr)
            nz = np.random.default_rng(20_000 + k).standard_normal(n)
            nz = nz * np.sqrt((clean**2).sum() / (nz**2).sum())
            mix = (clean + nz).astype(np.float32)
            st.append(stoi(clean, mix, sr))
            sd.append(sdr(clean, mix))
            if pesq.available:
                pq.append(pesq(clean, mix))
        out = {"stoi": float(np.mean(st)), "sdr": float(np.mean(sd))}
        if pq:
            out["pesq_native"] = float(np.mean(pq))
        return out

    trainer = Trainer(config)
    before = score(trainer.state.params, trainer.state.bn_state)
    noisy = score_mix()
    t0 = time.perf_counter()
    trainer.train(loader)
    wall = time.perf_counter() - t0
    after = score(trainer.state.params, trainer.state.bn_state)
    trainer.ckpt.close()

    steps = int(trainer.state.step)
    result = {
        "metric": "quality_run",
        "loader": "rotating" if a.rotating else "cached",
        "shards": getattr(loader, "num_shards", 1),
        "backend": jax.default_backend(),
        "steps": steps,
        "train_wall_s": round(wall, 1),
        "noisy_mix": {k: round(v, 3) for k, v in noisy.items()},
        "untrained": {k: round(v, 3) for k, v in before.items()},
        "trained": {k: round(v, 3) for k, v in after.items()},
    }
    print(json.dumps(result))
    assert after["stoi"] > noisy["stoi"] and after["sdr"] > noisy["sdr"], (
        "training did not improve held-out metrics over the mix"
    )


if __name__ == "__main__":
    main()
