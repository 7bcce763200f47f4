"""Test CLI: batch evaluation with PESQ/STOI/SDR and wav triplet dumps
(the reference's test.py/tester.py surface, test.py:13-41)."""

from __future__ import annotations

import argparse
import os

import jax

from fullycnnspeechenhancement_tpu.cli import (
    enable_compilation_cache,
    setup_file_logger,
)
from fullycnnspeechenhancement_tpu.config import load_ini_config
from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset
from fullycnnspeechenhancement_tpu.data.loader import DataLoader


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a speech denoiser")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--num-works", default=4, type=int)
    parser.add_argument(
        "--checkpoint", default=None, help="override checkpoint dir or npz"
    )
    args = parser.parse_args(argv)

    enable_compilation_cache()
    config = load_ini_config(args.cfg)
    logger = setup_file_logger(
        config.train.log_dir or "logs",
        f"test_{config.model.net_arch}_{config.model.net_work}",
    )

    from fullycnnspeechenhancement_tpu.eval.evaluator import Evaluator
    from fullycnnspeechenhancement_tpu.infer import InferenceEngine
    from fullycnnspeechenhancement_tpu.models import get_model

    # Reuse InferenceEngine's checkpoint resolution (orbax dir or npz).
    engine = InferenceEngine(config, checkpoint=args.checkpoint)

    test_ds = SpeechDataset.from_config(config.data, config.dsp, "test")
    loader = DataLoader(
        test_ds,
        config.dsp,
        config.eval.batch_size,
        bucket_frames=config.data.bucket_frames,
        shuffle=False,
        num_workers=args.num_works,
        seed=config.data.seed,
    )
    loader.set_epoch(0)

    # Standalone testing runs BN in inference mode (tester.py:67-83).
    evaluator = Evaluator(config, get_model(config.model.net_work),
                          bn_training_mode=False)
    try:
        results = evaluator.evaluate(
            loader,
            engine.params,
            engine.bn_state,
            save_dir=config.data.audio_save_path,
        )
    finally:
        evaluator.close()
    msg = ", ".join(f"{k}={v:.4f}" for k, v in sorted(results.items()))
    logger.info("test results: %s", msg)
    print(msg)


if __name__ == "__main__":
    main()
