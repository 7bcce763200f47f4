"""Train CLI: `python -m fullycnnspeechenhancement_tpu.cli.train --cfg <ini>`.

Same surface as the reference's train.py (argparse --cfg/--num-works,
reference train.py:69-75), wiring config -> datasets -> loaders -> Trainer.
"""

from __future__ import annotations

import argparse

from fullycnnspeechenhancement_tpu.cli import (
    enable_compilation_cache,
    setup_file_logger,
)
from fullycnnspeechenhancement_tpu.config import Config, load_ini_config
from fullycnnspeechenhancement_tpu.data.dataset import SpeechDataset
from fullycnnspeechenhancement_tpu.data.loader import DataLoader


def build_loaders(config: Config, num_workers: int):
    from fullycnnspeechenhancement_tpu.parallel import multihost

    hi, hc = multihost.host_index(), multihost.host_count()
    if config.data.use_device_cache:
        # Device-resident corpus + on-device mixing: the Trainer commits
        # the flats and fuses batch materialization into the train step
        # (steady-state H2D = [B] metadata).  The corpus build decodes the
        # full (host-sharded) corpus once up front.  A corpus estimated
        # past [data] device_cache_budget_gb rotates shards through HBM
        # instead (RotatingDeviceCacheLoader).
        from fullycnnspeechenhancement_tpu.data.device_cache import (
            DeviceCacheLoader,
            RotatingDeviceCacheLoader,
            build_device_corpus,
        )
        from fullycnnspeechenhancement_tpu.data.manifest import read_manifest

        budget_gb = config.data.device_cache_budget_gb
        est_bytes = 0
        entries = None  # reused by the chosen loader (no second parse)
        if budget_gb > 0:
            entries = read_manifest(
                config.data.train_manifest_path,
                config.data.min_duration,
                config.data.max_duration,
            )
            per = 2 * (2 if entries and entries[0].is_premixed else 1)
            est_bytes = sum(
                int(e.duration * config.dsp.sample_rate) * per
                for e in entries
            ) // max(hc, 1)
        if budget_gb > 0 and est_bytes > budget_gb * (1 << 30):
            train_loader = RotatingDeviceCacheLoader(
                config.data.train_manifest_path,
                config.data.train_noise_manifest,
                config.dsp,
                config.train.batch_size,
                data=config.data,
                hbm_budget_bytes=int(budget_gb * (1 << 30)),
                host_index=hi,
                host_count=hc,
                bucket_frames=config.data.bucket_frames,
                shuffle=True,
                seed=config.data.seed,
                spill_dir=config.data.device_cache_spill_dir or None,
                entries=entries,
            )
        else:
            corpus = build_device_corpus(
                config.data.train_manifest_path,
                config.data.train_noise_manifest,
                config.dsp,
                config.data,
                host_index=hi,
                host_count=hc,
                max_bucket_frames=max(config.data.bucket_frames),
                commit=False,  # Trainer commits with mesh-aware placement
                entries=entries,
            )
            train_loader = DeviceCacheLoader(
                corpus,
                config.dsp,
                config.train.batch_size,
                bucket_frames=config.data.bucket_frames,
                shuffle=True,
                seed=config.data.seed,
            )
    else:
        train_ds = SpeechDataset.from_config(
            config.data, config.dsp, "train", host_index=hi, host_count=hc
        )
        train_loader = DataLoader(
            train_ds,
            config.dsp,
            config.train.batch_size,
            bucket_frames=config.data.bucket_frames,
            shuffle=True,
            num_workers=num_workers,
            prefetch=config.data.prefetch_batches,
            seed=config.data.seed,
            int16_transport=config.data.int16_transport,
        )
    val_loader = None
    if config.data.val_manifest_path:
        val_ds = SpeechDataset.from_config(config.data, config.dsp, "val")
        val_loader = DataLoader(
            val_ds,
            config.dsp,
            config.train.batch_size,
            bucket_frames=config.data.bucket_frames,
            shuffle=False,
            num_workers=num_workers,
            seed=config.data.seed,
        )
    return train_loader, val_loader


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a speech denoiser")
    parser.add_argument("--cfg", required=True, help="INI config file")
    parser.add_argument(
        "--num-works", default=4, type=int, help="loader worker threads"
    )
    args = parser.parse_args(argv)

    from fullycnnspeechenhancement_tpu.parallel import multihost

    multihost.maybe_initialize_from_env()
    enable_compilation_cache()
    config = load_ini_config(args.cfg)
    logger = setup_file_logger(
        config.train.log_dir,
        f"{config.model.net_arch}_{config.model.net_work}",
    )

    from fullycnnspeechenhancement_tpu.train.trainer import Trainer

    train_loader, val_loader = build_loaders(config, args.num_works)
    trainer = Trainer(config)
    try:
        trainer.train(train_loader, val_loader, log=logger)
    finally:
        trainer.ckpt.close()


if __name__ == "__main__":
    main()
