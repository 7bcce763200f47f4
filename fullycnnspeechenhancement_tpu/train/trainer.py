"""Training engine: epoch loop, checkpointing, validation, telemetry.

The reference's `FullyCNNTrainer` (trainer.py:121-338) drives a TF Session
with feed_dict; this engine drives jitted steps (single-chip or
data-parallel over a mesh) with a prefetching loader, per-epoch orbax
checkpoints, every-N-epoch validation through the device rebuild path, and
JSONL scalar telemetry (the reference writes TensorBoard summaries,
trainer.py:138-141; JSONL keeps the image dependency-free and is trivially
plottable).

Throughput is tracked as audio-seconds/s -- the north-star metric from
BASELINE.json -- alongside the reference's data_time/batch_time meters
(trainer.py:212-230).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.data.loader import DataLoader, LoaderBatch
from fullycnnspeechenhancement_tpu.eval.evaluator import Evaluator
from fullycnnspeechenhancement_tpu.eval.metrics import AverageMeter
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    shard_batch,
)
from fullycnnspeechenhancement_tpu.train.checkpoint import CheckpointManager
from fullycnnspeechenhancement_tpu.train.profiling import StepProfiler
from fullycnnspeechenhancement_tpu.train.step import (
    Batch,
    create_train_state,
    make_train_step,
)

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, config: Config):
        self.config = config
        self.model = get_model(config.model.net_work)
        self.run_name = f"{config.model.net_arch}_{config.model.net_work}"

        n_dp = config.train.data_parallel
        if n_dp > 1:
            self.mesh = make_mesh(n_data=n_dp)
            self._step = make_parallel_train_step(config, self.model, self.mesh)
        else:
            self.mesh = None
            self._step = jax.jit(
                make_train_step(config, self.model), donate_argnums=(0,)
            )

        self.state = create_train_state(
            config, self.model, jax.random.PRNGKey(config.train.seed)
        )
        self.ckpt = CheckpointManager(
            config.train.checkpoints_path,
            self.run_name,
            max_to_keep=config.train.max_checkpoints_to_keep,
        )
        self.start_epoch = 0
        if config.train.continue_train:
            restored, epoch = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                self.start_epoch = epoch + 1
                logger.info("resumed from epoch %d checkpoint", epoch)

        # Faithful default: in-training validation runs BN in batch-stats
        # mode, like the reference reusing its training graph (Appendix A.8).
        self.evaluator = Evaluator(config, self.model, bn_training_mode=True)
        # The reference never resets its validation meters across epochs
        # (Appendix A.11); keep that behaviour for log parity.
        self._valid_meters = {}

        self.train_loss = AverageMeter()
        self.data_time = AverageMeter()
        self.step_time = AverageMeter()
        self.profiler = StepProfiler()

        os.makedirs(config.train.log_dir, exist_ok=True)
        self._scalars_path = os.path.join(
            config.train.log_dir, f"scalars_{self.run_name}.jsonl"
        )
        param_count = self.model.param_count()
        logger.info("model %s: %d parameters", self.run_name, param_count)

    def _log_scalars(self, **kv):
        with open(self._scalars_path, "a") as f:
            f.write(json.dumps(kv) + "\n")

    def _device_batch(self, b: LoaderBatch) -> Batch:
        batch = Batch(
            jnp.asarray(b.mix_wav), jnp.asarray(b.clean_wav), jnp.asarray(b.lengths)
        )
        if self.mesh is not None:
            batch = shard_batch(self.mesh, batch)
        return batch

    def train(
        self,
        train_loader: DataLoader,
        valid_loader: Optional[DataLoader] = None,
        epochs: Optional[int] = None,
        log: Optional[logging.Logger] = None,
    ):
        log = log or logger
        cfg = self.config.train
        epochs = epochs if epochs is not None else cfg.epochs
        for epoch in range(self.start_epoch, epochs):
            train_loader.set_epoch(epoch)
            epoch_audio_s = 0.0
            epoch_t0 = time.perf_counter()
            t_data = time.perf_counter()
            for i, b in enumerate(train_loader):
                self.data_time.update(time.perf_counter() - t_data)
                t_step = time.perf_counter()
                batch = self._device_batch(b)
                self.state, metrics = self._step(self.state, batch)
                loss = float(metrics["loss"])
                self.step_time.update(time.perf_counter() - t_step)
                self.train_loss.update(loss)
                epoch_audio_s += float(b.lengths.sum()) / self.config.dsp.sample_rate
                step = int(metrics["step"])
                self.profiler.step(step)
                self._log_scalars(
                    step=step, loss=loss, lr=float(metrics["lr"]), epoch=epoch
                )
                if (i + 1) % cfg.num_iter_print == 0:
                    log.info(
                        "epoch %d batch %d/%d loss %.4f(%.4f) "
                        "data %.3fs(%.3fs) step %.3fs(%.3fs)",
                        epoch,
                        i + 1,
                        len(train_loader),
                        self.train_loss.val,
                        self.train_loss.avg,
                        self.data_time.val,
                        self.data_time.avg,
                        self.step_time.val,
                        self.step_time.avg,
                    )
                t_data = time.perf_counter()
            wall = time.perf_counter() - epoch_t0
            log.info(
                "epoch %d done: %.1f audio-s in %.1f s (%.1f audio-s/s)",
                epoch,
                epoch_audio_s,
                wall,
                epoch_audio_s / max(wall, 1e-9),
            )
            self.ckpt.save(epoch, self.state)
            if valid_loader is not None and (epoch + 1) % cfg.valid_every_epochs == 0:
                self.validate(valid_loader, epoch, log)
        self.profiler.close()

    def validate(self, valid_loader: DataLoader, epoch: int, log=None):
        log = log or logger
        valid_loader.set_epoch(0)  # fixed eval mixing across epochs
        save_dir = os.path.join(self.config.data.audio_save_path, str(epoch))
        results = self.evaluator.evaluate(
            valid_loader,
            self.state.params,
            self.state.bn_state,
            save_dir=save_dir,
            meters=self._valid_meters,
        )
        msg = ", ".join(f"{k}={v:.4f}" for k, v in sorted(results.items()))
        log.info("epoch %d validation: %s", epoch, msg)
        self._log_scalars(epoch=epoch, **{f"valid_{k}": v for k, v in results.items()})
        return results
