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

Hot-loop design (TPU-native, unlike the reference's per-batch
sess.run+fetch, trainer.py:181-192): step dispatch is asynchronous; the
loop NEVER fetches per-step scalars.  Metrics accumulate as packed device
arrays and are pulled in ONE device->host transfer every `num_iter_print`
steps (`_flush_metrics`) -- on a tunneled TPU a fetch is the only true
barrier and costs a full round trip.  Optionally `steps_per_call > 1`
chains K optimizer steps inside one `lax.scan` dispatch (per-bucket batch
stacking), amortizing host/tunnel dispatch overhead as well.
"""

from __future__ import annotations

import json
import logging
import os
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.data.device_cache import (
    CachedBatch,
    DeviceCacheLoader,
    RotatingDeviceCacheLoader,
)
from fullycnnspeechenhancement_tpu.data.loader import DataLoader, LoaderBatch
from fullycnnspeechenhancement_tpu.eval.evaluator import Evaluator
from fullycnnspeechenhancement_tpu.eval.metrics import AverageMeter
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.parallel import (
    make_mesh,
    make_parallel_cached_multi_step,
    make_parallel_cached_step,
    make_parallel_multi_step,
    make_parallel_train_step,
    replicate,
    shard_batch,
    shard_meta,
    shard_stacked_batch,
    shard_stacked_meta,
)
from fullycnnspeechenhancement_tpu.train.cached_step import (
    Meta,
    make_cached_multi_step,
    make_cached_train_step,
)
from fullycnnspeechenhancement_tpu.train.checkpoint import (
    CheckpointManager,
    import_reference_npz,
)
from fullycnnspeechenhancement_tpu.train.profiling import StepProfiler
from fullycnnspeechenhancement_tpu.train.step import (
    Batch,
    create_train_state,
    make_multi_step,
    make_train_step,
    pack_step_metrics,
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
        self._steps_per_call = max(1, config.train.steps_per_call)
        if self._steps_per_call > 1:
            if self.mesh is not None:
                self._multi_step = make_parallel_multi_step(
                    config, self.model, self.mesh
                )
            else:
                self._multi_step = jax.jit(
                    make_multi_step(make_train_step(config, self.model)),
                    donate_argnums=(0,),
                )
        else:
            self._multi_step = None

        self._cached_fns: dict = {}
        self._cached_premixed = False
        self._cached_loader = None

        self.state = create_train_state(
            config, self.model, jax.random.PRNGKey(config.train.seed)
        )
        self.ckpt = CheckpointManager(
            config.train.checkpoints_path,
            self.run_name,
            max_to_keep=config.train.max_checkpoints_to_keep,
        )
        self.start_epoch = 0
        if config.train.base_checkpoint_file:
            # Warm start from an EXPLICIT checkpoint, taking priority over
            # resume-from-latest (reference trainer.py:52-53 semantics).
            self._warm_start(config.train.base_checkpoint_file)
        elif config.train.continue_train:
            restored, epoch = self.ckpt.restore(self.state)
            if restored is not None:
                self.state = restored
                self.start_epoch = epoch + 1
                logger.info("resumed from epoch %d checkpoint", epoch)

        # Host mirror of the device step counter: fetched once here, then
        # advanced host-side so the hot loop never syncs on it.
        self._host_step = int(self.state.step)

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

    def _warm_start(self, path: str) -> None:
        """Initialise params (+BN stats) from an explicit checkpoint:
        a `.npz` in the TF-name bridge layout (checkpoint.py), or an
        orbax run directory, whose latest epoch is loaded.  Training
        restarts at epoch 0 with fresh optimizer state and step counter
        (the reference's `base_checkpoint_file`, trainer.py:52-53)."""
        if path.endswith(".npz"):
            params, bn_state = import_reference_npz(path, self.model)
            # npz may omit BN stats (freeze exports fold them); keep the
            # fresh init for anything missing.
            merged_bn = dict(self.state.bn_state)
            merged_bn.update(bn_state)
            self.state = self.state._replace(
                params=params, bn_state=merged_bn
            )
        elif os.path.isdir(path):
            mgr = CheckpointManager(
                os.path.dirname(os.path.abspath(path)),
                os.path.basename(os.path.abspath(path)),
            )
            restored, epoch = mgr.restore(self.state)
            mgr.close()
            if restored is None:
                raise FileNotFoundError(
                    f"base_checkpoint_file directory {path} contains no "
                    f"checkpoint epochs"
                )
            self.state = self.state._replace(
                params=restored.params, bn_state=restored.bn_state
            )
            logger.info("warm start from %s epoch %d", path, epoch)
        else:
            raise FileNotFoundError(
                f"base_checkpoint_file {path} is neither an .npz bridge "
                f"file nor an orbax run directory"
            )
        logger.info("warm-started params from %s", path)

    # ---- device-cache dispatch (data/device_cache.py) ------------------

    def _cached_fn(self, bucket_frames: int, k: int):
        """Per-(bucket, K) compiled cached step; built lazily because the
        bucket's static sample length is only known from the loader."""
        key = (bucket_frames, k)
        fn = self._cached_fns.get(key)
        if fn is None:
            bucket_samples = self.config.dsp.padded_samples(bucket_frames)
            premixed = self._cached_premixed
            if self.mesh is not None:
                maker = (
                    make_parallel_cached_step
                    if k == 1
                    else make_parallel_cached_multi_step
                )
                fn = maker(
                    self.config, self.model, self.mesh, bucket_samples, premixed
                )
            else:
                maker = (
                    make_cached_train_step if k == 1 else make_cached_multi_step
                )
                fn = jax.jit(
                    maker(self.config, self.model, bucket_samples, premixed),
                    donate_argnums=(0,),
                )
            self._cached_fns[key] = fn
        return fn

    def _prepare_cached(self, loader) -> None:
        if loader.batch_size != self.config.train.batch_size:
            raise ValueError(
                f"cached loader batch size ({loader.batch_size}) must "
                f"match config.train.batch_size "
                f"({self.config.train.batch_size}): the compiled cached "
                f"steps and the loss normalization assume the configured "
                f"batch"
            )
        self._cached_premixed = loader.premixed
        self._cached_loader = loader
        # Activate with the right placement: replicated over the mesh
        # under DP so SPMD sees mesh-resident flats.  The plain loader
        # commits now; the rotating loader commits per shard rotation.
        sharding = replicate(self.mesh) if self.mesh is not None else None
        loader.activate(sharding)

    def _prep_cached_single(self, b: CachedBatch, flats=None):
        meta = Meta.from_batch(b)
        if self.mesh is not None:
            meta = shard_meta(self.mesh, meta)
        # `flats` is captured by the feeder the moment the loader yields
        # the batch: under the rotating loader flats change mid-epoch,
        # and a batch must ride with the shard that produced it
        return (
            b.bucket_frames,
            meta,
            flats if flats is not None else self._cached_loader.flats(),
        )

    def _prep_cached_multi(self, bufs: list, flats=None):
        meta = Meta.stack(bufs)
        if self.mesh is not None:
            meta = shard_stacked_meta(self.mesh, meta)
        return (
            bufs[0].bucket_frames,
            meta,
            flats if flats is not None else self._cached_loader.flats(),
        )

    def _dispatch_cached(self, payload, k: int, epoch: int) -> None:
        bucket_frames, meta, (clean_flat, other_flat) = payload
        self.state, out = self._cached_fn(bucket_frames, k)(
            self.state, clean_flat, other_flat, meta
        )
        if k == 1:
            out = pack_step_metrics(out)[None]
        self._note_steps(out, k, epoch)

    def _log_scalars(self, **kv):
        with open(self._scalars_path, "a") as f:
            f.write(json.dumps(kv) + "\n")

    def _device_batch(self, b: LoaderBatch) -> Batch:
        batch = Batch(
            jnp.asarray(b.mix_wav),
            jnp.asarray(b.clean_wav),
            jnp.asarray(b.lengths),
            None if b.wav_scale is None else jnp.asarray(b.wav_scale),
        )
        if self.mesh is not None:
            batch = shard_batch(self.mesh, batch)
        return batch

    def _prep_single(self, b: LoaderBatch):
        return self._device_batch(b)

    def _prep_multi(self, bufs: list) -> Batch:
        batch = Batch(
            jnp.asarray(np.stack([x.mix_wav for x in bufs])),
            jnp.asarray(np.stack([x.clean_wav for x in bufs])),
            jnp.asarray(np.stack([x.lengths for x in bufs])),
            None
            if bufs[0].wav_scale is None
            else jnp.asarray(np.stack([x.wav_scale for x in bufs])),
        )
        if self.mesh is not None:
            batch = shard_stacked_batch(self.mesh, batch)
        return batch

    def _dispatch_host(self, payload: Batch, k: int, epoch: int) -> None:
        if k == 1:
            self.state, metrics = self._step(self.state, payload)
            packed = pack_step_metrics(metrics)[None]
        else:
            self.state, packed = self._multi_step(self.state, payload)
        self._note_steps(packed, k, epoch)

    def _feed(self, train_loader, K: int, cached: bool):
        """Background feeder: consumes the loader, groups same-bucket
        batches for the multi-step path, and moves payloads host->device
        OFF the dispatch thread, so transfers overlap device compute
        (the classic prefetch-to-device pipeline; on link-bound hosts
        the H2D copy otherwise serializes against every step).  Yields
        (payload, k, audio_seconds); queue depth bounds device-side
        buffering to a couple of batches."""
        prep_one = self._prep_cached_single if cached else self._prep_single
        prep_multi = self._prep_cached_multi if cached else self._prep_multi
        sr = self.config.dsp.sample_rate
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()
        _SENTINEL = object()

        def produce():
            try:
                # K>1 groups are keyed by (bucket, flats identity): under
                # the rotating cache a scanned group must never mix
                # batches whose metadata indexes different shards' flats
                buffers: dict = {}
                last_sig = None
                for b in train_loader:
                    if stop.is_set():
                        return
                    # capture flats NOW: the loader only rotates when its
                    # generator is advanced again, so these are b's flats.
                    # `generation` is the loader's monotonic shard-commit
                    # counter (id(flats) is unsafe: CPython id reuse after
                    # GC could alias consecutive shards -- ADVICE r4).
                    fl = self._cached_loader.flats() if cached else None
                    sig = self._cached_loader.generation if cached else 0
                    if cached and last_sig is not None and sig != last_sig:
                        # shard rotated: flush the previous shard's
                        # residual groups NOW -- buffered entries hold
                        # that shard's device flats, and deferring to
                        # epoch end would pin every rotated shard's
                        # flats in HBM simultaneously
                        for key in [k for k in buffers if k[1] != sig]:
                            for b2, audio2, fl2 in buffers.pop(key):
                                if stop.is_set():
                                    return
                                q.put((prep_one(b2, fl2), 1, audio2))
                    last_sig = sig
                    audio = float(b.lengths.sum()) / sr
                    if K > 1:
                        key = (b.bucket_frames, sig)
                        buf = buffers.setdefault(key, [])
                        buf.append((b, audio, fl))
                        if len(buf) == K:
                            args = ([x for x, _, _ in buf],)
                            if cached:
                                args = args + (fl,)
                            q.put(
                                (
                                    prep_multi(*args),
                                    K,
                                    sum(a for _, a, _ in buf),
                                )
                            )
                            buffers[key] = []
                    else:
                        args = (b,) if not cached else (b, fl)
                        q.put((prep_one(*args), 1, audio))
                # residual same-(bucket, shard) groups smaller than K run
                # one at a time, each with the flats captured at receive
                for buf in buffers.values():
                    for b, audio, fl in buf:
                        if stop.is_set():
                            return
                        args = (b,) if not cached else (b, fl)
                        q.put((prep_one(*args), 1, audio))
            except BaseException as e:  # surfaced to the consumer
                q.put(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # On dispatch error / interruption: signal the producer so it
            # abandons the rest of the epoch (it would otherwise decode
            # and transfer every remaining batch before exiting), then
            # drain so its blocked put() can observe the stop flag.
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    t.join(timeout=0.1)

    def _note_steps(self, packed, n: int, epoch: int) -> None:
        """Record n dispatched steps' packed [n, 2] device metrics; the
        values are fetched later in one transfer by `_flush_metrics`."""
        rows = [
            {"step": self._host_step + j, "epoch": epoch} for j in range(n)
        ]
        self._host_step += n
        self._pending.append((packed, rows))
        self._steps_since_flush += n
        self.profiler.step(self._host_step)

    def _flush_metrics(self, log, epoch: int, batch_i: int, n_batches: int):
        """Fetch all pending step metrics in ONE device->host transfer.

        This is the loop's only device barrier: the reference fetches its
        loss scalar out of every sess.run (trainer.py:181-192); on a
        tunneled TPU each fetch costs a ~25 ms round trip, so the
        production loop amortizes one fetch over `num_iter_print` steps
        (device dispatch stays async in between).
        """
        if not self._pending:
            return
        packed = jnp.concatenate([p for p, _ in self._pending], axis=0)
        vals = np.asarray(packed)  # the one true barrier
        rows = [r for _, rs in self._pending for r in rs]
        n = len(rows)
        wall = time.perf_counter() - self._flush_t0
        # Wall time per step across the flush window (includes data wait);
        # per-step device time is not separately observable without extra
        # barriers, which is the point.
        self.step_time.update(wall / max(n, 1))
        with open(self._scalars_path, "a") as f:
            for row, v in zip(rows, vals):
                row["loss"] = float(v[0])
                row["lr"] = float(v[1])
                self.train_loss.update(row["loss"])
                f.write(json.dumps(row) + "\n")
        log.info(
            "epoch %d batch %d/%d loss %.4f(%.4f) "
            "data %.3fs(%.3fs) step-wall %.3fs(%.3fs)",
            epoch,
            batch_i,
            n_batches,
            self.train_loss.val,
            self.train_loss.avg,
            self.data_time.val,
            self.data_time.avg,
            self.step_time.val,
            self.step_time.avg,
        )
        self._pending = []
        self._steps_since_flush = 0
        self._flush_t0 = time.perf_counter()

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
        K = self._steps_per_call
        flush_every = max(1, cfg.num_iter_print)
        cached = isinstance(
            train_loader, (DeviceCacheLoader, RotatingDeviceCacheLoader)
        )
        if cached:
            self._prepare_cached(train_loader)
        dispatch = self._dispatch_cached if cached else self._dispatch_host
        n_batches_total = len(train_loader)
        try:
            self._run_epochs(
                train_loader, valid_loader, epochs, K, flush_every,
                cached, dispatch, n_batches_total, log,
            )
        finally:
            # Run the teardown trio even when an epoch raises
            # (dispatch error, KeyboardInterrupt): un-barriered async
            # checkpoint commits race interpreter shutdown, and leaked
            # scorer processes block process exit on their atexit join.
            self.ckpt.wait()
            self.profiler.close()
            # release the validation scoring workers (the pool
            # recreates lazily if validate() is called again)
            self.evaluator.close()

    def _run_epochs(
        self, train_loader, valid_loader, epochs, K, flush_every,
        cached, dispatch, n_batches_total, log,
    ):
        cfg = self.config.train
        for epoch in range(self.start_epoch, epochs):
            train_loader.set_epoch(epoch)
            epoch_audio_s = 0.0
            epoch_t0 = time.perf_counter()
            self._pending = []
            self._steps_since_flush = 0
            self._flush_t0 = time.perf_counter()
            t_data = time.perf_counter()
            steps_done = 0
            for payload, k, audio_s in self._feed(train_loader, K, cached):
                self.data_time.update(time.perf_counter() - t_data)
                epoch_audio_s += audio_s
                dispatch(payload, k, epoch)
                steps_done += k
                if self._steps_since_flush >= flush_every:
                    self._flush_metrics(
                        log, epoch, steps_done, n_batches_total
                    )
                t_data = time.perf_counter()
            self._flush_metrics(log, epoch, n_batches_total, n_batches_total)
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

    def validate(self, valid_loader: DataLoader, epoch: int, log=None):
        log = log or logger
        # Barrier the async checkpoint commit first: the evaluator's
        # scoring pool forks on first use, and forking mid-commit would
        # race orbax's background serialization threads.
        self.ckpt.wait()
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
