"""Train steps over the device-resident corpus cache.

Composes `data.device_cache.materialize_batch` INSIDE the jitted train
step, so the steady-state host->device traffic per optimizer step is the
[B] metadata vectors (~1 kB) instead of the [B, L] waveforms (~34 MB at
batch 64 x 8 s) -- the TPU-native replacement for the reference's
feed_dict loop (`/root/reference/model_utils/trainer.py:181-192`), and
the fix for the measured ~45 MB/s tunnel H2D ceiling
(benchmarks/PERF_NOTES.md round 3).

`bucket_samples` is static (one compiled program per bucket, exactly like
the host-batch path); the int16 corpus flats ride as ordinary jit
operands -- donated state is argument 0, the flats are NOT donated, so
they stay resident across steps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.data.device_cache import (
    CachedBatch,
    materialize_batch,
)
from fullycnnspeechenhancement_tpu.models.rced import ModelDef
from fullycnnspeechenhancement_tpu.train.step import (
    Batch,
    make_train_step,
    pack_step_metrics,
)


class Meta(NamedTuple):
    """Device-side view of CachedBatch: just the [B] (or [K, B]) arrays."""

    clean_chunk: jnp.ndarray  # int32
    clean_off: jnp.ndarray  # int32
    other_chunk: jnp.ndarray  # int32
    other_off: jnp.ndarray  # int32
    scale: jnp.ndarray  # float32
    lengths: jnp.ndarray  # int32

    @classmethod
    def from_batch(cls, b: CachedBatch) -> "Meta":
        return cls(
            jnp.asarray(b.clean_chunk),
            jnp.asarray(b.clean_off),
            jnp.asarray(b.other_chunk),
            jnp.asarray(b.other_off),
            jnp.asarray(b.scale),
            jnp.asarray(b.lengths),
        )

    @classmethod
    def stack(cls, batches) -> "Meta":
        """[CachedBatch] x K (same bucket) -> Meta with [K, B] leaves."""
        import numpy as np

        return cls(
            jnp.asarray(np.stack([b.clean_chunk for b in batches])),
            jnp.asarray(np.stack([b.clean_off for b in batches])),
            jnp.asarray(np.stack([b.other_chunk for b in batches])),
            jnp.asarray(np.stack([b.other_off for b in batches])),
            jnp.asarray(np.stack([b.scale for b in batches])),
            jnp.asarray(np.stack([b.lengths for b in batches])),
        )


def _materialize(clean_flat, other_flat, meta: Meta, bucket_samples, premixed):
    cb = CachedBatch(
        meta.clean_chunk,
        meta.clean_off,
        meta.other_chunk,
        meta.other_off,
        meta.scale,
        meta.lengths,
        indices=None,
        bucket_frames=0,
    )
    mix, clean = materialize_batch(
        clean_flat, other_flat, cb, bucket_samples, premixed
    )
    return Batch(mix, clean, meta.lengths)


def make_cached_train_step(
    config: Config, model: ModelDef, bucket_samples: int, premixed: bool
):
    """(state, clean_flat, other_flat, Meta[B]) -> (state, metrics);
    materialization fused into the same XLA program as the train step."""
    step = make_train_step(config, model)

    def cached_step(state, clean_flat, other_flat, meta: Meta):
        return step(
            state,
            _materialize(clean_flat, other_flat, meta, bucket_samples, premixed),
        )

    return cached_step


def make_cached_multi_step(
    config: Config, model: ModelDef, bucket_samples: int, premixed: bool
):
    """(state, clean_flat, other_flat, Meta[K, B]) -> (state, packed [K, 2]);
    K optimizer steps scanned in one device dispatch, each materializing
    its batch from the resident flats."""
    step = make_train_step(config, model)

    def multi(state, clean_flat, other_flat, meta: Meta):
        def body(s, m):
            s, metrics = step(
                s,
                _materialize(clean_flat, other_flat, m, bucket_samples, premixed),
            )
            return s, pack_step_metrics(metrics)

        return jax.lax.scan(body, state, meta)

    return multi
