"""Data-parallel training over a device mesh.

Utterance batches shard over the 'data' mesh axis; params, BN state and
optimizer state replicate.  The step itself is the same pure function as
single-chip (`train.step.make_train_step`) -- jit sharding annotations let
XLA's SPMD partitioner insert the gradient all-reduce (psum over ICI) and
the BN-moment all-reduce automatically.  This is the scaling-book recipe:
pick a mesh, annotate shardings, let XLA place collectives.

Note on BN: the reference computes BN batch statistics on its single
device (batch 2).  Under DP the batch is global, and the mean/variance
reductions in `blocks.conv_bn_relu_apply` span the whole sharded batch, so
this is synchronized ("sync BN") across data shards -- there is no
reference multi-device behaviour to be faithful to, and sync BN is the
mathematically-equivalent extension of the single-device semantics
(SURVEY.md SS7 hard part 4).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.models.rced import ModelDef
from fullycnnspeechenhancement_tpu.parallel.mesh import DATA_AXIS
from fullycnnspeechenhancement_tpu.train.cached_step import (
    Meta,
    make_cached_multi_step,
    make_cached_train_step,
)
from fullycnnspeechenhancement_tpu.train.step import (
    Batch,
    make_multi_step,
    make_train_step,
)


def replicate(mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def stacked_batch_sharding(mesh) -> NamedSharding:
    """Sharding for [K, B, ...] multi-step batches: scan axis replicated,
    batch axis sharded over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh, batch: Batch) -> Batch:
    """Place a host batch onto the mesh, sharded along the batch axis."""
    sh = batch_sharding(mesh)
    return Batch(
        *(None if x is None else jax.device_put(x, sh) for x in batch)
    )


def shard_stacked_batch(mesh, batch: Batch) -> Batch:
    """Place a stacked [K, B, ...] multi-step batch onto the mesh."""
    sh = stacked_batch_sharding(mesh)
    return Batch(
        *(None if x is None else jax.device_put(x, sh) for x in batch)
    )


def make_parallel_train_step(config: Config, model: ModelDef, mesh):
    """jit-compiled DP train step: state replicated, batch sharded.

    The global batch (config.train.batch_size) must be divisible by the
    mesh's data-axis size.
    """
    n_data = mesh.shape[DATA_AXIS]
    if config.train.batch_size % n_data:
        raise ValueError(
            f"global batch {config.train.batch_size} not divisible by "
            f"data-parallel degree {n_data}"
        )
    step = make_train_step(config, model)
    repl = replicate(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, Batch(bsh, bsh, bsh, bsh)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_multi_step(config: Config, model: ModelDef, mesh):
    """jit-compiled DP multi-step: scans K train steps in one device call.

    Input batches have [K, B, ...] leaves (K replicated scan axis, B sharded
    over 'data'); returns (state, packed metrics [K, 2]).
    """
    n_data = mesh.shape[DATA_AXIS]
    if config.train.batch_size % n_data:
        raise ValueError(
            f"global batch {config.train.batch_size} not divisible by "
            f"data-parallel degree {n_data}"
        )
    multi = make_multi_step(make_train_step(config, model))
    repl = replicate(mesh)
    bsh = stacked_batch_sharding(mesh)
    return jax.jit(
        multi,
        in_shardings=(repl, Batch(bsh, bsh, bsh, bsh)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# ---- device-cache path (data/device_cache.py + train/cached_step.py) ----
#
# The int16 corpus flats REPLICATE over the mesh (every device holds the
# whole corpus; per-device HBM budget permitting, this is the simplest
# correct layout and keeps materialization collective-free: each device
# slices only the metadata rows it owns).  Metadata shards over 'data'
# exactly like waveform batches.


def shard_meta(mesh, meta: Meta) -> Meta:
    sh = batch_sharding(mesh)
    return Meta(*(jax.device_put(x, sh) for x in meta))


def shard_stacked_meta(mesh, meta: Meta) -> Meta:
    sh = stacked_batch_sharding(mesh)
    return Meta(*(jax.device_put(x, sh) for x in meta))


def _check_divisible(config: Config, mesh, batch_size=None) -> None:
    b = batch_size if batch_size is not None else config.train.batch_size
    n_data = mesh.shape[DATA_AXIS]
    if b % n_data:
        raise ValueError(
            f"global batch {b} not divisible by "
            f"data-parallel degree {n_data}"
        )


def make_parallel_cached_step(
    config: Config,
    model: ModelDef,
    mesh,
    bucket_samples: int,
    premixed: bool,
    batch_size=None,
):
    """jit-compiled DP cached train step: state + corpus flats replicated,
    [B] metadata sharded over 'data'; batch materialization happens inside
    the same SPMD program as the step.  Pass `batch_size` when the
    metadata batches differ from `config.train.batch_size` so the
    divisibility check guards the ACTUAL [B] the step receives."""
    _check_divisible(config, mesh, batch_size)
    step = make_cached_train_step(config, model, bucket_samples, premixed)
    repl = replicate(mesh)
    msh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, Meta(*([msh] * 6))),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_parallel_cached_multi_step(
    config: Config,
    model: ModelDef,
    mesh,
    bucket_samples: int,
    premixed: bool,
    batch_size=None,
):
    """DP cached multi-step: scans K cached steps in one device call;
    metadata leaves are [K, B] (scan axis replicated, batch sharded)."""
    _check_divisible(config, mesh, batch_size)
    multi = make_cached_multi_step(config, model, bucket_samples, premixed)
    repl = replicate(mesh)
    msh = stacked_batch_sharding(mesh)
    return jax.jit(
        multi,
        in_shardings=(repl, repl, repl, Meta(*([msh] * 6))),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
