"""Parallelism: device meshes, data-parallel steps, time-axis sharding.

The reference has no distributed training of any kind (SURVEY.md SS2.3);
this package is new capability, built the TPU way: `jax.sharding.Mesh` +
jit-with-shardings so XLA inserts the gradient all-reduce over ICI, and an
explicit `shard_map` halo-exchange path for time-sharded long-audio
inference (the convolutional analogue of context parallelism).
"""

from fullycnnspeechenhancement_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    DATA_AXIS,
    MODEL_AXIS,
)
from fullycnnspeechenhancement_tpu.parallel.dp import (  # noqa: F401
    make_parallel_cached_multi_step,
    make_parallel_cached_step,
    make_parallel_multi_step,
    make_parallel_train_step,
    shard_batch,
    shard_meta,
    shard_stacked_batch,
    shard_stacked_meta,
    replicate,
)
