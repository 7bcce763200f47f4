"""Time-axis sharded inference with halo exchange.

The convolutional analogue of context parallelism (SURVEY.md SS5): the
model family's time receptive field is exactly the first conv's kernel
height 8 with TF SAME pads (3 before, 4 after) -- every later layer is
per-frame.  For utterances too long for one device, the spectrogram's
time axis shards across the mesh and each device exchanges a constant
3-frame left / 4-frame right halo with its neighbours via
`jax.lax.ppermute` over ICI, then runs the full stack locally; interior
outputs are exactly the unsharded outputs, and edge devices see zero
halos, matching SAME zero padding at the global boundaries.

Cost: one 7-frame ppermute regardless of T -- O(1) communication, the
cheapest possible sequence-parallel scheme.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from fullycnnspeechenhancement_tpu.models.rced import ModelDef
from fullycnnspeechenhancement_tpu.parallel.mesh import DATA_AXIS

_HALO_L = 3  # (kh-1)//2 of the first conv's time kernel 8
_HALO_R = 4  # kh//2


def make_time_sharded_forward(model: ModelDef, mesh, axis: str = DATA_AXIS):
    """Returns jitted (params, bn_state, mag [B, T, F]) -> [B, T, F] with T
    sharded over `axis`.  T must be divisible by the axis size."""
    n_shards = mesh.shape[axis]

    def local_fn(params, bn_state, mag_local):
        # mag_local: [B, T_local, F]
        send_right = [(i, i + 1) for i in range(n_shards - 1)]
        send_left = [(i + 1, i) for i in range(n_shards - 1)]
        halo_l = jax.lax.ppermute(
            mag_local[:, -_HALO_L:], axis, perm=send_right
        )  # device i receives i-1's tail; device 0 gets zeros
        halo_r = jax.lax.ppermute(
            mag_local[:, :_HALO_R], axis, perm=send_left
        )  # device i receives i+1's head; last device gets zeros
        ext = jnp.concatenate([halo_l, mag_local, halo_r], axis=1)
        pred, _ = model.apply(params, bn_state, ext[..., None], is_training=False)
        return pred[:, _HALO_L : _HALO_L + mag_local.shape[1], :, 0]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None)),
        out_specs=P(None, axis, None),
    )
    return jax.jit(sharded)
