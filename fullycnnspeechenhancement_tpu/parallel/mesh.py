"""Device mesh construction.

Axes: ('data', 'model').  The 32k-param R-CED family needs no tensor
parallelism, so 'model' stays size 1 by default but is plumbed through so
shardings can grow onto it without API changes (SURVEY.md SS2.3 table).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n} devices, have {len(devices)}"
        )
    grid = np.array(devices[:n]).reshape(n_data, n_model)
    return jax.sharding.Mesh(grid, (DATA_AXIS, MODEL_AXIS))
