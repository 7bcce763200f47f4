"""Model export: the reference's freeze-to-pb equivalent.

`freeze.py` in the reference folds checkpoint variables into a frozen
GraphDef (`/root/reference/freeze.py:31-48`, with its V3 output-node bug,
Appendix A.7).  The TPU-native equivalents:

  * `export_npz` -- weights + BN stats in the documented TF-variable-name
    npz layout (portable to any runtime, including back into TF);
  * `export_stablehlo` -- a serialized StableHLO module of the BN-folded
    inference function via `jax.export`, the XLA-world analogue of a
    frozen graph: constants folded, one artifact, loadable by any
    StableHLO consumer.

Both fold BN into inference form (moving stats baked in), like
freeze-time constant folding.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.train.checkpoint import export_params_npz

logger = logging.getLogger(__name__)


def export_npz(path: str, params: dict, bn_state: dict) -> str:
    export_params_npz(path, params, bn_state)
    logger.info("wrote weights npz: %s", path)
    return path


def export_stablehlo(
    config: Config,
    params: dict,
    bn_state: dict,
    path: str,
    batch: int = 1,
    frames: int = 512,
) -> str:
    """Serialize the inference forward ([B, T, F, 1] magnitude -> enhanced
    magnitude) as StableHLO bytes."""
    model = get_model(config.model.net_work)

    def forward(x):
        y, _ = model.apply(params, bn_state, x, is_training=False)
        return y

    shape = (batch, frames, config.model.feature_dim, 1)
    exported = jax.export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    logger.info("wrote StableHLO artifact: %s (%d bytes)", path, len(blob))
    return path


def load_stablehlo(path: str):
    """Deserialize an exported artifact; returns the jax.export.Exported."""
    with open(path, "rb") as f:
        return jax.export.deserialize(bytearray(f.read()))
