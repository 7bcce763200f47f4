"""Checkpointing: orbax save/restore + reference-checkpoint import.

Replaces `tf.train.Saver` (reference trainer.py:50-65,232-239): one
checkpoint per epoch holding params, BN state, TF-Adam state and step, with
`max_to_keep` pruning and latest-checkpoint resolution.  Directory layout
mirrors the reference's `{checkpoints_path}/{net_arch}_{net_work}/` naming
so configs port over unchanged.

Reference-weight import: TF-1.x `.ckpt` files can't be parsed without
TensorFlow (not in this image), so the bridge is a documented npz layout:
dump the reference checkpoint to npz in any TF-1.14 environment with

    import tensorflow as tf, numpy as np
    reader = tf.train.NewCheckpointReader(ckpt_path)
    np.savez(out, **{k: reader.get_tensor(k)
                     for k in reader.get_variable_to_shape_map()})

then `import_reference_npz` maps TF variable names to our pytree:
  {scope}/kernel               -> params[scope]['w']      (HWIO, same layout)
  {scope}/bias                 -> params[scope]['b']
  {scope}/batch_norm/gamma     -> params[scope]['gamma']
  {scope}/batch_norm/beta      -> params[scope]['beta']
  {scope}/batch_norm/moving_mean     -> bn_state[scope]['mean']
  {scope}/batch_norm/moving_variance -> bn_state[scope]['var']
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from fullycnnspeechenhancement_tpu.models.rced import ModelDef
from fullycnnspeechenhancement_tpu.train.step import TrainState

_EPOCH_DIR = re.compile(r"^epoch_(\d+)$")


class CheckpointManager:
    def __init__(self, root: str, run_name: str, max_to_keep: int = 10):
        self.dir = os.path.abspath(os.path.join(root, run_name))
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, epoch: int, state: TrainState) -> None:
        """Asynchronous: the save snapshots the (device) state and
        finalizes in the background so the next epoch's compute overlaps
        the write -- per-epoch checkpointing must not sit on the hot
        path (the reference's tf.train.Saver blocks the session,
        trainer.py:232-239).  `restore`/`close` barrier on completion."""
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(_to_savable(state))
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, epoch: Optional[int] = None):
        self._mgr.wait_until_finished()
        epoch = self.latest_epoch() if epoch is None else epoch
        if epoch is None:
            return None, None
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(_to_savable(state_like))
        )
        return _from_savable(restored, state_like), epoch

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def _to_savable(state: TrainState):
    return {
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def _from_savable(d, like: TrainState) -> TrainState:
    opt = d["opt_state"]
    if not isinstance(opt, type(like.opt_state)):
        # orbax restores NamedTuples as dicts/lists; rebuild the TFAdamState
        opt = type(like.opt_state)(*[opt[k] for k in like.opt_state._fields])
    return TrainState(
        params=d["params"], bn_state=d["bn_state"], opt_state=opt, step=d["step"]
    )


def import_reference_npz(
    npz_path: str, model: ModelDef
) -> Tuple[dict, dict]:
    """Load a reference TF-checkpoint npz dump into (params, bn_state)."""
    blob = dict(np.load(npz_path))
    params, bn_state = {}, {}
    for spec in model.layers:
        name = spec.name
        p = {
            "w": jnp.asarray(blob[f"{name}/kernel"], jnp.float32),
            "b": jnp.asarray(blob[f"{name}/bias"], jnp.float32),
        }
        if spec.use_norm:
            p["gamma"] = jnp.asarray(blob[f"{name}/batch_norm/gamma"], jnp.float32)
            p["beta"] = jnp.asarray(blob[f"{name}/batch_norm/beta"], jnp.float32)
            bn_state[name] = {
                "mean": jnp.asarray(
                    blob[f"{name}/batch_norm/moving_mean"], jnp.float32
                ),
                "var": jnp.asarray(
                    blob[f"{name}/batch_norm/moving_variance"], jnp.float32
                ),
            }
        params[name] = p
    return params, bn_state


def export_params_npz(path: str, params: dict, bn_state: dict) -> None:
    """Inverse of `import_reference_npz`: write our pytrees in the
    reference's TF variable-name layout (also the freeze/export format)."""
    out = {}
    for name, p in params.items():
        out[f"{name}/kernel"] = np.asarray(p["w"])
        out[f"{name}/bias"] = np.asarray(p["b"])
        if "gamma" in p:
            out[f"{name}/batch_norm/gamma"] = np.asarray(p["gamma"])
            out[f"{name}/batch_norm/beta"] = np.asarray(p["beta"])
    for name, s in bn_state.items():
        out[f"{name}/batch_norm/moving_mean"] = np.asarray(s["mean"])
        out[f"{name}/batch_norm/moving_variance"] = np.asarray(s["var"])
    np.savez(path, **out)
