"""Single-utterance inference engine.

Reference surface: `InferenceEngine(config).denoise(audio_file)` writes
`<name>_de.wav` (`/root/reference/infer.py:19-77`).  This engine jits the
whole chain (analysis -> model (BN inference mode) -> rebuild) once per
padded length bucket, so repeated calls reuse compiled programs.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.data.audio_io import read_wav, write_wav
from fullycnnspeechenhancement_tpu.dsp.features import SpectrogramExtractor
from fullycnnspeechenhancement_tpu.dsp.rebuild import WaveformRebuilder
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.train.checkpoint import (
    CheckpointManager,
    import_reference_npz,
)
from fullycnnspeechenhancement_tpu.train.step import create_train_state

logger = logging.getLogger(__name__)


class InferenceEngine:
    """Single-utterance denoiser.

    Pass `mesh` (a jax.sharding.Mesh with a 'data' axis) to route
    utterances LONGER than the top padded-length bucket through the
    time-sharded halo forward (`parallel.halo.make_time_sharded_forward`):
    the spectrogram's time axis shards across the mesh, each device
    exchanges a constant 7-frame halo over ICI and runs the conv stack on
    its slice -- outputs are exactly the single-device forward's (SURVEY
    SS5 long-audio strategy).  Shorter utterances keep the single-device
    bucketed path regardless of mesh."""

    def __init__(
        self,
        config: Config,
        checkpoint: Optional[str] = None,
        bucket_seconds: Sequence[float] = (2.0, 4.0, 8.0, 16.0, 32.0),
        mesh=None,
    ):
        self.config = config
        self.model = get_model(config.model.net_work)
        self.ext = SpectrogramExtractor(config.dsp)
        self.reb = WaveformRebuilder(config.dsp)
        self.bucket_samples = [
            int(s * config.dsp.sample_rate) for s in bucket_seconds
        ]
        self.mesh = mesh
        if mesh is not None:
            from fullycnnspeechenhancement_tpu.parallel.halo import (
                make_time_sharded_forward,
            )

            # model forward time-sharded over the mesh; analysis and
            # rebuild stay single-device (one matmul each -- the 16-layer
            # conv stack is where the FLOPs are)
            self._sharded_model = make_time_sharded_forward(self.model, mesh)
            self._analyze = jax.jit(self.ext.magnitude_and_phase)
            self._rebuild = jax.jit(
                lambda pred, pre, pim: self.reb(
                    pred.astype(jnp.float32), pre, pim
                )
            )
        else:
            self._sharded_model = None
        self.params, self.bn_state = self._load(checkpoint)

        def denoise_fn(params, bn_state, wav, lengths):
            mag, pre, pim = self.ext.magnitude_and_phase(wav, lengths)
            if config.model.fused_inference:
                from fullycnnspeechenhancement_tpu.ops import (
                    fused_inference_forward,
                )

                pred = fused_inference_forward(self.model, params, bn_state, mag)
                return self.reb(pred.astype(jnp.float32), pre, pim)
            pred, _ = self.model.apply(
                params, bn_state, mag[..., None], is_training=False
            )
            return self.reb(pred[..., 0].astype(jnp.float32), pre, pim)

        self._fn = jax.jit(denoise_fn)

    def _load(self, checkpoint: Optional[str]):
        ckpt_path = checkpoint or self.config.eval.checkpoint_filepath
        if ckpt_path and ckpt_path.endswith(".npz"):
            logger.info("importing reference npz weights: %s", ckpt_path)
            return import_reference_npz(ckpt_path, self.model)
        state = create_train_state(
            self.config, self.model, jax.random.PRNGKey(self.config.train.seed)
        )
        if ckpt_path:
            run_name = os.path.basename(os.path.normpath(ckpt_path))
            mgr = CheckpointManager(os.path.dirname(ckpt_path) or ".", run_name)
            restored, epoch = mgr.restore(state)
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {ckpt_path}")
            logger.info("restored epoch %d from %s", epoch, ckpt_path)
            mgr.close()
            return restored.params, restored.bn_state
        logger.warning("no checkpoint configured; using random init")
        return state.params, state.bn_state

    def _pad_len(self, n: int) -> int:
        for b in self.bucket_samples:
            if n <= b:
                return b
        top = self.bucket_samples[-1]
        return ((n + top - 1) // top) * top

    def denoise_array(self, signal: np.ndarray) -> np.ndarray:
        """float32 waveform -> denoised float32 waveform (same length)."""
        n = len(signal)
        L = self._pad_len(n)
        if self._sharded_model is not None and L > self.bucket_samples[-1]:
            return self._denoise_time_sharded(signal, n, L)
        wav = np.zeros((1, L), np.float32)
        wav[0, :n] = signal
        out = self._fn(
            self.params, self.bn_state, jnp.asarray(wav),
            jnp.asarray([n], jnp.int32),
        )
        return np.asarray(out)[0, :n]

    def _denoise_time_sharded(self, signal: np.ndarray, n: int, L: int):
        """Over-top-bucket utterances: analysis on one device, the conv
        stack sharded over the mesh's 'data' axis with halo exchange,
        rebuild on one device.  The frame axis zero-pads up to a multiple
        of the axis size -- exact, because TF SAME time padding is zeros
        too, so padded frames contribute the same zeros to the kept
        frames' receptive fields."""
        from fullycnnspeechenhancement_tpu.parallel.mesh import DATA_AXIS

        wav = np.zeros((1, L), np.float32)
        wav[0, :n] = signal
        mag, pre, pim = self._analyze(
            jnp.asarray(wav), jnp.asarray([n], jnp.int32)
        )
        t = mag.shape[1]
        n_shards = self.mesh.shape[DATA_AXIS]
        t_pad = -(-t // n_shards) * n_shards
        if t_pad != t:
            mag = jnp.pad(mag, ((0, 0), (0, t_pad - t), (0, 0)))
        pred = self._sharded_model(self.params, self.bn_state, mag)[:, :t]
        out = self._rebuild(pred, pre, pim)
        return np.asarray(out)[0, :n]

    def denoise(self, audio_file: str, save_path: Optional[str] = None) -> str:
        signal, _ = read_wav(audio_file, self.config.dsp.sample_rate)
        out = self.denoise_array(signal)
        save_dir = save_path or self.config.data.audio_save_path
        os.makedirs(save_dir, exist_ok=True)
        out_path = os.path.join(
            save_dir, os.path.basename(audio_file).replace(".wav", "_de.wav")
        )
        write_wav(out_path, out, self.config.dsp.sample_rate)
        logger.info("saved denoised audio to %s", out_path)
        return out_path
