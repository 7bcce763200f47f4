"""Pure-functional train / eval steps.

TPU-first redesign of the reference's Session/feed_dict loop
(`/root/reference/model_utils/trainer.py:156-192`): a single jitted step
takes raw waveform batches and does STFT analysis, model forward, loss,
backward and the optimizer update on device -- the host only decodes and
mixes audio.  Everything is static-shape; variable utterance lengths ride
in as a `lengths` vector.

Loss (reference contract, trainer.py:143-153 + SURVEY.md Appendix A.12-13):
sum of squared error over the padded [B, T, F, 1] block, divided by the
*configured* batch size.  The reference pads each batch to its own max
frame count (data_loader.py:198-225), so pad frames of shorter utterances
*do* enter its loss (zero target/input, conv-bias-driven prediction) and
its BN batch statistics.  Static bucket padding adds extra slack frames at
T >= batch-max that the reference never materializes; the parity-default
step reproduces the reference exactly by (a) restricting BN batch moments
to frames < batch-max (`batch_max_frame_mask`) and (b) summing the loss
over that same region, unnormalized beyond /batch_size.  Equivalence with
a batch-max-padded run is asserted in
tests/test_train.py::test_bucket_slack_matches_batchmax_padding.

`mask_loss=True` switches to the fully masked, frame-count-normalised loss
with per-utterance BN masking (documented corrected mode, a departure from
the reference).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from fullycnnspeechenhancement_tpu.config import Config
from fullycnnspeechenhancement_tpu.dsp.features import SpectrogramExtractor
from fullycnnspeechenhancement_tpu.models.rced import ModelDef
from fullycnnspeechenhancement_tpu.train.optim import noam_schedule, tf_adam


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    """Raw-waveform batch: device does the DSP.

    Waveform leaves are float32, or int16 when the loader ships
    `int16_transport` batches -- then `wav_scale` carries the [B]
    per-utterance peak normalization (mixes at 0 dB SNR exceed +/-1.0,
    so plain full-scale int16 would clip them) and the step reconstructs
    on device via `_as_wav`, halving host->device bytes on link-bound
    hosts."""

    mix_wav: jnp.ndarray  # [B, L] float32 or int16, zero-padded
    clean_wav: jnp.ndarray  # [B, L]
    lengths: jnp.ndarray  # [B] int32 sample counts
    wav_scale: Optional[jnp.ndarray] = None  # [B] float32, int16 mode only


def _as_wav(x: jnp.ndarray, scale: Optional[jnp.ndarray]) -> jnp.ndarray:
    """int16 transport -> float32 waveform; float32 passes through."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        wav = x.astype(jnp.float32) / 32768.0
        return wav if scale is None else wav * scale[:, None]
    return x


def create_train_state(config: Config, model: ModelDef, rng) -> TrainState:
    params, bn_state = model.init(rng)
    tx = tf_adam(noam_schedule(config.train.lr, config.train.warmup_steps))
    return TrainState(
        params=params,
        bn_state=bn_state,
        opt_state=tx.init(params),
        step=jnp.zeros([], jnp.int32),
    )


def make_optimizer(config: Config) -> optax.GradientTransformation:
    return tf_adam(noam_schedule(config.train.lr, config.train.warmup_steps))


def spectral_l2_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    batch_size: int,
    mask: Optional[jnp.ndarray] = None,
    normalize_mask: bool = False,
) -> jnp.ndarray:
    """sum((target - pred)^2) / configured_batch_size (trainer.py:146-147).

    `mask` ([B, T]) restricts the error to masked frames.  The parity
    default passes the batch-max mask unnormalized (the reference sums
    over its whole batch-max-padded block).  `normalize_mask=True`
    additionally divides by the real-frame fraction so magnitudes stay
    comparable across padding -- the corrected `mask_loss` mode.
    """
    sq = jnp.square(target - pred)
    if mask is None:
        return jnp.sum(sq) / batch_size
    m = mask[:, :, None, None]
    total = jnp.sum(sq * m)
    if not normalize_mask:
        return total / batch_size
    denom = jnp.maximum(jnp.mean(m), 1e-8)
    return total / (batch_size * denom)


def _model_forward(config: Config, model: ModelDef):
    """Forward fn honouring `model.blocked_compute` (freq-to-depth fast
    path, models/blocked.py -- exact reparametrization of `apply`)."""
    if config.model.blocked_compute:
        from fullycnnspeechenhancement_tpu.models.blocked import apply_blocked

        return functools.partial(
            apply_blocked,
            model,
            fb=config.model.blocked_fb,
            dw_pallas=config.model.dw_pallas,
        )
    return model.apply


def make_train_step(config: Config, model: ModelDef):
    """Returns a jittable (state, batch) -> (state, metrics) train step."""
    ext = SpectrogramExtractor(config.dsp)
    tx = make_optimizer(config)
    batch_size = config.train.batch_size
    mask_loss = config.train.mask_loss
    compute_dtype = jnp.dtype(config.model.compute_dtype)
    forward = _model_forward(config, model)

    def loss_fn(params, bn_state, batch: Batch):
        mix_mag = ext(
            _as_wav(batch.mix_wav, batch.wav_scale), batch.lengths
        )  # [B, T, F]
        clean_mag = ext(_as_wav(batch.clean_wav, batch.wav_scale), batch.lengths)
        x = mix_mag[..., None].astype(compute_dtype)
        T = mix_mag.shape[1]
        if mask_loss:
            # Corrected mode: per-utterance masking of loss and BN stats.
            mask = ext.frame_mask(batch.lengths, T)
        else:
            # Parity mode: the exact region the reference's batch-max
            # padded collate materializes (see module docstring).
            mask = ext.batch_max_frame_mask(batch.lengths, T)
        pred, new_bn = forward(
            params, bn_state, x, is_training=True, frame_mask=mask
        )
        pred = pred.astype(jnp.float32)
        loss = spectral_l2_loss(
            pred, clean_mag[..., None], batch_size, mask, normalize_mask=mask_loss
        )
        return loss, new_bn

    def train_step(state: TrainState, batch: Batch):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.bn_state, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        lr = noam_schedule(config.train.lr, config.train.warmup_steps)(state.step)
        new_state = TrainState(new_params, new_bn, new_opt, state.step + 1)
        return new_state, {"loss": loss, "lr": lr, "step": state.step}

    return train_step


def pack_step_metrics(metrics) -> jnp.ndarray:
    """Stack the per-step scalar metrics into one [2] array (loss, lr).

    The production loop keeps metrics on device and fetches many steps'
    worth in a single device->host transfer (a fetch is the only true
    barrier on a tunneled TPU and costs a full round trip -- see
    benchmarks/PERF_NOTES.md); packing makes that one contiguous array.
    """
    return jnp.stack([metrics["loss"], metrics["lr"]])


def make_multi_step(step_fn):
    """Chain `step_fn` over a leading steps axis with `lax.scan`.

    (state, Batch with [K, B, ...] leaves) -> (state, packed metrics [K, 2]).
    One host dispatch runs K optimizer steps on device -- the TPU-native
    replacement for the reference's per-batch `sess.run` loop
    (/root/reference/model_utils/trainer.py:181-192), amortizing dispatch
    and tunnel latency across K steps.
    """

    def multi_step(state: TrainState, batches: Batch):
        def body(s, b):
            s, m = step_fn(s, b)
            return s, pack_step_metrics(m)

        return jax.lax.scan(body, state, batches)

    return multi_step


def make_eval_step(config: Config, model: ModelDef, is_training: bool = False):
    """(params, bn_state, mix_wav, lengths) -> (pred_mag, phase_re, phase_im).

    The standalone tester runs BN in inference mode (tester.py:67-83); the
    reference's *in-training* validation reuses the training graph -- BN in
    batch-stats mode (trainer.py:245-250, Appendix A.8).  `is_training`
    selects which behaviour to replicate.
    """
    ext = SpectrogramExtractor(config.dsp)
    compute_dtype = jnp.dtype(config.model.compute_dtype)
    use_fused = config.model.fused_inference and not is_training
    forward = _model_forward(config, model)

    def eval_step(params, bn_state, mix_wav, lengths):
        mag, phase_re, phase_im = ext.magnitude_and_phase(mix_wav, lengths)
        if use_fused:
            # Whole-stack Pallas kernel (ops/pallas_rced.py): inner layers
            # run out of VMEM, BN folded (inference mode only).
            from fullycnnspeechenhancement_tpu.ops import fused_inference_forward

            pred = fused_inference_forward(model, params, bn_state, mag)
            return pred.astype(jnp.float32), phase_re, phase_im
        x = mag[..., None].astype(compute_dtype)
        # In-training validation computes BN batch stats; restrict them to
        # the batch-max region like the train step (bucket slack does not
        # exist in the reference's dynamic-shape validation batches).
        fmask = (
            ext.batch_max_frame_mask(lengths, mag.shape[1])
            if is_training
            else None
        )
        pred, _ = forward(
            params, bn_state, x, is_training=is_training, frame_mask=fmask
        )
        return pred[..., 0].astype(jnp.float32), phase_re, phase_im

    return eval_step
