"""Cost of the batch-max BN/loss masking in the blocked train step.

The round-2 parity-collate change (batch-max frame mask through BN
moments + loss) regressed the full blocked step 79.8 -> 108.3 ms.  This
sweeps masked-moment formulations to find one XLA schedules well:

  A: shipped round-2 formulation (f32 cast, [B,T] mask product per layer)
  B: as A but the mask stays [1,T] (batch-max masks are row-identical)
  C: single combined bf16 mask multiply (ym = y*m), reductions with
     dtype=f32 (cast fused into the reduce), square in compute dtype
  N: no mask (round-1 behaviour, the 79.8 ms reference point)

Run: python benchmarks/micro_mask_cost.py [A B C N ...]
"""
import sys, time

sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp

from fullycnnspeechenhancement_tpu.cli import enable_compilation_cache

enable_compilation_cache()

import fullycnnspeechenhancement_tpu.models.blocked as blocked_mod
from fullycnnspeechenhancement_tpu.config import Config, ModelConfig, TrainConfig
from fullycnnspeechenhancement_tpu.models import get_model
from fullycnnspeechenhancement_tpu.models.blocked import (
    FB_DEFAULT,
    _block_weight,
    _freq_mask,
    block_input,
    unblock_output,
)
from fullycnnspeechenhancement_tpu.models.blocks import (
    BN_EPSILON,
    BN_MOMENTUM,
    tf_same_pads,
)
from fullycnnspeechenhancement_tpu.train import create_train_state
from fullycnnspeechenhancement_tpu.train.step import Batch, make_train_step

B, SECONDS, ITERS = 64, 8.0, 20
SAMPLES = int(SECONDS * 8000)
VARIANTS = sys.argv[1:] or ["N", "A", "B", "C"]


def make_apply(variant):
    def apply_v(
        model, params, state, x, *, is_training, fb=FB_DEFAULT,
        precision=None, frame_mask=None,
    ):
        if precision is None:
            precision = (
                jax.lax.Precision.HIGHEST
                if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            )
        Bx, T, F, _ = x.shape
        nb = -(-F // fb)
        mask4 = _freq_mask(F, fb, x.dtype)
        n_real = Bx * T * F
        if variant == "N":
            frame_mask = None

        z = block_input(x, fb)
        taps, new_state = {}, {}
        ch = {spec.name: spec.out_ch for spec in model.layers}

        for spec in model.layers:
            p = params[spec.name]
            cout = spec.out_ch
            kh, kw = spec.kernel
            if kw >= F:
                cin = z.shape[3] // fb
                xn = unblock_output(z, F, cin)
                y = jax.lax.conv_general_dilated(
                    xn, p["w"].astype(x.dtype), (1, 1), tf_same_pads(spec.kernel),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
                ) + p["b"].astype(x.dtype)
                if spec.use_act:
                    y = jax.nn.relu(y)
                z = block_input(y, fb)
                taps[spec.name] = z
                continue

            wb, dc = _block_weight(p["w"], fb)
            kb = wb.shape[1]
            y = jax.lax.conv_general_dilated(
                z, wb.astype(x.dtype), (1, 1),
                [tf_same_pads(spec.kernel)[0], (dc, kb - 1 - dc)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
            )
            y = y + jnp.tile(p["b"], fb).astype(x.dtype)

            if spec.use_norm:
                s = state.get(spec.name, {})
                if is_training:
                    mdt = jnp.promote_types(jnp.float32, y.dtype)
                    if variant in ("A", "B", "N"):
                        y32 = y.astype(mdt).reshape(Bx, T, nb, fb, cout)
                        m32 = mask4.astype(mdt)[..., None]
                        if frame_mask is not None:
                            fm = frame_mask
                            if variant == "B":
                                fm = fm[:1]
                            m32 = m32 * fm.astype(mdt)[:, :, None, None, None]
                            n = jnp.sum(frame_mask.astype(mdt)) * F
                        else:
                            n = n_real
                        ys = jnp.sum(y32 * m32, axis=(0, 1, 2, 3))
                        yss = jnp.sum(jnp.square(y32) * m32, axis=(0, 1, 2, 3))
                    else:  # C: bf16 masked activation, f32-accum reduces
                        m = mask4
                        if frame_mask is not None:
                            m = m * frame_mask.astype(x.dtype)[:1, :, None, None]
                            n = jnp.sum(frame_mask.astype(mdt)) * F
                        else:
                            n = n_real
                        ym = (
                            y.reshape(Bx, T, nb, fb, cout) * m[..., None]
                        )
                        ys = jnp.sum(ym, axis=(0, 1, 2, 3), dtype=mdt)
                        yss = jnp.sum(
                            jnp.square(ym), axis=(0, 1, 2, 3), dtype=mdt
                        )
                    mean = ys / n
                    var = yss / n - jnp.square(mean)
                    new_state[spec.name] = {
                        "mean": BN_MOMENTUM * s["mean"] + (1.0 - BN_MOMENTUM) * mean,
                        "var": BN_MOMENTUM * s["var"] + (1.0 - BN_MOMENTUM) * var,
                    }
                else:
                    mean, var = s["mean"], s["var"]
                scale = p["gamma"] * jax.lax.rsqrt(var + BN_EPSILON)
                shift = p["beta"] - mean * scale
                y = y * jnp.tile(scale, fb).astype(x.dtype) + jnp.tile(
                    shift, fb
                ).astype(x.dtype)

            if spec.skip_from is not None:
                y = y + taps[spec.skip_from]
            if spec.use_act:
                y = jax.nn.relu(y)
            if spec.add_from is not None:
                y = y + taps[spec.add_from]
            y = (
                y.reshape(Bx, T, nb, fb, cout) * mask4[..., None]
            ).reshape(Bx, T, nb, fb * cout)
            taps[spec.name] = y
            z = y

        cfinal = ch[model.layers[-1].name]
        out = unblock_output(z, F, cfinal)
        for name, s in state.items():
            if name not in new_state:
                new_state[name] = s
        return out, new_state

    return apply_v


config = Config(
    model=ModelConfig(
        net_work="FullyCNNV2", compute_dtype="bfloat16", blocked_compute=True
    ),
    train=TrainConfig(batch_size=B, lr=1.5e-3),
)
model = get_model("FullyCNNV2")
rng = np.random.default_rng(0)
t = np.arange(SAMPLES) / 8000.0
clean = 0.3 * np.sin(
    2 * np.pi * rng.uniform(100, 1000, (B, 1)) * t[None, :]
).astype(np.float32)
mix = clean + 0.1 * rng.standard_normal((B, SAMPLES)).astype(np.float32)
batch = Batch(
    jnp.asarray(mix), jnp.asarray(clean), jnp.full((B,), SAMPLES, jnp.int32)
)

orig_apply = blocked_mod.apply_blocked
for variant in VARIANTS:
    blocked_mod.apply_blocked = make_apply(variant)
    try:
        state = create_train_state(config, model, jax.random.PRNGKey(0))
        step = make_train_step(config, model)

        @jax.jit
        def chain(s, b):
            def body(s, _):
                s, m = step(s, b)
                return s, m["loss"]

            s, losses = jax.lax.scan(body, s, None, length=ITERS)
            return s, losses[-1]

        s, last = chain(state, batch)
        l0 = float(last)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, last = chain(s, batch)
            float(last)
            times.append(time.perf_counter() - t0)
        ms = min(times) / ITERS * 1e3
        print(
            f"variant {variant}: {ms:.2f} ms/step, "
            f"{B*SECONDS/(ms/1e3):.0f} audio-s/s, loss[{ITERS}]={l0:.1f}",
            flush=True,
        )
    finally:
        blocked_mod.apply_blocked = orig_apply
