"""Independent pure-numpy TF-1.14-semantics oracle for the R-CED family.

This is a from-scratch re-implementation of the reference graph semantics
(`/root/reference/model_utils/module.py:11-34` conv_bn_relu and
`model.py:6-96` topologies), deliberately sharing NO code with the
package: its own layer tables, its own conv (explicit asymmetric SAME
padding + per-tap einsum), its own BN (biased batch moments, eps=1e-3,
momentum 0.99 moving-stat update), its own skip ordering.  Used by
tests/test_parity_oracle.py to pin `ModelDef.apply`, `apply_blocked` and
(transitively, via tests/test_pallas.py) the fused Pallas kernel against
an implementation that cannot share their bugs, and to generate the
committed golden activation fixtures.

TF-1.14 semantics encoded here (SURVEY.md SS2.1):
  * conv2d stride 1 SAME: pad (k-1)//2 before, k//2 after, per dim;
  * batch_normalization(training=True): biased moments over (N, H, W),
    eps=1e-3; moving = 0.99*moving + 0.01*batch;
    (training=False): moving stats;
  * skip add after BN, before ReLU (module.py:30-31);
  * V3 block-output residual add after the last conv's BN+ReLU
    (model.py:75-77).
"""

import numpy as np

BN_EPS = 1e-3
BN_MOM = 0.99

# Layer tables transcribed independently from /root/reference/model_utils/
# model.py (V1 :6-29, V2 :32-61, V3 :64-96).  Each entry:
# (name, out_ch, (kh, kw), use_norm, use_act, skip_from, add_from)
V1_LAYERS = [
    ("encode_1", 12, (8, 13), True, True, None, None),
    ("encode_2", 16, (1, 11), True, True, None, None),
    ("encode_3", 20, (1, 9), True, True, None, None),
    ("encode_4", 24, (1, 7), True, True, None, None),
    ("encode_8", 32, (1, 7), True, True, None, None),  # quirk: model.py:15
    ("decode_1", 24, (1, 7), True, True, "encode_4", None),
    ("decode_2", 20, (1, 9), True, True, "encode_3", None),
    ("decode_3", 16, (1, 11), True, True, "encode_2", None),
    ("decode_4", 12, (1, 13), True, True, "encode_1", None),
    ("decode_5", 1, (1, 129), False, False, None, None),
]

V2_LAYERS = (
    [
        (f"encode_{i + 1}", c, k, True, True, None, None)
        for i, (c, k) in enumerate(
            zip(
                [10, 12, 14, 15, 19, 21, 23, 25],
                [(8, 11), (1, 7), (1, 5), (1, 5), (1, 5), (1, 5), (1, 7), (1, 11)],
            )
        )
    ]
    + [
        (f"decode_{i + 1}", c, k, True, True, f"encode_{7 - i}", None)
        for i, (c, k) in enumerate(
            zip(
                [23, 21, 19, 15, 14, 12, 10],
                [(1, 7), (1, 5), (1, 5), (1, 5), (1, 5), (1, 7), (1, 11)],
            )
        )
    ]
    + [("decode_8", 1, (1, 129), False, False, None, None)]
)


def _v3_block(name, first_kernel, add_from=None):
    return [
        (f"{name}_encode_1", 18, first_kernel, True, True, None, None),
        (f"{name}_encode_2", 30, (1, 5), True, True, None, None),
        (f"{name}_decode", 8, (1, 9), True, True, None, add_from),
    ]


V3_LAYERS = (
    _v3_block("CE1", (8, 9))
    + _v3_block("CE2", (1, 9))
    + _v3_block("CE3", (1, 9))
    + _v3_block("CD1", (1, 9), add_from="CE2_decode")
    + _v3_block("CD2", (1, 9), add_from="CE1_decode")
    + [("decode_final", 1, (1, 129), False, False, None, None)]
)

ORACLE_LAYERS = {
    "FullyCNN": V1_LAYERS,
    "FullyCNNV2": V2_LAYERS,
    "FullyCNNV3": V3_LAYERS,
}


def conv2d_same(x, w, b):
    """NHWC conv, stride 1, TF SAME (asymmetric for even kernels)."""
    kh, kw, cin, cout = w.shape
    ph, pw = ((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)
    xp = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    B, T, F, _ = x.shape
    out = np.zeros((B, T, F, cout), x.dtype)
    for i in range(kh):
        for j in range(kw):
            out += np.einsum(
                "btfc,co->btfo", xp[:, i : i + T, j : j + F, :], w[i, j]
            )
    return out + b


def batch_norm(y, gamma, beta, mean, var, training, frame_mask=None):
    """Returns (normalized y, batch moments or None).

    `frame_mask` [B, T]: restrict batch moments to masked frames (the
    batch-max region of the padded collate; see train/step.py docstring).
    """
    if training:
        if frame_mask is None:
            bm = y.mean(axis=(0, 1, 2))
            bv = (y**2).mean(axis=(0, 1, 2)) - bm**2
        else:
            m = frame_mask[:, :, None, None]
            n = m.sum() * y.shape[2]
            bm = (y * m).sum(axis=(0, 1, 2)) / n
            bv = (y**2 * m).sum(axis=(0, 1, 2)) / n - bm**2
        use_m, use_v = bm, bv
    else:
        use_m, use_v = mean, var
        bm = bv = None
    yn = (y - use_m) / np.sqrt(use_v + BN_EPS) * gamma + beta
    return yn, (bm, bv)


def oracle_forward(name, params, bn_state, x, training, frame_mask=None):
    """Full-model forward.  params/bn_state are dicts of numpy arrays keyed
    like the package's pytrees ({name: {w, b, gamma, beta}} /
    {name: {mean, var}}).  Returns (y, new_bn_state)."""
    taps = {}
    new_bn = {}
    x = np.asarray(x, np.float64)
    for lname, out_ch, kernel, use_norm, use_act, skip_from, add_from in (
        ORACLE_LAYERS[name]
    ):
        p = {k: np.asarray(v, np.float64) for k, v in params[lname].items()}
        y = conv2d_same(x, p["w"], p["b"])
        if use_norm:
            s = bn_state[lname]
            y, (bm, bv) = batch_norm(
                y,
                p["gamma"],
                p["beta"],
                np.asarray(s["mean"], np.float64),
                np.asarray(s["var"], np.float64),
                training,
                frame_mask,
            )
            if training:
                new_bn[lname] = {
                    "mean": BN_MOM * np.asarray(s["mean"], np.float64)
                    + (1 - BN_MOM) * bm,
                    "var": BN_MOM * np.asarray(s["var"], np.float64)
                    + (1 - BN_MOM) * bv,
                }
            else:
                new_bn[lname] = {k: np.asarray(v) for k, v in s.items()}
        if skip_from is not None:
            y = y + taps[skip_from]
        if use_act:
            y = np.maximum(y, 0.0)
        if add_from is not None:
            y = y + taps[add_from]
        taps[lname] = y
        x = y
    return x, new_bn


def make_random_params(name, seed=0):
    """Random params/bn_state as plain numpy dicts (Glorot-scale weights,
    nonzero biases/BN offsets so every semantic detail is exercised)."""
    rng = np.random.default_rng(seed)
    params, bn_state = {}, {}
    cin = 1
    for lname, out_ch, (kh, kw), use_norm, _, _, _ in ORACLE_LAYERS[name]:
        lim = np.sqrt(6.0 / (kh * kw * (cin + out_ch)))
        params[lname] = {
            "w": rng.uniform(-lim, lim, (kh, kw, cin, out_ch)).astype(np.float32),
            "b": rng.normal(0, 0.05, (out_ch,)).astype(np.float32),
        }
        if use_norm:
            params[lname]["gamma"] = (
                1.0 + rng.normal(0, 0.1, (out_ch,))
            ).astype(np.float32)
            params[lname]["beta"] = rng.normal(0, 0.1, (out_ch,)).astype(
                np.float32
            )
            bn_state[lname] = {
                "mean": rng.normal(0, 0.2, (out_ch,)).astype(np.float32),
                "var": (1.0 + rng.random((out_ch,))).astype(np.float32),
            }
        cin = out_ch
    return params, bn_state
