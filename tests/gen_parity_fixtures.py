"""Generate the committed golden activation fixtures from the numpy
TF-semantics oracle (tests/tf_semantics_oracle.py).

Run from the repo root:  python tests/gen_parity_fixtures.py
Writes tests/fixtures/parity_oracle.npz.  The fixtures pin all three model
variants (V1/V2/V3) in eval, train, and train+frame-mask modes so future
rounds cannot silently regress TF-1.14 forward semantics.
"""

import os

import numpy as np

from tf_semantics_oracle import ORACLE_LAYERS, make_random_params, oracle_forward

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "parity_oracle.npz")

B, T, F = 2, 12, 129


def main():
    rng = np.random.default_rng(42)
    x = rng.random((B, T, F, 1)).astype(np.float32)
    # per-utterance frame mask: utt 0 full, utt 1 only 8 of 12 frames
    fmask = np.zeros((B, T), np.float32)
    fmask[0, :] = 1.0
    fmask[1, :8] = 1.0

    blobs = {"input": x, "frame_mask": fmask}
    for name in ORACLE_LAYERS:
        params, bn_state = make_random_params(name, seed=7)
        for lname, p in params.items():
            for k, v in p.items():
                blobs[f"{name}/params/{lname}/{k}"] = v
        for lname, s in bn_state.items():
            for k, v in s.items():
                blobs[f"{name}/bn/{lname}/{k}"] = v
        for case, (training, mask) in {
            "eval": (False, None),
            "train": (True, None),
            "train_masked": (True, fmask),
        }.items():
            y, new_bn = oracle_forward(
                name, params, bn_state, x, training=training, frame_mask=mask
            )
            blobs[f"{name}/{case}/out"] = y.astype(np.float32)
            if training:
                for lname, s in new_bn.items():
                    blobs[f"{name}/{case}/new_bn/{lname}/mean"] = s[
                        "mean"
                    ].astype(np.float32)
                    blobs[f"{name}/{case}/new_bn/{lname}/var"] = s["var"].astype(
                        np.float32
                    )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **blobs)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, {len(blobs)} arrays)")


if __name__ == "__main__":
    main()
