"""Generate committed golden STOI score fixtures.

Run from the repo root:  python tests/gen_stoi_fixtures.py
Writes tests/fixtures/stoi_golden.npz: deterministic synthetic signal
pairs (constructed in-place from seeds at test time, only scores stored)
spanning identity, additive noise at several SNRs, lowpass filtering and
amplitude scaling.  Scores are computed with the independently-structured
oracle (tests/stoi_oracle.py); tests/test_metrics.py asserts the package
implementation reproduces them.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stoi_oracle import stoi_oracle

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "stoi_golden.npz")

SR = 8000


def make_pairs():
    """Deterministic (name, clean, degraded) triples."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(123)
    n = int(3.0 * SR)
    t = np.arange(n) / SR
    carrier = lfilter([1.0], [1.0, -0.9], rng.standard_normal(n))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t)
    clean = (env * carrier).astype(np.float64)
    noise = rng.standard_normal(n)

    pairs = [("identity", clean, clean.copy())]
    for snr_db in [20, 10, 5, 0, -5]:
        scale = np.sqrt(
            (clean**2).sum() / (10 ** (snr_db / 10) * (noise**2).sum())
        )
        pairs.append((f"snr_{snr_db}", clean, clean + scale * noise))
    pairs.append(
        ("lowpass", clean, lfilter(np.ones(8) / 8.0, [1.0], clean))
    )
    pairs.append(("scaled", clean, 0.25 * clean))
    pairs.append(
        ("clipped", clean, np.clip(clean, -0.5 * np.abs(clean).max(),
                                   0.5 * np.abs(clean).max()))
    )
    mod = clean * (1.0 + 0.5 * np.sin(2 * np.pi * 1.0 * t))
    pairs.append(("am_warble", clean, mod))
    return pairs


def main():
    names, scores = [], []
    for name, c, d in make_pairs():
        s = stoi_oracle(c, d, SR)
        names.append(name)
        scores.append(s)
        print(f"{name:12} {s:.6f}")
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, names=np.array(names), scores=np.array(scores))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
