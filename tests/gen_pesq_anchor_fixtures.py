"""Generate ITU-anchored PESQ fixtures: tests/fixtures/pesq_anchors.npz.

Run this in ANY environment where real ITU P.862 code is installed
(`pip install pypesq` or `pip install pesq`) and commit the resulting
npz.  The build image this framework is developed in has no pypesq and
no network egress, so the fixture cannot be generated in-tree -- this
script makes the anchoring reproducible the moment ITU code is
reachable, and `tests/test_metrics.py::test_pesq_native_vs_itu_fixture`
asserts the native implementation (runtime/pesq862.cc) against the
fixture whenever it is present.

The degraded signals are derived deterministically from fixed seeds (no
audio files need committing): a syllabically-modulated harmonic carrier
(the same anchor signal family the in-tree tests use) under identity,
constant gain, and white noise at a 30/20/10/0 dB SNR grid.

Reference dependency being anchored: /root/reference/model_utils/
utils.py:32-45 (pypesq scoring at 8 kHz), whose published result is
PESQ 2.27 on aishell_1 + office noise (readme.md:69-73).

Usage:  python tests/gen_pesq_anchor_fixtures.py [out.npz]
"""

import os
import sys

import numpy as np

SR = 8000


def anchor_signal(seconds: float = 4.0) -> np.ndarray:
    t = np.arange(int(seconds * SR)) / SR
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t)
    return (
        env
        * (
            0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 880 * t)
        )
    ).astype(np.float32)


def conditions():
    """Yields (name, clean, degraded) with all randomness seeded."""
    y = anchor_signal()
    yield "identity", y, y.copy()
    yield "gain_0.3", y, (0.3 * y).astype(np.float32)
    noise = np.random.default_rng(3).standard_normal(len(y)).astype(np.float32)
    for snr_db in (30, 20, 10, 0):
        scale = np.sqrt(
            (y**2).sum() / (10 ** (snr_db / 10) * (noise**2).sum())
        )
        yield f"awgn_snr{snr_db}", y, (y + scale * noise).astype(np.float32)


def itu_pesq():
    """Returns (fn(clean, degraded) -> raw MOS, implementation name)."""
    try:
        from pypesq import pesq as _pesq  # type: ignore

        return lambda a, b: float(_pesq(a, b, SR)), "pypesq"
    except ImportError:
        pass
    # The `pesq` package's nb mode returns MOS-LQO (it applies P.862.1);
    # invert the published mapping to store raw P.862 MOS, the scale the
    # reference reports and runtime/pesq862.cc produces.
    from pesq import pesq as _pesq  # type: ignore

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from fullycnnspeechenhancement_tpu.eval.metrics import mos_lqo_inverse

    return (
        lambda a, b: mos_lqo_inverse(float(_pesq(SR, a, b, "nb"))),
        "pesq-pkg-lqo-inverted",
    )


def main():
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "fixtures",
            "pesq_anchors.npz",
        )
    )
    score, impl = itu_pesq()
    names, scores = [], []
    for name, clean, degraded in conditions():
        s = score(clean, degraded)
        print(f"{name}: raw MOS {s:.3f}")
        names.append(name)
        scores.append(s)
    np.savez(
        out_path,
        names=np.array(names),
        scores=np.array(scores, np.float64),
        implementation=np.array(impl),
        sample_rate=np.array(SR),
    )
    print(f"wrote {out_path} ({impl})")


if __name__ == "__main__":
    main()
