"""Generate tests/fixtures/pesq_native_regression.npz: the NATIVE P.862
scorer's exact outputs on the committed anchor conditions.

The true ITU anchor fixture (gen_pesq_anchor_fixtures.py) remains
environment-blocked (no pypesq/pesq wheel, no egress), so the native
scorer's absolute scale cannot be conformance-checked in-tree.  This
fixture locks the scale against DRIFT instead (VERDICT r4 item 5): any
future change to runtime/pesq862.cc that shifts scores on the anchor
grid fails `tests/test_metrics.py::test_pesq_native_regression` loudly,
forcing the change to be deliberate (and this fixture regenerated).

Usage:  python tests/gen_pesq_native_regression.py [out.npz]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_pesq_anchor_fixtures import SR, conditions  # noqa: E402


def main():
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "fixtures",
            "pesq_native_regression.npz",
        )
    )
    from fullycnnspeechenhancement_tpu.data import native

    if not native.native_available():
        raise SystemExit("native runtime not built; cannot generate")
    names, scores = [], []
    for name, clean, degraded in conditions():
        s = float(native.pesq_nb(clean, degraded))
        print(f"{name}: native raw MOS {s:.6f}")
        names.append(name)
        scores.append(s)
    np.savez(
        out_path,
        names=np.array(names),
        scores=np.array(scores, np.float64),
        implementation=np.array("p862-native"),
        sample_rate=np.array(SR),
    )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
