"""bench.py plumbing guard: every trainer loader mode must run end-to-end
on CPU at tiny shapes.  The bench is the driver-visible record of the
round; a broken mode would otherwise only surface during the end-of-round
TPU run (round 2 lost all numbers that way -- benchmarks/PERF_NOTES.md)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["host", "host_i16", "cached", "rotating"])
def test_bench_trainer_loop_modes_run(mode):
    import bench

    rate = bench.bench_trainer_real_loop(
        batch=2,
        seconds_per_utt=0.5,
        n_entries=8,
        epochs_measured=1,
        steps_per_call=2,
        loader_mode=mode,
    )
    assert rate > 0.0


@pytest.mark.slow
def test_bench_eval_measure_runs():
    """benchmarks/bench_eval.py end-to-end at tiny shapes: returns a
    positive throughput, a device-phase number, and real metric values
    (the eval loop is a default bench section since r5)."""
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks",
        ),
    )
    import bench_eval

    r = bench_eval.measure(n_entries=4, seconds_per_utt=0.5, batch=2)
    assert r["value"] > 0 and r["device_audio_s_per_s"] > 0
    assert 0.0 <= r["scoring_overhead_frac"] <= 1.0
    assert "stoi" in r["metrics"] and "sdr" in r["metrics"]


def test_run_section_retries_transient_and_records_hard_failures():
    """Section runner: one retry on transient backend markers (a tunnel
    flap nulled every section of an otherwise-green bench in round 4),
    no retry on ordinary exceptions, error text recorded either way."""
    import bench

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("FAILED_PRECONDITION: TPU backend error")
        return 42.0

    errors = {}
    assert bench.run_section("s", flaky, errors, retry_sleep_s=0) == 42.0
    assert calls["n"] == 2 and not errors

    def hard():
        raise ValueError("shape mismatch")

    errors = {}
    assert bench.run_section("h", hard, errors, retry_sleep_s=0) is None
    assert "shape mismatch" in errors["h"]

    def always_transient():
        raise RuntimeError("UNAVAILABLE: socket closed")

    errors = {}
    assert (
        bench.run_section("t", always_transient, errors, retry_sleep_s=0)
        is None
    )
    assert "UNAVAILABLE" in errors["t"]


def test_bench_smoke_meta():
    """The smoke gate's section list must keep covering every Pallas/
    production path named in PERF_NOTES (cheap string check -- the real
    compile gate runs on the TPU via `bench.py --smoke`)."""
    import inspect

    import bench

    src = inspect.getsource(bench.smoke)
    for needle in (
        "train_blocked_bf16_b64",
        "dw_pallas",
        "cached_train_step",
        "fused_inference",
    ):
        assert needle in src
