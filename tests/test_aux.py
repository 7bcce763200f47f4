"""Aux subsystems: profiling hooks, multi-host helpers, prep utilities."""

import os

import numpy as np
import pytest

from fullycnnspeechenhancement_tpu.parallel import multihost
from fullycnnspeechenhancement_tpu.train.profiling import StepProfiler


def test_multihost_identity_single_host():
    assert multihost.host_index() == 0
    assert multihost.host_count() == 1
    assert multihost.local_batch_size(8) == 8


def test_step_profiler_noop_without_env(monkeypatch):
    monkeypatch.delenv("FCSE_PROFILE_DIR", raising=False)
    p = StepProfiler()
    for s in range(20):
        p.step(s)  # must be a no-op, no trace started
    p.close()
    assert p.dir is None


def test_step_profiler_traces_window(tmp_path, monkeypatch):
    monkeypatch.setenv("FCSE_PROFILE_DIR", str(tmp_path / "prof"))
    monkeypatch.setenv("FCSE_PROFILE_START", "2")
    monkeypatch.setenv("FCSE_PROFILE_STEPS", "2")
    import jax
    import jax.numpy as jnp

    p = StepProfiler()
    f = jax.jit(lambda x: x * 2)
    for s in range(6):
        f(jnp.ones(4)).block_until_ready()
        p.step(s)
    p.close()
    assert p._done
    # trace directory produced something
    files = []
    for root, _, names in os.walk(str(tmp_path / "prof")):
        files += names
    assert files, "profiler produced no trace files"


def test_prepare_common_unpack_roundtrip(tmp_path):
    import tarfile
    import zipfile

    from fullycnnspeechenhancement_tpu.data.prepare import md5file, unpack

    src = tmp_path / "payload.txt"
    src.write_text("hello")
    tar_path = str(tmp_path / "a.tar")
    with tarfile.open(tar_path, "w") as tar:
        tar.add(str(src), arcname="payload.txt")
    unpack(tar_path, str(tmp_path / "out_tar"))
    assert (tmp_path / "out_tar" / "payload.txt").read_text() == "hello"

    zip_path = str(tmp_path / "a.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        zf.write(str(src), arcname="payload.txt")
    unpack(zip_path, str(tmp_path / "out_zip"))
    assert (tmp_path / "out_zip" / "payload.txt").read_text() == "hello"

    assert len(md5file(tar_path)) == 32


def test_aishell2_speaker_split(tmp_path):
    from fullycnnspeechenhancement_tpu.data.prepare.aishell_2 import (
        read_speaker_split,
    )

    lines = []
    for i in range(25):
        lines.append(f"S{i:04d}\tage\t女\tother")
    for i in range(25, 55):
        lines.append(f"S{i:04d}\tage\t男\tother")
    p = tmp_path / "spk_info.txt"
    p.write_text("\n".join(lines))
    dev, test = read_speaker_split(str(p))
    assert len(dev) == 20 and len(test) == 20
    # first 10 of each gender (numeric order) go to dev
    assert "S0000" in dev and "S0025" in dev
    assert "S0010" in test and "S0035" in test
    assert "S0020" not in dev and "S0020" not in test


def test_work_cfgs_complete_and_loadable():
    """Every dataset workflow dir carries train/test/infer cfgs (the
    reference ships all three per dataset, e.g. /root/reference/Work/
    aishell_2/cfg/fully_cnn_infer.cfg:1) and each round-trips through
    load_ini_config."""
    from fullycnnspeechenhancement_tpu.config import load_ini_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for dataset in ("aishell_1", "aishell_2", "voicebank"):
        for kind in ("train", "test", "infer"):
            path = os.path.join(
                repo, "work", dataset, "cfg", f"fully_cnn_{kind}.cfg"
            )
            assert os.path.exists(path), path
            cfg = load_ini_config(path)
            assert cfg.dsp.sample_rate == 8000
            assert cfg.model.feature_dim == 129


def test_dead_keys_warn(tmp_path, caplog):
    """Both reference dead keys ([data] windows / nfft, parsed by no
    reference code path -- Appendix A.1/A.2) warn when an INI asks for a
    non-behavioural value, and the behavioural values stay in force."""
    import logging

    from fullycnnspeechenhancement_tpu.config import load_ini_config

    ini = tmp_path / "dead.cfg"
    ini.write_text("[data]\nwindows = hanning\nnfft = 512\n")
    with caplog.at_level(logging.WARNING):
        cfg = load_ini_config(str(ini))
    text = caplog.text
    assert "windows=hanning" in text and "nfft=512" in text
    assert cfg.dsp.window_name == "hamming"
    assert cfg.dsp.num_bins == 129  # nfft stays 256

    # junk values in a dead key warn instead of aborting config load
    # (the reference never parses the key, so it accepts anything)
    for bad in ("not-a-number", "inf", "1e400"):
        junk = tmp_path / f"junk_{bad[:3]}.cfg"
        junk.write_text(f"[data]\nnfft = {bad}\n")
        with caplog.at_level(logging.WARNING):
            cfg = load_ini_config(str(junk))
        assert f"nfft={bad}" in caplog.text
        assert cfg.dsp.num_bins == 129
