"""Test harness: force JAX onto a virtual 8-device CPU platform.

This environment's sitecustomize imports jax and registers a remote-TPU
('axon') backend at interpreter startup, so JAX_PLATFORMS env mutations in
conftest are too late -- use jax.config.update before any backend
initialisation instead.  Sharding/collective logic (DP psum, halo exchange)
is exercised on this virtual mesh; the real-TPU bench path is bench.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn

# Persistent compilation cache: the suite is compile-time dominated (16-layer
# grad compiles take tens of seconds on CPU), and test shapes are fixed, so
# repeat runs hit the cache and the suite drops from ~10 min to ~2 min.
# The env var makes subprocess tests (e.g. the x64 gradient test) inherit it.
_JAX_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _JAX_CACHE)
# Subprocess tests inherit the cache *dir* from the env var but would fall
# back to JAX's default thresholds (min compile time 1s), leaving sub-1s
# subprocess compiles uncached -- export the policy knobs too.
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (multi-process, training)"
    )

REFERENCE_ROOT = "/root/reference"


def make_corpus(root, sr=8000, n_clean=6, seed=0):
    """Write a small wav corpus + manifests under `root`; returns paths."""
    import numpy as np

    from fullycnnspeechenhancement_tpu.data import write_manifest, write_wav

    rng = np.random.default_rng(seed)
    clean_entries, noise_entries, premixed_entries = [], [], []
    durations = [0.5, 0.8, 1.1, 1.6, 2.2, 3.1, 1.3, 0.9][:n_clean]
    for i, sec in enumerate(durations):
        t = np.arange(int(sec * sr)) / sr
        env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t)
        sig = (env * (0.4 * np.sin(2 * np.pi * (250 + 90 * i) * t))).astype(
            np.float32
        )
        p = os.path.join(root, f"clean_{i}.wav")
        write_wav(p, sig, sr)
        clean_entries.append({"audio_filepath": p, "duration": sec})
        mp = os.path.join(root, f"mix_{i}.wav")
        write_wav(
            mp, sig + 0.1 * rng.standard_normal(len(sig)).astype(np.float32), sr
        )
        premixed_entries.append(
            {"clean_audio_filepath": p, "mix_audio_filepath": mp, "duration": sec}
        )
    for i, sec in enumerate([0.7, 2.5]):
        p = os.path.join(root, f"noise_{i}.wav")
        write_wav(
            p, 0.2 * rng.standard_normal(int(sec * sr)).astype(np.float32), sr
        )
        noise_entries.append({"audio_filepath": p, "duration": sec})
    paths = {
        "clean": os.path.join(root, "manifest.clean"),
        "noise": os.path.join(root, "manifest.noise"),
        "premixed": os.path.join(root, "manifest.premixed"),
    }
    write_manifest(paths["clean"], clean_entries)
    write_manifest(paths["noise"], noise_entries)
    write_manifest(paths["premixed"], premixed_entries)
    return paths


def import_reference_module(relpath: str, name: str):
    """Import a module file from the read-only reference tree for use as a
    golden oracle in parity tests.  Unavailable third-party deps (librosa,
    pypesq, pystoi, tensorflow) are stubbed so numpy-only modules load."""
    import importlib.util
    import types

    import numpy as np

    if not hasattr(np, "mat"):  # removed in numpy 2.0; the reference uses it
        np.mat = np.asmatrix

    for stub in ("librosa", "pypesq", "pystoi", "soundfile", "joblib"):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            # attributes the reference modules pull at import time
            mod.pesq = None
            mod.stoi = None
            mod.Parallel = None
            mod.delayed = None
            sys.modules[stub] = mod
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module
