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

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


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
