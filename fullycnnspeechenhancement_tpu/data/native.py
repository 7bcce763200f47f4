"""ctypes binding for the native host runtime (libfcse_runtime.so).

The native library implements WAV decode, scipy-compatible polyphase
resampling and reference-semantics SNR mixing in C++
(`runtime/fcse_runtime.cc`).  ctypes calls release the GIL, so the
thread-pool loader decodes in true parallel.  Everything degrades
gracefully to the Python implementations when the library isn't built;
`native_available()` reports which path is active.

Build once per machine:  make -C fullycnnspeechenhancement_tpu/runtime
(or call `build()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "runtime")
_SO_PATH = os.path.abspath(os.path.join(_RUNTIME_DIR, "libfcse_runtime.so"))

_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree; returns success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_RUNTIME_DIR)],
            check=True,
            capture_output=quiet,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.fcse_decode_wav.restype = ctypes.c_int
    lib.fcse_decode_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fcse_resample.restype = ctypes.c_int
    lib.fcse_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fcse_mix_at_snr.restype = ctypes.c_int
    lib.fcse_mix_at_snr.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fcse_prepare_item.restype = ctypes.c_int
    lib.fcse_prepare_item.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fcse_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.fcse_pesq_nb.restype = ctypes.c_double
    lib.fcse_pesq_nb.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.fcse_pesq_nb_ind.restype = ctypes.c_double
    lib.fcse_pesq_nb_ind.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _take(lib, ptr, n) -> np.ndarray:
    out = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.fcse_free(ptr)
    return out


def decode_wav(path: str) -> Tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.fcse_decode_wav(path.encode(), ctypes.byref(ptr),
                             ctypes.byref(n), ctypes.byref(sr))
    if rc:
        raise IOError(f"fcse_decode_wav({path}) failed: rc={rc}")
    return _take(lib, ptr, n.value), int(sr.value)


def resample(signal: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    x = np.ascontiguousarray(signal, np.float32)
    ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.fcse_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr,
        target_sr, ctypes.byref(ptr), ctypes.byref(n),
    )
    if rc:
        raise RuntimeError(f"fcse_resample failed: rc={rc}")
    return _take(lib, ptr, n.value)


def mix_at_snr(
    speech: np.ndarray, noise: np.ndarray, snr_db: float, seed: int
) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    s = np.ascontiguousarray(speech, np.float32)
    nz = np.ascontiguousarray(noise, np.float32)
    out = np.empty_like(s)
    rc = lib.fcse_mix_at_snr(
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s),
        nz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(nz),
        snr_db, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc:
        raise RuntimeError(f"fcse_mix_at_snr failed: rc={rc}")
    return out


def pesq_nb(
    reference: np.ndarray, degraded: np.ndarray, return_indicators: bool = False
):
    """P.862-structured narrowband PESQ (runtime/pesq862.cc).

    Inputs: mono float signals at 8 kHz.  Returns the MOS-scale score in
    [-0.5, 4.5]; with return_indicators=True, (score, D, DA) -- the raw
    symmetric/asymmetric disturbance indicators.  NOT bit-compatible with
    the ITU reference implementation (see pesq862.cc header), but a real
    perceptual model of the same family, calibrated on anchor conditions.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    a = np.ascontiguousarray(reference, np.float32)
    b = np.ascontiguousarray(degraded, np.float32)
    d = ctypes.c_double()
    da = ctypes.c_double()
    score = lib.fcse_pesq_nb_ind(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        ctypes.byref(d), ctypes.byref(da),
    )
    if score < -100.0:
        raise ValueError(f"fcse_pesq_nb failed: rc={score}")
    if return_indicators:
        return float(score), float(d.value), float(da.value)
    return float(score)


def prepare_item(
    clean_path: str,
    noise_path: Optional[str],
    target_sr: int,
    snr_db: float,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused decode+resample(+mix): -> (mix, clean).  Releases the GIL for
    the whole item, making thread-pool loading truly parallel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime not built")
    mix_ptr = ctypes.POINTER(ctypes.c_float)()
    clean_ptr = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.fcse_prepare_item(
        clean_path.encode(),
        (noise_path or "").encode(),
        target_sr, snr_db, seed,
        ctypes.byref(mix_ptr), ctypes.byref(clean_ptr), ctypes.byref(n),
    )
    if rc:
        raise IOError(
            f"fcse_prepare_item({clean_path}, {noise_path}) failed: rc={rc}"
        )
    mix = _take(lib, mix_ptr, n.value)
    clean = _take(lib, clean_ptr, n.value)
    return mix, clean
