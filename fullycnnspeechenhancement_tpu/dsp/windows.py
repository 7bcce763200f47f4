"""Window functions.

The reference supports hamming/hanning/blackman/bartlett by name with a
Hamming default (`data_utils/audio_feature.py:13-20`); in practice Hamming is
always used (the cfg key selecting hanning is dead -- SURVEY.md Appendix A.1).
"""

from __future__ import annotations

import numpy as np

_WINDOWS = {
    "hamming": np.hamming,
    "hanning": np.hanning,
    "blackman": np.blackman,
    "bartlett": np.bartlett,
}


def make_window(name: str | None, length: int) -> np.ndarray:
    """Return a float64 window of `length` samples; unknown names fall back
    to Hamming, matching the reference's `.get(name, hamming)` behaviour."""
    fn = _WINDOWS.get(name, np.hamming)
    return fn(length)
