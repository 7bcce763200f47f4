"""Independently-structured STOI oracle, written in the published pystoi
package's code organization (vectorized third-octave matrix, segment
tensor, per-segment normalization) as opposed to the package's per-segment
loop -- used by tests/test_metrics.py to cross-check
`eval.metrics.stoi` and to generate the committed golden score fixtures.

pystoi itself is not installable in this image (zero egress), so absolute
parity with its binaries is unverifiable here; this oracle transcribes the
same published algorithm (Taal et al. 2011) and pystoi's documented
implementation choices (hann(N+2)[1:-1] window, OLA without
renormalization, nearest-bin band edges, dyn_range 40, beta -15) through a
second, differently-shaped code path.
"""

import numpy as np

FS = 10000
N_FRAME = 256
HOP = 128
NFFT = 512
NUMBAND = 15
MINFREQ = 150.0
N = 30  # frames per segment
BETA = -15.0
DYN_RANGE = 40.0


def _hann_pystoi(n=N_FRAME):
    k = np.arange(1, n + 1)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / (n + 1))


def thirdoct(fs=FS, nfft=NFFT, num_bands=NUMBAND, min_freq=MINFREQ):
    f = np.linspace(0, fs / 2, nfft // 2 + 1)
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    freq_low = cf * 2.0 ** (-1.0 / 6.0)
    freq_high = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        fl_ii = np.argmin(np.square(f - freq_low[i]))
        fh_ii = np.argmin(np.square(f - freq_high[i]))
        obm[i, fl_ii:fh_ii] = 1.0
    return obm


def _frames(x):
    w = _hann_pystoi()
    n = (len(x) - N_FRAME) // HOP + 1
    idx = np.arange(N_FRAME)[None, :] + HOP * np.arange(n)[:, None]
    return x[idx] * w


def remove_silent_frames(x, y):
    xf = _frames(x)
    yf = _frames(y)
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    mask = energies > np.max(energies) - DYN_RANGE
    xf, yf = xf[mask], yf[mask]
    n_out = (len(xf) - 1) * HOP + N_FRAME

    def ola(frames):
        out = np.zeros(n_out)
        for i, fr in enumerate(frames):
            out[i * HOP : i * HOP + N_FRAME] += fr
        return out

    return ola(xf), ola(yf)


def stoi_oracle(x, y, fs_sig):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if fs_sig != FS:
        from fullycnnspeechenhancement_tpu.data.audio_io import resample

        x = resample(x, fs_sig, FS).astype(np.float64)
        y = resample(y, fs_sig, FS).astype(np.float64)
    x, y = remove_silent_frames(x, y)
    X = np.fft.rfft(_frames(x), NFFT)
    Y = np.fft.rfft(_frames(y), NFFT)
    obm = thirdoct()
    Xb = np.sqrt(np.abs(X) ** 2 @ obm.T)  # [T, J]
    Yb = np.sqrt(np.abs(Y) ** 2 @ obm.T)
    n_seg = Xb.shape[0] - N + 1
    if n_seg <= 0:
        raise ValueError("too short for STOI")
    # segment tensor [n_seg, N, J]
    seg_idx = np.arange(N)[None, :] + np.arange(n_seg)[:, None]
    Xs = Xb[seg_idx]
    Ys = Yb[seg_idx]
    norm_x = np.linalg.norm(Xs, axis=1, keepdims=True)
    norm_y = np.linalg.norm(Ys, axis=1, keepdims=True)
    alpha = norm_x / (norm_y + 1e-12)
    Ysn = np.minimum(Ys * alpha, Xs * (1.0 + 10.0 ** (-BETA / 20.0)))
    Xm = Xs - Xs.mean(axis=1, keepdims=True)
    Ym = Ysn - Ysn.mean(axis=1, keepdims=True)
    num = np.sum(Xm * Ym, axis=1)
    den = np.linalg.norm(Xm, axis=1) * np.linalg.norm(Ym, axis=1) + 1e-12
    return float(np.mean(num / den))
