"""Deterministic test signals shared by golden generation and the test suite."""
import numpy as np


def _envelope(n, seed):
    rng = np.random.default_rng(seed)
    # slowly varying random envelope, 0..1
    knots = rng.uniform(0.05, 1.0, size=16)
    t = np.linspace(0, 15, n)
    return np.interp(t, np.arange(16), knots)


def music_like(n_frames, stereo=True, seed=1234, rate=48000):
    """Band-limited noise + moving tones with dynamics: exercises tonal and
    noise maskers, scfsi patterns, varying bit allocation."""
    n = n_frames * 1152
    rng = np.random.default_rng(seed)
    t = np.arange(n) / rate
    chans = []
    for ch in range(2 if stereo else 1):
        x = rng.normal(0, 0.08, n)
        # crude lowpass via cumulative moving average
        k = np.hanning(31)
        k /= k.sum()
        x = np.convolve(x, k, mode="same")
        for f0, amp in [(441.3, 0.22), (1333.7, 0.12), (3777.1, 0.05), (9212.9, 0.02)]:
            # slight per-channel detune; off-bin frequencies
            x = x + amp * np.sin(2 * np.pi * (f0 * (1 + 0.001 * ch)) * t + 0.7 * ch)
        x *= _envelope(n, seed + 10 + ch)
        chans.append(x)
    if stereo and len(chans) == 1:
        chans.append(chans[0])
    x = np.stack(chans if stereo else chans[:1])
    x = np.clip(x, -0.999, 0.999)
    return (x * 32767.0).astype(np.int16)


def speech_like(n_frames, stereo=True, seed=99, rate=48000):
    """AM noise bursts with silent gaps: exercises silence handling and
    large frame-to-frame scalefactor jumps."""
    n = n_frames * 1152
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 0.15, n)
    gate = (np.sin(2 * np.pi * 3.1 * np.arange(n) / rate) > -0.2).astype(float)
    x *= gate * _envelope(n, seed + 1)
    x = np.clip(x, -0.999, 0.999)
    out = np.stack([x, np.roll(x, 480)]) if stereo else x[None]
    return (out * 32767.0).astype(np.int16)


def silence(n_frames, stereo=True):
    return np.zeros((2 if stereo else 1, n_frames * 1152), dtype=np.int16)


def loud_tones(n_frames, stereo=True, rate=48000, seed=7):
    """Near-full-scale multi-tone: exercises top scalefactor indices and
    high allocations."""
    n = n_frames * 1152
    t = np.arange(n) / rate
    x = 0.5 * np.sin(2 * np.pi * 997.3 * t) + 0.4 * np.sin(2 * np.pi * 5101.7 * t + 1.0)
    y = 0.5 * np.sin(2 * np.pi * 1501.1 * t + 0.5) + 0.35 * np.sin(2 * np.pi * 7331.3 * t)
    rng = np.random.default_rng(seed)
    x += rng.normal(0, 0.01, n)
    y += rng.normal(0, 0.01, n)
    out = np.stack([x, y]) if stereo else np.stack([x])
    out = np.clip(out, -0.999, 0.999)
    return (out * 32767.0).astype(np.int16)


SIGNALS = {
    "music": music_like,
    "speech": speech_like,
    "tones": loud_tones,
}


def frames_of(sig):
    """[C, n*1152] int16 -> [n, 2, 1152] (mono duplicated to 2 rows, as the
    toolame entry point always receives short[2][1152])."""
    c, n = sig.shape
    nf = n // 1152
    out = np.zeros((nf, 2, 1152), dtype=np.int16)
    arr = sig[:, : nf * 1152].reshape(c, nf, 1152)
    out[:, 0] = arr[0].reshape(nf, 1152)
    out[:, 1] = arr[1 if c > 1 else 0].reshape(nf, 1152)
    return out
