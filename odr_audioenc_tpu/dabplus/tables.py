"""AAC constant tables for the DAB+ encoder (960 transform).

Loaded from data/aac_tables.npz (MPEG-4 standard tables extracted by
tools/gen_aac_tables.py from the reference fdk-aac ROMs: sfb widths
psy_configuration.cpp:238-260, Huffman books aacEnc_rom.cpp)."""
from pathlib import Path

import numpy as np

_npz = np.load(Path(__file__).parent.parent / "data" / "aac_tables.npz")

SFB_LONG = {r: _npz[f"sfb_long_{r}"] for r in [16000, 22050, 24000, 32000, 44100, 48000]}
SFB_SHORT = {r: _npz[f"sfb_short_{r}"] for r in [16000, 22050, 24000, 32000, 44100, 48000]}

HUFF_LEN = {b: _npz[f"huff_len{b}"] for b in range(1, 12)}
HUFF_CODE = {b: _npz[f"huff_code{b}"] for b in range(1, 12)}
HUFF_LEN_SCF = _npz["huff_lenscf"]    # [121] index = delta + 60
HUFF_CODE_SCF = _npz["huff_codescf"]  # [121]

MAX_SFB_LONG = 49  # padded band count used on device
N = 960


def sfb_offsets(rate):
    w = SFB_LONG[rate]
    off = np.zeros(len(w) + 1, np.int32)
    off[1:] = np.cumsum(w)
    return off


def band_matrix(rate, nbands=MAX_SFB_LONG):
    """[nbands, 960] one-hot rows for per-band reductions."""
    off = sfb_offsets(rate)
    m = np.zeros((nbands, N), np.float32)
    for b in range(len(off) - 1):
        m[b, off[b]:off[b + 1]] = 1.0
    return m


def band_of_line(rate):
    off = sfb_offsets(rate)
    out = np.zeros(N, np.int32)
    for b in range(len(off) - 1):
        out[off[b]:off[b + 1]] = b
    return out


def mdct_matrix(n=N, dtype=np.float64):
    """[2n, n] windowed forward MDCT basis (sine window), scaled so that the
    ISO IMDCT + overlap-add reconstructs unity."""
    ns = np.arange(2 * n)[:, None].astype(np.float64)
    ks = np.arange(n)[None, :].astype(np.float64)
    win = np.sin(np.pi / (2 * n) * (ns + 0.5))
    basis = np.cos(np.pi / n * (ns + 0.5 + n / 2.0) * (ks + 0.5))
    # x2: the decoder's IMDCT convention is x[n] = (2/N) sum spec cos(...);
    # forward must carry the 2 so the windowed overlap-add is unity
    # (calibrated against the fdk decoder loopback)
    return (2.0 * win * basis).astype(dtype)


def bark(f_hz):
    f = np.maximum(f_hz, 0.0) * 0.001
    return 13.0 * np.arctan(0.76 * f) + 3.5 * np.arctan((f / 7.5) ** 2)


def ath_db(f_hz):
    f = np.where(f_hz < -0.3, 3410.0, f_hz)
    f = np.clip(f / 1000.0, 0.01, 18.0)
    return (3.640 * np.power(f, -0.8)
            - 6.800 * np.exp(-0.6 * (f - 3.4) ** 2)
            + 6.000 * np.exp(-0.15 * (f - 8.7) ** 2)
            + 0.6e-3 * np.power(f, 4.0))


def band_psy_tables(rate, nbands=MAX_SFB_LONG):
    """Per-band bark centres, masking slopes and absolute thresholds (energy
    domain, int16-scaled MDCT units)."""
    off = sfb_offsets(rate)
    nb = len(off) - 1
    centers = 0.5 * (off[:-1] + off[1:]) * rate / (2.0 * N)
    bk = bark(centers)
    dbark = np.diff(bk)
    # spreading slopes: 30 dB/bark toward lower, 15 dB/bark toward higher freqs
    f_low = 10.0 ** (-3.0 * dbark)   # applied walking downward (b+1 -> b)
    f_high = 10.0 ** (-1.5 * dbark)  # applied walking upward (b -> b+1)
    # absolute threshold: full-scale sine (+-32768) ~ 96 dB SPL; a single MDCT
    # line of amplitude a has band energy ~ (N/2) * a^2 -- calibration constant
    # chosen so ath(0 dB) corresponds to ~1 LSB line energy
    ath = 10.0 ** (ath_db(centers) / 10.0) * 480.0
    out = dict(nbands=nb, f_low=np.zeros(nbands), f_high=np.zeros(nbands),
               ath=np.full(nbands, 1e30))
    out["f_low"][:nb - 1] = f_low
    out["f_high"][:nb - 1] = f_high
    out["ath"][:nb] = ath
    return out
