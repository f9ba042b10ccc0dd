"""Batched psy model 2 (AT&T / ISO model 2, libtoolame-dab/psycho_2.c).

Selectable through the reference CLI as ``--dabpsy 2`` (odr-audioenc.cpp:186,
:1492 -> toolame_set_psy_model, toolame.c:202-210).  The model is stateful: a
1056-sample ring buffer per channel (psycho_2.c:76-88) plus two ages of FFT
magnitude/phase per channel for the unpredictability measure's linear
prediction (psycho_2.c:110-141).  Two granules of 576 samples are processed
per frame and the final SMR is the per-subband max (psycho_2.c:247-250).

Unlike model 1 there are no sequential list walks - everything is per-line /
per-partition dense math, so the same code serves the exact f64 path and the
f32 TPU path; the spreading-function convolution (psycho_2.c:160-175) is a
[CBANDS, CBANDS] matmul.  ``exact_order=True`` (the f64 validation path)
accumulates the partition / spreading / subband sums in the C loop order so
the only divergence from the reference is libm-vs-XLA transcendental ulps.

The reference FHT packing (fft.c:1230-1275) maps to the rFFT as
  energy[k] = (H[k]^2 + H[N-k]^2)/2 = Re^2 + Im^2 = |X_k|^2,
  phi[k]    = atan2(-H[k], H[N-k]) + pi/4 = atan2(Im X_k, Re X_k),
with phi[0] never written (mem_alloc zero-fills -> always 0.0, fft.c:1248)
and phi[512] = atan2(0, H[512]).
"""
import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T

BLKSIZE = 1024
HBLK = 513
CB = 64          # CBANDS (encoder.h:42)
NMT = 5.5        # noise-masking-tone offset (psycho_2.c:21)
LN_TO_LOG10 = 0.2302585093  # common.h:31

_CRIT_BAND = np.array([0, 100, 200, 300, 400, 510, 630, 770,
                       920, 1080, 1270, 1480, 1720, 2000, 2320, 2700,
                       3150, 3700, 4400, 5300, 6400, 7700, 9500, 12000,
                       15500, 25000, 30000], np.float64)
_BMAX = np.array([20.0, 20.0, 20.0, 20.0, 20.0, 17.0, 15.0,
                  10.0, 7.0, 4.4, 4.5, 4.5, 4.5, 4.5,
                  4.5, 4.5, 4.5, 4.5, 4.5, 4.5, 4.5,
                  4.5, 4.5, 4.5, 3.5, 3.5, 3.5], np.float64)


def make_psy2_tables(sfreq):
    """psycho_2_init (psycho_2.c:258-438) in numpy f64."""
    i = int(sfreq + 0.5)
    if i in (32000, 16000):
        sfreq_idx = 0
    elif i in (44100, 22050):
        sfreq_idx = 1
    elif i in (48000, 24000):
        sfreq_idx = 2
    else:
        raise ValueError(f"psy model 2: invalid sample rate {sfreq}")
    absthr = np.asarray(T.ABSTHR[sfreq_idx], np.float64)

    window = 0.5 * (1.0 - np.cos(2.0 * T.PI_REF *
                                 (np.arange(BLKSIZE) - 0.5) / BLKSIZE))

    # line -> bark value, then partitions of <= 0.33 bark
    freq_mult = sfreq / BLKSIZE
    bval = np.zeros(HBLK)
    for k in range(HBLK):
        f = k * freq_mult
        j = 1
        while f > _CRIT_BAND[j]:
            j += 1
        bval[k] = j - 1 + (f - _CRIT_BAND[j - 1]) / (_CRIT_BAND[j] - _CRIT_BAND[j - 1])

    partition = np.zeros(HBLK, np.int32)
    cbval = np.zeros(CB)
    numlines = np.zeros(CB, np.int32)
    cbval[0] = bval[0]
    bval_lo = bval[0]
    cnt = 1
    for k in range(1, HBLK):
        if (bval[k] - bval_lo) > 0.33:
            partition[k] = partition[k - 1] + 1
            cbval[partition[k - 1]] /= cnt
            cbval[partition[k]] = bval[k]
            bval_lo = bval[k]
            numlines[partition[k - 1]] = cnt
            cnt = 1
        else:
            partition[k] = partition[k - 1]
            cbval[partition[k]] += bval[k]
            cnt += 1
    numlines[partition[-1]] = cnt
    cbval[partition[-1]] /= cnt

    # spreading function s[i][j] (psycho_2.c:385-407): row index i is the
    # OUTER loop variable named j in C; replicate the exact index roles
    s = np.zeros((CB, CB))
    for j in range(CB):
        for i in range(CB):
            t1 = (cbval[i] - cbval[j]) * 1.05
            t2 = 8.0 * ((t1 - 0.5) ** 2 - 2.0 * (t1 - 0.5)) \
                if (0.5 <= t1 <= 2.5) else 0.0
            t1b = t1 + 0.474
            t3 = 15.811389 + 7.5 * t1b - 17.5 * np.sqrt(1.0 + t1b * t1b)
            s[i][j] = 0.0 if t3 <= -100 else np.exp((t2 + t3) * LN_TO_LOG10)

    tmn = np.maximum(15.5 + cbval, 24.5)
    rnorm = s.sum(axis=1)  # rnorm[j] = sum_i s[j][i] (psycho_2.c:411-417)
    bmax_k = _BMAX[(cbval + 0.5).astype(np.int32)]

    ncb = int(partition[-1]) + 1
    P = np.zeros((CB, HBLK))
    P[partition, np.arange(HBLK)] = 1.0
    # ordered per-partition line indices (exact f64 accumulation order)
    maxlines = int(numlines.max())
    seg_idx = np.zeros((CB, maxlines), np.int32)
    seg_msk = np.zeros((CB, maxlines), bool)
    for p in range(ncb):
        lines = np.nonzero(partition == p)[0]
        seg_idx[p, :len(lines)] = lines
        seg_msk[p, :len(lines)] = True

    denom_ok = (rnorm > 0) & (numlines > 0)
    nb_scale = np.where(denom_ok, 1.0 / np.where(denom_ok, rnorm * numlines, 1.0), 0.0)
    return {
        "absthr": absthr, "window": window, "partition": partition,
        "P": P, "s": s, "tmn": tmn, "rnorm": rnorm, "bmax_k": bmax_k,
        "numlines": numlines, "ncb": ncb, "nb_scale": nb_scale,
        "seg_idx": seg_idx, "seg_msk": seg_msk,
    }


def init_psy2_state(B, dtype):
    """savebuf ring + two ages of (r, phi) per channel slot (zero-filled, as
    mem_alloc does, psycho_2.c:199/mem.c:21)."""
    z = lambda *sh: jnp.zeros(sh, dtype)
    return {"savebuf": z(B, 1056),
            "r_m1": z(B, HBLK), "r_m2": z(B, HBLK),
            "p_m1": z(B, HBLK), "p_m2": z(B, HBLK)}


def _granule(savebuf, r_m1, r_m2, p_m1, p_m2, tabs, dtype, exact_order):
    window = jnp.asarray(tabs["window"], dtype)
    w = savebuf[:, :BLKSIZE] * window
    spec = jnp.fft.rfft(w.astype(jnp.float64 if dtype == jnp.float64
                                 else jnp.float32))
    re, im = spec.real.astype(dtype), spec.imag.astype(dtype)
    energy = re * re + im * im
    phi = jnp.arctan2(im, re)
    # floor + phi conventions (fft.c:1248-1274)
    mid = (jnp.arange(HBLK) >= 1) & (jnp.arange(HBLK) < 512)
    small = mid & (energy < 0.0005)
    energy = jnp.where(small, 0.0005, energy)
    phi = jnp.where(small, 0.0, phi)
    phi = phi.at[:, 0].set(0.0)
    phi = phi.at[:, 512].set(jnp.where(re[:, 512] < 0, np.pi, 0.0))

    # unpredictability (psycho_2.c:110-141)
    r_new = jnp.sqrt(energy)
    r_pr = 2.0 * r_m1 - r_m2
    phi_pr = 2.0 * p_m1 - p_m2
    t1 = r_new * jnp.cos(phi) - r_pr * jnp.cos(phi_pr)
    t2 = r_new * jnp.sin(phi) - r_pr * jnp.sin(phi_pr)
    t3 = r_new + jnp.abs(r_pr)
    c = jnp.where(t3 != 0, jnp.sqrt(t1 * t1 + t2 * t2) / jnp.where(t3 != 0, t3, 1.0), 0.0)

    # partition grouping (psycho_2.c:146-155)
    ec = energy * c
    if exact_order:
        seg_idx, seg_msk = tabs["seg_idx"], tabs["seg_msk"]
        ge = jnp.zeros((energy.shape[0], CB), dtype)
        gc = jnp.zeros_like(ge)
        for t in range(seg_idx.shape[1]):
            m = jnp.asarray(seg_msk[:, t], dtype)
            ge = ge + energy[:, seg_idx[:, t]] * m
            gc = gc + ec[:, seg_idx[:, t]] * m
    else:
        P = jnp.asarray(tabs["P"], dtype)
        ge = energy @ P.T
        gc = ec @ P.T

    # spreading convolution (psycho_2.c:160-175): ecb[j] = sum_k s[j][k]*ge[k]
    s = jnp.asarray(tabs["s"], dtype)
    if exact_order:
        ecb = jnp.zeros_like(ge)
        cbv = jnp.zeros_like(ge)
        for k in range(tabs["ncb"]):
            ecb = ecb + ge[:, k:k + 1] * s[:, k]
            cbv = cbv + gc[:, k:k + 1] * s[:, k]
    else:
        ecb = ge @ s.T
        cbv = gc @ s.T
    cb = jnp.where(ecb != 0, cbv / jnp.where(ecb != 0, ecb, 1.0), 0.0)

    # required SNR per partition (psycho_2.c:180-193)
    cb = jnp.clip(cb, 0.05, 0.5)
    tb = -0.434294482 * jnp.log(cb) - 0.301029996
    bc = jnp.asarray(tabs["tmn"], dtype) * tb + NMT * (1.0 - tb)
    bc = jnp.maximum(bc, jnp.asarray(tabs["bmax_k"], dtype))
    bc = jnp.exp(-bc * LN_TO_LOG10)

    # permissible noise energy -> per-line threshold (psycho_2.c:199-222)
    nb = ecb * bc * jnp.asarray(tabs["nb_scale"], dtype)
    nb_line = nb[:, tabs["partition"]]  # static index -> constant gather
    fthr = jnp.maximum(nb_line, jnp.asarray(tabs["absthr"], dtype))

    # translate to the 32 subbands (psycho_2.c:227-245); both loops cover
    # 17-line windows starting at 16*sb (208 == 16*13)
    snr_sb = []
    for sb in range(32):
        j0 = 16 * sb
        win_f = fthr[:, j0:j0 + 17]
        win_e = energy[:, j0:j0 + 17]
        if exact_order:
            se = jnp.zeros_like(win_e[:, 0])
            for k in range(17):
                se = se + win_e[:, k]
        else:
            se = win_e.sum(axis=1)
        if sb < 13:
            mn = win_f.min(axis=1)
            snr = 4.342944819 * jnp.log(se / (mn * 17.0))
        else:
            if exact_order:
                sf = jnp.zeros_like(win_f[:, 0])
                for k in range(17):
                    sf = sf + win_f[:, k]
            else:
                sf = win_f.sum(axis=1)
            snr = 4.342944819 * jnp.log(se / sf)
        snr_sb.append(snr)
    smr = jnp.stack(snr_sb, axis=1)  # [B, 32]
    return smr, r_new, phi


def psycho_2(frame, state, tabs, dtype=jnp.float64, exact_order=None):
    """frame: [B, 1152] raw sample-valued floats (psy model 2 windows the
    unscaled shorts, psycho_2.c:81-87); state from init_psy2_state.
    Returns (smr [B, 32], state')."""
    if exact_order is None:
        exact_order = jnp.dtype(dtype) == jnp.float64
    savebuf = state["savebuf"]
    r_m1, r_m2 = state["r_m1"], state["r_m2"]
    p_m1, p_m2 = state["p_m1"], state["p_m2"]
    smrs = []
    for g in range(2):
        savebuf = jnp.concatenate(
            [savebuf[:, 576:], frame[:, g * 576:(g + 1) * 576]], axis=1)
        smr_g, r_new, phi_new = _granule(savebuf, r_m1, r_m2, p_m1, p_m2,
                                         tabs, dtype, exact_order)
        r_m2, p_m2 = r_m1, p_m1
        r_m1, p_m1 = r_new, phi_new
        smrs.append(smr_g)
    smr = jnp.maximum(smrs[0], smrs[1])
    state = {"savebuf": savebuf, "r_m1": r_m1, "r_m2": r_m2,
             "p_m1": p_m1, "p_m2": p_m2}
    return smr, state
