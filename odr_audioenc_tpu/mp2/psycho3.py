"""Batched psy model 3 (libtoolame-dab/psycho_3.c): the cleaner
reimplementation of ISO model 1, selectable via --dabpsy 3.

Structure per channel (psycho_3.c:71-127):
  hann+FFT power spectrum -> per-subband SPL -> tonal labeling (range-wise
  7dB-over-neighbours test with neighbour zeroing) -> per-critical-band noise
  grouping -> ATH decimation -> masking thresholds on a 136-line frequency
  subset -> min per subband -> SMR.

The tonal walk is the only sequential part (neighbour zeroing feeds later
candidates); it runs as a masked scan like psycho1's.  Everything else is
embarrassingly parallel (the critical bands are independent here - no centre
spill, no linked lists).
"""
import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from .psycho1 import _add_db, power_spectrum

HBLK = 513
NBINS = 513  # psy3 arrays span bins 0..512 (bin 512 is a real masker here)
PAD = 12
DBMIN = T.DBMIN
SUBSIZE = 136

# srange per bin (psycho_3_tonal_label ranges, :206-215)
_RUN3 = np.zeros(NBINS, np.int32)
_RUN3[2:63] = 2
_RUN3[63:127] = 3
_RUN3[127:255] = 6
_RUN3[255:500] = 12

# 136-line frequency subset (psycho_3_init, :494-513)
_SUBSET = []
_i = 1
while _i < 3 * 16 + 1:
    _SUBSET.append(_i)
    _i += 1
while _i < 6 * 16 + 1:
    _SUBSET.append(_i)
    _i += 2
while _i < 12 * 16 + 1:
    _SUBSET.append(_i)
    _i += 4
while _i < 32 * 16 + 1:
    _SUBSET.append(_i)
    _i += 8
FREQ_SUBSET = np.asarray(_SUBSET, np.int32)
assert len(FREQ_SUBSET) == SUBSIZE


def make_psy3_tables(sfreq_hz):
    """bark/ath per line + critical band boundaries (psycho_3_init)."""
    i = np.arange(HBLK).astype(np.float64)
    freq = i * sfreq_hz / 1024.0
    f = np.where(freq < -0.3, 3410.0, freq)
    f = np.clip(f / 1000.0, 0.01, 18.0)
    bark = 13.0 * np.arctan(0.76 * f) + 3.5 * np.arctan((f / 7.5) ** 2)
    # NB: the reference computes freq2bark on the raw freq (no clipping):
    fr = freq * 0.001
    bark = 13.0 * np.arctan(0.76 * fr) + 3.5 * np.arctan((fr / 7.5) ** 2)
    ath = (3.640 * np.power(f, -0.8)
           - 6.800 * np.exp(-0.6 * (f - 3.4) ** 2)
           + 6.000 * np.exp(-0.15 * (f - 8.7) ** 2)
           + 0.6e-3 * np.power(f, 4.0))
    cband = [1]
    cbase = 0
    for k in range(1, HBLK):
        if bark[k] - bark[cbase] > 1.0:
            cbase = k
            cband.append(k)
    cband.append(513)
    return dict(bark=bark, ath=ath, cbandindex=np.asarray(cband, np.int32))


def tonal_label3(power, dbtab, dtype):
    """Range-wise tonal labeling with neighbour zeroing (psycho_3.c:186-247).
    power: [B, 512].  Returns (power', xtm [B,512], tone mask)."""
    B = power.shape[0]
    runs = jnp.asarray(_RUN3)
    # maxima from the ORIGINAL spectrum (strict > both sides, :85-92)
    prev = power[:, 1:-1] > power[:, :-2]
    nxt = power[:, 1:-1] > power[:, 2:]
    cand = jnp.zeros_like(power, dtype=bool).at[:, 1:-1].set(prev & nxt)
    cand = cand & (runs > 0)

    ppad = jnp.full((B, NBINS + 2 * PAD), DBMIN, dtype).at[:, PAD:PAD + NBINS].set(power)
    # bin 0 is never written by the reference (uninitialised stack); the
    # neighbour test at k=2,j=-2 reads it.  Model it as 0.0 dB.
    ppad = ppad.at[:, PAD].set(0.0)

    def body(carry, k):
        ppad, xtm, tone = carry
        zero = jnp.asarray(0, k.dtype)
        w = jax.lax.dynamic_slice(ppad, (zero, k), (B, 2 * PAD + 1))
        run = runs[k]
        is_cand = cand[:, k]
        js = np.arange(2, PAD + 1)
        ok = jnp.ones((B,), bool)
        diffs_l = w[:, PAD] [:, None] - w[:, PAD - js]
        diffs_r = w[:, PAD] [:, None] - w[:, PAD + js]
        jm = js[None, :] <= run
        viol = (((diffs_l < 7.0) | (diffs_r < 7.0)) & jm).any(axis=1)
        accept = is_cand & ~viol
        x = _add_db(_add_db(w[:, PAD - 1], w[:, PAD], dbtab), w[:, PAD + 1], dbtab)
        xtm = xtm.at[:, k].set(jnp.where(accept, x, xtm[:, k]))
        tone = tone.at[:, k].set(accept | tone[:, k])
        # zero ALL lines within +-srange including itself (:240-242)
        off = np.arange(-PAD, PAD + 1)
        zmask = jnp.abs(off) <= run
        neww = jnp.where(accept[:, None] & zmask[None, :], DBMIN, w)
        ppad = jax.lax.dynamic_update_slice(ppad, neww, (zero, k))
        return (ppad, xtm, tone), None

    xtm0 = jnp.full((B, NBINS), DBMIN, dtype)
    tone0 = jnp.zeros((B, NBINS), bool)
    (ppad, xtm, tone), _ = jax.lax.scan(
        body, (ppad, xtm0, tone0), jnp.arange(2, 500, dtype=jnp.int32))
    power = ppad[:, PAD:PAD + NBINS].at[:, 0].set(power[:, 0])
    return power, xtm, tone


def noise_label3(power, energy, cbandindex, dtype):
    """Independent per-critical-band noise grouping (psycho_3.c:264-307)."""
    B = power.shape[0]
    bins = np.arange(NBINS)
    ncb = len(cbandindex) - 1
    xnm = jnp.full((B, NBINS), DBMIN, dtype)
    noise = jnp.zeros((B, NBINS), bool)
    dbtab = jnp.asarray(T.ADD_DB_TABLE, dtype)
    for c in range(ncb):
        lo, hi = int(cbandindex[c]), int(min(cbandindex[c + 1], NBINS))
        if lo >= NBINS:
            break
        seg_p = power[:, lo:hi]
        seg_e = energy[:, lo:hi]
        use = seg_p != DBMIN
        # sequential add_db over the band (order = ascending bins)
        s = jnp.full((B,), DBMIN, dtype)
        for j in range(hi - lo):
            s = jnp.where(use[:, j], _add_db(seg_p[:, j], s, dbtab), s)
        esum = (seg_e * use).sum(-1)
        cw = (seg_e * use * np.arange(hi - lo)).sum(-1)
        no_comp = s <= DBMIN
        centre = jnp.where(no_comp, (lo + min(int(cbandindex[c + 1]), 513)) // 2,
                           lo + (cw / jnp.maximum(esum, 1e-30)).astype(jnp.int32))
        centre = jnp.clip(centre, 0, NBINS - 1)
        oh = jax.nn.one_hot(centre, NBINS, dtype=jnp.bool_)
        xnm = jnp.where(oh, s[:, None], xnm)
        noise = noise | oh
    return xnm, noise


def psycho_3(samples, scale_max, p3, low_rate, dtype=jnp.float64):
    """samples: [B, 1024]; scale_max: [B, 32]; p3: tables dict (per batch,
    shared samplerate); low_rate: [B] bool.  Returns smr [B, 32]."""
    dbtab = jnp.asarray(T.ADD_DB_TABLE, dtype)
    # full 513-bin power spectrum (psycho_1_fft computes energy[512] too)
    win = jnp.asarray(T.PSY1_WINDOW, dtype)
    spec = jnp.fft.rfft((samples * win).astype(
        jnp.float64 if dtype == jnp.float64 else jnp.float32))
    energy = (spec.real ** 2 + spec.imag ** 2).astype(dtype)  # [B, 513]
    power = jnp.where(energy < 1e-20, DBMIN + T.POWERNORM,
                      10.0 * jnp.log10(jnp.maximum(energy, 1e-300)) + T.POWERNORM)
    power = power.at[:, 0].set(0.0)  # bin 0 "uninitialised" in the reference

    # SPL per subband (psycho_3_spl): bins 1..511 (bin 512's Xmax[32] write is
    # out of bounds in the reference and dropped here)
    xmax = jnp.max(power[:, :512].at[:, 0].set(DBMIN).reshape(-1, 32, 16), axis=-1)
    lsb = jnp.maximum(xmax, 20.0 * jnp.log10(scale_max * 32768.0) - 10.0)

    power, xtm, tone = tonal_label3(power, dbtab, dtype)
    xnm, noise = noise_label3(power, energy, p3["cbandindex"], dtype)

    # decimation vs ATH (psycho_3_decimation)
    ath = jnp.asarray(p3["ath"], dtype)
    drop_n = noise & (xnm < ath)
    noise = noise & ~drop_n
    xnm = jnp.where(drop_n, DBMIN, xnm)
    drop_t = tone & (xtm < ath)
    tone = tone & ~drop_t
    xtm = jnp.where(drop_t, DBMIN, xtm)

    # thresholds over the 136-line subset
    bark = jnp.asarray(p3["bark"], dtype)
    bark_sub = bark[FREQ_SUBSET]  # [136]
    B = power.shape[0]

    def masker_pass(member, xvals, c_bark, c_off):
        def body(lt, k):
            m = member[:, k]
            xk = xvals[:, k]
            dz = bark_sub[None, :] - bark[k]
            in_rng = (dz >= -3.0) & (dz < 8.0)
            av = -1.525 + c_bark * bark[k] + c_off + xk
            xkb = xk[:, None]
            vf = jnp.where(dz < -1.0, 17.0 * (dz + 1.0) - (0.4 * xkb + 6.0),
                 jnp.where(dz < 0.0, (0.4 * xkb + 6.0) * dz,
                 jnp.where(dz < 1.0, -17.0 * dz,
                           -(dz - 1.0) * (17.0 - 0.15 * xkb) - 17.0)))
            newv = _add_db(lt, av[:, None] + vf, dbtab)
            return jnp.where(m[:, None] & in_rng, newv, lt), None

        lt0 = jnp.full((B, SUBSIZE), DBMIN, dtype)
        lt, _ = jax.lax.scan(body, lt0, jnp.arange(1, HBLK, dtype=jnp.int32))
        return lt

    lttm = masker_pass(tone, xtm, -0.275, -4.5)
    ltnm = masker_pass(noise, xnm, -0.175, -0.5)
    ltg = _add_db(ltnm, lttm, dbtab)
    ath_sub = ath[FREQ_SUBSET]
    base = jnp.where(low_rate[:, None], ath_sub[None, :], ath_sub[None, :] - 12.0)
    ltg = _add_db(base, ltg, dbtab)

    # min per subband over the subset (psycho_3_minimummasking)
    sb_of = FREQ_SUBSET >> 4  # [136]
    oh = jax.nn.one_hot(sb_of, 32, dtype=jnp.bool_)  # [136, 32]
    big = jnp.asarray(999999.9, dtype)
    ltmin = jnp.min(jnp.where(oh[None], ltg[:, :, None], big), axis=1)
    return lsb - ltmin