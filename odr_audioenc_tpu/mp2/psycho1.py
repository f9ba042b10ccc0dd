"""Batched ISO psychoacoustic model 1 (the toolame default, DFLT_PSY=1).

Re-expression of libtoolame-dab/psycho_1.c for stream-batched execution.  The
reference walks mutable linked lists over the 513-bin spectrum; here the same
sequential semantics are reproduced with masked `lax.scan`s over the bin axis,
batched over [B] = streams x channels.  The f64 CPU path reproduces the
reference bit-for-bit up to FFT reduction order (the Mayer FHT is replaced by
an rFFT computing the identical power spectrum; differences are ~1 ulp and only
observable through the 0.1 dB add_db table quantisation, i.e. with ~1e-13
probability per lookup).

Sequence (psycho_1.c:22-87):
  hann window + FFT + power spectrum + per-subband "spike" levels
  tonal labeling (local maxima, run check, neighbor absorption)   :267-340
  noise labeling (per critical band geometric-mean centre)        :350-400
  subsampling (drop below-ATH maskers, 0.5-bark merge)            :409-470
  thresholds per freq line (masking functions + add_db)           :480-532
  minimum mask per subband -> SMR                                 :541-581
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T

LAST = -1
DBMIN = T.DBMIN
NBINS = 512
PAD = 12  # padding for windowed neighbor access


def _add_db(a, b, dbtab):
    """Order-sensitive dB-domain addition via the reference's 0.1dB lookup
    table (psycho_1.c:180-205)."""
    fdiff = 10.0 * (a - b)
    idiff = jnp.trunc(fdiff).astype(jnp.int32)
    idx = jnp.clip(jnp.abs(idiff), 0, 999)
    tab = dbtab[idx]
    out = jnp.where(idiff >= 0, a + tab, b + tab)
    out = jnp.where(fdiff > 990.0, a, out)
    out = jnp.where(fdiff < -990.0, b, out)
    return out


_DFT_BASIS = None


def _dft_basis(dtype):
    """[1024, 1024] rDFT basis: columns 0..511 = cos(2pi k n/N), columns
    512..1023 = -sin(2pi k n/N) for bins k = 0..511."""
    global _DFT_BASIS
    if _DFT_BASIS is None:
        n = np.arange(1024)[:, None]
        k = np.arange(512)[None, :]
        ang = 2.0 * np.pi * n * k / 1024.0
        _DFT_BASIS = np.concatenate([np.cos(ang), -np.sin(ang)],
                                    axis=1).astype(np.float32)
    return jnp.asarray(_DFT_BASIS, dtype)


def power_spectrum(samples, dtype):
    """samples: [B, 1024] already scaled to +-1.  Returns (power_db [B,512],
    energy [B,512], spike [B,32]).  (psycho_1_hann_fft_pickmax, :215-258)"""
    w = jnp.asarray(T.PSY1_WINDOW, dtype)
    xr = samples * w
    if dtype == jnp.float64:
        spec = jnp.fft.rfft(xr.astype(jnp.float64))
        energy_full = (spec.real**2 + spec.imag**2)  # [B, 513]
    else:
        # f32 TPU path: the 1024-point rDFT as one [1024, 1024] matmul
        # (cos||sin basis for bins 0..511) - the MXU beats the XLA fft
        # lowering ~3x at B=4096 and fuses with the window product
        basis = _dft_basis(dtype)
        ri = xr @ basis                               # [B, 1024]
        energy_full = ri[:, :512] ** 2 + ri[:, 512:] ** 2
    # reference: energy[i] = (a^2+b^2)/2 with a,b the FHT pair; for a real
    # signal that equals |X_k|^2 exactly for 0<i<512, and X_0^2 at 0.
    energy = energy_full[:, :NBINS].astype(dtype)
    energy = energy.at[:, 1:].multiply(1.0)  # already |X|^2
    power = jnp.where(energy < 1e-20, DBMIN + T.POWERNORM,
                      10.0 * jnp.log10(jnp.maximum(energy, 1e-300)) + T.POWERNORM)
    # spike: sequential sum of CF*energy within each 16-bin group, seeded DBM
    e16 = energy.reshape(-1, 32, 16)
    acc = jnp.full(e16.shape[:2], T.DBM, dtype)
    for j in range(16):
        acc = acc + T.CF * e16[:, :, j]
    spike = 10.0 * jnp.log10(acc)
    return power, energy, spike


def tonal_label(power, cand, dbtab, dtype):
    """Sequential tonal-component walk (psycho_1.c:267-340).

    power: [B, 512] dB spectrum; cand: [B, 512] bool pass-1 local-max flags.
    Returns (power', is_tone [B,512], member [B,512]) where `is_tone` is the
    final type==TONE flag and `member` the surviving tone-list membership.
    """
    B = power.shape[0]
    runs = jnp.asarray(T.TONAL_RUN)  # [512]

    ppad = jnp.full((B, NBINS + 2 * PAD), DBMIN, dtype).at[:, PAD:PAD + NBINS].set(power)
    # type: 0 false, 1 tone (pass-1 candidates start as TONE)
    tpad = jnp.zeros((B, NBINS + 2 * PAD), jnp.bool_).at[:, PAD:PAD + NBINS].set(cand)

    def body(carry, i):
        ppad, tpad, member, last, lbo = carry
        run = runs[i]
        zero = jnp.asarray(0, i.dtype)
        w = jax.lax.dynamic_slice(ppad, (zero, i), (B, 2 * PAD + 1))      # centered at i+PAD -> index PAD
        tw = jax.lax.dynamic_slice(tpad, (zero, i), (B, 2 * PAD + 1))
        is_cand = tw[:, PAD]
        maxv = w[:, PAD] - 7.0
        # violation: any j in 2..run with max < w[+-j]
        js = np.arange(2, PAD + 1)
        lhs = w[:, PAD - js]   # [B, 11]
        rhs = w[:, PAD + js]
        jmask = (js[None, :] <= run)
        viol = jnp.any(((maxv[:, None] < lhs) | (maxv[:, None] < rhs)) & jmask, axis=1)
        accept = is_cand & ~viol
        reject = is_cand & viol

        # boost: x = add_db(x, add_db(x[i-1], x[i+1]))  (1 < i < 500 always in range)
        boosted = _add_db(w[:, PAD], _add_db(w[:, PAD - 1], w[:, PAD + 1], dbtab), dbtab)
        # zero neighbors 1..run both sides
        js1 = np.arange(1, PAD + 1)
        zmask = jnp.zeros((2 * PAD + 1,), jnp.bool_)
        zmask = zmask.at[PAD - js1].set(True).at[PAD + js1].set(True)
        zmask = zmask & (jnp.abs(np.arange(-PAD, PAD + 1)) <= run)
        neww = jnp.where(accept[:, None] & zmask[None, :], DBMIN, w)
        neww = neww.at[:, PAD].set(jnp.where(accept, boosted, neww[:, PAD]))
        newt = jnp.where(accept[:, None] & zmask[None, :], False, tw)
        newt = newt.at[:, PAD].set(jnp.where(reject, False, newt[:, PAD]))
        ppad = jax.lax.dynamic_update_slice(ppad, neww, (zero, i))
        tpad = jax.lax.dynamic_update_slice(tpad, newt, (zero, i))

        # list surgery: if (i - last) <= run and last_but_one exists,
        # the previous accepted component is dropped from the list
        drop_last = accept & (last >= 0) & ((i - last) <= run) & (lbo >= 0)
        onehot_last = jax.nn.one_hot(jnp.where(last >= 0, last, 0), NBINS, dtype=jnp.bool_)
        member = member & ~(onehot_last & drop_last[:, None])
        member = member.at[:, i].max(accept) if False else jax.lax.dynamic_update_index_in_dim(
            member, member[:, i] | accept, i, axis=1)
        lbo = jnp.where(accept, last, lbo)
        last = jnp.where(accept, i, last)
        return (ppad, tpad, member, last, lbo), None

    member0 = jnp.zeros((B, NBINS), jnp.bool_)
    last0 = jnp.full((B,), -1, jnp.int32)
    carry = (ppad, tpad, member0, last0, last0)
    carry, _ = jax.lax.scan(body, carry, jnp.arange(2, NBINS - PAD, dtype=jnp.int32))
    ppad, tpad, member, _, _ = carry
    return ppad[:, PAD:PAD + NBINS], tpad[:, PAD:PAD + NBINS], member


def noise_label_scan(power, is_tone, energy, cbound, n_cband, dbtab, dtype):
    """Single forward scan over bins 0..511 implementing noise_label.

    State per B: current band index k, accumulators (sum_db, weight), plus the
    output arrays.  When the scan crosses into a new band it finalises the
    previous band (computes the centre, writes sum/type), then processes the
    current bin with the updated arrays - reproducing the reference's
    in-order mutation including centre spill into the next band.
    """
    B = power.shape[0]
    NB = cbound.shape[1]
    bins = jnp.arange(NBINS)

    # boundary structure: band k spans [cb[k], cb[k+1}) for k < n_cband-1.
    # first processed bin is cb[0] (bins below cb[0] are untouched).
    cb_full = jnp.concatenate([cbound, jnp.full((B, 1), NBINS + 1, cbound.dtype)], axis=1)

    def finalize(power, typ_tone, typ_noise, member, k, sum_db, weight, lo, hi):
        """Close band k: compute centre, write sum/type (vectorised over B)."""
        no_comp = sum_db <= DBMIN
        index = weight * jnp.power(jnp.asarray(10.0, dtype), -0.1 * sum_db)
        centre_n = lo + (index * (hi - lo).astype(dtype)).astype(jnp.int32)
        centre = jnp.where(no_comp, (hi + lo) // 2, centre_n)
        centre = jnp.clip(centre, 0, NBINS - 2)
        # Iwadare fix
        t_c = jnp.take_along_axis(typ_tone, centre[:, None], 1)[:, 0]
        t_c1 = jnp.take_along_axis(typ_tone, jnp.minimum(centre + 1, NBINS - 1)[:, None], 1)[:, 0]
        centre = jnp.where(t_c, jnp.where(t_c1, centre + 1, centre - 1), centre)
        centre = jnp.clip(centre, 0, NBINS - 1)
        oh = jax.nn.one_hot(centre, NBINS, dtype=jnp.bool_)
        power = jnp.where(oh, sum_db[:, None], power)
        typ_noise = typ_noise | oh
        member = member | oh
        return power, typ_noise, member

    typ_noise0 = jnp.zeros((B, NBINS), jnp.bool_)
    member0 = jnp.zeros((B, NBINS), jnp.bool_)

    def body(carry, b):
        power, typ_noise, member, k, sum_db, weight = carry
        lo = jnp.take_along_axis(cb_full, k[:, None], 1)[:, 0]
        hi = jnp.take_along_axis(cb_full, (k + 1)[:, None], 1)[:, 0]
        active = (k < n_cband - 1)
        # does bin b end band k? (b == hi and band active)
        ends = active & (b == hi)
        pf, tf, mf = finalize(power, is_tone, typ_noise, member, k, sum_db, weight, lo, hi)
        power = jnp.where(ends[:, None], pf, power)
        typ_noise = jnp.where(ends[:, None], tf, typ_noise)
        member = jnp.where(ends[:, None], mf, member)
        k = jnp.where(ends, k + 1, k)
        sum_db = jnp.where(ends, jnp.asarray(DBMIN, dtype), sum_db)
        weight = jnp.where(ends, jnp.asarray(0.0, dtype), weight)
        lo = jnp.take_along_axis(cb_full, k[:, None], 1)[:, 0]
        hi = jnp.take_along_axis(cb_full, (k + 1)[:, None], 1)[:, 0]
        active = (k < n_cband - 1)

        # accumulate bin b into band k if in range
        inband = active & (b >= lo) & (b < hi)
        x_b = power[:, b]
        e_b = energy[:, b]
        tone_b = is_tone[:, b]
        use = inband & ~tone_b & (x_b != DBMIN)
        new_sum = _add_db(x_b, sum_db, dbtab)
        new_w = weight + T.CF * e_b * (b - lo).astype(dtype) / (hi - lo).astype(dtype)
        sum_db = jnp.where(use, new_sum, sum_db)
        weight = jnp.where(use, new_w, weight)
        # reference zeroes consumed lines: power[j].x = DBMIN
        power = power.at[:, b].set(jnp.where(use, DBMIN, x_b))
        return (power, typ_noise, member, k, sum_db, weight), None

    carry = (power, typ_noise0, member0, jnp.zeros((B,), jnp.int32),
             jnp.full((B,), DBMIN, dtype), jnp.zeros((B,), dtype))
    carry, _ = jax.lax.scan(body, carry, jnp.arange(NBINS, dtype=jnp.int32))
    power, typ_noise, member, k, sum_db, weight = carry
    # close the final band for streams whose last boundary is beyond 511:
    # reference bands always end at cbound[n-1] <= 511, and the scan's `ends`
    # fires when b == hi; if hi == some bin <= 511 it fired already.  A band
    # ending exactly at 512 never exists (cbound values < 512).
    return power, typ_noise, member


def subsample(power, member, hear_of_bin):
    """Drop maskers below the absolute hearing threshold
    (psycho_1_subsampling first two loops, :409-442).  Order-independent."""
    drop = member & (power < hear_of_bin)
    power = jnp.where(drop, DBMIN, power)
    return power, member & ~drop


def bark_merge(power, member, bark_of_bin, dtype):
    """0.5-bark pairwise merge over the tone list (psycho_1.c:443-469).
    Sequential: keeps the larger of two tonal neighbours closer than 0.5 bark.
    """
    B = power.shape[0]

    def body(carry, b):
        power, member, anchor = carry
        m_b = member[:, b]
        x_b = power[:, b]
        bk_b = bark_of_bin[:, b]
        has_anchor = anchor >= 0
        a_idx = jnp.maximum(anchor, 0)[:, None]
        x_a = jnp.take_along_axis(power, a_idx, 1)[:, 0]
        bk_a = jnp.take_along_axis(bark_of_bin, a_idx, 1)[:, 0]
        close = m_b & has_anchor & ((bk_b - bk_a) < 0.5)
        drop_anchor = close & (x_b > x_a)
        drop_b = close & ~drop_anchor
        oh_a = jax.nn.one_hot(a_idx[:, 0], NBINS, dtype=jnp.bool_)
        member = member & ~(oh_a & drop_anchor[:, None])
        power = jnp.where(oh_a & drop_anchor[:, None], DBMIN, power)
        member = member.at[:, b].set(jnp.where(drop_b, False, member[:, b]))
        power = power.at[:, b].set(jnp.where(drop_b, DBMIN, x_b))
        # anchor advances to b unless b was dropped
        anchor = jnp.where(m_b & ~drop_b, b, anchor)
        return (power, member, anchor), None

    carry = (power, member, jnp.full((B,), -1, jnp.int32))
    (power, member, _), _ = jax.lax.scan(body, carry, jnp.arange(NBINS, dtype=jnp.int32))
    return power, member


def threshold(power, tone_member, noise_member, map_of_bin, bark_line, hear_line,
              sub_size, low_rate, dbtab, dtype):
    """Global masking threshold per frequency line (psycho_1.c:480-532).

    bark_line/hear_line: [B, NLINE] per-line bark/hear (index 0 is the dummy
    ltg[0]); sub_size: [B]; low_rate: [B] bool (per-channel bitrate < 96).
    Returns ltg_x [B, NLINE].
    """
    B, NLINE = bark_line.shape
    ks = jnp.arange(NLINE)
    kvalid = (ks[None, :] >= 1) & (ks[None, :] < sub_size[:, None])

    def masker_pass(ltg_x, member, c_bark, c_off):
        def body(ltg_x, t):
            m = member[:, t]
            x_t = power[:, t]
            bark_t = jnp.take_along_axis(bark_line, map_of_bin[:, t][:, None], 1)[:, 0]
            dz = bark_line - bark_t[:, None]          # [B, NLINE]
            in_range = (dz >= -3.0) & (dz < 8.0)
            tmps = -1.525 + c_bark * bark_t + c_off + x_t  # [B]
            xt = x_t[:, None]
            vf = jnp.where(dz < -1.0, 17.0 * (dz + 1.0) - (0.4 * xt + 6.0),
                 jnp.where(dz < 0.0, (0.4 * xt + 6.0) * dz,
                 jnp.where(dz < 1.0, -17.0 * dz,
                           -(dz - 1.0) * (17.0 - 0.15 * xt) - 17.0)))
            newv = _add_db(ltg_x, tmps[:, None] + vf, dbtab)
            upd = m[:, None] & in_range & kvalid
            return jnp.where(upd, newv, ltg_x), None

        ltg_x, _ = jax.lax.scan(body, ltg_x, jnp.arange(NBINS, dtype=jnp.int32))
        return ltg_x

    ltg_x = jnp.full((B, NLINE), DBMIN, dtype)
    ltg_x = masker_pass(ltg_x, tone_member, -0.275, -4.5)
    ltg_x = masker_pass(ltg_x, noise_member, -0.175, -0.5)
    base = jnp.where(low_rate[:, None], hear_line, hear_line - 12.0)
    ltg_x = jnp.where(kvalid, _add_db(base, ltg_x, dbtab), ltg_x)
    return ltg_x


def minimum_mask(ltg_x, line_sb, hear_line, sub_size, sblimit_max=32):
    """ltmin per subband with the reference's pointer-walk quirks
    (psycho_1.c:541-559).  line_sb: [B, NLINE] = line>>4 per entry (entry 0
    dummy; entries >= sub_size padded with a large value)."""
    B, NLINE = ltg_x.shape
    ls = jnp.arange(NLINE)[None, :]
    valid_line = (ls >= 1) & (ls < sub_size[:, None])
    sbl = jnp.where(valid_line, line_sb, 999)
    sbs = jnp.arange(sblimit_max)

    # j pointer at the start of subband i: 1 + #lines with sb < i
    cnt_lt = (sbl[:, :, None] < sbs[None, None, :]).sum(axis=1)  # [B, 32]
    j_i = 1 + cnt_lt
    tail = j_i >= (sub_size[:, None] - 1)

    # min of ltg_x over lines with sb == i
    match = sbl[:, :, None] == sbs[None, None, :]  # [B, NLINE, 32]
    big = jnp.asarray(jnp.inf, ltg_x.dtype)
    min_match = jnp.where(match, ltg_x[:, :, None], big).min(axis=1)
    has_match = match.any(axis=1)

    x_at_j = jnp.take_along_axis(ltg_x, jnp.clip(j_i, 0, NLINE - 1), 1)
    hear_last = jnp.take_along_axis(hear_line, (sub_size - 1)[:, None], 1)
    ltmin = jnp.where(tail, hear_last,
                      jnp.where(has_match, min_match, x_at_j))
    return ltmin  # [B, 32]


def smr_from(ltmin, spike, scale_max, dtype):
    """SMR per subband (psycho_1_smr, :568-581)."""
    sc = 20.0 * jnp.log10(scale_max * 32768.0) - 10.0
    return jnp.maximum(sc, spike) - ltmin


def psycho_1(samples, scale_max, psy_tabs, low_rate, dtype=jnp.float64):
    """Full model-1 SMR computation.

    samples:   [B, 1024] float in +-1 (the FFT window; see model.py for the
               1152/1408-ring alignment, psycho_1.c:57-75)
    scale_max: [B, 32] `multiple[min sf index]` per subband (find_sf_max)
    psy_tabs:  dict of per-B gathered tables (see make_psy1_tables)
    low_rate:  [B] bool, per-channel bitrate < 96 kbps
    Returns smr [B, 32].
    """
    dbtab = jnp.asarray(T.ADD_DB_TABLE, dtype)
    power, energy, spike = power_spectrum(samples, dtype)

    # pass 1: local maxima flags over bins 2..499 (psycho_1.c:274-284)
    prev = power[:, 1:-1] > power[:, :-2]
    nxt = power[:, 1:-1] >= power[:, 2:]
    cand = jnp.zeros_like(power, dtype=bool).at[:, 1:-1].set(prev & nxt)
    mask_rng = (jnp.arange(NBINS) >= 2) & (jnp.arange(NBINS) < NBINS - PAD)
    cand = cand & mask_rng

    power, is_tone, tone_m = tonal_label(power, cand, dbtab, dtype)
    power, _, noise_m = noise_label_scan(power, is_tone, energy,
                                         psy_tabs["cbound"], psy_tabs["n_cband"],
                                         dbtab, dtype)

    hear_of_bin = psy_tabs["hear_of_bin"]
    power, tone_m = subsample(power, tone_m, hear_of_bin)
    power, noise_m = subsample(power, noise_m, hear_of_bin)
    bark_of_bin = psy_tabs["bark_of_bin"]
    power, tone_m = bark_merge(power, tone_m, bark_of_bin, dtype)

    ltg_x = threshold(power, tone_m, noise_m, psy_tabs["map"],
                      psy_tabs["bark_line"], psy_tabs["hear_line"],
                      psy_tabs["sub_size"], low_rate, dbtab, dtype)
    ltmin = minimum_mask(ltg_x, psy_tabs["line_sb"], psy_tabs["hear_line"],
                         psy_tabs["sub_size"])
    return smr_from(ltmin, spike, scale_max, dtype)


def make_psy1_tables(rate_indices, dtype=np.float64):
    """Build the per-B gathered psy-1 tables.  rate_indices: [B] int in
    {0,1,2,4,5,6} (MPEG1: sfreq idx; MPEG2: sfreq idx + 4)."""
    NLINE = 133
    B = len(rate_indices)
    out = {
        "map": np.zeros((B, NBINS), np.int32),
        "bark_line": np.zeros((B, NLINE), dtype),
        "hear_line": np.zeros((B, NLINE), dtype),
        "line_sb": np.zeros((B, NLINE), np.int32),
        "sub_size": np.zeros((B,), np.int32),
        "cbound": np.zeros((B, 27), np.int32),
        "n_cband": np.zeros((B,), np.int32),
    }
    out["hear_of_bin"] = np.zeros((B, NBINS), dtype)
    out["bark_of_bin"] = np.zeros((B, NBINS), dtype)
    for b, ri in enumerate(rate_indices):
        ri = int(ri)
        sub_size = int(T.FREQ_ENTRIES[ri]) + 1
        out["sub_size"][b] = sub_size
        out["map"][b] = T.make_map(ri)
        out["bark_line"][b, 1:sub_size] = T.FREQ_BARK[ri][: sub_size - 1]
        out["hear_line"][b, 1:sub_size] = T.FREQ_HEAR[ri][: sub_size - 1]
        out["line_sb"][b, 1:sub_size] = T.FREQ_LINE[ri][: sub_size - 1] >> 4
        nc = int(T.CRIT_BAND_COUNT[ri])
        out["n_cband"][b] = nc
        out["cbound"][b, :nc] = T.CBOUND[ri][:nc]
        out["hear_of_bin"][b] = out["hear_line"][b][out["map"][b]]
        out["bark_of_bin"][b] = out["bark_line"][b][out["map"][b]]
    return out
