"""Device-side DAB+ AAC-LC core: batched 960-MDCT, masking thresholds,
scalefactor estimation, rate loop, quantization and Huffman bit counting.

TPU-first re-design of the fdk-aac encoder path (libAACenc: psy_main.cpp
transform/band-energy/spreading, sf_estim.cpp scalefactor estimation,
qc_main.cpp rate loop, bit_cnt.cpp codebook costs).  The reference's
fixed-point iterative PE/threshold machinery is replaced by a vectorised
float pipeline: dense MDCT on the MXU, two-pass bark spreading, the 3GPP
26.403 scalefactor formula, and a parallel scan over global-gain offsets in
place of the sequential outer/inner quantizer loops.  Long windows only (block
switching lands with a later revision).

Every AU's exact bit count is computed on device so the host packer never
overruns the superframe budget.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as AT

NB = AT.MAX_SFB_LONG  # 49 padded bands
N_OFFSETS = 10        # rate-loop coarse offsets (scan)
SF_OFF_RANGE = 6      # coarse step = fine-pass width


def mdct_frame(prev, cur, basis, dtype):
    """prev/cur: [..., 960] float; basis [1920, 960].  Returns [..., 960]."""
    x = jnp.concatenate([prev, cur], axis=-1)
    return x @ basis


def band_energy(spec, band_m):
    """spec [..., 960], band_m [NB, 960] -> [..., NB]"""
    return (spec * spec) @ band_m.T


def spread_thresholds(en, pt, dtype):
    """Two-pass bark-domain spreading + ATH (psy_main.cpp:950-1014 analogue).

    en: [..., NB]; pt: dict with f_low/f_high/ath [NB].
    Returns thr [..., NB]."""
    base = en * jnp.asarray(10.0 ** (-2.9), dtype)  # 29 dB best-case SNR
    f_high = pt["f_high"]
    f_low = pt["f_low"]

    def up(carry, b):
        t = jnp.maximum(base[..., b], carry * f_high[b - 1])
        return t, t

    # spreading over 49 bands via small unrolled passes (cheap)
    thr = base
    for b in range(1, NB):
        thr = thr.at[..., b].set(jnp.maximum(thr[..., b], thr[..., b - 1] * f_high[b - 1]))
    for b in range(NB - 2, -1, -1):
        thr = thr.at[..., b].set(jnp.maximum(thr[..., b], thr[..., b + 1] * f_low[b]))
    thr = jnp.maximum(thr, pt["ath"])
    thr = jnp.minimum(thr, en + 1e30 * (en == 0))  # never demand below-signal noise
    return thr


def estimate_scf(spec_abs, thr, band_m, dtype):
    """3GPP 26.403 scalefactor estimation:
    scf = 8.8585*log10(6.75*thr / ffak) with ffak = sum sqrt|X| per band."""
    ffak = jnp.sqrt(spec_abs) @ band_m.T
    ok = ffak > 0
    scf = 8.8585 * (jnp.log10(jnp.maximum(6.75 * thr, 1e-30))
                    - jnp.log10(jnp.maximum(ffak, 1e-30)))
    scf = jnp.where(ok, scf, 0.0)
    return jnp.clip(jnp.floor(scf), -120, 120).astype(jnp.int32)


def quantize_spec(spec, gains, band_of_line, dtype):
    """q = sign(x) * int(|x|^(3/4) * 2^(-3/16 gain) + 0.4054), clipped to the
    book-11 escape limit."""
    g = gains[..., band_of_line]  # [..., 960]
    mag = jnp.power(jnp.abs(spec), 0.75) * jnp.exp2(-0.1875 * g.astype(dtype))
    q = jnp.floor(mag + 0.4054).astype(jnp.int32)
    q = jnp.clip(q, 0, 8191)
    return jnp.where(spec < 0, -q, q)


def _pair_len(tab, i, j):
    return jnp.asarray(tab)[i, j]


_LEN_QUAD = np.stack([AT.HUFF_LEN[b].reshape(-1) for b in (1, 2, 3, 4)])  # [4,81]
_LEN_PAIR56 = np.stack([AT.HUFF_LEN[5].reshape(-1), AT.HUFF_LEN[6].reshape(-1)])
_LEN_PAIR78 = np.stack([AT.HUFF_LEN[7].reshape(-1), AT.HUFF_LEN[8].reshape(-1)])
_LEN_PAIR910 = np.stack([AT.HUFF_LEN[9].reshape(-1), AT.HUFF_LEN[10].reshape(-1)])
_LEN_PAIR11 = AT.HUFF_LEN[11].reshape(-1)


def spectral_bits_and_books(q, band_of_line, max_sfb, dtype):
    """Per-band best codebook + bit cost (bit_cnt.cpp re-expression).

    q: [..., 960] int32.  Returns (books [..., NB], bits [..., NB]).
    Tables are flattened so every codebook costs a single small gather; band
    reductions ride the MXU as f32 matmuls.
    """
    aq = jnp.abs(q)
    oh = jax.nn.one_hot(band_of_line, NB, dtype=dtype)  # [960, NB]
    maxq = jnp.max(aq[..., None] * oh.astype(jnp.int32), axis=-2)  # [..., NB]

    shp = q.shape[:-1]
    q4 = q.reshape(*shp, 240, 4)
    aq4 = aq.reshape(*shp, 240, 4)
    q2 = q.reshape(*shp, 480, 2)
    aq2 = aq.reshape(*shp, 480, 2)
    oh4 = oh[::4]  # [240, NB] (quads never straddle bands: widths %4 == 0)
    oh2 = oh[::2]

    def bsum4(x):
        return jnp.round(x.astype(dtype) @ oh4).astype(jnp.int32)

    def bsum2(x):
        return jnp.round(x.astype(dtype) @ oh2).astype(jnp.int32)

    signs4 = jnp.sum(aq4 != 0, axis=-1)
    signs2 = jnp.sum(aq2 != 0, axis=-1)

    def lut(table_rows, idx, n):
        """table lookup as one-hot matmul (gathers are slow on TPU; a
        [.., n] one-hot x [n, k] table rides the MXU)."""
        ohx = jax.nn.one_hot(idx, n, dtype=dtype)
        t = jnp.asarray(np.stack(table_rows, -1), dtype)  # [n, k]
        out = ohx @ t
        return [jnp.round(out[..., j]).astype(jnp.int32)
                for j in range(len(table_rows))]

    c1 = jnp.clip(q4 + 1, 0, 2)
    i1 = ((c1[..., 0] * 3 + c1[..., 1]) * 3 + c1[..., 2]) * 3 + c1[..., 3]
    c3 = jnp.clip(aq4, 0, 2)
    i3 = ((c3[..., 0] * 3 + c3[..., 1]) * 3 + c3[..., 2]) * 3 + c3[..., 3]
    l1, l2 = lut([_LEN_QUAD[0], _LEN_QUAD[1]], i1, 81)
    l3, l4 = lut([_LEN_QUAD[2], _LEN_QUAD[3]], i3, 81)
    l3, l4 = l3 + signs4, l4 + signs4

    c5 = jnp.clip(q2 + 4, 0, 8)
    i5 = c5[..., 0] * 9 + c5[..., 1]
    l5, l6 = lut([_LEN_PAIR56[0], _LEN_PAIR56[1]], i5, 81)
    c7 = jnp.clip(aq2, 0, 7)
    i7 = c7[..., 0] * 8 + c7[..., 1]
    l7, l8 = lut([_LEN_PAIR78[0], _LEN_PAIR78[1]], i7, 64)
    l7, l8 = l7 + signs2, l8 + signs2
    c9 = jnp.clip(aq2, 0, 12)
    i9 = c9[..., 0] * 13 + c9[..., 1]
    l9, l10 = lut([_LEN_PAIR910[0], _LEN_PAIR910[1]], i9, 169)
    l9, l10 = l9 + signs2, l10 + signs2
    c11 = jnp.clip(aq2, 0, 16)
    i11 = c11[..., 0] * 17 + c11[..., 1]
    esc = jnp.where(aq2 >= 16,
                    2 * jnp.maximum(jnp.floor(jnp.log2(jnp.maximum(aq2, 16).astype(dtype))), 4).astype(jnp.int32) - 3,
                    0).sum(-1)
    (l11,) = lut([_LEN_PAIR11], i11, 289)
    l11 = l11 + signs2 + esc

    bits = jnp.stack([
        jnp.zeros_like(bsum4(l1)),            # book 0
        bsum4(l1), bsum4(l2), bsum4(l3), bsum4(l4),
        bsum2(l5), bsum2(l6), bsum2(l7), bsum2(l8),
        bsum2(l9), bsum2(l10), bsum2(l11),
    ], axis=-1)  # [..., NB, 12]

    lav = jnp.asarray([0, 1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 8191], jnp.int32)
    ok = maxq[..., None] <= lav
    ok = ok.at[..., 0].set(maxq == 0)
    bandsel = jnp.arange(NB) < max_sfb[..., None]
    big = jnp.asarray(1 << 20, jnp.int32)
    cost = jnp.where(ok, bits, big)
    books = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    bbits = jnp.min(cost, axis=-1)
    books = jnp.where(bandsel, books, 0)
    bbits = jnp.where(bandsel, bbits, 0)
    return books, bbits


def side_info_bits(books, gains, max_sfb, dtype):
    """Section + scalefactor-dpcm + fixed ICS bits for one channel's ICS."""
    nb = books.shape[-1]
    bandsel = jnp.arange(nb) < max_sfb[..., None]
    books_m = jnp.where(bandsel, books, -1)
    # sections: runs of equal codebook within [0, max_sfb)
    prev = jnp.concatenate([jnp.full(books_m.shape[:-1] + (1,), -2, books_m.dtype),
                            books_m[..., :-1]], axis=-1)
    new_sect = (books_m != prev) & bandsel
    n_sect = new_sect.sum(-1)
    sect_bits = n_sect * (4 + 5)  # runs < 31 bands (max_sfb <= 49 -> may need escape)
    # runs >= 31 need one extra 5-bit escape; with <=49 bands at most one run
    # can exceed 31: count bands per run conservatively via total:
    # exact: a run of length L costs 5*(L//31) extra
    run_id = jnp.cumsum(new_sect, axis=-1)
    # compute run lengths via segment counts
    max_runs = nb
    run_oh = jax.nn.one_hot(jnp.where(bandsel, run_id, 0), max_runs + 1, dtype=jnp.int32)
    run_len = run_oh.sum(-2)[..., 1:]
    sect_bits = sect_bits + 5 * (run_len // 31).sum(-1)

    # scalefactor dpcm over non-zero bands
    nz = (books_m > 0)
    # previous non-zero band's gain
    idx = jnp.arange(nb)
    gsel = jnp.where(nz, gains, 0)
    # sequential dpcm via cumulative trick: gather gains of nz bands in order
    # cost = sum over consecutive nz pairs of lenscf[d+60]; first nz band vs
    # itself (global_gain) = lenscf[60]
    lastnz_idx = jnp.where(nz, idx, -1)
    prev_nz = jax.lax.associative_scan(jnp.maximum, lastnz_idx, axis=-1)
    prev_nz = jnp.concatenate([jnp.full(prev_nz.shape[:-1] + (1,), -1, prev_nz.dtype),
                               prev_nz[..., :-1]], axis=-1)
    g_prev = jnp.take_along_axis(gains, jnp.maximum(prev_nz, 0), axis=-1)
    delta = jnp.clip(gains - g_prev, -60, 60)
    has_prev = prev_nz >= 0
    lens = jnp.asarray(AT.HUFF_LEN_SCF)[delta + 60]
    scf_bits = jnp.where(nz & has_prev, lens, 0).sum(-1)
    scf_bits = scf_bits + jnp.where(nz.any(-1), jnp.asarray(AT.HUFF_LEN_SCF)[60], 0)

    # global_gain(8) + ics_info(11) is counted by the caller (shared for CPE)
    fixed = 8 + 3  # global_gain + pulse/tns/gain_control flags
    return sect_bits + scf_bits + fixed


def ms_transform(spec, band_m, bol, max_sfb, dtype):
    """Per-band mid/side decision + transform (ms_stereo.cpp analogue).

    spec: [S, 2, 960] -> (spec', ms_used [S, NB])."""
    m = 0.5 * (spec[:, 0] + spec[:, 1])
    s = 0.5 * (spec[:, 0] - spec[:, 1])
    en_lr = band_energy(spec[:, 0], band_m) + band_energy(spec[:, 1], band_m)
    en_ms = band_energy(m, band_m) + band_energy(s, band_m)
    use = (en_ms < 0.8 * en_lr) & (jnp.arange(NB) < max_sfb[:, None])
    use_l = use[..., bol]  # [S, 960]
    out = jnp.stack([jnp.where(use_l, m, spec[:, 0]),
                     jnp.where(use_l, s, spec[:, 1])], axis=1)
    return out, use


def encode_au(spec, pt, band_m, bol, max_sfb, budget_bits, n_ch, dtype):
    """Rate-controlled quantization of one AU for all streams.

    spec: [S, ch, 960]; budget_bits: [S].
    Returns dict(q [S,ch,960], gains [S,ch,NB], books [S,ch,NB], bits [S],
    ms_used [S, NB])."""
    ms_used = jnp.zeros(spec.shape[:1] + (NB,), bool)
    if spec.shape[1] == 2:
        spec, ms_used = ms_transform(spec, band_m, bol, max_sfb, dtype)
    en = band_energy(spec, band_m)
    thr = spread_thresholds(en, pt, dtype)
    scf0 = estimate_scf(jnp.abs(spec), thr, band_m, dtype)

    ics_fixed = 11  # ics_info bits (shared when CPE common_window)
    # CPE: +1 common_window, +2 ms_mask_present, +max_sfb ms_used bits
    elem_fixed = jnp.where(n_ch == 2,
                           3 + 4 + 1 + 2 + ics_fixed + max_sfb,
                           3 + 4 + ics_fixed)

    # rate-pressure weighting: weak bands lose precision faster than dominant
    # ones (the effect of adj_thr.cpp's avoid-hole logic, re-expressed)
    nlines = jnp.maximum(band_m.sum(-1), 1.0)
    line_db = 10.0 * jnp.log10(jnp.maximum(en / nlines, 1e-10))
    peak_db = line_db.max(-1, keepdims=True)
    offw = 0.35 + 0.65 * jnp.clip((peak_db - line_db) / 18.0, 0.0, 2.5)  # [S,ch,NB]

    # |x|^(3/4) computed once; the rate loop only rescales by 2^(-3/16 gain)
    mag075 = jnp.power(jnp.abs(spec), 0.75)
    neg = spec < 0

    def try_offset(o):
        o = jnp.asarray(o)
        if o.ndim == 1:  # per-stream offsets in the fine pass
            o = o[:, None, None]
        gains = jnp.clip(scf0 + jnp.floor(o * offw).astype(jnp.int32), -100, 155)
        # clamp gains into a window of the per-channel max so dpcm stays legal
        gmax = gains.max(-1, keepdims=True)
        gains = jnp.clip(gains, gmax - 60, gmax)
        scale = jnp.exp2(-0.1875 * gains.astype(dtype))[..., bol]
        q = jnp.clip(jnp.floor(mag075 * scale + 0.4054).astype(jnp.int32), 0, 8191)
        q = jnp.where(neg, -q, q)
        books, bbits = spectral_bits_and_books(q, bol, max_sfb[:, None], dtype)
        side = side_info_bits(books, gains, max_sfb[:, None], dtype)
        ch_bits = (bbits.sum(-1) + side)  # [S, ch]
        total = ch_bits.sum(-1) + elem_fixed + 3  # + ID_END
        total = total + 7  # byte-align worst case
        return total, (q, gains, books)

    # coarse pass over wide offsets, then a fine pass around the winner
    def scan_coarse(_, o):
        t, _ = try_offset(o)
        return None, t

    coarse = jnp.arange(N_OFFSETS) * SF_OFF_RANGE - SF_OFF_RANGE
    _, totals_c = jax.lax.scan(scan_coarse, None, coarse)
    totals_c = jnp.moveaxis(totals_c, 0, -1)
    fits_c = totals_c <= budget_bits[:, None]
    ci = jnp.where(fits_c.any(-1), jnp.argmax(fits_c, -1), N_OFFSETS - 1)
    o_hi = coarse[ci]  # smallest coarse offset that fits

    def scan_fine(_, d):
        o = o_hi - d  # try finer (lower) offsets below the coarse winner
        t, p = try_offset(o)
        return None, (t, *p)

    _, (totals, qs, gainss, bookss) = jax.lax.scan(
        scan_fine, None, jnp.arange(SF_OFF_RANGE)[::-1])  # d: 3,2,1,0
    totals = jnp.moveaxis(totals, 0, -1)  # [S, SF_OFF_RANGE], offsets ascending
    fits = totals <= budget_bits[:, None]
    choice = jnp.where(fits.any(-1), jnp.argmax(fits, -1), SF_OFF_RANGE - 1)

    def pick(stacked):
        return jnp.take_along_axis(
            stacked, choice.reshape((1, -1) + (1,) * (stacked.ndim - 2)), 0)[0]

    q = pick(qs)
    gains = pick(gainss)
    books = pick(bookss)
    bits = jnp.take_along_axis(totals, choice[:, None], 1)[:, 0]
    return dict(q=q, gains=gains, books=books, bits=bits, thr=thr, en=en,
                ms_used=ms_used)
