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
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as AT

NB = AT.MAX_SFB_LONG  # 49 padded bands
MSNR_O = 10_000       # reduceMinSnr region DISABLED: unlike fdk (which only
                      # fires it when PE overshoots desired by >15%), our
                      # offset grid hits o>4 on ordinary AUs and the 1 dB-SNR
                      # top bands cost +2..5 dB corpus NMR (measured)
MSNR_RATE = 14.0      # the top sfbs to 1 dB SNR, one rank per step
MSNR_FAC = 0.8        # SnrLdFac: thr := 0.8*en ~ 1 dB SNR (adj_thr.cpp:124)
HOLE_O = 8            # rate-loop offset where allowMoreHoles band erasure
HOLE_RATE = 14.0      # priority ranks opened per offset step past HOLE_O
SPILL_O = 40          # rate-loop offset where uniform spill-degradation
                      # takes over from the capped threshold reduction
BISECT_STEPS = None   # profiling override for the rate-loop bisect depth
FRAC_BISECT_STEPS = 5  # fractional offset refinement (resolution 1/32 o
                       # ~ 0.17 scf - see the rate-loop comment)
REFINE_ROUNDS = int(os.environ.get('ODR_REFINE_ROUNDS', 4))     # afterburner refinement rounds (-A disables via
                      # encode_au(refine_rounds=0); AACENC_AFTERBURNER)
REFINE_BANDS = int(os.environ.get('ODR_REFINE_BANDS', 8))      # worst-NMR bands refined per round


def _mmdt():
    """Matmul dtype for the 0/1 one-hot reductions: bf16 rides the MXU on
    TPU; the CPU backend's DotThunk rejects standalone bf16 x bf16 -> f32
    dots (they surface un-fused inside lax.cond branches), so tests fall
    back to f32.  Values are small ints - exact either way."""
    import jax
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


TNS_MAX_ORDER = 12      # LC long windows (14496-3 table 4.156)
TNS_GAIN_THRESH = 1.437  # aacenc_tns.cpp:447 threshOn[HIFILT]=1437 (/1000)
TNS_LO_ORDER = 5         # aacenc_tns.cpp:451 tnsLimitOrder[LOFILT]=maxOrder-7
# 4-bit arcsine quantizer: the decoder (FDKaacDec_tnsCoeff4) reconstructs
# positive indices as sin(i/iqfac) with iqfac = 7.5/(pi/2) but NEGATIVE
# indices with iqfac_m = 8.5/(pi/2) (asymmetric per 14496-3); the encoder
# border table (FDKaacEnc_tnsCoeff4Borders) is nearest-neighbor in the
# matching regime
_TNS_IQFAC4 = (8.0 - 0.5) / (np.pi / 2.0)
_TNS_IQFAC4_M = (8.0 + 0.5) / (np.pi / 2.0)


def _acf_norm(x, lags):
    """Energy-normalized autocorrelation of the trailing axis: r[k] =
    sum x[i]x[i-k] / r0, zero when the segment is silent.  Returns
    [..., lags+1] with r[0] == 1 (or 0 for silence)."""
    L = x.shape[-1]
    r0 = (x * x).sum(-1)
    ok = r0 > 0
    inv = jnp.where(ok, 1.0 / jnp.maximum(r0, 1e-30), 0.0)
    rs = [jnp.where(ok, 1.0, 0.0)]
    for k in range(1, lags + 1):
        rs.append((x[..., k:] * x[..., :L - k]).sum(-1) * inv)
    return jnp.stack(rs, -1)


def _levinson(r, order, dtype):
    """Levinson-Durbin: autocorrelation [..., >=order+1] -> reflection
    coefficients [..., order] and prediction gain r0/err."""
    r0 = jnp.maximum(r[..., 0], 1e-30)
    a = jnp.zeros(r.shape[:-1] + (order + 1,), dtype).at[..., 0].set(1.0)
    err = r0
    ks = []
    for m in range(1, order + 1):
        acc = sum(a[..., i] * r[..., m - i] for i in range(m))
        k_m = -acc / jnp.maximum(err, 1e-30)
        k_m = jnp.clip(k_m, -0.999, 0.999)
        ks.append(k_m)
        if m > 1:
            flip = jnp.stack([a[..., m - i] for i in range(1, m)], -1)
            a = a.at[..., 1:m].set(a[..., 1:m] + k_m[..., None] * flip)
        a = a.at[..., m].set(k_m)
        err = err * (1.0 - k_m * k_m)
    return jnp.stack(ks, -1), r0 / jnp.maximum(err, 1e-30)


def _quant_stepup(ks, dtype, out_order=TNS_MAX_ORDER):
    """4-bit arcsine index quantization (decoder FDKaacDec_tnsCoeff4 is
    sin(idx/iqfac)) + step-up of the QUANTIZED reflection coefficients to
    direct form.  Returns (idx [..., out_order], order, sum_sqr,
    a_hat [..., out_order])."""
    max_order = ks.shape[-1]
    asn = jnp.arcsin(ks)
    idx = jnp.where(ks >= 0,
                    jnp.clip(jnp.round(asn * _TNS_IQFAC4), 0, 7),
                    jnp.clip(jnp.round(asn * _TNS_IQFAC4_M), -8, 0)) \
        .astype(jnp.int32)
    nz = idx != 0
    order = jnp.where(nz.any(-1),
                      max_order - jnp.argmax(nz[..., ::-1], -1), 0)
    sum_sqr = (idx * idx).sum(-1)
    idx = jnp.where(jnp.arange(max_order) < order[..., None], idx, 0)
    khat = jnp.where(idx >= 0,
                     jnp.sin(idx.astype(dtype) / _TNS_IQFAC4),
                     jnp.sin(idx.astype(dtype) / _TNS_IQFAC4_M))
    ah = jnp.zeros(ks.shape[:-1] + (max_order + 1,), dtype) \
        .at[..., 0].set(1.0)
    for m in range(1, max_order + 1):
        k_m = khat[..., m - 1]
        if m > 1:
            flip = jnp.stack([ah[..., m - i] for i in range(1, m)], -1)
            ah = ah.at[..., 1:m].set(ah[..., 1:m] + k_m[..., None] * flip)
        ah = ah.at[..., m].set(k_m)
    idx_o, ah_o = idx, ah[..., 1:]
    if max_order < out_order:
        pad = [(0, 0)] * (idx.ndim - 1) + [(0, out_order - max_order)]
        idx_o = jnp.pad(idx_o, pad)
        ah_o = jnp.pad(ah_o, pad)
    return idx_o, order.astype(jnp.int32), sum_sqr, ah_o


def tns_analysis_fdk(spec, lo_start, hi_start, stop, dtype):
    """fdk TnsDetect analogue (aacenc_tns.cpp:638-964, long windows).

    The decisive structural points, verified against the instrumented
    reference on transition AUs (tools/diag_lc_stages.py round-5 notes):
      * the autocorrelation is energy-normalized PER SEGMENT - the HI
        range [hi_start, stop) is split into three equal thirds, each
        normalized by its own energy and summed (MergedAutoCorrelation,
        :638-771).  An un-normalized single-range ACF fits only the
        loudest third and loses ~20 dB of realized prediction gain.
      * the LO range [lo_start, hi_start) gets its own order-5 filter
        (lag window gate 3*lag <= maxOrder+3 keeps 5 lags, :713-722).
      * if both filters are similar (sum |didx| < 2 over the first 5
        indices) they MERGE into one HI filter covering the whole range
        from lo_start (:926-952) - on transition AUs this is the filter
        that strips 15-25 dB of temporal envelope across ALL bands.
    fdk's Gauss lag window is ~1.0 at these orders (CalcGaussWindow with
    timeRes 0.046875) and is omitted.

    Returns dict with per-[..,] leaves: en, idx [..,12], order, merged,
    en_lo, idx_lo [..,12], order_lo, ah_hi [..,12], ah_lo [..,12],
    pred_gain."""
    third = (stop - hi_start) // 3
    segs = [(hi_start, hi_start + third), (hi_start + third,
            hi_start + 2 * third), (hi_start + 2 * third, stop)]
    r_hi = sum(_acf_norm(spec[..., a:b], TNS_MAX_ORDER) for a, b in segs)
    r_lo = _acf_norm(spec[..., lo_start:hi_start], TNS_LO_ORDER)

    ks_hi, pg_hi = _levinson(r_hi, TNS_MAX_ORDER, dtype)
    idx_hi, order_hi, ssq_hi, ah_hi = _quant_stepup(ks_hi, dtype)
    # ODR_TNS_GATE: quality-diagnostics override of the enable threshold
    # (read at trace time; production uses the fdk value)
    _gt = float(os.environ.get("ODR_TNS_GATE", "0")) or TNS_GAIN_THRESH
    en_hi = ((pg_hi > _gt)
             | (ssq_hi > TNS_MAX_ORDER // 2 + 2)) & (order_hi > 0)

    ks_lo, pg_lo = _levinson(r_lo, TNS_LO_ORDER, dtype)
    idx_lo, order_lo, ssq_lo, ah_lo = _quant_stepup(ks_lo, dtype)
    # "filter lower quarter if gain is high enough, but not if it's too
    # high" (aacenc_tns.cpp:920-925)
    lo_quality = (((pg_lo > 1.5) & (pg_lo < 16.0 * TNS_LO_ORDER))
                  | ((ssq_lo > 9) & (ssq_lo < 22 * TNS_LO_ORDER))) \
        & (order_lo > 0)
    if os.environ.get("ODR_TNS_NOLO"):     # diagnostics: disable LO/merge
        lo_quality = lo_quality & False
    en_lo = en_hi & lo_quality

    # merge when the two filters agree on the first LO-order indices
    dsum = jnp.abs(idx_hi[..., :TNS_LO_ORDER] - idx_lo[..., :TNS_LO_ORDER]) \
        .sum(-1)
    merged = en_lo & (dsum < 2)
    # merged order trim (aacenc_tns.cpp:940-952): from index 5 walk up
    # while |idx| <= 1, then back down to the last non-zero
    pos = jnp.arange(TNS_MAX_ORDER)
    big = (jnp.abs(idx_hi) > 1) & (pos >= TNS_LO_ORDER)
    first_big = jnp.where(big.any(-1), jnp.argmax(big, -1), order_hi)
    below = (idx_hi != 0) & (pos < first_big[..., None])
    last_nz = jnp.where(below.any(-1),
                        TNS_MAX_ORDER - 1 - jnp.argmax(below[..., ::-1], -1),
                        -1)
    order_trim = jnp.minimum(order_hi, last_nz + 1)
    order_hi = jnp.where(merged, jnp.maximum(order_trim, 0), order_hi)
    idx_hi = jnp.where(pos < order_hi[..., None], idx_hi, 0)
    en_lo = en_lo & ~merged
    return dict(en=en_hi, idx=idx_hi, order=order_hi, merged=merged,
                en_lo=en_lo, idx_lo=idx_lo, order_lo=order_lo,
                ah_hi=ah_hi, ah_lo=ah_lo, pred_gain=pg_hi)


def tns_sync(t):
    """Cross-channel HI-filter sync (FDKaacEnc_TnsSync, aacenc_tns.cpp:
    980-1051): when the two channels' quantized indices are similar
    (every |d| <= 1 and sum |d| <= 2), channel 1 adopts channel 0's
    whole TNS configuration.  t: dict from tns_analysis_fdk with leading
    dims [S, 2]."""
    d = jnp.abs(t["idx"][:, 0] - t["idx"][:, 1])
    do_sync = (t["en"][:, 0] | t["en"][:, 1]) \
        & (d.max(-1) <= 1) & (d.sum(-1) <= 2)

    def adopt(v):
        return jnp.concatenate(
            [v[:, :1], jnp.where(
                do_sync.reshape((-1,) + (1,) * (v.ndim - 1)),
                v[:, :1], v[:, 1:2])], axis=1)
    return {k: adopt(v) for k, v in t.items()}


def _fir_range(spec, a_hat, start, stop):
    """A(z) = 1 + sum a_k z^-k applied forward over [start, stop) with
    zero history (the decoder clears its lattice state,
    aacdec_tns.cpp:369).  Returns just the filtered segment."""
    x = spec[..., start:stop]
    y = x
    for k in range(1, TNS_MAX_ORDER + 1):
        xd = jnp.pad(x[..., :-k], [(0, 0)] * (x.ndim - 1) + [(k, 0)])
        y = y + a_hat[..., k - 1:k] * xd
    return y


def tns_filter_fdk(spec, t, lo_start, hi_start, stop):
    """Apply the TnsEncode filter layout (aacenc_tns.cpp:1070-1111): when
    merged, ONE HI filter covers [lo_start, stop); otherwise the HI filter
    covers [hi_start, stop) and the optional LO filter [lo_start,
    hi_start), each with zero history at its own start line."""
    y_m = _fir_range(spec, t["ah_hi"], lo_start, stop)
    y_h = _fir_range(spec, t["ah_hi"], hi_start, stop)
    y_l = _fir_range(spec, t["ah_lo"], lo_start, hi_start)
    en = t["en"][..., None]
    mg = t["merged"][..., None]
    lo = t["en_lo"][..., None]
    x_lo = spec[..., lo_start:hi_start]
    seg_lo = jnp.where(en & mg, y_m[..., :hi_start - lo_start],
                       jnp.where(en & lo, y_l, x_lo))
    x_hi = spec[..., hi_start:stop]
    seg_hi = jnp.where(en & mg, y_m[..., hi_start - lo_start:],
                       jnp.where(en, y_h, x_hi))
    return jnp.concatenate([spec[..., :lo_start], seg_lo, seg_hi,
                            spec[..., stop:]], axis=-1)


def mdct_frame(prev, cur, basis, dtype):
    """prev/cur: [..., 960] float; basis [1920, 960].  Returns [..., 960]."""
    x = jnp.concatenate([prev, cur], axis=-1)
    return x @ basis


def mdct_frame_switched(prev, cur, cos_basis, wvecs, short_basis, seq, dtype):
    """Window-switched MDCT (transform.cpp/mdct_block analogue, TPU layout).

    prev/cur: [S, ch, 960]; cos_basis: [1920, 960] unwindowed long basis;
    wvecs: [4, 1920] LONG/START/SHORT/STOP analysis windows; short_basis:
    [240, 120] windowed; seq: [S] window sequence of this AU.
    Long path: per-stream window vector x one shared basis matmul.
    Short path: 8 strided 240-frames x one [240,120] matmul, emitted
    window-major [8*120]; selected per stream."""
    from . import tables as AT
    x = jnp.concatenate([prev, cur], axis=-1)             # [S, ch, 1920]
    w = jnp.take(wvecs, seq, axis=0)[:, None, :]          # [S, 1, 1920]
    spec_long = (x * w) @ cos_basis
    frames = jnp.stack(
        [x[..., AT.SHORT_OFFSET + 120 * i: AT.SHORT_OFFSET + 120 * i + 240]
         for i in range(8)], axis=-2)                     # [S, ch, 8, 240]
    spec_short = (frames @ short_basis).reshape(spec_long.shape)
    is_short = (seq == 2)[:, None, None]
    return jnp.where(is_short, spec_short, spec_long)


def band_energy(spec, band_m):
    """spec [..., 960], band_m [NB, 960] -> [..., NB]"""
    return (spec * spec) @ band_m.T


class BandCtx:
    """Per-stream long/short band-domain dispatch.

    All band reductions/broadcasts compute both static variants (long sfb
    ladder and grouped short-block ladder over the window-major layout) and
    select per stream - the reductions are cheap bf16 MXU matmuls, and the
    select keeps every downstream [NB]-domain shape static."""

    def __init__(self, band_m, bol, short_ctx=None, is_short=None):
        self.band_m = band_m
        self.bol = bol
        self.oh_l = jax.nn.one_hot(bol, NB, dtype=_mmdt())
        self.short = short_ctx is not None and is_short is not None
        if self.short:
            self.band_m_s = short_ctx["band_m"]
            self.bol_s = short_ctx["bol"]
            self.oh_s = jax.nn.one_hot(self.bol_s, NB, dtype=_mmdt())
            self.t = is_short  # [S] bool

    def _sel(self, long_v, short_fn):
        if not self.short:
            return long_v
        sv = short_fn()
        tb = self.t.reshape(self.t.shape + (1,) * (long_v.ndim - 1))
        return jnp.where(tb, sv, long_v)

    def energy(self, spec):
        return self._sel(band_energy(spec, self.band_m),
                         lambda: band_energy(spec, self.band_m_s))

    def reduce_f(self, x):
        """float band sums: x [..., 960] -> [..., NB]."""
        return self._sel(x @ self.band_m.T, lambda: x @ self.band_m_s.T)

    def bsum(self, x, stride):
        """int band sums of per-codeword costs: x [..., 960//stride]."""
        def mm(oh):
            return jnp.round(jnp.matmul(x.astype(_mmdt()), oh[::stride],
                                        preferred_element_type=jnp.float32))
        out = self._sel(mm(self.oh_l), lambda: mm(self.oh_s))
        return out.astype(jnp.int32)

    def count(self, ind):
        """violation counts: ind [..., 960, K] 0/1 bf16 -> [..., NB, K]."""
        def mm(oh):
            return jnp.einsum("...nc,nb->...bc", ind, oh,
                              preferred_element_type=jnp.float32)
        return self._sel(mm(self.oh_l), lambda: mm(self.oh_s))

    def count4(self, ind):
        """like count, over 4-line groups: ind [..., 240, K] (groups never
        straddle bands, so the quad-max fold is exact).  f32 operands: the
        CPU backend's dot thunk rejects bf16 x bf16 -> f32 on the strided
        one-hot slice, and the tensors are 4x smaller than count's anyway."""
        ind = ind.astype(jnp.float32)

        def mm(oh):
            return jnp.einsum("...nc,nb->...bc", ind,
                              oh[::4].astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        return self._sel(mm(self.oh_l), lambda: mm(self.oh_s))

    def to_lines(self, band_vals):
        """band_vals [..., NB] -> [..., 960] via band_of_line.  Expressed
        as a matmul with the 0/1 band matrix (exact: exactly one term per
        line) - the indexed gather costs ~1 ms/call on TPU."""
        if band_vals.dtype == jnp.bool_:
            out = self._sel(
                band_vals.astype(jnp.float32) @ self.band_m.astype(jnp.float32),
                lambda: band_vals.astype(jnp.float32)
                @ self.band_m_s.astype(jnp.float32))
            return out > 0.5
        return self._sel(band_vals @ self.band_m.astype(band_vals.dtype),
                         lambda: band_vals @ self.band_m_s.astype(band_vals.dtype))


def spread_thresholds(en, pt, dtype, clamp_en=None):
    """Two-pass bark-domain spreading + ATH (psy_main.cpp:950-1014 analogue).

    en: [..., NB]; pt: dict with f_low/f_high/ath/pcm_floor, each [NB] or
    broadcastable [..., NB] (per-stream selected for long/short ladders).
    clamp_en: optional [..., NB] - when given, thresholds are clamped to
    these energies (the legacy non-fdk behavior; fdk never clamps thr to
    the coded spectrum's energy, and the TNS threshold elevation depends
    on NOT clamping - see encode_au).  Returns thr [..., NB]."""
    # C_RATIO, -29 dB (psy_main.cpp:703).  The reference also clips the
    # threshold at clipEnergy (:945) - a fixed-point overflow guard, NOT
    # psychoacoustics; in float it binds on loud tones and measurably
    # starves the rest of the budget (96k corpus NMR +1.2 dB), so no clip.
    base = en * jnp.asarray(10.0 ** (-2.9), dtype)
    f_high = jnp.broadcast_to(pt["f_high"], en.shape)
    f_low = jnp.broadcast_to(pt["f_low"], en.shape)

    # spreading over 49 bands via small unrolled passes (cheap)
    thr = base
    for b in range(1, NB):
        thr = thr.at[..., b].set(jnp.maximum(thr[..., b], thr[..., b - 1] * f_high[..., b - 1]))
    for b in range(NB - 2, -1, -1):
        thr = thr.at[..., b].set(jnp.maximum(thr[..., b], thr[..., b + 1] * f_low[..., b]))
    # absolute floor: the hearing curve (the reference's PCM-quant floor
    # analogue, psy_main.cpp:952-970)
    thr = jnp.maximum(thr, pt["ath"])
    if clamp_en is not None:
        thr = jnp.minimum(thr, clamp_en + 1e30 * (clamp_en == 0))
    return thr


def spread_energy(en, f_low, f_high):
    """Max-spreading of band ENERGIES with the SprEn slopes (avoid-hole
    detection input, FDKaacEnc_SpreadingMax on sfbSpreadEnergy)."""
    s = en
    for b in range(1, NB):
        s = s.at[..., b].set(jnp.maximum(s[..., b],
                                         s[..., b - 1] * f_high[..., b - 1]))
    for b in range(NB - 2, -1, -1):
        s = s.at[..., b].set(jnp.maximum(s[..., b],
                                         s[..., b + 1] * f_low[..., b]))
    return s


def adapt_min_snr(minsnr, en, bandsel, dtype):
    """Relax minSnr for bands far below the channel's average energy
    (FDKaacEnc_adaptMinSnr, adj_thr.cpp:465-556): for avgEn/en > 10,
    minSnr^expo with expo from 1.0 down to 0.25, capped at 0.8."""
    nb_act = jnp.maximum(bandsel.sum(-1, keepdims=True), 1)
    avg_en = (en * bandsel).sum(-1, keepdims=True) / nb_act.astype(dtype)
    r = jnp.log2(jnp.maximum(avg_en, 1e-30)) - jnp.log2(jnp.maximum(en, 1e-30))
    expo = jnp.maximum(1.375 - 0.375 * 0.30103 * r, 0.25)
    red = jnp.minimum(jnp.power(jnp.maximum(minsnr, 1e-30), expo),
                      jnp.asarray(0.8, dtype))
    return jnp.where(r > np.log2(10.0), red, minsnr)


def modify_min_snr(minsnr, en, bandsel, grp_start, grp_end, is_short_b,
                   dtype):
    """Tighten minSnr on local spectral peaks, relax it in valleys
    (FDKaacEnc_initAvoidHoleFlag's modifyMinSnr part, adj_thr.cpp:569-640).

    grp_start/grp_end: [.., NB] bool - spectral-neighbor access never
    crosses a short-block group boundary."""
    en_m1 = jnp.concatenate([en[..., :1], en[..., :-1]], -1)
    en_p1 = jnp.concatenate([en[..., 1:], en[..., -1:]], -1)
    # edge replication at group boundaries / ladder ends
    last_act = grp_end | ~jnp.concatenate(
        [bandsel[..., 1:], jnp.zeros_like(bandsel[..., :1])], -1)
    en_m1 = jnp.where(grp_start, en, en_m1)
    en_p1 = jnp.where(last_act, en, en_p1)
    avg = 0.5 * (en_m1 + en_p1)
    en_s = jnp.maximum(en, 1e-30)
    # peak: demand down to -5 dB (long) / -3 dB (short)
    floor_pk = jnp.where(is_short_b, jnp.asarray(0.5, dtype),
                         jnp.asarray(0.316, dtype))
    tmp_pk = jnp.maximum(0.8 * avg / en_s, floor_pk)
    minsnr = jnp.where((en > avg) & bandsel,
                       jnp.minimum(minsnr, tmp_pk), minsnr)
    # valley: relax by up to x3.16, capped at 0.8
    tmp_vl = jnp.minimum(jnp.minimum(jnp.asarray(0.8, dtype),
                                     avg / (2.0 * en_s) * minsnr),
                         minsnr * 3.16)
    valley = (2.0 * en < avg) & (en > 0) & bandsel
    return jnp.where(valley, tmp_vl, minsnr)


def ms_adapt_min_snr(minsnr, en, spr_en, ms_used, dtype):
    """Stereo M/S minSnr + spread-energy coupling
    (FDKaacEnc_initAvoidHoleFlag, adj_thr.cpp:642-694).
    minsnr/en/spr_en: [S, 2, NB]; ms_used: [S, NB]."""
    en_m, en_s = en[:, 0], en[:, 1]
    max_en = jnp.maximum(en_m, en_s)
    max_thr = 0.25 * max_en * minsnr[:, 0]
    out = []
    for c, en_c in ((0, en_m), (1, en_s)):
        cand = jnp.where(en_c > 0, max_thr / jnp.maximum(en_c, 1e-30), 0.0)
        snr = jnp.maximum(minsnr[:, c], cand)
        snr = jnp.where(snr <= 1.0, jnp.minimum(snr, 0.8), snr)
        out.append(jnp.where(ms_used, snr, minsnr[:, c]))
    minsnr = jnp.stack(out, axis=1)
    spr_s = jnp.where(ms_used & (en_m > spr_en[:, 0]), 0.9 * en_s,
                      spr_en[:, 1])
    spr_m = jnp.where(ms_used & (en_s > spr_s), 0.9 * en_m, spr_en[:, 0])
    return minsnr, jnp.stack([spr_m, spr_s], axis=1)


def estimate_scf(spec_abs, thr, bctx, dtype):
    """3GPP 26.403 scalefactor estimation:
    scf = 8.8585*log10(6.75*thr / ffak) with ffak = sum sqrt|X| per band."""
    ffak = bctx.reduce_f(jnp.sqrt(spec_abs))
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


def _fold17(table, lim):
    """Fold a (lim+1)^2 pair length table into 17x17 over book-11's clipped
    index domain (entries past lim are unreachable when the book is valid,
    so their value is free)."""
    t = np.asarray(table).reshape(lim + 1, lim + 1)
    a = np.minimum(np.arange(17), lim)
    return t[np.ix_(a, a)].reshape(-1)


_FOLDED_PAIR = [_fold17(_LEN_PAIR78[0], 7), _fold17(_LEN_PAIR78[1], 7),
                _fold17(_LEN_PAIR910[0], 12), _fold17(_LEN_PAIR910[1], 12),
                _LEN_PAIR11]


def _folded_pair_tables():
    return _FOLDED_PAIR


def spectral_bits_and_books(q, bctx, bandsel, dtype, return_cost=False,
                            fast=False):
    """Per-band best codebook + bit cost (bit_cnt.cpp re-expression).

    q: [..., 960] int32; bctx: BandCtx; bandsel: [..., NB] valid-band mask.
    Returns (books [..., NB], bits [..., NB]).
    Tables are flattened so every codebook costs a single small gather; band
    reductions ride the MXU as f32 matmuls.

    fast=True counts only the odd codebooks {1,3,5,7,9,11} - a tight upper
    bound (the even books are alternate tables over the same magnitude
    ranges) used by the rate loop's bisect phase, which only needs totals.
    """
    aq = jnp.abs(q)

    shp = q.shape[:-1]
    q4 = q.reshape(*shp, 240, 4)
    aq4 = aq.reshape(*shp, 240, 4)
    q2 = q.reshape(*shp, 480, 2)
    aq2 = aq.reshape(*shp, 480, 2)
    # quads/pairs never straddle bands: sfb widths %4 == 0 in both the long
    # ladder and the window-major short layout (window starts are %4 == 0)

    # per-book validity via violation COUNTS instead of a per-band max (the
    # [.., 960, NB] max tensor was the bandwidth hot spot); folding each
    # 4-line group to its max first shrinks the count matmul 4x (groups
    # never straddle bands).  0/1 values are exact in bf16, f32 accumulate.
    lav_dist = jnp.asarray([0, 1, 2, 4, 7, 12], jnp.int32)
    aq4max = aq4.max(-1)                                      # [.., 240]
    ind = (aq4max[..., None] > lav_dist).astype(_mmdt())
    cnt = bctx.count4(ind)                                    # [.., NB, 6]
    ok_dist = cnt < 0.5
    # book -> distinct-lav column: 0:0, 1/2:1, 3/4:2, 5/6:3, 7/8:4, 9/10:5,
    # 11: always valid (q is clipped to the book-11 escape limit)
    ok = jnp.stack([ok_dist[..., 0],
                    ok_dist[..., 1], ok_dist[..., 1],
                    ok_dist[..., 2], ok_dist[..., 2],
                    ok_dist[..., 3], ok_dist[..., 3],
                    ok_dist[..., 4], ok_dist[..., 4],
                    ok_dist[..., 5], ok_dist[..., 5],
                    jnp.ones_like(ok_dist[..., 0])], axis=-1)  # [.., NB, 12]

    def bsum4(x):
        return bctx.bsum(x, 4)

    def bsum2(x):
        return bctx.bsum(x, 2)

    signs4 = jnp.sum(aq4 != 0, axis=-1)
    signs2 = jnp.sum(aq2 != 0, axis=-1)

    def lut2(table_rows, ia, ib, n):
        """Bilinear table lookup: len(a, b) = one_hot(a) @ M selected by
        one_hot(b).  A flat [.., n^2] one-hot (up to 289 wide for book 11)
        was the rate loop's HBM hot spot - the factorized form touches
        [.., n] tensors instead (measured 5.5 -> ~1 ms per bit-count eval
        at [2048, 2, 960]).  Lengths are small ints: exact in bf16 with
        f32 accumulation."""
        k = len(table_rows)
        oh_a = jax.nn.one_hot(ia, n, dtype=jnp.bfloat16)
        oh_b = jax.nn.one_hot(ib, n, dtype=jnp.bfloat16)
        # EXACTNESS NOTE (round-5 forensics): the TPU's DEFAULT matmul
        # precision truncates f32 operands to bf16 (8 mantissa bits).  An
        # earlier radix-32 packing (4 lengths per f32 column, values up to
        # 2^20) was silently corrupted by that truncation ON TPU ONLY -
        # counted AU bits diverged from the written stream by up to ~1000
        # bits/AU and TPU superframes could overflow (CPU f32 dots are
        # exact, so the x64 test suite never saw it).  Every operand here
        # is now a small int < 32 - exact in bf16 - with f32 accumulation,
        # which is both exact and MXU-fast.  Do NOT re-pack multiple
        # values per column beyond 256 without Precision.HIGHEST.
        tabs = [np.asarray(t).reshape(n, n).astype(np.int64)
                for t in table_rows]
        for t in tabs:
            assert t.max() < 32
        mp = np.stack(tabs, -1).astype(np.float32)          # [a, b, k]
        m2 = jnp.asarray(mp.reshape(n, n * k), jnp.bfloat16)
        v = jnp.matmul(oh_a, m2, preferred_element_type=jnp.float32) \
            .reshape(oh_a.shape[:-1] + (n, k))
        out = jnp.round(jnp.einsum("...nk,...n->...k", v.astype(jnp.bfloat16),
                                   oh_b, preferred_element_type=jnp.float32)
                        ).astype(jnp.int32)
        return [out[..., j] for j in range(k)]

    c1 = jnp.clip(q4 + 1, 0, 2)
    a1 = c1[..., 0] * 3 + c1[..., 1]
    b1 = c1[..., 2] * 3 + c1[..., 3]
    c3 = jnp.clip(aq4, 0, 2)
    a3 = c3[..., 0] * 3 + c3[..., 1]
    b3 = c3[..., 2] * 3 + c3[..., 3]
    c5 = jnp.clip(q2 + 4, 0, 8)
    c7 = jnp.clip(aq2, 0, 7)
    c9 = jnp.clip(aq2, 0, 12)
    c11 = jnp.clip(aq2, 0, 16)
    # floor(log2(a)) via the f32 exponent field (exact for ints < 2^24;
    # cheaper than the transcendental log2 on the hot path), >= 4 for
    # a >= 16 so the reference's lower clamp is implicit
    n_esc = (jax.lax.bitcast_convert_type(
        jnp.maximum(aq2, 16).astype(jnp.float32), jnp.int32) >> 23) - 127
    esc = jnp.where(aq2 >= 16, 2 * n_esc - 3, 0).sum(-1)

    # books 7..11 all read through ONE 17-wide one-hot pair: books 7-10's
    # tables are folded into 17x17 (entries past each book's limit are
    # irrelevant - validity masks them) so one matmul serves five tables
    if fast:
        (l1,) = lut2([_LEN_QUAD[0]], a1, b1, 9)
        (l3,) = lut2([_LEN_QUAD[2]], a3, b3, 9)
        (l5,) = lut2([_LEN_PAIR56[0]], c5[..., 0], c5[..., 1], 9)
        l7, l9, l11 = lut2(_folded_pair_tables()[::2],
                           c11[..., 0], c11[..., 1], 17)
        bits = jnp.stack([
            jnp.zeros_like(bsum4(l1)),        # book 0
            bsum4(l1), bsum4(l3 + signs4),
            bsum2(l5), bsum2(l7 + signs2),
            bsum2(l9 + signs2), bsum2(l11 + signs2 + esc),
        ], axis=-1)                           # [..., NB, 7]
        ok_f = ok[..., jnp.asarray([0, 1, 3, 5, 7, 9, 11])]
        cost = jnp.where(ok_f, bits, jnp.asarray(1 << 20, jnp.int32))
        sel = jnp.argmin(cost, axis=-1)
        books = jnp.asarray([0, 1, 3, 5, 7, 9, 11], jnp.int32)[sel]
        bbits = jnp.min(cost, axis=-1)
        books = jnp.where(bandsel, books, 0)
        bbits = jnp.where(bandsel, bbits, 0)
        return books, bbits

    l1, l2 = lut2([_LEN_QUAD[0], _LEN_QUAD[1]], a1, b1, 9)
    l3, l4 = lut2([_LEN_QUAD[2], _LEN_QUAD[3]], a3, b3, 9)
    l3, l4 = l3 + signs4, l4 + signs4
    l5, l6 = lut2([_LEN_PAIR56[0], _LEN_PAIR56[1]],
                  c5[..., 0], c5[..., 1], 9)
    l7, l8, l9, l10, l11 = lut2(_folded_pair_tables(),
                                c11[..., 0], c11[..., 1], 17)
    l7, l8 = l7 + signs2, l8 + signs2
    l9, l10 = l9 + signs2, l10 + signs2
    l11 = l11 + signs2 + esc

    bits = jnp.stack([
        jnp.zeros_like(bsum4(l1)),            # book 0
        bsum4(l1), bsum4(l2), bsum4(l3), bsum4(l4),
        bsum2(l5), bsum2(l6), bsum2(l7), bsum2(l8),
        bsum2(l9), bsum2(l10), bsum2(l11),
    ], axis=-1)  # [..., NB, 12]

    big = jnp.asarray(1 << 20, jnp.int32)
    cost = jnp.where(ok, bits, big)
    if return_cost:
        # caller runs the sectioning DP on this; per-band argmin is a safe
        # upper bound used inside the rate loop
        return cost, bandsel
    books = jnp.argmin(cost, axis=-1).astype(jnp.int32)
    bbits = jnp.min(cost, axis=-1)
    books = jnp.where(bandsel, books, 0)
    bbits = jnp.where(bandsel, bbits, 0)
    return books, bbits


SECT_BITS = 4 + 5       # sect_cb + sect_len (long windows)
SECT_BITS_SHORT = 4 + 3  # sect_len is 3 bits for EIGHT_SHORT
PNS_HCB = 13             # NOISE_HCB


def pns_detect(spec, en, thr, bctx, eligible, nlines, dtype, pns_tabs=None):
    """Perceptual noise substitution detection re-designed from the fdk LC
    chain (noisedet.cpp:150-240 FDKaacEnc_noiseDetect + aacenc_pns.cpp:
    218-285 flag cleanup):

      - power distribution: the band is split into four quarters; it is
        noise-like when maxQuarter * refPower^(width/32) < minQuarter
        (the PSD-slope-corrected max/min flatness test, powDistPSDcurve
        from pnsparam.cpp:560-571);
      - tonality: fdk thresholds the chaos-measure tonality against
        refTonality; here the spectral-flatness measure over the band's
        chi-square(1)-distributed powers stands in for it (~0.28 for
        Gaussian noise, ->0 when a tone dominates);
      - audibility: en > 1.5 * thr (aacenc_pns.cpp:233-237) - masked
        bands go to ZERO for free instead;
      - cleanup: fill single-band gaps between PNS bands, then drop
        isolated PNS bands (aacenc_pns.cpp:250-285).

    noise_nrg semantics match the decoder's CPns_Apply: the generated
    unit-energy noise vector is scaled by 2^(sf/4) per coefficient, so
    sf = 2*log2(band energy) reproduces the band's energy."""
    p = spec * spec
    if pns_tabs is not None:
        qmask = pns_tabs["qmask"]                      # [4, 960]
        curve = pns_tabs["curve"]                      # [NB]
        width_ok = pns_tabs["width_ok"]                # [NB]
        qe = jnp.stack([bctx.reduce_f(p * qmask[i]) for i in range(4)], -1)
        noise_pd = qe.max(-1) * curve < qe.min(-1)     # [S, ch, NB]
        eligible = eligible & width_ok
        ton_ref = pns_tabs["ton_thresh"]
    else:
        noise_pd = jnp.ones(en.shape, bool)
        ton_ref = jnp.asarray(10.0 ** -0.10, dtype)
    # chaos measure (chaosmeasure.cpp PeakFast): predict each line's
    # magnitude from its +-2 same-parity neighbours; chaos = (pred/|x|)^2
    # clipped to 1 (1 = unpredictable = noise), then the 0.75/0.25 IIR
    # smoothing along frequency expanded as a short FIR (0.25^12 ~ 6e-8)
    a = jnp.abs(spec)
    pad = [(0, 0)] * (a.ndim - 1)
    left2 = jnp.pad(a[..., :-2], pad + [(2, 0)], mode="edge")
    right2 = jnp.pad(a[..., 2:], pad + [(0, 2)], mode="edge")
    pred = 0.5 * (left2 + right2)
    chaos = jnp.where(pred < a, (pred / jnp.maximum(a, 1e-20)) ** 2, 1.0)
    taps = (0.75 * 0.25 ** np.arange(12)).astype(np.float32)
    k = jnp.asarray(taps, dtype)
    ch_s = sum(k[i] * jnp.pad(chaos[..., :chaos.shape[-1] - i],
                              pad + [(i, 0)], mode="edge")
               for i in range(12))
    # sfb tonality (tonality.cpp CalcSfbTonality): tonality =
    # min(1, -log10(c')) with c' = 2 * energy-weighted chaos (the +3/64
    # ld-domain constant nets a factor 2 after the fMultDiv2 scalings);
    # noise-like iff tonality < refTonality i.e. c' > 10^-refTonality
    c_ratio = 2.0 * bctx.reduce_f(p * ch_s) / jnp.maximum(en, 1e-20)
    noise_ton = c_ratio > ton_ref
    fuzzy = noise_pd & noise_ton
    mask = eligible & fuzzy & (en > 1.5 * thr)
    # gap fill: a non-PNS band between two PNS bands joins if noise-like
    left = jnp.pad(mask[..., :-1], [(0, 0)] * (mask.ndim - 1) + [(1, 0)])
    right = jnp.pad(mask[..., 1:], [(0, 0)] * (mask.ndim - 1) + [(0, 1)])
    mask = mask | (eligible & fuzzy & left & right)
    # drop isolated PNS bands
    left = jnp.pad(mask[..., :-1], [(0, 0)] * (mask.ndim - 1) + [(1, 0)])
    right = jnp.pad(mask[..., 1:], [(0, 0)] * (mask.ndim - 1) + [(0, 1)])
    mask = mask & (left | right)
    nrg = jnp.clip(jnp.round(2.0 * jnp.log2(jnp.maximum(en, 1e-10))),
                   -100, 155).astype(jnp.int32)
    return mask, nrg


def optimal_books(cost, bandsel, sect_bits=None, force_break=None):
    """Jointly optimal per-band codebooks under sectioning (dyn_bits.cpp
    noiseless-coder analogue): DP over bands where staying in the previous
    section is free and starting a new one costs a section header.  Merging
    can pick a non-minimal book for a band when that saves more header bits
    than it costs in spectrum bits.

    cost: [..., NB, 12] per-band per-book spectral bits (invalid = big);
    sect_bits: scalar or [..., 1] per-stream section-header cost;
    force_break: optional [..., NB] bool - sections may not continue across
    these bands (short-block window groups restart section_data).
    Returns books [..., NB] int32."""
    nbk = cost.shape[-1]
    if sect_bits is None:
        sect_bits = jnp.asarray(SECT_BITS, jnp.int32)  # scalar or [..., 1]
    dp0 = cost[..., 0, :] + sect_bits

    if force_break is None:
        force_break = jnp.zeros(cost.shape[:-1], bool)

    def fwd(dp, xs):
        c_b, sel_b, fb_b = xs  # [..., 12], [..., 1], [..., 1]
        best = dp.min(-1, keepdims=True)
        bestj = dp.argmin(-1).astype(jnp.int32)
        new = best + sect_bits
        stayed = (dp <= new) & ~fb_b
        dp2 = c_b + jnp.where(fb_b, new, jnp.minimum(dp, new))
        dp2 = jnp.where(sel_b, dp2, dp)  # beyond max_sfb: carry through
        return dp2, (stayed, bestj)

    cost_t = jnp.moveaxis(cost, -2, 0)           # [NB, ..., 12]
    sel_t = jnp.moveaxis(bandsel, -1, 0)[..., None]
    fb_t = jnp.moveaxis(force_break, -1, 0)[..., None]
    fb_t = jnp.broadcast_to(fb_t, sel_t.shape)
    dpF, (stayed, bestj) = jax.lax.scan(fwd, dp0, (cost_t[1:], sel_t[1:],
                                                   fb_t[1:]))

    kT = dpF.argmin(-1).astype(jnp.int32)

    def bwd(k, xs):
        stayed_b, bestj_b, sel_b = xs
        stay_k = (stayed_b * jax.nn.one_hot(k, nbk, dtype=jnp.int32)).sum(-1) > 0
        k_prev = jnp.where(stay_k, k, bestj_b)
        k_prev = jnp.where(sel_b[..., 0], k_prev, k)
        return k_prev, k

    k0, books_rev = jax.lax.scan(bwd, kT, (stayed, bestj, sel_t[1:]),
                                 reverse=True)
    books = jnp.concatenate([k0[None], books_rev], axis=0)  # [NB, ...]
    return jnp.moveaxis(books, 0, -1)


def side_info_bits(books, gains, bandsel, dtype, sect_hdr=None,
                   force_break=None, is_short=None):
    """Section + scalefactor-dpcm + fixed ICS bits for one channel's ICS.

    bandsel: [..., NB] valid-band mask; sect_hdr: per-stream section header
    cost ([..., ] int, default 4+5); force_break: bands where a new section
    must start (short window-group starts); is_short: [...] bool selecting
    the 3-bit sect_len escape rule."""
    nb = books.shape[-1]
    books_m = jnp.where(bandsel, books, -1)
    if sect_hdr is None:
        sect_hdr = jnp.asarray(4 + 5, jnp.int32)
    # sections: runs of equal codebook within the valid bands
    prev = jnp.concatenate([jnp.full(books_m.shape[:-1] + (1,), -2, books_m.dtype),
                            books_m[..., :-1]], axis=-1)
    new_sect = (books_m != prev) & bandsel
    if force_break is not None:
        new_sect = new_sect | (jnp.broadcast_to(force_break, bandsel.shape)
                               & bandsel)
    n_sect = new_sect.sum(-1)
    sect_bits = n_sect * sect_hdr
    # a run of length L costs len_bits*(L//esc_val) extra escape fields; band
    # b adds one exactly when its distance from the run start hits the escape
    # value (no run-length histogram needed - one cummax + elementwise)
    idxs = jnp.arange(nb)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_sect, idxs, -1), axis=-1)
    d = idxs - run_start
    esc_l = bandsel & (run_start >= 0) & (d % 31 == 30)
    if is_short is not None:
        esc_s = bandsel & (run_start >= 0) & (d % 7 == 6)
        esc_cnt = jnp.where(is_short, esc_s.sum(-1), esc_l.sum(-1))
        esc_w = jnp.where(is_short, 3, 5)
    else:
        esc_cnt = esc_l.sum(-1)
        esc_w = 5
    sect_bits = sect_bits + esc_w * esc_cnt

    def _dpcm_chain_bits(member, values, first_cost=None):
        """Bit cost of a dpcm chain over `member` bands in band order:
        lenscf[delta+60] between consecutive members; the first member costs
        `first_cost` bits (None = lenscf[60], the regular chain's
        global-gain reference)."""
        idx = jnp.arange(nb)
        last_idx = jnp.where(member, idx, -1)
        prev_i = jax.lax.associative_scan(jnp.maximum, last_idx, axis=-1)
        prev_i = jnp.concatenate(
            [jnp.full(prev_i.shape[:-1] + (1,), -1, prev_i.dtype),
             prev_i[..., :-1]], axis=-1)
        # values at prev via one-hot bf16 matmul (gather-free; small ints
        # are exact in bf16 with f32 accumulation)
        p_oh = jax.nn.one_hot(jnp.maximum(prev_i, 0), nb, dtype=_mmdt())
        v_prev = jnp.round(jnp.einsum("...kj,...j->...k", p_oh,
                                      values.astype(_mmdt()),
                                      preferred_element_type=jnp.float32)
                           ).astype(jnp.int32)
        delta = jnp.clip(values - v_prev, -60, 60)
        has_prev = prev_i >= 0
        d_oh = jax.nn.one_hot(delta + 60, 121, dtype=_mmdt())
        lens = jnp.round(d_oh @ jnp.asarray(AT.HUFF_LEN_SCF, _mmdt())
                         ).astype(jnp.int32)
        bits = jnp.where(member & has_prev, lens, 0).sum(-1)
        fc = jnp.asarray(AT.HUFF_LEN_SCF)[60] if first_cost is None else first_cost
        return bits + jnp.where(member.any(-1), fc, 0)

    # scalefactor dpcm over non-zero spectral bands (PNS bands carry their
    # noise energies in a SEPARATE chain: 9-bit PCM start + scf-huffman
    # deltas, block.cpp:199-207 / aacdec_pns.cpp CPns_Read)
    nz = (books_m > 0) & (books_m != PNS_HCB)
    scf_bits = _dpcm_chain_bits(nz, gains)
    pns = books_m == PNS_HCB
    noise_bits = _dpcm_chain_bits(pns, gains, first_cost=9)

    # global_gain(8) + ics_info(11) is counted by the caller (shared for CPE)
    fixed = 8 + 3  # global_gain + pulse/tns/gain_control flags
    return sect_bits + scf_bits + noise_bits + fixed


def pre_echo_control(thr, thr_nm1, pre_flag, seq, short_ctx, is_short, dtype):
    """Limit frame-to-frame masking-threshold increase to 2x
    (FDKaacEnc_PreEchoControl, pre_echo_control.cpp:103-180 + the psy_main
    STOP/START skip logic, psy_main.cpp:975-1007): after a quiet frame, a
    loud frame's quantization noise may not jump above twice the quiet
    threshold - THE pre-echo guard for long/START frames, where the MDCT
    window already contains the upcoming attack.  Without it our transient
    pre-window noise sat ~15 dB above the reference's.

    thr: [S, ch, NB]; thr_nm1: previous AU's UNCONTROLLED thresholds;
    pre_flag: [S] bool (False after START/first AU); seq: [S] window
    sequence.  For EIGHT_SHORT AUs the control runs group-sequentially on
    the grouped {4,4} ladder (group 1 capped by the previous AU's group 2,
    group 2 by this AU's group 1).  Returns (thr', thr_nm1', pre_flag')."""
    inc, rem = 2.0, 0.01
    cap = lambda t, prev: jnp.maximum(jnp.minimum(t, inc * prev), rem * t)
    flag_eff = (pre_flag & (seq != 3))[:, None, None]
    ctl_long = cap(thr, thr_nm1)
    if short_ctx is not None:
        # grouped short ladder: band i of group g lives at g*nsfb + i
        prev_g2 = thr_nm1[..., short_ctx["prev_grp_map"]]
        g1 = short_ctx["g1_mask"]  # [NB] True on group-1 bands
        ctl_g1 = cap(thr, prev_g2)
        ctl_g2 = cap(thr, thr[..., short_ctx["prev_grp_map"]])
        ctl_short = jnp.where(g1, ctl_g1, ctl_g2)
        # group-2 control is within-AU and applies even without history
        short_always = jnp.where(g1, thr, ctl_g2)
        is_short_b = is_short[:, None, None]
        ctl = jnp.where(is_short_b, ctl_short, ctl_long)
        no_hist = jnp.where(is_short_b, short_always, thr)
    else:
        ctl = ctl_long
        no_hist = thr
    thr_out = jnp.where(flag_eff, ctl, no_hist)
    return thr_out, thr, seq != 1


def ms_stereo(spec, en, thr, bctx, bandsel, dtype):
    """Per-band mid/side decision + transform + psy-data substitution
    (FDKaacEnc_MsStereoProcessing, ms_stereo.cpp:109-240).

    The decision compares perceptual-entropy proxies: MS wins when
    (minThr/max(enM,minThr))*(minThr/max(enS,minThr)) beats the L/R
    product.  On MS bands the thresholds become min(thrL, thrR) for BOTH
    the mid and side channel - derived from the L/R-domain masking, never
    re-spread from the MS energies (that was a ~7 dB NMR noise floor: the
    decoded L/R noise is the SUM of the M and S noise, so each must honour
    the stricter of the two channel masks).

    spec/en/thr: [S, 2, 960]/[S, 2, NB] L/R domain ->
    (spec', en', thr', ms_used [S, NB]) with MS bands substituted."""
    m = 0.5 * (spec[:, 0] + spec[:, 1])
    s = 0.5 * (spec[:, 0] - spec[:, 1])
    en_m = bctx.energy(m)
    en_s = bctx.energy(s)
    thr_l, thr_r = thr[:, 0], thr[:, 1]
    en_l, en_r = en[:, 0], en[:, 1]
    min_thr = jnp.minimum(thr_l, thr_r)
    pnlr = (thr_l / jnp.maximum(en_l, thr_l)) * \
        (thr_r / jnp.maximum(en_r, thr_r))
    pnms = (min_thr / jnp.maximum(en_m, min_thr)) * \
        (min_thr / jnp.maximum(en_s, min_thr))
    use = (pnms > pnlr) & bandsel
    use_l = bctx.to_lines(use)  # [S, 960]
    out = jnp.stack([jnp.where(use_l, m, spec[:, 0]),
                     jnp.where(use_l, s, spec[:, 1])], axis=1)
    en2 = jnp.stack([jnp.where(use, en_m, en_l),
                     jnp.where(use, en_s, en_r)], axis=1)
    thr2 = jnp.stack([jnp.where(use, min_thr, thr_l),
                      jnp.where(use, min_thr, thr_r)], axis=1)
    return out, en2, thr2, use


# full-scale reference for the threshold-weighting tool: fdk's fractional
# spectra make calcWeighting's en^p terms absolute-level dependent; our
# int16-domain MDCT needs the equivalent normalisation constant.  2^31
# calibrated on the PEAQ corpus (tools/quality.py sweep).
WEIGHT_FS2 = 2.0 ** 31


def calc_weighting(en, thr, ffak, nlines, bandsel, is_short, last_patch,
                   ms_used, dtype):
    """Threshold/energy weighting for noise-like long frames - a float
    re-expression of FDKaacEnc_calcWeighting (adj_thr.cpp:755-880): when
    the audible spectrum is flat (active-line share > 0.78125, this frame
    and the last), each band's threshold and energy are divided by
    w_b = min(1, sqrt(en_b^p * sum(en^(1-p/2))/sum(en))) with p selected
    by the flatness - tilting the upcoming threshold reduction toward loud
    bands (the psy-shaped scf ladder in speech pauses).

    en/thr/ffak: [S, ch, NB] (post-MS); nlines: band widths [.., NB];
    last_patch: [S, ch] bool carried state.  Returns (w, new_last_patch).
    """
    act = (en > thr) & bandsel
    width = jnp.broadcast_to(nlines, en.shape)
    # active-lines estimate (FDKaacEnc_prepareSfbPe, line_pe.cpp:116-146):
    # nl = min(width, formFactor * (width/en)^(1/4))
    nl = jnp.minimum(width, ffak * jnp.power(
        width / jnp.maximum(en, 1e-30), 0.25))
    nl = jnp.where(act, nl, 0.0)
    # denominator is the full ladder width (sfbOffsets[sfbCnt] = 960)
    chaos = jnp.maximum(0.1875, nl.sum(-1) / float(AT.N))
    long_frame = jnp.ones(en.shape[0], bool) if is_short is None \
        else ~is_short
    use_patch = (chaos > 0.78125) & long_frame[:, None]
    exe = jnp.broadcast_to((use_patch & last_patch)[..., None],
                           en.shape)
    if en.shape[1] == 2 and ms_used is not None:
        # MS-coupled bands follow the mid channel's decision (per band)
        exe1 = jnp.where(ms_used, exe[:, 0], exe[:, 1])
        exe = jnp.stack([exe[:, 0], exe1], axis=1)
    # normalised energies (fdk fractional domain)
    en_n = jnp.maximum(en / jnp.asarray(WEIGHT_FS2, dtype), 1e-30)
    e_tot = jnp.sum(jnp.where(bandsel, en_n, 0.0), -1, keepdims=True)
    e14 = jnp.sum(jnp.where(bandsel, jnp.power(en_n, 0.25), 0.0), -1,
                  keepdims=True)
    e12 = jnp.sum(jnp.where(bandsel, jnp.sqrt(en_n), 0.0), -1, keepdims=True)
    e34 = jnp.sum(jnp.where(bandsel, jnp.power(en_n, 0.75), 0.0), -1,
                  keepdims=True)
    e_tot = jnp.maximum(e_tot, 1e-30)
    w1 = jnp.sqrt(jnp.power(en_n, 1.5) * e14 / e_tot)   # chaos > 0.8125
    w2 = jnp.sqrt(en_n * e12 / e_tot)                   # chaos > 0.796875
    w3 = jnp.sqrt(jnp.sqrt(en_n) * e34 / e_tot)         # else
    c = chaos[..., None]
    w = jnp.where(c > 0.8125, w1, jnp.where(c > 0.796875, w2, w3))
    w = jnp.minimum(w, 1.0)
    w = jnp.where(exe & (en > 0.0) & bandsel, w, 1.0)
    # short frames leave the chain armed (adj_thr.cpp:878-882)
    new_last = jnp.where(long_frame[:, None], use_patch, True)
    return w.astype(dtype), new_last


def encode_au(spec, pt, band_m, bol, max_sfb, budget_bits, n_ch, dtype,
              tns_cfg=None, transient=None, short_ctx=None, is_short=None,
              refine_rounds=REFINE_ROUNDS, modify_minsnr=True,
              pre_state=None, seq=None, weight_state=None,
              thr_override=None):
    """Rate-controlled quantization of one AU for all streams.

    spec: [S, ch, 960] (window-major [8x120] layout for short-block
    streams); budget_bits: [S]; short_ctx: static short-block tables from
    tables.make_short_ctx; is_short: [S] bool (window_sequence == SHORT).
    Returns dict(q [S,ch,960], gains [S,ch,NB], books [S,ch,NB], bits [S],
    ms_used [S, NB])."""
    S, n_ch_s, _ = spec.shape
    if short_ctx is None:
        is_short = None
    bctx = BandCtx(band_m, bol, short_ctx, is_short)

    # per-stream band metadata: long sfb ladder vs grouped short ladder
    bandsel_l = jnp.arange(NB) < max_sfb[:, None]              # [S, NB]
    if short_ctx is not None:
        t1 = is_short[:, None]
        bandsel = jnp.where(t1, short_ctx["bandsel"][None], bandsel_l)
        force_break = t1 & short_ctx["force_break"][None]      # [S, NB]
        sect_hdr = jnp.where(is_short, SECT_BITS_SHORT, SECT_BITS)  # [S]
        nbands_tx = jnp.where(is_short, short_ctx["nbands_tx"], max_sfb)
        ics_fixed = jnp.where(is_short, 15, 11)  # short ics_info: +4-bit
        # max_sfb +7-bit scale_factor_grouping
        pt_sel = {k: jnp.where(is_short[:, None, None],
                               short_ctx["pt"][k][None, None],
                               jnp.asarray(pt[k])[None, None])
                  for k in ("f_low", "f_high", "ath", "pcm_floor", "minsnr",
                            "f_low_spr", "f_high_spr")}
        nlines = jnp.where(t1, short_ctx["nlines"][None],
                           jnp.maximum(band_m.sum(-1), 1.0)[None])[:, None]
    else:
        bandsel = bandsel_l
        force_break = None
        sect_hdr = jnp.asarray(SECT_BITS, jnp.int32)
        nbands_tx = max_sfb
        ics_fixed = 11
        pt_sel = pt
        nlines = jnp.maximum(band_m.sum(-1), 1.0)

    # pre-TNS energies: the psy threshold source (fdk ordering, see the
    # threshold-elevation note below; post-TNS energies feed the minSnr
    # caps and MS/PNS decisions like fdk's psyOut sfbEnergy)
    en_pre = bctx.energy(spec)

    # TNS first: the decoder applies MS reconstruction before TNS synthesis,
    # so the encoder filters L/R before the MS transform.  Split-range TNS
    # like the reference (aacenc_tns.cpp:440-452, 875-935): the HI filter
    # covers the top 3/4 of the range (order <= 12, threshold 1.437), a
    # second LO filter the bottom quarter (order <= 5, threshold 1.5 with
    # fdk's implausibility upper bounds), only when the HI filter runs.
    if tns_cfg is not None:
        start, mid, stop = (tns_cfg["start_line"], tns_cfg["mid_line"],
                            tns_cfg["stop_line"])
        t = tns_analysis_fdk(spec, start, mid, stop, dtype)
        if n_ch_s == 2:
            t = tns_sync(t)
        if is_short is not None:
            # short blocks already confine noise to 5 ms windows; our TNS
            # filter range/syntax is long-window only
            off = ~is_short[:, None]
            t["en"] = t["en"] & off
            t["en_lo"] = t["en_lo"] & off
            t["merged"] = t["merged"] & off
        tns_en, tns_order, tns_idx = t["en"], t["order"], t["idx"]
        tns_en_lo, tns_order_lo, tns_idx_lo = \
            t["en_lo"], t["order_lo"], t["idx_lo"]
        spec = tns_filter_fdk(spec, t, start, mid, stop)
        # filter-1 length field in bands: whole TNS range when merged,
        # the HI range otherwise (written by all three packers)
        tns_len = jnp.where(t["merged"], tns_cfg["length_code_merged"],
                            tns_cfg["length_code"]).astype(jnp.int32)
        # tns_data: n_filt 2 + coef_res 1, then per filter 6+5+1+1 + 4/coef
        tns_bits = jnp.where(tns_en, 16 + 4 * tns_order, 0) \
            + jnp.where(tns_en_lo, 13 + 4 * tns_order_lo, 0)  # [S, ch]
    else:
        tns_en = jnp.zeros((S, n_ch_s), bool)
        tns_order = jnp.zeros((S, n_ch_s), jnp.int32)
        tns_idx = jnp.zeros((S, n_ch_s, TNS_MAX_ORDER), jnp.int32)
        tns_bits = jnp.zeros((S, n_ch_s), jnp.int32)
        tns_en_lo = jnp.zeros((S, n_ch_s), bool)
        tns_order_lo = jnp.zeros((S, n_ch_s), jnp.int32)
        tns_idx_lo = jnp.zeros((S, n_ch_s, TNS_MAX_ORDER), jnp.int32)
        tns_len = jnp.zeros((S, n_ch_s), jnp.int32)

    # psy on the L/R domain (energies -> spreading -> thresholds, THEN MS
    # substitution, psy_main.cpp:872-1218)
    en = bctx.energy(spec)
    # fdk computes psy thresholds from the PRE-TNS energies: thr =
    # en*C_RATIO (psy_main.cpp:702) runs before TnsEncode, and the TNS
    # energy recompute (:844-905) rescales but never recomputes thr -
    # while the rate loop codes the POST-TNS spectrum.  Where TNS strips
    # 20-30 dB of temporal envelope (loud->silence transition AUs), the
    # thresholds sit that far above the residual energy: those bands cost
    # ~no bits (holes/PNS open, the scf ladder rises) and TNS synthesis
    # re-applies the envelope to the quantization noise at decode, hiding
    # it under the signal tail.  Confirmed stage-by-stage against the
    # instrumented reference (tools/diag_lc_stages.py): this is the
    # round-4 "unidentified threshold elevation" - the elevation IS the
    # TNS prediction gain, and it requires NOT clamping thr to the coded
    # (post-TNS) energy.
    # A/B knob for the quality work: ODR_THR_SRC=post restores the legacy
    # post-TNS threshold source (read at trace time, diagnostics only)
    if os.environ.get("ODR_THR_SRC", "pre") == "pre":
        thr = spread_thresholds(en_pre, pt_sel, dtype, clamp_en=en_pre)
    else:
        thr = spread_thresholds(en, pt_sel, dtype, clamp_en=en)
    pre_out = {}
    if pre_state is not None:
        thr, thr_nm1, pre_flag = pre_echo_control(
            thr, pre_state[0], pre_state[1], seq, short_ctx, is_short, dtype)
        pre_out = dict(thr_nm1=thr_nm1, pre_flag=pre_flag)
    en_lr = en  # avoid-hole spread energies stay L/R-domain

    # PNS detection runs on the PRE-MS L/R spectra (fdk order: PnsDetect at
    # psy_main.cpp:1144 precedes MsStereoProcessing at :1190; the channel
    # pair is reconciled afterwards in PostProcessPnsChannelPair)
    pns_start = pt.get("pns_start", None)
    bandsel_pre = bandsel[:, None] if bandsel.ndim == 2 else bandsel
    if pns_start is not None:
        eligible = bandsel_pre & (jnp.arange(NB) >= pns_start)
        if is_short is not None:
            eligible = eligible & ~is_short[:, None, None] \
                if eligible.ndim == 3 else eligible & ~is_short[:, None]
        pns_mask, pns_nrg = pns_detect(spec, en, thr, bctx, eligible,
                                       nlines, dtype,
                                       pns_tabs=pt.get("pns_tabs"))
    else:
        pns_mask = jnp.zeros(en.shape, bool)
        pns_nrg = jnp.zeros(en.shape, jnp.int32)
    if spec.shape[1] == 2:
        # normalized noise correlation (PreProcessPnsChannelPair:441-480)
        ccf = bctx.reduce_f(spec[:, 0] * spec[:, 1]) / jnp.sqrt(
            jnp.maximum(en[:, 0] * en[:, 1], 1e-20))

    ms_used = jnp.zeros(spec.shape[:1] + (NB,), bool)
    if spec.shape[1] == 2:
        spec, en, thr, ms_used = ms_stereo(spec, en, thr, bctx, bandsel, dtype)
        # PNS/MS reconciliation (PostProcessPnsChannelPair:498-541):
        # PNS on an MS band needs PNS in BOTH channels, the ms flag then
        # signals noise correlation (> 0.6 in amplitude, 0.36 threshold
        # on the squared-domain constant)
        pair = pns_mask[:, 0] & pns_mask[:, 1]
        corr = ccf > 0.36          # noiseCorrelationThresh (aacenc_pns.cpp:115)
        pns_mask = jnp.where((ms_used & ~pair)[:, None], False, pns_mask)
        ms_used = jnp.where(pair, corr, ms_used)
    # CPE: +1 common_window, +2 ms_mask_present, + per-band ms_used bits
    elem_fixed = jnp.where(n_ch == 2,
                           3 + 4 + 1 + 2 + ics_fixed + nbands_tx,
                           3 + 4 + ics_fixed)

    # ---- avoid-hole machinery (adj_thr.cpp initAvoidHoleFlag/adaptMinSnr,
    # float redesign): a per-band minimum-SNR cap keeps locally-dominant
    # bands from being starved when the rate loop raises thresholds
    bsel_c = bandsel[:, None] if bandsel.ndim == 2 else bandsel
    spr_en = spread_energy(en_lr,
                           jnp.broadcast_to(pt_sel["f_low_spr"], en.shape),
                           jnp.broadcast_to(pt_sel["f_high_spr"], en.shape))
    # decrease spread energy by 3 dB (long) / 2 dB (short)
    if is_short is not None:
        spr_scale = jnp.where(is_short[:, None, None], 0.63, 0.5)
        is_short_b = is_short[:, None, None]
        grp_start = jnp.where(is_short_b, short_ctx["grp_start"][None, None],
                              (jnp.arange(NB) == 0)[None, None])
        grp_end = jnp.where(is_short_b, short_ctx["grp_end"][None, None],
                            jnp.zeros((NB,), bool)[None, None])
    else:
        spr_scale = 0.5
        is_short_b = jnp.zeros((S, 1, 1), bool)
        grp_start = (jnp.arange(NB) == 0)[None, None]
        grp_end = jnp.zeros((NB,), bool)[None, None]
    spr_en = spr_en * spr_scale
    minsnr = jnp.broadcast_to(pt_sel["minsnr"], en.shape).astype(dtype)
    minsnr = adapt_min_snr(minsnr, en, bsel_c, dtype)
    if modify_minsnr:
        minsnr = modify_min_snr(minsnr, en, bsel_c, grp_start, grp_end,
                                is_short_b, dtype)
    if spec.shape[1] == 2:
        minsnr, spr_en = ms_adapt_min_snr(minsnr, en, spr_en, ms_used, dtype)
    # NO_AH: band is masked by its neighbours' spread energy, or minSnr
    # demands nothing - no cap needed
    no_ah = (spr_en > en) | (minsnr > 1.0)
    ffak = bctx.reduce_f(jnp.sqrt(jnp.abs(spec)))
    log_ffak = jnp.log10(jnp.maximum(ffak, 1e-30))

    # ---- threshold weighting (calcWeighting): raises quiet bands'
    # thresholds AND energies in flat frames, so the reduction loop and
    # the AH caps below both operate in the weighted domain - the loud
    # bands keep their psy threshold shape (adj_thr.cpp:905-941)
    w_out = {}
    wgt = None
    en_w, thr_w = en, thr
    if weight_state is not None:
        wgt, last_patch = calc_weighting(en, thr, ffak, nlines, bsel_c,
                                         is_short, weight_state, ms_used,
                                         dtype)
        en_w = en / wgt
        thr_w = thr / wgt
        w_out = dict(last_patch=last_patch)

    cap_thr = jnp.maximum(en_w * minsnr, thr_w)
    floor29 = en_w * jnp.asarray(10.0 ** -2.9, dtype)
    thr4 = jnp.power(jnp.maximum(thr_w, 1e-30), 0.25)

    # ---- allowMoreHoles priority (adj_thr.cpp:1690-1930): when the
    # capped reduction still misses the budget, the reference does NOT
    # raise every threshold uniformly - it ERASES whole bands (thr := 2*en,
    # pe 0), lowest-energy bands first and from the highest sfb down, never
    # below startSfb (15 long / 3 per short group at >=20kbps/ch).  This is
    # what keeps the scf ladder psy-shaped under pressure: important low
    # bands stay at their caps while unimportant bands disappear.
    idxb = jnp.arange(NB)
    pos = jnp.broadcast_to(idxb, (1, 1, NB))
    start_b = jnp.asarray(15 if modify_minsnr else 0)
    if short_ctx is not None:
        # grouped short ladder: position within the group, startSfbS=3
        gs = np.flatnonzero(np.asarray(short_ctx["grp_start"]))
        per_grp = int(gs[1] - gs[0]) if len(gs) > 1 else NB
        pos = jnp.where(is_short[:, None, None],
                        jnp.broadcast_to(idxb % per_grp, (1, 1, NB)), pos)
        start_b = jnp.where(is_short[:, None, None],
                            3 if modify_minsnr else 0, start_b)
    hole_cand = bsel_c & ~no_ah & (en_w > thr_w) & (pos >= start_b)
    # hole ordering uses the PRE-TNS (source) energies: a hole deletes the
    # band entirely, so its decoded error is the ORIGINAL band energy, not
    # the (possibly 20+ dB smaller) TNS residual.  Ranking by post-TNS
    # energies made TNS-covered bands - tiny residual, loud source - look
    # like cheap holes and erased exactly the 1-4 kHz bands the reference
    # keeps coded on transition AUs (tools/diag_lc_delivered.py: decoded
    # noise = en_pre where our counted residual dist was at threshold).
    en_hole = jnp.maximum(en, en_pre)
    ld_en = jnp.log2(jnp.maximum(en_hole, 1e-30))
    big = jnp.asarray(1e30, dtype)
    mn = jnp.min(jnp.where(hole_cand, ld_en, big), axis=(-2, -1),
                 keepdims=True)
    n_cand = jnp.maximum(hole_cand.sum(axis=(-2, -1), keepdims=True), 1)
    avg = jnp.log2(jnp.maximum(
        jnp.sum(jnp.where(hole_cand, en_hole, 0.0),
                axis=(-2, -1), keepdims=True) / n_cand, 1e-30))
    fr = jnp.asarray([(2 * k + 1) / 15.0 for k in range(8)], dtype)
    borders = mn[..., None] + (avg - mn)[..., None] * fr    # [..,1,1,8]
    k0 = jnp.sum(ld_en[..., None] > borders, -1)            # [S,ch,NB] 0..8
    # rank 0..NB-1 is reserved for the MS quieter-channel holes below (fdk
    # opens those FIRST); the energy-ladder ranks start at NB
    hole_rank = jnp.where(hole_cand & (k0 < 8),
                          NB + k0 * NB + (NB - 1 - pos), 1 << 20)
    if spec.shape[1] == 2:
        # for MS bands the reference first allows a hole in the QUIETER of
        # the two channels (allowMoreHoles, adj_thr.cpp:1645-1685: erase ch
        # q when en_q/en_l < 0.4*minSnr_l), from the top sfb down
        en0, en1 = en_w[:, 0], en_w[:, 1]
        quiet1 = en1 <= en0                       # [S, NB]
        en_q = jnp.where(quiet1, en1, en0)
        en_l = jnp.where(quiet1, en0, en1)
        msnr_l = jnp.where(quiet1, minsnr[:, 0], minsnr[:, 1])
        pref = ms_used & (en_q < 0.4 * msnr_l * en_l)
        quiet_ch = quiet1.astype(jnp.int32)[:, None, :]
        pref_c = pref[:, None, :] & \
            (jnp.arange(2, dtype=jnp.int32)[None, :, None] == quiet_ch)
        hole_rank = jnp.where(hole_cand & pref_c, NB - 1 - pos, hole_rank)
    hole_thr = 2.0 * en_w
    # region B (reduceMinSnr, adj_thr.cpp:1520-1600): before erasing bands,
    # the reference drops the top sfbs' demands to ~1 dB SNR (thr=0.8*en),
    # highest band first - this is what produces the rising scf ladder with
    # barely-coded top bands on hard AUs instead of a flat one
    msnr_cand = bsel_c & ~no_ah & (minsnr < MSNR_FAC)
    msnr_rank = jnp.broadcast_to(NB - 1 - pos, hole_cand.shape)
    msnr_thr = MSNR_FAC * en_w

    # |x|^(3/4) computed once; the rate loop only rescales by 2^(-3/16 gain)
    mag075 = jnp.power(jnp.abs(spec), 0.75)
    neg = spec < 0
    bandsel_c = bandsel[:, None]                  # [S, 1, NB] per channel
    fb_c = force_break[:, None] if force_break is not None else None
    sect_hdr_c = sect_hdr[..., None] if short_ctx is not None else sect_hdr
    is_short_c = is_short[:, None] if is_short is not None else None

    # PNS flags were decided pre-MS (see above); expand to the line domain
    pns_line = bctx.to_lines(pns_mask)

    # ---- scalefactor-estimate correction (FDKaacEnc_improveScf,
    # sf_estim.cpp): the 3GPP form-factor formula is biased for tonal
    # bands; probe-quantize at the threshold target, measure the REAL
    # distortion and fold the per-band bias into the formula so the rate
    # loop's thresholds are actually met on the wire
    spec_abs0 = jnp.abs(spec)
    log_thr = jnp.log10(jnp.maximum(thr, 1e-30))

    def band_dist(gains):
        gf = gains.astype(dtype)
        scale = bctx.to_lines(jnp.exp2(-0.1875 * gf))
        qq = jnp.clip(jnp.floor(mag075 * scale + 0.4054), 0.0, 8191.0)
        deq = jnp.power(qq, 4.0 / 3.0) * bctx.to_lines(jnp.exp2(0.25 * gf))
        return bctx.reduce_f((spec_abs0 - deq) ** 2)

    scf_corr = jnp.zeros(en.shape, dtype)
    for _ in range(2):
        g_probe = jnp.clip(jnp.floor(
            8.8585 * (jnp.log10(6.75 * thr) - log_ffak) + scf_corr
        ).astype(jnp.int32), -100, 155)
        dist = band_dist(g_probe)
        # one-directional like the reference: only lower scfs whose real
        # distortion overshoots the threshold (never trade away headroom)
        scf_corr = jnp.clip(
            scf_corr + jnp.round(8.8585 * (log_thr - jnp.log10(
                jnp.maximum(dist, 1e-30)))), -16.0, 0.0)

    def count_for_gains(gains, use_dp=True, keep=None, want_bbits=False):
        """Quantize + exact bit count at explicit per-band gains.  With
        use_dp the sectioning DP (dyn_bits analogue) finds jointly-optimal
        codebooks; without it the per-band argmin is a safe upper bound
        (used in the coarse bracket pass only).  keep: optional [S, ch, NB]
        bool - bands outside it are zeroed entirely (crash recovery)."""
        scale = bctx.to_lines(jnp.exp2(-0.1875 * gains.astype(dtype)))
        q = jnp.clip(jnp.floor(mag075 * scale + 0.4054).astype(jnp.int32), 0, 8191)
        q = jnp.where(neg, -q, q)
        q = jnp.where(pns_line, 0, q)             # no spectral data for PNS
        pns_eff = pns_mask
        if keep is not None:
            q = jnp.where(bctx.to_lines(keep), q, 0)
            pns_eff = pns_mask & keep
        if use_dp:
            cost, _ = spectral_bits_and_books(q, bctx, bandsel_c,
                                              dtype, return_cost=True)
            sb = sect_hdr_c[..., None] if short_ctx is not None else SECT_BITS
            books = optimal_books(cost, bandsel_c & ~pns_eff, sect_bits=sb,
                                  force_break=fb_c)
            # masked sum, not take_along_axis: a [S,2,NB] gather measured
            # 0.7 ms/AU on TPU (profiled fusion.3917) vs ~0 for the select
            bbits = jnp.sum(jnp.where(books[..., None] ==
                                      jnp.arange(cost.shape[-1]), cost, 0),
                            axis=-1)
            books = jnp.where(bandsel_c, books, 0)
            bbits = jnp.where(bandsel_c, bbits, 0)
        else:
            books, bbits = spectral_bits_and_books(q, bctx, bandsel_c, dtype,
                                                   fast=True)
        books = jnp.where(pns_eff, PNS_HCB, books)
        bbits = jnp.where(pns_eff, 0, bbits)
        # transmitted gains: all-zero bands may still get a book > 0 from
        # the sectioning DP (merging saves header bits), so their scf enters
        # the dpcm chain - clamp THOSE into the nonzero bands' +-60 window
        # (their value is free: scf x zero spectrum reconstructs zero)
        qnz = (q != 0).astype(_mmdt())
        nzb = bctx.count(qnz[..., None])[..., 0] > 0.5
        gmax_nz = jnp.where(nzb, gains, -100).max(-1, keepdims=True)
        gmax_nz = jnp.where(nzb.any(-1, keepdims=True), gmax_nz, 100)
        g_safe = jnp.clip(gains, gmax_nz - 60, gmax_nz)
        g_tx = jnp.where(pns_eff, pns_nrg,
                         jnp.where(nzb, gains, g_safe))
        side = side_info_bits(books, g_tx, bandsel_c, dtype,
                              sect_hdr=sect_hdr_c, force_break=fb_c,
                              is_short=is_short_c)
        ch_bits = (bbits.sum(-1) + side + tns_bits)  # [S, ch]
        total = ch_bits.sum(-1) + elem_fixed + 3  # + ID_END
        total = total + 7  # byte-align worst case
        if want_bbits:
            return total, q, books, g_tx, bbits
        return total, q, books, g_tx

    def try_offset(o, use_dp=True):
        """Threshold-reduction rate-loop step (reduceThresholdsCBR,
        adj_thr.cpp:988-1053 in float): thr_red = (thr^1/4 + 2^(o/2))^4,
        capped at en*minSnr on avoid-hole bands, floored at en-29dB; for
        o < 0 the surplus budget buys extra precision below the psy
        threshold (our hard per-superframe budget makes that free)."""
        o = jnp.asarray(o, dtype)
        if o.ndim == 1:  # per-stream offsets
            o = o[:, None, None]
        redval = jnp.exp2(0.5 * o)
        thr_red = jnp.power(thr4 + redval, 4.0)
        thr_red = jnp.where(no_ah, thr_red, jnp.minimum(thr_red, cap_thr))
        thr_red = jnp.maximum(thr_red, floor29)
        # past MSNR_O the top sfbs drop to 1 dB SNR one by one (region B,
        # reduceMinSnr); past HOLE_O the offset opens holes in priority
        # order instead of flattening every band (allowMoreHoles).  Both
        # only ever RAISE thresholds with o: bits(o) stays monotone
        msnr_on = msnr_cand & \
            (msnr_rank.astype(dtype) < (o - MSNR_O) * MSNR_RATE)
        thr_red = jnp.where(msnr_on, jnp.maximum(thr_red, msnr_thr), thr_red)
        hole = hole_rank.astype(dtype) < (o - HOLE_O) * HOLE_RATE
        thr_red = jnp.where(hole, jnp.maximum(thr_red, hole_thr), thr_red)
        if wgt is not None:
            # reduction/caps run in the weighted domain; the final
            # thresholds are un-weighted again (adj_thr.cpp:2888-2899)
            thr_red = thr_red * wgt
        thr_red = thr_red * jnp.exp2(jnp.minimum(o, 0.0))
        # past the caps, degrade uniformly so any budget is attainable
        spill = jnp.maximum(o - SPILL_O, 0.0)
        scf = jnp.floor(8.8585 * (jnp.log10(6.75 * thr_red) - log_ffak)
                        + scf_corr + spill).astype(jnp.int32)
        # padded/inactive bands carry huge thresholds - exclude them
        # BEFORE the window clamp or their 155-clipped scfs drag every real
        # band's gain to the ceiling (empty-AU bug on the short ladder)
        gains = jnp.where(bandsel_c, jnp.clip(scf, -100, 155), -100)
        # clamp gains into a window of the per-channel max so dpcm stays legal
        gmax = gains.max(-1, keepdims=True)
        gains = jnp.clip(gains, gmax - 60, gmax)
        total, q, books, g_tx = count_for_gains(gains, use_dp)
        return total, (q, g_tx, books)

    # bisect the reduction exponent: bits(o) is monotone non-increasing in o,
    # so the smallest fitting offset in [O_LO, O_HI] is found with
    # ceil(log2(range)) exact counts instead of a dense coarse+fine scan.
    # O_LO = 0: never spend below the psy demand - like the reference,
    # sub-demand surplus is BANKED (leftover -> reservoir) and drained at
    # hard AUs, where a bit buys far more NMR than on easy AUs (measured:
    # force-spending easy AUs starved the transition AUs the PEAQ gap
    # concentrates in).  The refine loop still adds targeted precision.
    O_LO, O_HI = 0, 63
    n_steps = BISECT_STEPS if BISECT_STEPS is not None else \
        int(np.ceil(np.log2(O_HI - O_LO + 1)))
    lo = jnp.full_like(budget_bits, O_LO)
    hi = jnp.full_like(budget_bits, O_HI)

    def bisect(carry, _):
        lo, hi = carry
        mid = (lo + hi) // 2
        t, _ = try_offset(mid, use_dp=False)  # upper-bound count: safe
        fit = t <= budget_bits
        return (jnp.where(fit, lo, mid + 1), jnp.where(fit, mid, hi)), None

    if thr_override is not None:
        # diagnostic path (driven from tools/diag_lc_thr.py via the
        # encode_superframes kwarg): bypass the rate loop and quantize at
        # externally supplied per-band thresholds (e.g. the instrumented
        # reference's final thresholds), isolating threshold computation
        # from the coding machinery.  The refine scan below is also skipped
        # so the transplant is not nudged back toward OUR psy thresholds.
        thr_o = jnp.maximum(thr_override, 1e-10)
        scf = jnp.floor(8.8585 * (jnp.log10(6.75 * thr_o) - log_ffak)
                        + scf_corr).astype(jnp.int32)
        gains = jnp.where(bandsel_c, jnp.clip(scf, -100, 155), -100)
        gmax = gains.max(-1, keepdims=True)
        gains = jnp.clip(gains, gmax - 60, gmax)
        bits, q, books, gains = count_for_gains(gains)
    else:
        (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=n_steps)
        # hi = smallest INTEGER offset whose (upper-bound) count fits.  One
        # integer o step moves every scf by ~5 units (thr_red ~ 2^(2o) in
        # the reduction-dominated regime, scf = 8.8585*log10 -> 5.33
        # scf/o), so stopping here leaves up to several hundred bits of a
        # loud AU's budget unused - measured 1960/2200 bits on the
        # transition AUs the PEAQ gap concentrates in.  A short FRACTIONAL
        # bisect over (hi-1, hi] (bits(o) stays monotone; try_offset is
        # continuous in o) recovers that budget like the reference's
        # per-band scf iteration does.
        flo = jnp.maximum(hi.astype(dtype) - 1.0, float(O_LO))
        fhi = hi.astype(dtype)

        def fbisect(carry, _):
            flo, fhi = carry
            mid = 0.5 * (flo + fhi)
            t, _ = try_offset(mid, use_dp=False)
            fit = t <= budget_bits
            return (jnp.where(fit, flo, mid), jnp.where(fit, mid, fhi)), None

        (flo, fhi), _ = jax.lax.scan(fbisect, (flo, fhi), None,
                                     length=FRAC_BISECT_STEPS)
        # the final DP count can only be smaller than the upper-bound
        # count, so the budget is never overrun
        bits, (q, gains, books) = try_offset(fhi, use_dp=True)
    # `gains` now carries the transmitted values: scalefactors on spectral
    # bands, noise energies on PNS bands (the writers' noise chain source)

    # afterburner-style refinement (aacenc_lib afterburner analogue): spend
    # leftover budget by adding precision (gain-1) to the bands with the
    # worst measured noise-to-masking ratio, keeping only rounds that still
    # fit the budget exactly
    x_abs = jnp.abs(spec)
    thr_f = jnp.maximum(thr, 1e-10)

    def refine(carry, _):
        q, gains, books, bits = carry
        deq = jnp.power(jnp.abs(q).astype(dtype), 4.0 / 3.0) * \
            bctx.to_lines(jnp.exp2(0.25 * gains.astype(dtype)))
        err = (x_abs - deq) ** 2
        nmr = bctx.reduce_f(err) / thr_f
        gmax = gains.max(-1, keepdims=True)
        can = bandsel_c & (gains > gmax - 60)
        nmr = jnp.where(can, nmr, -jnp.inf)
        _, ti = jax.lax.top_k(nmr, REFINE_BANDS)  # [S, ch, K]
        dec = (ti[..., None] == jnp.arange(NB)).any(-2)
        gains2 = jnp.where(pns_mask, gains, gains - dec)
        total2, q2, books2, gains2 = count_for_gains(gains2)
        ok = (total2 <= budget_bits)[:, None, None]  # [S,1,1]
        return (jnp.where(ok, q2, q),
                jnp.where(ok, gains2, gains),
                jnp.where(ok, books2, books),
                jnp.where(ok[:, 0, 0], total2, bits)), None

    if refine_rounds and thr_override is None:
        (q, gains, books, bits), _ = jax.lax.scan(
            refine, (q, gains, books, bits), None, length=refine_rounds)

    # ---- per-stream crash recovery (FDKaacEnc_crashRecovery semantics,
    # qc_main.cpp:1149,1398): if the bisect exhausted its offset range and a
    # stream's exact count still exceeds its budget, zero spectral bands
    # from the top sfb down (both channels, like the reference lowering
    # maxSfb) until that AU fits - degrade ONE stream's frame instead of
    # aborting the batch.  lax.cond: the heavy recount only executes when an
    # overflow actually occurred (approximately never).
    def _recover(ops):
        q0, g0, books0, bits0 = ops
        over = bits0 > budget_bits
        # per-band costs of the over streams' solutions (exact recount of
        # the current transmitted gains; over streams are degraded anyway,
        # non-over streams keep their original outputs via the select below)
        t_full, _, _, _, bb = count_for_gains(g0, want_bbits=True)
        # cs[K] = spectral bits saved by zeroing bands >= K (both channels)
        bb_t = bb.sum(-2)                                    # [S, NB]
        cs = jnp.cumsum(bb_t[..., ::-1], -1)[..., ::-1]      # [S, NB]
        cs = jnp.concatenate([cs, jnp.zeros_like(cs[..., :1])], -1)  # K=NB
        # largest keep-count K whose estimate (+64-bit side-info margin,
        # dropping bands can split at most one section and merge scf deltas)
        # fits; fit(K) is monotone non-increasing in K
        fit = (t_full[:, None] - cs + 64) <= budget_bits[:, None]  # [S, NB+1]
        k_est = jnp.maximum(fit.sum(-1) - 1, 0)              # [S]
        keep_n = jnp.where(over, k_est, NB)
        keep = jnp.arange(NB)[None, None, :] < keep_n[:, None, None]
        t1, q1, books1, g1 = count_for_gains(g0, keep=keep)
        # guaranteed floor: the all-zero AU (books 0, no scf chain) always
        # fits any budget the superframe can grant
        books_z = jnp.zeros_like(books1)
        g_z = jnp.zeros_like(g1)
        side_z = side_info_bits(books_z, g_z, bandsel_c, dtype,
                                sect_hdr=sect_hdr_c, force_break=fb_c,
                                is_short=is_short_c)
        t_z = (side_z + tns_bits).sum(-1) + elem_fixed + 3 + 7
        use_zero = t1 > budget_bits
        sel = lambda a, b: jnp.where(
            use_zero.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        q1 = sel(jnp.zeros_like(q1), q1)
        g1 = sel(g_z, g1)
        books1 = sel(books_z, books1)
        t1 = jnp.where(use_zero, t_z, t1)
        ov = lambda a, b: jnp.where(
            over.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        return (ov(q1, q0), ov(g1, g0), ov(books1, books0),
                jnp.where(over, t1, bits0))

    q, gains, books, bits = jax.lax.cond(
        jnp.any(bits > budget_bits), _recover, lambda ops: ops,
        (q, gains, books, bits))
    # delivered per-band distortion (diagnostic tap; fused away when unused)
    deq_f = jnp.power(jnp.abs(q).astype(dtype), 4.0 / 3.0) * \
        bctx.to_lines(jnp.exp2(0.25 * gains.astype(dtype)))
    dist = bctx.reduce_f((x_abs - deq_f) ** 2)
    return dict(q=q, gains=gains, books=books, bits=bits, thr=thr, en=en,
                dist=dist, en_pre=en_pre, minsnr=minsnr,
                ms_used=ms_used, tns_en=tns_en, tns_order=tns_order,
                tns_idx=tns_idx, tns_en_lo=tns_en_lo,
                tns_order_lo=tns_order_lo, tns_idx_lo=tns_idx_lo,
                tns_len=tns_len,
                **pre_out, **w_out)
