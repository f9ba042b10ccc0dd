"""Vectorised psy model 1 for the TPU f32 throughput path.

Same masking model as psycho1.py, but with the sequential linked-list walks
re-expressed as data-parallel passes so nothing scans over the 512 bins:

  tonal labeling  -> bounded relaxation (3 rounds of shift-stencil updates)
  noise labeling  -> independent per-critical-band reductions
  0.5-bark merge  -> bounded pairwise relaxation
  thresholds      -> masker compaction (top-k) + linear-domain accumulation

The dB-domain add_db table in the reference is a 0.1dB-quantised approximation
of linear-power addition; this path uses exact linear-domain sums instead, so
SMRs differ from the bit-exact f64 path by well under the table's own
quantisation error.  Output frames remain valid MP2; tests measure the
decision divergence.  Use psycho1.psycho_1 (exact=True path) for bit-exact
validation on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T
from .psycho1 import NBINS, PAD, DBMIN, power_spectrum, minimum_mask, smr_from, subsample

_RELAX_ROUNDS = 3
_MERGE_ROUNDS = 4
MAX_TONE = 128


def _lin(x):
    return jnp.power(10.0, 0.1 * x)


def _db(p):
    return 10.0 * jnp.log10(jnp.maximum(p, 1e-37))


def tonal_fast(power, cand, dtype):
    """Left-causal relaxation version of the tonal walk.

    The sequential walk processes candidates in bin order, so a candidate's
    decision depends only on mutations (zeroing/boosting) from ACCEPTED
    candidates strictly to its left.  We encode that causality with
    min_zeroer[b] = smallest accepted bin that zeroes b: bin b reads as DBMIN
    for an observer at c iff min_zeroer[b] < c.  Iterating the decision from
    scratch converges to the sequential fixpoint (dependency chains are short;
    _RELAX_ROUNDS bounds them).  Returns (power', member)."""
    B = power.shape[0]
    runs = jnp.asarray(T.TONAL_RUN)  # [512]
    bins = jnp.arange(NBINS)
    BIG = NBINS + 1

    def min_zeroer(accept):
        mz = jnp.full((B, NBINS), BIG, jnp.int32)
        for d in range(1, PAD + 1):
            src = accept & (runs >= d)
            zr = jnp.roll(src, d, 1) & (bins >= d)          # accepter at b-d
            zl = jnp.roll(src, -d, 1) & (bins < NBINS - d)  # accepter at b+d
            mz = jnp.where(zr, jnp.minimum(mz, bins - d), mz)
            mz = jnp.where(zl, jnp.minimum(mz, bins + d), mz)
        return mz

    def boost_values(mz):
        """boosted dB of each bin as if accepted at its own turn (neighbours
        read DBMIN if zeroed before that turn)."""
        def nb(shift):
            v = jnp.roll(power, shift, 1)
            m = jnp.roll(mz, shift, 1)
            return jnp.where(m < bins, 0.0, _lin(v))
        return _db(_lin(power) + nb(1) + nb(-1))

    def decide(accept):
        mz = min_zeroer(accept)
        boost = boost_values(mz)
        excluded = mz < bins
        maxv = power - 7.0
        viol = jnp.zeros_like(cand)
        for o in list(range(-PAD, -1)) + list(range(2, PAD + 1)):
            b_ok = (bins + o >= 0) & (bins + o < NBINS)
            mz_o = jnp.roll(mz, -o, 1)
            acc_o = jnp.roll(accept, -o, 1)
            val = jnp.where(mz_o < bins, DBMIN,
                            jnp.where(acc_o & (o < 0), jnp.roll(boost, -o, 1),
                                      jnp.roll(power, -o, 1)))
            viol = viol | ((runs >= abs(o)) & b_ok & (maxv < val))
        return cand & ~excluded & ~viol

    accept = decide(jnp.zeros_like(cand))
    for _ in range(_RELAX_ROUNDS - 1):
        accept = decide(accept)

    mz = min_zeroer(accept)
    boost = boost_values(mz)
    # list surgery (psycho_1.c:313-315): member `prev` is dropped when the
    # next accepted `b` is within run(b), provided prev has a predecessor
    midx = jnp.where(accept, bins[None, :], -1)
    prev_inc = jax.lax.associative_scan(jnp.maximum, midx, axis=1)
    prev = jnp.concatenate([jnp.full((B, 1), -1), prev_inc[:, :-1]], axis=1)
    pprev = jnp.take_along_axis(prev, jnp.maximum(prev, 0), 1)
    drop_prev_at = accept & (prev >= 0) & ((bins - prev) <= runs) & (pprev >= 0)
    member = accept & ~jnp.zeros_like(accept).at[
        jnp.arange(B)[:, None], jnp.maximum(prev, 0)].max(drop_prev_at)

    zeroed = mz < BIG
    power = jnp.where(zeroed, DBMIN, jnp.where(accept, boost, power))
    typ = accept & ~zeroed  # type==TONE after the walk (zeroing clears it)
    return power, member, typ


def noise_fast(power, is_tone, energy, band_matrix, centre_base, centre_span, dtype):
    """Independent per-band noise maskers.

    band_matrix: [NBANDS, 512] one-hot rows for each critical band;
    centre_base/centre_span: [B or 1, NBANDS] cbound[k], width.
    Returns (power', noise_member)."""
    usable = (~is_tone) & (power != DBMIN)
    p_lin = _lin(power) * usable
    bins = jnp.arange(NBINS, dtype=dtype)

    def bandsum(x):
        if band_matrix.ndim == 2:
            return x @ band_matrix.T                  # [B, NBANDS]
        return jnp.einsum("bn,bkn->bk", x, band_matrix)

    # CF*energy weighting with the in-band position fraction
    sums = bandsum(p_lin)
    wsum = bandsum(T.CF * energy * usable)
    wpos = bandsum(T.CF * energy * usable * bins)
    span = jnp.maximum(centre_span, 1).astype(dtype)
    weight = (wpos - centre_base.astype(dtype) * wsum) / span
    no_comp = sums <= 0.0
    sum_db = _db(sums)
    index = weight / jnp.maximum(sums, 1e-37)
    centre = centre_base + (index * span).astype(jnp.int32)
    centre = jnp.where(no_comp, centre_base + centre_span // 2, centre)
    centre = jnp.clip(centre, 0, NBINS - 1)
    # Iwadare adjust
    t_c = jnp.take_along_axis(is_tone, centre, 1)
    t_c1 = jnp.take_along_axis(is_tone, jnp.clip(centre + 1, 0, NBINS - 1), 1)
    centre = jnp.clip(jnp.where(t_c, jnp.where(t_c1, centre + 1, centre - 1), centre),
                      0, NBINS - 1)
    valid = centre_span > 0
    sum_db = jnp.where(no_comp, jnp.asarray(DBMIN, dtype), sum_db)
    member = jnp.zeros_like(is_tone)
    member = member.at[jnp.arange(member.shape[0])[:, None], centre].max(valid)
    # consumed lines -> DBMIN; then centre writes in band order (a later
    # band's empty-sum centre can overwrite an earlier masker - noise_label
    # mutates in place, psycho_1.c:390-397)
    if band_matrix.ndim == 2:
        inband = (band_matrix.sum(0) > 0)[None, :]
    else:
        inband = (band_matrix.sum(1) > 0)
    power = jnp.where(usable & inband, DBMIN, power)
    bins_i = jnp.arange(NBINS)
    for k in range(centre.shape[1]):
        oh = (bins_i[None, :] == centre[:, k, None]) & valid[:, k, None]
        power = jnp.where(oh, sum_db[:, k, None], power)
    return power, member


def merge_fast(power, member, bark_of_bin, dtype):
    """Bounded-relaxation 0.5-bark pairwise merge."""
    B = power.shape[0]
    bins = jnp.arange(NBINS)
    for _ in range(_MERGE_ROUNDS):
        # previous member index per position (exclusive cummax of masked iota)
        midx = jnp.where(member, bins[None, :], -1)
        prev_inc = jax.lax.associative_scan(jnp.maximum, midx, axis=1)
        prev = jnp.concatenate([jnp.full((B, 1), -1), prev_inc[:, :-1]], axis=1)
        has_prev = member & (prev >= 0)
        pidx = jnp.maximum(prev, 0)
        bk_p = jnp.take_along_axis(bark_of_bin, pidx, 1)
        x_p = jnp.take_along_axis(power, pidx, 1)
        close = has_prev & ((bark_of_bin - bk_p) < 0.5)
        drop_self = close & (power <= x_p)
        drop_prev_at = close & (power > x_p)
        # scatter drop of prev
        dropped_prev = jnp.zeros_like(member)
        dropped_prev = dropped_prev.at[jnp.arange(B)[:, None], pidx].max(drop_prev_at)
        newm = member & ~drop_self & ~dropped_prev
        if True:
            changed = newm != member
        member = newm
        power = jnp.where(member | ~(drop_self | dropped_prev), power, DBMIN)
    return power, member


def threshold_fast(power, tone_m, noise_m, map_of_bin, bark_line, hear_line,
                   sub_size, low_rate, dtype):
    """Linear-domain global threshold with masker compaction."""
    B, NLINE = bark_line.shape
    ks = jnp.arange(NLINE)
    kvalid = (ks[None, :] >= 1) & (ks[None, :] < sub_size[:, None])

    def accumulate(member, c_bark, c_off, kmax):
        score = jnp.where(member, 1000000 - jnp.arange(NBINS), 0)
        _, idx = jax.lax.top_k(score, kmax)           # [B, kmax] masker bins
        m = jnp.take_along_axis(member, idx, 1)       # valid flags
        x_t = jnp.take_along_axis(power, idx, 1)
        mp = jnp.take_along_axis(map_of_bin, idx, 1)
        bark_t = jnp.take_along_axis(bark_line, mp, 1)
        dz = bark_line[:, None, :] - bark_t[:, :, None]        # [B, K, NLINE]
        in_rng = (dz >= -3.0) & (dz < 8.0)
        tmps = -1.525 + c_bark * bark_t + c_off + x_t          # [B, K]
        xt = x_t[:, :, None]
        vf = jnp.where(dz < -1.0, 17.0 * (dz + 1.0) - (0.4 * xt + 6.0),
             jnp.where(dz < 0.0, (0.4 * xt + 6.0) * dz,
             jnp.where(dz < 1.0, -17.0 * dz,
                       -(dz - 1.0) * (17.0 - 0.15 * xt) - 17.0)))
        contrib = _lin(tmps[:, :, None] + vf) * (in_rng & m[:, :, None])
        return contrib.sum(axis=1)                              # [B, NLINE]

    acc = accumulate(tone_m, -0.275, -4.5, MAX_TONE)
    acc = acc + accumulate(noise_m, -0.175, -0.5, 32)
    base = jnp.where(low_rate[:, None], hear_line, hear_line - 12.0)
    ltg = _db(_lin(base) + acc)
    return jnp.where(kvalid, ltg, DBMIN)


def psycho_1_fast(samples, scale_max, psy_tabs, low_rate, dtype=jnp.float32):
    """Drop-in replacement for psycho1.psycho_1 on the f32 path."""
    power, energy, spike = power_spectrum(samples, dtype)

    prev = power[:, 1:-1] > power[:, :-2]
    nxt = power[:, 1:-1] >= power[:, 2:]
    cand = jnp.zeros_like(power, dtype=bool).at[:, 1:-1].set(prev & nxt)
    cand = cand & ((jnp.arange(NBINS) >= 2) & (jnp.arange(NBINS) < NBINS - PAD))

    power, tone_m, tone_typ = tonal_fast(power, cand, dtype)
    power, noise_m = noise_fast(power, tone_typ, energy,
                                psy_tabs["band_matrix"], psy_tabs["centre_base"],
                                psy_tabs["centre_span"], dtype)
    hear_of_bin = psy_tabs["hear_of_bin"]
    power, tone_m = subsample(power, tone_m, hear_of_bin)
    power, noise_m = subsample(power, noise_m, hear_of_bin)
    bark_of_bin = psy_tabs["bark_of_bin"]
    power, tone_m = merge_fast(power, tone_m, bark_of_bin, dtype)

    ltg = threshold_fast(power, tone_m, noise_m, psy_tabs["map"],
                         psy_tabs["bark_line"], psy_tabs["hear_line"],
                         psy_tabs["sub_size"], low_rate, dtype)
    ltmin = minimum_mask(ltg, psy_tabs["line_sb"], psy_tabs["hear_line"],
                         psy_tabs["sub_size"])
    return smr_from(ltmin, spike, scale_max, dtype)


def make_fast_tables(psy_tabs_np, dtype=np.float32):
    """Extend make_psy1_tables output with per-band one-hot matrices.
    Assumes a single samplerate per batch is NOT required: bands are padded to
    the max count; rows are per-B via centre_base/span, but the 0/1 matrix is
    shared when all rate indices match (common case); otherwise per-B masks
    are folded into centre_span=0 rows."""
    cb = psy_tabs_np["cbound"]          # [B, 27]
    nc = psy_tabs_np["n_cband"]         # [B]
    B = cb.shape[0]
    NBANDS = 26
    base = np.zeros((B, NBANDS), np.int32)
    span = np.zeros((B, NBANDS), np.int32)
    for b in range(B):
        n = int(nc[b])
        for k in range(min(n - 1, NBANDS)):
            base[b, k] = cb[b, k]
            span[b, k] = cb[b, k + 1] - cb[b, k]
    # one-hot band matrix: if rows differ per-B this needs [B, NBANDS, 512];
    # build per-B only when needed, else share.
    uniq = np.unique(np.concatenate([base, span], 1), axis=0)
    if len(uniq) == 1:
        bm = np.zeros((NBANDS, 512), dtype)
        for k in range(NBANDS):
            if span[0, k] > 0:
                bm[k, base[0, k]: base[0, k] + span[0, k]] = 1.0
        band_matrix = bm
    else:
        # fall back: per-stream matrices folded to [B*?]; keep simple by using
        # the densest (48k) grid per stream via batched one-hot
        bm = np.zeros((B, NBANDS, 512), dtype)
        for b in range(B):
            for k in range(NBANDS):
                if span[b, k] > 0:
                    bm[b, k, base[b, k]: base[b, k] + span[b, k]] = 1.0
        band_matrix = bm
    return {"band_matrix": band_matrix, "centre_base": base, "centre_span": span}
