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

_RELAX_ROUNDS = 1
_MERGE_ROUNDS = 1
MAX_TONE = 64


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
    # Iwadare adjust; tone flags at centre/centre+1 via one-hot compares
    oh_c = centre[:, :, None] == jnp.arange(NBINS)          # [B, NBANDS, 512]
    t_c = (oh_c & is_tone[:, None, :]).any(-1)
    tone_next = jnp.concatenate([is_tone[:, 1:],
                                 jnp.zeros_like(is_tone[:, :1])], axis=1)
    t_c1 = (oh_c & tone_next[:, None, :]).any(-1)
    centre = jnp.clip(jnp.where(t_c, jnp.where(t_c1, centre + 1, centre - 1), centre),
                      0, NBINS - 1)
    valid = centre_span > 0
    sum_db = jnp.where(no_comp, jnp.asarray(DBMIN, dtype), sum_db)
    # consumed lines -> DBMIN; then centre writes in band order (a later
    # band's empty-sum centre can overwrite an earlier masker - noise_label
    # mutates in place, psycho_1.c:390-397).  member/power centre writes are
    # one-hot compares accumulated in band order - no gather/scatter kernels.
    if band_matrix.ndim == 2:
        inband = (band_matrix.sum(0) > 0)[None, :]
    else:
        inband = (band_matrix.sum(1) > 0)
    power = jnp.where(usable & inband, DBMIN, power)
    bins_i = jnp.arange(NBINS)
    member = jnp.zeros_like(is_tone)
    for k in range(centre.shape[1]):
        oh = (bins_i[None, :] == centre[:, k, None]) & valid[:, k, None]
        power = jnp.where(oh, sum_db[:, k, None], power)
        member = member | oh
    return power, member


def compact_maskers(member, power, bark_of_bin, kmax, dtype):
    """Compact the sparse masker set to its first `kmax` members (bin order).
    Returns (m [B,K] valid, x [B,K] dB, bk [B,K] bark at the masker bin —
    which IS threshold's bark_t, since bark_of_bin = bark_line[map]).
    Implemented as a rank one-hot + ONE batched matmul so it lowers to the
    MXU instead of sort/gather kernels (gather/scatter/top_k each cost a
    dispatch round-trip that dwarfs the math at this size)."""
    rank = jnp.cumsum(member, axis=1) - 1                       # [B, N]
    ks = jnp.arange(kmax)
    oh = (rank[:, :, None] == ks[None, None, :]) & member[:, :, None]
    vals = jnp.stack([power, bark_of_bin * jnp.ones_like(power)], axis=-1)
    out = jnp.einsum("bnk,bnc->bkc", oh.astype(dtype), vals)
    m = oh.any(axis=1)
    return m, out[..., 0], out[..., 1]


def merge_compact(m, x, bk):
    """Bounded-relaxation 0.5-bark pairwise merge, in the compact [B,K]
    masker domain (entries are already in ascending-bin order, so the
    previous list member is just the previous valid compact slot).
    Gathers/scatters at prev-indices are one-hot matmuls (MXU)."""
    B, K = m.shape
    ks = jnp.arange(K)
    dtype = x.dtype
    vals = jnp.stack([bk, x], axis=-1)                          # [B, K, 2]
    for _ in range(_MERGE_ROUNDS):
        midx = jnp.where(m, ks[None, :], -1)
        prev_inc = jax.lax.associative_scan(jnp.maximum, midx, axis=1)
        prev = jnp.concatenate([jnp.full((B, 1), -1), prev_inc[:, :-1]], axis=1)
        p_oh = ((prev[:, :, None] == ks[None, None, :])).astype(dtype)  # [B,K,J]
        pv = jnp.einsum("bkj,bjc->bkc", p_oh, vals)
        bk_p, x_p = pv[..., 0], pv[..., 1]
        close = m & (prev >= 0) & ((bk - bk_p) < 0.5)
        drop_self = close & (x <= x_p)
        drop_prev_at = close & (x > x_p)
        dropped_prev = jnp.einsum("bkj,bk->bj", p_oh,
                                  drop_prev_at.astype(dtype)) > 0.5
        m = m & ~drop_self & ~dropped_prev
    return m


def threshold_fast(tone_c, noise_c, bark_line, hear_line,
                   sub_size, low_rate, dtype):
    """Linear-domain global threshold over pre-compacted masker sets.
    tone_c/noise_c: (m [B,K], x [B,K], bark_t [B,K]) from compact_maskers."""
    B, NLINE = bark_line.shape
    ks = jnp.arange(NLINE)
    kvalid = (ks[None, :] >= 1) & (ks[None, :] < sub_size[:, None])

    def accumulate(m, x_t, bark_t, c_bark, c_off):
        # single fused [B, K_tone+K_noise, NLINE] pass for both masker types
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

    m = jnp.concatenate([tone_c[0], noise_c[0]], axis=1)
    x = jnp.concatenate([tone_c[1], noise_c[1]], axis=1)
    bk = jnp.concatenate([tone_c[2], noise_c[2]], axis=1)
    kt = tone_c[0].shape[1]
    c_bark = jnp.where(jnp.arange(m.shape[1]) < kt, -0.275, -0.175)
    c_off = jnp.where(jnp.arange(m.shape[1]) < kt, -4.5, -0.5)
    acc = accumulate(m, x, bk, c_bark, c_off)
    base = jnp.where(low_rate[:, None], hear_line, hear_line - 12.0)
    ltg = _db(_lin(base) + acc)
    return jnp.where(kvalid, ltg, DBMIN)


def minimum_mask_fast(ltg_x, hear_line, static_mm):
    """minimum_mask with the config-static structure baked in: the j pointer,
    tail flags, and the line->subband match sets depend only on the
    (homogeneous) sample rate.  Runtime work is one masked min-reduce and one
    one-hot matmul — two fused kernels instead of 32 gathers."""
    mask, tail, j_onehot, has_match, ss = static_mm
    dtype = ltg_x.dtype
    big = jnp.asarray(np.finfo(np.float32).max, dtype)
    min_match = jnp.where(jnp.asarray(mask)[None], ltg_x[:, :, None], big).min(1)
    x_at_j = ltg_x @ jnp.asarray(j_onehot, dtype)               # [B, 32]
    out = jnp.where(jnp.asarray(has_match)[None], min_match, x_at_j)
    return jnp.where(jnp.asarray(tail)[None], hear_line[:, ss - 1][:, None], out)


def psycho_1_fast(samples, scale_max, psy_tabs, low_rate, dtype=jnp.float32,
                  use_pallas=None):
    """Drop-in replacement for psycho1.psycho_1 on the f32 path.

    use_pallas: run the tonal relaxation as one fused Pallas kernel
    (psycho1_pallas) - the default enables it on TPU backends, where the
    ~100-shift jnp formulation is dispatch-bound (it alone was ~80% of the
    whole MP2 encode step)."""
    power, energy, spike = power_spectrum(samples, dtype)

    prev = power[:, 1:-1] > power[:, :-2]
    nxt = power[:, 1:-1] >= power[:, 2:]
    cand = jnp.zeros_like(power, dtype=bool).at[:, 1:-1].set(prev & nxt)
    cand = cand & ((jnp.arange(NBINS) >= 2) & (jnp.arange(NBINS) < NBINS - PAD))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    nu = psy_tabs.get("static_noise_uniform")
    # the fused tonal+noise variant measured slightly slower than
    # tonal-kernel + XLA noise on v5e (the in-kernel [T,512]x[512,32]
    # matmuls beat XLA's batched fusion by nothing and cost VMEM); keep it
    # available but off by default
    if use_pallas == "fused-noise" and nu is not None:
        from .psycho1_pallas import tonal_noise_pallas
        bmt, base32, span32 = nu
        power, tone_m, noise_m = tonal_noise_pallas(
            power, cand, energy, jnp.asarray(bmt), jnp.asarray(base32),
            jnp.asarray(span32))
    else:
        if use_pallas:
            from .psycho1_pallas import tonal_pallas
            power, tone_m, tone_typ = tonal_pallas(power, cand, dtype)
        else:
            power, tone_m, tone_typ = tonal_fast(power, cand, dtype)
        power, noise_m = noise_fast(power, tone_typ, energy,
                                    psy_tabs["band_matrix"], psy_tabs["centre_base"],
                                    psy_tabs["centre_span"], dtype)
    hear_of_bin = psy_tabs["hear_of_bin"]
    power, tone_m = subsample(power, tone_m, hear_of_bin)
    power, noise_m = subsample(power, noise_m, hear_of_bin)

    # compact both masker sets once; merge + threshold run in [B,K] domain
    bark_of_bin = psy_tabs["bark_of_bin"]
    m_t, x_t, bk_t = compact_maskers(tone_m, power, bark_of_bin, MAX_TONE, dtype)
    m_t = merge_compact(m_t, x_t, bk_t)
    m_n, x_n, bk_n = compact_maskers(noise_m, power, bark_of_bin, 32, dtype)

    ltg = threshold_fast((m_t, x_t, bk_t), (m_n, x_n, bk_n),
                         psy_tabs["bark_line"], psy_tabs["hear_line"],
                         psy_tabs["sub_size"], low_rate, dtype)
    if psy_tabs.get("static_mm") is not None:
        ltmin = minimum_mask_fast(ltg, psy_tabs["hear_line"],
                                  psy_tabs["static_mm"])
    else:
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

    out = {"band_matrix": band_matrix, "centre_base": base, "centre_span": span}
    # uniform geometry for the fused pallas kernel (homogeneous rates): the
    # transposed, 32-col-padded band matrix and one base/span row
    if band_matrix.ndim == 2 and len(np.unique(np.concatenate([base, span], 1), axis=0)) == 1:
        bmt = np.zeros((512, 32), dtype)
        bmt[:, :NBANDS] = band_matrix.T
        base32 = np.zeros(32, np.int32)
        span32 = np.zeros(32, np.int32)
        base32[:NBANDS] = base[0]
        span32[:NBANDS] = span[0]
        out["static_noise_uniform"] = (bmt, base32, span32)
    else:
        out["static_noise_uniform"] = None

    # static minimum_mask structure (homogeneous sample rate only): the line
    # -> subband map, j pointer and tail flags are data-independent
    ls_rows = psy_tabs_np["line_sb"]
    ss_rows = psy_tabs_np["sub_size"]
    if len(np.unique(ls_rows, axis=0)) == 1 and len(np.unique(ss_rows)) == 1:
        NLINE = ls_rows.shape[1]
        ss = int(ss_rows[0])
        ls = ls_rows[0]
        valid = (np.arange(NLINE) >= 1) & (np.arange(NLINE) < ss)
        sbl = np.where(valid, ls, 999)
        j_raw = 1 + (sbl[None, :] < np.arange(32)[:, None]).sum(1)
        j_i = np.clip(j_raw, 0, NLINE - 1)
        tail = j_raw >= ss - 1
        mask = sbl[:, None] == np.arange(32)[None, :]           # [NLINE, 32]
        has_match = mask.any(0)
        j_onehot = np.zeros((NLINE, 32), dtype)
        j_onehot[j_i, np.arange(32)] = 1.0
        out["static_mm"] = (mask, tail, j_onehot, has_match, ss)
    else:
        out["static_mm"] = None
    return out
