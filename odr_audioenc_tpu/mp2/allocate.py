"""Batched Layer-II scalefactor / scfsi / bit-allocation / quantization.

Re-expression of libtoolame-dab/encode_new.c for [S]-stream batches.  The
reference's data-dependent loops become:
  scalefactor binary search  -> comparison count against the 64-entry table
  scfsi class/pattern logic  -> table gathers + selects
  joint-stereo mode_ext walk -> 5 vectorised bits_for_nonoise variants
  greedy min-MNR allocation  -> lax.while_loop with per-stream done flags,
                                argmin tie-break matching the C scan order
  quantizer                  -> elementwise (d*a+b, MSB invert)

All decision comparisons replicate the C expressions so the f64 path is
bit-exact; the same code runs in f32 on TPU.
"""
import jax
import jax.numpy as jnp
import numpy as np

from .. import tables as T

SBLIMIT = 32
BANC = 32  # header bits
BERR = 16  # CRC bits (error_protection always on in the DAB tool)


def _onehot_lut(idx, table):
    """table[idx] as a one-hot select+reduce (fuses; avoids gather kernels,
    whose dispatch cost dwarfs the data at these sizes).  Exact: sums one
    element.  idx [...], table [n] -> [...] in table.dtype."""
    oh = idx[..., None] == jnp.arange(table.shape[0])
    return (oh * table).sum(-1, dtype=table.dtype)


def _onehot_sel(rows, idx):
    """rows [..., n] selected at idx [...] via one-hot (same rationale)."""
    oh = idx[..., None] == jnp.arange(rows.shape[-1])
    return (oh * rows).sum(-1, dtype=rows.dtype)


def scalefactor_calc(sb_sample, dtype):
    """sb_sample: [..., 3, 12, 32] -> sf indices [..., 3, 32]
    (scalefactor_calc_new, encode_new.c:179-230)."""
    cur_max = jnp.abs(sb_sample).max(axis=-2)  # [..., 3, 32]
    tab = jnp.asarray(T.SCALEFACTOR, dtype)
    count = (tab >= cur_max[..., None]).sum(axis=-1)
    return jnp.clip(count - 1, 0, 63).astype(jnp.int32)


def find_sf_max(sf_index, sblimit, dtype):
    """multiple[min over gr] per (ch, sb); 1e-20 above sblimit
    (find_sf_max, encode_new.c:260-277).  sf_index: [B, 2, 3, 32]."""
    low = sf_index.min(axis=-2)  # [B, 2, 32]
    mult = jnp.asarray(T.SCALEFACTOR, dtype)[low]
    mask = jnp.arange(SBLIMIT) < sblimit[:, None, None]
    return jnp.where(mask, mult, 1e-20)


def combine_lr(sb_sample):
    """joint = .5*(L+R) (combine_LR_new, encode_new.c:237-246)."""
    return 0.5 * (sb_sample[:, 0] + sb_sample[:, 1])


# scfsi pattern -> (code, action) where action selects the rewritten
# (sf0, sf1, sf2).  Patterns enumerated: 0x123,0x122,0x133,0x113,0x111,
# 0x222,0x333,0x444  (sf_transmission_pattern, encode_new.c:288-354)
_PATTERNS = [0x123, 0x122, 0x133, 0x113, 0x111, 0x222, 0x333, 0x444]
_PAT_CODE = np.array([0, 3, 3, 1, 2, 2, 2, 2], np.int32)
_PAT_LUT = np.zeros((5, 5), np.int32)
for _i in range(5):
    for _j in range(5):
        _PAT_LUT[_i, _j] = _PATTERNS.index(int(T.SCFSI_PATTERN[_i, _j]))


def sf_transmission_pattern(sf_index):
    """sf_index: [B, 2, 3, 32] -> (adjusted sf_index, scfsi [B, 2, 32])."""
    sf0, sf1, sf2 = sf_index[..., 0, :], sf_index[..., 1, :], sf_index[..., 2, :]
    d0 = sf0.astype(jnp.int32) - sf1.astype(jnp.int32)
    d1 = sf1.astype(jnp.int32) - sf2.astype(jnp.int32)

    def classify(d):
        return jnp.where(d <= -3, 0,
               jnp.where(d < 0, 1,
               jnp.where(d == 0, 2,
               jnp.where(d < 3, 3, 4))))

    pat = jnp.asarray(_PAT_LUT)[classify(d0), classify(d1)]  # [B, 2, 32]
    code = jnp.asarray(_PAT_CODE)[pat]

    min02 = jnp.minimum(sf0, sf2)
    # per-pattern rewritten scalefactors
    n0 = jnp.select([pat == 5, pat == 6, pat == 7], [sf1, sf2, min02], sf0)
    n1 = jnp.select([pat == 3, pat == 4, pat == 2, pat == 5, pat == 6, pat == 7],
                    [sf0, sf0, sf2, sf1, sf2, min02], sf1)
    n2 = jnp.select([pat == 1, pat == 4, pat == 5, pat == 6, pat == 7],
                    [sf1, sf0, sf1, sf2, min02], sf2)
    out = jnp.stack([n0, n1, n2], axis=-2)
    return out, code


def _frame_tables(tablenum):
    """Per-stream gathered alloc tables.  tablenum: [B] -> dict of [B,32] /
    [B,32,16] arrays.  line==-1 (above sblimit) maps to nbal 0, matching the
    reference's benign OOB read of nbal[-1] (== step_index[8][15] == 0)."""
    line = jnp.asarray(T.LINE)[tablenum]  # [B, 32]
    line_c = jnp.maximum(line, 0)
    nbal = jnp.where(line < 0, 0, jnp.asarray(T.NBAL)[line_c])
    step_idx = jnp.asarray(T.STEP_INDEX)[line_c]  # [B, 32, 16]
    max_alloc = (1 << nbal) - 1  # [B, 32]; 0 above sblimit
    # config-static per-step lookups (avoid runtime gathers on TPU)
    snr_steps = jnp.asarray(T.SNR)[step_idx]                      # [B,32,16]
    gb_steps = (12 * jnp.asarray(T.GROUP) * jnp.asarray(T.BITS))[step_idx]
    return {"line": line, "nbal": nbal, "step_idx": step_idx,
            "max_alloc": max_alloc, "snr_steps": snr_steps,
            "gb_steps": gb_steps}


def _ba_for_mnr(smr, step_idx, max_alloc, sblimit, nch, jsbound, dtype,
                snr_steps=None):
    """First allocation index reaching min_mnr=0 per (ch, sb), with the
    joint-stereo continuation = max over channels above jsbound
    (bits_for_nonoise_new, encode_new.c:668-703)."""
    snr = snr_steps.astype(dtype)  # [B, 32, 16]
    ok = (snr[:, None] - smr[..., None]) >= 0.0  # [B, 2, 32, 16]
    ok = ok & (jnp.arange(16) < (max_alloc[:, None, :, None] - 1))
    # first index where ok, else max_alloc-1
    first = jnp.argmax(ok, axis=-1)
    any_ok = ok.any(axis=-1)
    ba = jnp.where(any_ok, first, jnp.maximum(max_alloc[:, None, :] - 1, 0))
    # joint: above jsbound use max over channels (and only ch0 slot counts)
    is_js = (jnp.arange(SBLIMIT)[None, :] >= jsbound[:, None]) & (nch[:, None] == 2)
    ba_js = jnp.maximum(ba[:, 0], ba[:, 1])
    ba = ba.at[:, 0].set(jnp.where(is_js, ba_js, ba[:, 0]))
    return ba  # [B, 2, 32]


def bits_for_nonoise(smr, scfsi, ft, sblimit, nch, jsbound, dtype):
    """Total bits required for transparent coding at a given jsbound
    (bits_for_nonoise_new)."""
    sb = jnp.arange(SBLIMIT)[None, :]
    below = sb < sblimit[:, None]
    chmul = jnp.where(sb < jsbound[:, None], nch[:, None], 1)
    bbal = (ft["nbal"] * chmul * below).sum(axis=1)
    req = BANC + bbal + BERR

    ba = _ba_for_mnr(smr, ft["step_idx"], ft["max_alloc"], sblimit, nch,
                     jsbound, dtype, snr_steps=ft["snr_steps"])
    smp = _onehot_sel(ft["gb_steps"][:, None], ba)  # 12*group*bits at ba
    sfs = _onehot_lut(scfsi, jnp.asarray(T.SFS_PER_SCFSI))  # [B,2,32]
    sel = jnp.full_like(smp, 2)
    sc = 6 * sfs
    is_js = (sb >= jsbound[:, None])[:, None, :] & (nch[:, None, None] == 2)
    sel = sel + jnp.where(is_js, 2, 0)
    sc = sc + jnp.where(is_js, 6 * sfs[:, ::-1], 0)
    # channel loop: ch < nch below jsbound, ch < 1 above
    ch_on = jnp.stack([jnp.ones_like(is_js[:, 0]),
                       (~is_js[:, 0]) & (nch[:, None] == 2)], axis=1)
    active = ch_on & below[:, None, :] & (ba > 0)
    req = req + jnp.where(active, smp + sel + sc, 0).sum(axis=(1, 2))
    return req


def js_mode_select(smr, scfsi, ft, sblimit, nch, is_joint, adb, dtype):
    """Joint-stereo mode_ext walk-down (main_bit_allocation_new,
    encode_new.c:803-819).  Returns (mode_is_stereo [B]bool, mode_ext [B],
    jsbound [B])."""
    variants = [sblimit, jnp.full_like(sblimit, 16), jnp.full_like(sblimit, 12),
                jnp.full_like(sblimit, 8), jnp.full_like(sblimit, 4)]
    reqs = [bits_for_nonoise(smr, scfsi, ft, sblimit, nch, v, dtype) for v in variants]
    fits = [r <= adb for r in reqs]
    # first fitting variant in order [stereo, ext3, ext2, ext1]; else ext0
    idx = jnp.select([fits[0], fits[1], fits[2], fits[3]],
                     [0, 1, 2, 3], 4)
    idx = jnp.where(is_joint, idx, 0)
    mode_is_stereo = idx == 0
    mode_ext = jnp.where(mode_is_stereo, 0, 4 - idx)
    jsbound = jnp.where(is_joint & ~mode_is_stereo,
                        jnp.asarray(T.JSB_TABLE)[jnp.clip(mode_ext, 0, 3)], sblimit)
    return mode_is_stereo, mode_ext, jsbound


def _ladder_tables(smr, scfsi, ft, sblimit, nch, jsbound, dtype):
    """Rung tables for the sorted-greedy allocator.

    A 'ladder' is one (ch, sb) allocation slot; above jsbound in stereo the
    two channels share one ladder (in channel-0's slot) whose MNR uses
    max(SMR_L, SMR_R) - exactly what the C greedy converges to since the
    mirrored update keeps both channels' allocations equal and the argmin
    always sees the worse channel first.

    Returns dict with [B, 64] ladder data and [B, 64, 16] rung data."""
    B = smr.shape[0]
    sb = jnp.arange(SBLIMIT)[None, :]
    below = sb < sblimit[:, None]
    is_js = (sb >= jsbound[:, None]) & (nch[:, None] == 2)  # [B, 32]

    smr_eff0 = jnp.where(is_js, jnp.maximum(smr[:, 0], smr[:, 1]), smr[:, 0])
    smr_eff = jnp.stack([smr_eff0, smr[:, 1]], axis=1)  # [B,2,32]
    active0 = below
    active1 = below & (nch[:, None] == 2) & ~is_js
    active = jnp.stack([active0, active1], axis=1)      # [B,2,32]

    # tie-break index = the flat (ch*32+sb) the C argmin would report
    tie0 = jnp.where(is_js & (smr[:, 1] > smr[:, 0]), 32 + sb, sb)
    tie1 = jnp.broadcast_to(32 + sb, tie0.shape)
    tie = jnp.stack([tie0, tie1], axis=1)               # [B,2,32]

    gb_rung = ft["gb_steps"]                                    # [B,32,16]
    inc = gb_rung.at[:, :, 1:].add(-gb_rung[:, :, :-1])         # delta cost
    snr = ft["snr_steps"].astype(dtype)                         # [B,32,16]
    # sort key for rung k = MNR at ba=k-1 (what maxmnr_new sees when picking)
    mnr_prev = jnp.concatenate([jnp.full((B, SBLIMIT, 1), jnp.asarray(T.SNR[0], dtype)),
                                snr[:, :, :-1]], axis=2)        # [B,32,16]
    keys = mnr_prev[:, None] - smr_eff[..., None]               # [B,2,32,16]
    # maxmnr_new's small=999999.0 start makes such entries unselectable
    keys = jnp.where(keys < 999999.0, keys, jnp.inf)

    sfs = _onehot_lut(scfsi, jnp.asarray(T.SFS_PER_SCFSI))      # [B,2,32]
    first_extra0 = jnp.where(is_js, 4 + 6 * (sfs[:, 0] + sfs[:, 1]), 2 + 6 * sfs[:, 0])
    first_extra = jnp.stack([first_extra0, 2 + 6 * sfs[:, 1]], axis=1)

    kk = jnp.arange(16)
    # rungs run up to ba == max_alloc == (1<<nbal)-1 (a_bit_allocation_new
    # marks used=2 when ba reaches it, encode_new.c:1161)
    rung_valid = (kk[None, None, :] >= 1) & (kk[None, None, :] <= ft["max_alloc"][:, :, None])
    cost = inc[:, None].repeat(2, 1)                            # [B,2,32,16]
    cost = cost.at[:, :, :, 1].add(first_extra)
    valid = rung_valid[:, None] & active[..., None]             # [B,2,32,16]
    return {
        "keys": jnp.where(valid, keys, jnp.inf).reshape(B, 2 * SBLIMIT * 16),
        "cost": jnp.where(valid, cost, 0).reshape(B, 2 * SBLIMIT * 16),
        "tie": tie[..., None].repeat(16, -1).reshape(B, 2 * SBLIMIT * 16),
        "valid": valid.reshape(B, 2 * SBLIMIT * 16),
        "active": active, "is_js": is_js, "smr_eff": smr_eff,
    }


def _ordered_key_bits(keys):
    """Order-preserving bijection IEEE float -> unsigned int of the same
    width (sign-magnitude flip), so `a < b` on floats equals `m(a) < m(b)`
    on uints.  Returns (mapped [same shape] uint, bit width)."""
    if keys.dtype == jnp.float64:
        u = jax.lax.bitcast_convert_type(keys, jnp.uint64)
        top = jnp.uint64(1 << 63)
        return jnp.where(u & top != 0, ~u, u | top), 64
    u = jax.lax.bitcast_convert_type(keys.astype(jnp.float32), jnp.uint32)
    top = jnp.uint32(1 << 31)
    return jnp.where(u & top != 0, ~u, u | top), 32


def a_bit_allocation(smr, scfsi, ft, sblimit, nch, jsbound, adb, dtype):
    """Greedy min-MNR allocation (a_bit_allocation_new, encode_new.c:1078-1187),
    computed as sorted-rung prefix + exact sequential tail.

    The C loop picks the globally-minimum-MNR slot each iteration; that pick
    sequence equals the rung list sorted by (MNR-before-rung, scan index), and
    no slot can freeze before the first rung that exceeds the budget.  So the
    longest affordable prefix of the sorted rungs is allocated wholesale and
    only the short tail (freezes + cheap late fits) runs the faithful
    while_loop.  Returns (bit_alloc [B,2,32] int32, adb_left [B])."""
    B = smr.shape[0]
    sb = jnp.arange(SBLIMIT)[None, :]
    below = sb < sblimit[:, None]
    chmul = jnp.where(sb < jsbound[:, None], nch[:, None], 1)
    bbal = (ft["nbal"] * chmul * below).sum(axis=1)
    ad = adb - (bbal + BERR + BANC)

    lt = _ladder_tables(smr, scfsi, ft, sblimit, nch, jsbound, dtype)
    # The maximal affordable prefix in (key, tie, pos) order is found WITHOUT
    # sorting: a bitwise bisection on the order-preserving integer image of
    # the float key finds the threshold key (the one whose rung group
    # straddles the budget), then a second 16-bit bisection on the composite
    # (tie*1024 + pos) index orders rungs inside that group.  Each bisection
    # step is one fused masked reduction over [B, R] - no [B,1024] sort
    # network, no gathers (a 4-operand lax.sort at this size costs several
    # ms on TPU; 48 masked reduces cost well under 1 ms).
    R = lt["keys"].shape[-1]
    pos = jnp.arange(R, dtype=jnp.int32)[None, :]
    ikey, nbits = _ordered_key_bits(lt["keys"])            # [B, R] uint
    cost = lt["cost"].astype(jnp.int32)
    total = cost.sum(-1)
    all_true = total <= ad
    one = jnp.ones((), ikey.dtype)

    def key_step(i, t):
        cand = t | (one << (nbits - 1 - i).astype(ikey.dtype))
        s = jnp.where(ikey < cand[:, None], cost, 0).sum(-1)
        return jnp.where(s <= ad, cand, t)

    tk = jax.lax.fori_loop(0, nbits, key_step,
                           jnp.zeros((B,), ikey.dtype))    # threshold key
    below_grp = ikey < tk[:, None]
    in_grp = ikey == tk[:, None]
    ad2 = ad - jnp.where(below_grp, cost, 0).sum(-1)
    comp = lt["tie"].astype(jnp.int32) * R + pos           # strict in-group order

    def comp_step(i, c):
        cand = c | (jnp.int32(1) << (15 - i))
        s = jnp.where(in_grp & (comp < cand[:, None]), cost, 0).sum(-1)
        return jnp.where(s <= ad2, cand, c)

    # comp = tie*1024 + pos < 64*1024 + 1024, but tie<=63 and pos<=1023 so
    # comp <= 65535: 16 bits exactly
    ck = jax.lax.fori_loop(0, 16, comp_step, jnp.zeros((B,), jnp.int32))
    before_thr = below_grp | (in_grp & (comp < ck[:, None]))
    taken = jnp.where(all_true[:, None], lt["valid"], before_thr & lt["valid"])
    spent0 = jnp.where(all_true, total, jnp.where(before_thr, cost, 0).sum(-1))

    ba0 = taken.reshape(B, 2, SBLIMIT, 16).sum(axis=-1)         # rungs are consecutive
    # mirror joint ladders into channel 1
    ba0 = ba0.at[:, 1].set(jnp.where(lt["is_js"], ba0[:, 0], ba0[:, 1]))

    return _alloc_tail(ba0, spent0, ad, smr, scfsi, ft, sblimit, nch, jsbound, dtype)


def _alloc_tail(ba0, spent0, ad, smr, scfsi, ft, sblimit, nch, jsbound, dtype):
    """Faithful continuation of the C greedy from a mid-allocation state."""
    B = smr.shape[0]
    sb = jnp.arange(SBLIMIT)[None, :]
    below = sb < sblimit[:, None]

    snr_tab = jnp.asarray(T.SNR, dtype)
    group_tab = jnp.asarray(T.GROUP)
    bits_tab = jnp.asarray(T.BITS)
    sfs_tab = jnp.asarray(T.SFS_PER_SCFSI)

    ba0 = ba0.astype(jnp.int32)
    si0 = jnp.take_along_axis(ft["step_idx"][:, None].repeat(2, 1),
                              ba0[..., None], -1)[..., 0]
    mnr0 = snr_tab[si0] - smr  # [B, 2, 32]
    ch_valid = jnp.arange(2)[None, :, None] < nch[:, None, None]
    valid = ch_valid & below[:, None, :]
    used0 = jnp.where(~valid, 2,
            jnp.where(ba0 >= ft["max_alloc"][:, None, :], 2,
            jnp.where(ba0 > 0, 1, 0))).astype(jnp.int32)

    state = dict(
        bit_alloc=ba0,
        used=used0,
        mnr=mnr0,
        spent=spent0.astype(jnp.int32),
        done=jnp.zeros((B,), jnp.bool_),
    )

    inf = jnp.asarray(jnp.inf, dtype)
    flat_si = ft["step_idx"]  # [B, 32, 16]

    sb_idx = jnp.arange(SBLIMIT)[None, :]
    is_js_e = (sb_idx >= jsbound[:, None])[:, None, :] & (nch[:, None, None] == 2)
    sfs_all = _onehot_lut(scfsi, sfs_tab)  # [B,2,32]
    first_extra_e = jnp.where(is_js_e, 4 + 6 * (sfs_all + sfs_all[:, ::-1]),
                              2 + 6 * sfs_all)

    # all per-pick lookups below are one-hot select+reduce instead of
    # gather/scatter: inside the While body each gather is its own kernel
    # and the dispatch overhead dominates the (tiny) data - one-hot forms
    # fuse into the surrounding elementwise work
    gbq_tab = jnp.asarray(12 * np.asarray(T.GROUP) * np.asarray(T.BITS),
                          jnp.int32)                                   # [18]
    nsi = gbq_tab.shape[0]

    def lut(idx, table):
        """table[idx] via one-hot: idx [...], table [n] -> [...]."""
        oh = idx[..., None] == jnp.arange(table.shape[0])
        return (oh * table).sum(-1, dtype=table.dtype)

    def sel16(rows, idx):
        """rows [B,...,16] selected at idx [B,...] via one-hot."""
        oh = idx[..., None] == jnp.arange(16)
        return (oh * rows).sum(-1, dtype=rows.dtype)

    def _entry_costs(st):
        """Next-rung full cost for every open entry (vectorised).

        In the C loop a visit either allocates or freezes; freezing never
        consumes bits and the remaining budget is non-increasing, so every
        open entry whose next cost exceeds the remaining budget NOW is
        guaranteed to freeze when visited - we can freeze them all at once
        without changing the pick sequence of the remaining entries."""
        ba = st["bit_alloc"]
        si2 = flat_si[:, None]                       # [B,1,32,16]
        si_next = sel16(si2, jnp.clip(ba + 1, 0, 15))
        si_cur = sel16(si2, ba)
        inc = lut(si_next, gbq_tab)
        inc = inc - jnp.where(st["used"] == 1, lut(si_cur, gbq_tab), 0)
        return inc + jnp.where(st["used"] == 0, first_extra_e, 0)

    def cond(st):
        return ~jnp.all(st["done"])

    def body(st):
        # pre-freeze everything that can no longer fit (see _entry_costs)
        costs = _entry_costs(st)
        open0 = (st["used"] != 2) & (st["mnr"] < 999999.0)
        freeze_now = open0 & (st["spent"][:, None, None] + costs > ad[:, None, None])
        # mirror freezes across joint-stereo pairs (used stays in sync)
        freeze_js = freeze_now | (freeze_now[:, ::-1] & is_js_e)
        used_pf = jnp.where(freeze_js, 2, st["used"])
        st = dict(st, used=used_pf)

        # maxmnr_new starts from small=999999.0, so entries at/above that are
        # never selectable (encode_new.c:1061-1077)
        open_ = (st["used"] != 2) & (st["mnr"] < 999999.0)
        mnr_m = jnp.where(open_, st["mnr"], inf).reshape(B, 64)
        flat = jnp.argmin(mnr_m, axis=1)  # first min wins ties = C scan order
        any_open = open_.reshape(B, 64).any(axis=1)
        act = any_open & ~st["done"]
        min_ch = flat // SBLIMIT
        min_sb = flat % SBLIMIT
        oh = (flat[:, None] == jnp.arange(64))           # [B, 64] pick one-hot
        sb_oh = (min_sb[:, None] == jnp.arange(SBLIMIT))  # [B, 32]

        def g2(a):  # a[B,2,32] at (min_ch, min_sb)
            return jnp.where(oh, a.reshape(B, 64), 0).sum(1, dtype=a.dtype)

        ba_cur = g2(st["bit_alloc"])
        used_cur = g2(st["used"])
        si_row = (sb_oh[:, :, None] * flat_si).sum(1, dtype=flat_si.dtype)  # [B, 16]
        si_next = sel16(si_row, jnp.clip(ba_cur + 1, 0, 15))
        si_cur = sel16(si_row, ba_cur)
        increment = lut(si_next, gbq_tab)
        increment = increment - jnp.where(used_cur == 1, lut(si_cur, gbq_tab), 0)
        oth_ch = 1 - min_ch
        oth_flat = oth_ch * SBLIMIT + min_sb
        oh_oth = (oth_flat[:, None] == jnp.arange(64))
        scfsi_min = g2(scfsi)
        scfsi_oth = jnp.where(oh_oth, scfsi.reshape(B, 64), 0).sum(1, dtype=scfsi.dtype)
        fresh = used_cur == 0
        is_js = (min_sb >= jsbound) & (nch == 2)
        seli = jnp.where(fresh, jnp.where(is_js, 4, 2), 0)
        scale = jnp.where(fresh,
                          6 * lut(scfsi_min, sfs_tab) +
                          jnp.where(is_js, 6 * lut(scfsi_oth, sfs_tab), 0),
                          0)

        cost = st["spent"] + seli + scale + increment
        fits = ad >= cost
        alloc = act & fits
        freeze = act & ~fits

        ba_new = ba_cur + 1
        max_a = jnp.where(sb_oh, ft["max_alloc"], 0).sum(1, dtype=ft["max_alloc"].dtype)
        new_used = jnp.where(alloc & (ba_new >= max_a), 2,
                   jnp.where(alloc, 1, jnp.where(freeze, 2, used_cur)))
        si_new = sel16(si_row, jnp.clip(ba_new, 0, 15))
        smr_min = g2(smr)
        mnr_new = lut(si_new, snr_tab) - smr_min

        def scat(a, onehot, val, on):
            upd = onehot & on[:, None]
            return jnp.where(upd, val[:, None].astype(a.dtype),
                             a.reshape(B, 64)).reshape(B, 2, SBLIMIT)

        bit_alloc = scat(st["bit_alloc"], oh, ba_new, alloc)
        used = scat(st["used"], oh, new_used, alloc | freeze)
        mnr = scat(st["mnr"], oh, mnr_new, alloc)

        # joint mirror: above jsbound the allocation applies to both channels
        mirror = is_js & (alloc | freeze) & act
        smr_oth = jnp.where(oh_oth, smr.reshape(B, 64), 0).sum(1, dtype=smr.dtype)
        ba_mirror = jnp.where(alloc, ba_new, ba_cur)
        si_mir = sel16(si_row, jnp.clip(ba_mirror, 0, 15))
        bit_alloc = scat(bit_alloc, oh_oth, ba_mirror, mirror)
        used = scat(used, oh_oth, jnp.where(alloc, new_used,
                                            jnp.asarray(2, jnp.int32)), mirror)
        mnr = scat(mnr, oh_oth, lut(si_mir, snr_tab) - smr_oth, mirror)

        return dict(
            bit_alloc=bit_alloc, used=used, mnr=mnr,
            spent=st["spent"] + jnp.where(alloc, increment + scale + seli, 0),
            done=st["done"] | ~any_open,
        )

    st = jax.lax.while_loop(cond, body, state)
    adb_left = ad - st["spent"]
    return st["bit_alloc"], adb_left


def quantize(sf_index, sb_sample, j_scale, j_sample, bit_alloc, ft,
             sblimit, nch, jsbound, dtype):
    """Subband quantization (subband_quantization_new, encode_new.c:479-547).

    sf_index: [B,2,3,32] (post-scfsi); sb_sample: [B,2,3,12,32];
    j_scale: [B,3,32]; j_sample: [B,3,12,32]; bit_alloc: [B,2,32].
    Returns sbband [B,2,3,12,32] int32."""
    sftab = jnp.asarray(T.SCALEFACTOR, dtype)
    sb = jnp.arange(SBLIMIT)
    is_js = (sb[None, :] >= jsbound[:, None]) & (nch[:, None] == 2)  # [B,32]

    scale = _onehot_lut(sf_index, sftab)  # [B,2,3,32]
    d_own = sb_sample / scale[:, :, :, None, :]
    d_js = j_sample / _onehot_lut(j_scale, sftab)[:, :, None, :]  # [B,3,12,32]
    d = jnp.where(is_js[:, None, None, None, :], d_js[:, None], d_own)

    si = _onehot_sel(ft["step_idx"][:, None], bit_alloc)  # [B,2,32]
    si = si[:, :, None, None, :]  # [B,2,1,1,32]
    a = _onehot_lut(si, jnp.asarray(T.QUANT_A, dtype))
    b = _onehot_lut(si, jnp.asarray(T.QUANT_B, dtype))
    s2n = _onehot_lut(si, jnp.asarray(T.STEPS2N))

    q = d * a + b
    neg = q < 0
    q = jnp.where(neg, q + 1.0, q)
    v = (q * s2n.astype(dtype)).astype(jnp.int32)
    v = jnp.where(~neg, v | s2n, v)

    active = (bit_alloc > 0)[:, :, None, None, :] & \
             (sb[None, None, None, None, :] < sblimit[:, None, None, None, None])
    return jnp.where(active, v, 0)
