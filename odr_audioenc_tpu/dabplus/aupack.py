"""Device-side DAB+ AU bitstream + superframe emission (TPU-native).

Slot-grid re-expression of the host writer (host/aacpack.py `write_au` /
`SuperframePacker.assemble`, which match fdk bitenc.cpp / bit_cnt.cpp /
tpenc_dab.cpp:154-466 semantics): every AU is a static grid of
(width, value) bit slots whose offsets are a cumsum in serialization
order, packed by the one-hot-matmul byte scatter (bitpack.py).  All the
data-dependent syntax (section runs, scalefactor DPCM chains, Huffman
codewords with signs/escapes, TNS filters, DSE, FIL fill) is expressed
as masked slots so one jitted graph serves every stream.

CRCs are GF(2)-linear, so the per-AU CRC16 (0x1021, inverted), the
firecode (0x782d) and the RS(120,110) column parity are evaluated as bit
matmuls; the AU CRC over a *variable-length* byte range is assembled
from a fixed-alignment reduction plus per-length multiplier tables
(x^{8k} mod g), and the last AU's deterministic FIL-fill tail
contributes via a host-precomputed table indexed by the fill width.
"""
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import bitpack as BP
from . import tables as AT

NB = AT.MAX_SFB_LONG

# CCITT CRC16 modulus (AU CRCs, tpenc_dab.cpp:407-423)
G_CRC = 0x11021
# firecode modulus (tpenc_dab.cpp:200)
G_FIRE = 0x1782D

# ---------------------------------------------------------------------------
# host-precomputed GF(2) tables
# ---------------------------------------------------------------------------


def _mulmod_int(a, b, g=G_CRC):
    r = 0
    while b:
        if b & 1:
            r ^= a
        b >>= 1
        a <<= 1
    db = g.bit_length() - 1
    while r.bit_length() > db:
        r ^= g << (r.bit_length() - 1 - db)
    return r


@lru_cache(maxsize=None)
def _xpow8(max_bytes):
    """x^(8j) mod g for j in 0..max_bytes."""
    xp = np.zeros(max_bytes + 1, np.int64)
    cur = 1
    x8 = _mulmod_int(1 << 8, 1)
    for j in range(max_bytes + 1):
        xp[j] = cur
        cur = _mulmod_int(cur, x8)
    return xp


@lru_cache(maxsize=None)
def _xinv():
    """x^{-1} mod g: g = x*q + 1 => x^{-1} = (g ^ 1) >> 1."""
    return (G_CRC ^ 1) >> 1


@lru_cache(maxsize=None)
def _xpow8_inv(max_bytes):
    """x^(-8j) mod g for j in 0..max_bytes."""
    xi = _xinv()
    x8i = 1
    for _ in range(8):
        x8i = _mulmod_int(x8i, xi)
    xp = np.zeros(max_bytes + 1, np.int64)
    cur = 1
    for j in range(max_bytes + 1):
        xp[j] = cur
        cur = _mulmod_int(cur, x8i)
    return xp


def _fill_slots_host(fill_bits):
    """(width, value) slots of dabWrite_FillRawDataBlock for `fill_bits`
    (host/aacpack.py _fill_raw_data_block, tpenc_dab.cpp:312-360), plus the
    trailing ID_END.  Zero spans are slots too (they advance the offset)."""
    slots = []
    pb = fill_bits
    while pb >= 7:
        pb -= 7
        esc = -1
        if pb >= 15 * 8:
            pb -= 8
            esc = 0
        cnt = min(269, pb >> 3)
        if cnt >= 15:
            esc = cnt - 15 + 1
        if esc >= 0:
            slots.append((15, (6 << 12) | (15 << 8) | esc))
        else:
            slots.append((7, (6 << 4) | cnt))
        cnt_bits = min(cnt * 8, pb)
        if cnt_bits:
            slots.append((cnt_bits, 0))  # EXT_FIL + fill nibble + zero bytes
        pb -= cnt_bits
    slots.append((3, 7))  # ID_END
    return slots


@lru_cache(maxsize=None)
def _tail_tables(max_d):
    """For every tail width D (= fill_bits + 3) in 0..max_d: the slot list
    (padded to a common count) and the tail's CRC contribution
    R(tail_poly * x^16) where the tail occupies the last D bits of the AU.
    Columns are 8-bit chunks (bf16-exact one-hot lookups)."""
    # x^j mod g for arbitrary bit shifts
    maxbits = max_d + 16
    xpb = np.zeros(maxbits + 1, np.int64)
    cur = 1
    for j in range(maxbits + 1):
        xpb[j] = cur
        cur = _mulmod_int(cur, 2)
    all_slots = {d: _fill_slots_host(d - 3) for d in range(3, max_d + 1)}
    n_slots = max(len(s) for s in all_slots.values())
    slots_tab = np.zeros((max_d + 1, n_slots, 2), np.int32)
    crc_tab = np.zeros(max_d + 1, np.int32)
    for d in range(3, max_d + 1):
        slots = all_slots[d]
        pos = 0
        crc = 0
        for k, (w, v) in enumerate(slots):
            slots_tab[d, k] = (w, v)
            pos += w
            if v:
                # value ends (d - pos) bits before the AU end
                vm = _mulmod_int(v, xpb[16])
                crc ^= _mulmod_int(vm, xpb[d - pos])
        # host consumes fill in whole elements; a <7-bit remainder becomes
        # BitWriter alignment zeros - the slot offsets stop short of d, fine
        crc_tab[d] = crc
    return slots_tab, crc_tab


@lru_cache(maxsize=None)
def _crc_shift_tables(maxcb, total):
    """shiftlut[Pb] = x^(8*(Pb - maxcb)) mod g for Pb in 0..total (the
    alignment factor turning the left-aligned content reduction into the
    AU-end-aligned contribution), and ilut[Pb] = init 0xFFFF shifted through
    8*Pb message bits (= crc16_ccitt of Pb zero bytes)."""
    xp = _xpow8(total)
    xpi = _xpow8_inv(maxcb)
    shift = np.zeros(total + 1, np.int64)
    for pb in range(total + 1):
        if pb >= maxcb:
            shift[pb] = xp[pb - maxcb]
        else:
            shift[pb] = xpi[maxcb - pb]
    ilut = np.array([_mulmod_int(0xFFFF, xp[j]) for j in range(total + 1)],
                    np.int64)
    return shift.astype(np.int32), ilut.astype(np.int32)


# ---------------------------------------------------------------------------
# device GF(2) helpers
# ---------------------------------------------------------------------------


def _lut16(idx, table_np, n):
    """One-hot lookup of packed 16-bit values: split into two 8-bit chunks
    (bf16-exact), recombined on device.  idx: [..] int32 in [0, n)."""
    t = np.stack([table_np >> 8, table_np & 0xFF], -1).astype(np.float32)
    oh = jax.nn.one_hot(idx, n, dtype=jnp.bfloat16)
    out = jnp.matmul(oh, jnp.asarray(t, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = jnp.round(out).astype(jnp.int32)
    return (out[..., 0] << 8) | out[..., 1]


def _mulmod_dev(a, b):
    """Carry-less multiply mod G_CRC of two <=16-bit device ints."""
    acc = jnp.zeros_like(a)
    t = b
    for i in range(16):
        acc = acc ^ jnp.where((a >> i) & 1 > 0, t, 0)
        t = ((t << 1) ^ jnp.where((t >> 15) & 1 > 0, G_CRC, 0)) & 0xFFFF
    return acc


# NOTE: these cache HOST (numpy) tables only - caching jnp arrays under
# lru_cache leaks tracers across jit traces (the constant materialises
# inside the first trace and escapes into the next one)


@lru_cache(maxsize=None)
def _crc16_R_np(p_bits):
    return BP.CrcTable(0x1021, 16, 0, p_bits).R


def _crc16_R(p_bits):
    return jnp.asarray(_crc16_R_np(p_bits), jnp.bfloat16)


@lru_cache(maxsize=None)
def _fire_R_np(p_bits):
    return BP.CrcTable(0x782D, 16, 0, p_bits).R


def _fire_R(p_bits):
    return jnp.asarray(_fire_R_np(p_bits), jnp.bfloat16)


@lru_cache(maxsize=None)
def _rs_M_np():
    from ..fec.rs import rs_dab
    return BP.rs_bit_matrix(rs_dab())


def _rs_M():
    return jnp.asarray(_rs_M_np(), jnp.bfloat16)


# ---------------------------------------------------------------------------
# spectral codeword tables (values; lengths live in encode.py)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _code_tables():
    """Per codebook-group stacked (len, code_hi, code_lo) rows for the value
    lookups, mirroring bit_cnt.cpp codeword emission."""
    def cols(b, n):
        c = AT.HUFF_CODE[b].reshape(-1)[:n].astype(np.int64)
        ln = AT.HUFF_LEN[b].reshape(-1)[:n].astype(np.int64)
        return [ln, c >> 8, c & 0xFF]

    def quad(b):
        # books 1..4 are [3,3,3,3]
        return cols(b, 81)

    tabs = {
        "q12": np.stack(quad(1) + quad(2), -1),          # [81, 6]
        "q34": np.stack(quad(3) + quad(4), -1),
        "p56": np.stack(cols(5, 81) + cols(6, 81), -1),
        "p78": np.stack(cols(7, 64) + cols(8, 64), -1),
        "p910": np.stack(cols(9, 169) + cols(10, 169), -1),
        "p11": np.stack(_p11_cols(), -1),                # [289, 3]
        # scf codes reach 19 bits -> three 8-bit chunks (bf16-exact)
        "scf": np.stack([AT.HUFF_LEN_SCF.astype(np.int64),
                         AT.HUFF_CODE_SCF.astype(np.int64) >> 16,
                         (AT.HUFF_CODE_SCF.astype(np.int64) >> 8) & 0xFF,
                         AT.HUFF_CODE_SCF.astype(np.int64) & 0xFF], -1),
    }
    return tabs


def _p11_cols():
    c = AT.HUFF_CODE[11][:17, :17].reshape(-1).astype(np.int64)
    ln = AT.HUFF_LEN[11][:17, :17].reshape(-1).astype(np.int64)
    return [ln, c >> 8, c & 0xFF]


def _lut_cols(idx, tab_np, n):
    """One-hot matmul lookup returning int32 columns (all entries < 256)."""
    oh = jax.nn.one_hot(idx, n, dtype=jnp.bfloat16)
    out = jnp.matmul(oh, jnp.asarray(tab_np, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = jnp.round(out).astype(jnp.int32)
    return [out[..., j] for j in range(tab_np.shape[1])]


@lru_cache(maxsize=None)
def _pair_tables_np():
    """Books 7..11's (len, code_hi, code_lo) columns folded onto book-11's
    17x17 clipped index domain and merged, so ONE bilinear one-hot pair
    serves all five tables (entries past a book's limit are never selected
    - the band's book is only chosen when its magnitude limit holds)."""
    tabs = _code_tables()

    def fold(t, lim):
        m = np.asarray(t).reshape(lim + 1, lim + 1, -1)
        a = np.minimum(np.arange(17), lim)
        return m[np.ix_(a, a)].reshape(289, -1)

    return np.concatenate([fold(tabs["p78"], 7), fold(tabs["p910"], 12),
                           np.asarray(tabs["p11"]).reshape(289, -1)],
                          axis=-1)  # [289, 15]


def _lut_cols2(ia, ib, tab_np, n):
    """Bilinear table lookup: cols(a, b) = one_hot(a) @ M picked by
    one_hot(b) - avoids materialising [.., n^2] one-hots (the flat 289-wide
    form was the AU pack's HBM hot spot).  Each (len, code_hi, code_lo)
    column triple is packed into ONE f32 (len<<16 | hi<<8 | lo < 2^21,
    f32-exact): the bilinear select touches 3x fewer columns."""
    C = tab_np.shape[-1]
    assert C % 3 == 0
    t = np.asarray(tab_np).astype(np.int64).reshape(n, n, C)
    # EXACTNESS NOTE (round-5 forensics): TPU DEFAULT matmul precision
    # truncates f32 operands to bf16; the earlier (len<<16|hi<<8|lo)
    # packing (values to 2^21) was silently corrupted on TPU and produced
    # invalid device-packed superframes.  All columns are kept < 256
    # (bf16-exact) with f32 accumulation instead - exact AND rides the
    # MXU at full default-precision speed.  Do NOT re-pack values >= 256
    # per column without Precision.HIGHEST.
    assert t.max() < 256
    mp = t.astype(np.float32)                             # [a, b, C]
    oh_a = jax.nn.one_hot(ia, n, dtype=jnp.bfloat16)
    oh_b = jax.nn.one_hot(ib, n, dtype=jnp.bfloat16)
    m2 = jnp.asarray(mp.reshape(n, n * C), jnp.bfloat16)
    v = jnp.matmul(oh_a, m2, preferred_element_type=jnp.float32) \
        .reshape(oh_a.shape[:-1] + (n, C))
    out = jnp.round(jnp.einsum("...nk,...n->...k", v.astype(jnp.bfloat16),
                               oh_b, preferred_element_type=jnp.float32)
                    ).astype(jnp.int32)
    return [out[..., j] for j in range(C)]


# ---------------------------------------------------------------------------
# static per-config context
# ---------------------------------------------------------------------------


class AuPackCtx:
    """Static tables for one DabPlusEncoder config."""

    def __init__(self, enc):
        self.enc = enc
        cfg = enc.cfg
        pk = enc.packer
        self.total = pk.total
        self.nau = pk.num_aus
        self.header_bytes = pk.header_bytes
        self.flags_byte = ((pk.dac_rate << 6) | (pk.sbr << 5)
                           | (pk.ch_mode << 4) | (pk.ps << 3))
        self.hdr_pad4 = (pk.dac_rate == 0 or pk.sbr == 0)
        self.n_ch = enc.core_channels
        self.max_sfb = enc.max_sfb
        self.sfb_off = np.asarray(enc.sfb_off)
        self.is_short_cfg = enc.short_ctx is not None
        if self.is_short_cfg:
            self.msfb_s = enc.short_ctx["nbands_tx"] // AT.N_GROUPS
            self.nsfb_s = enc.nsfb_short
            self.sfb_off_s = np.asarray(enc.sfb_off_short)
        self.tns_cfg = enc.tns_cfg
        # content-buffer byte bound per AU (host-asserted at emission)
        hard = self.total - self.header_bytes - 2 * self.nau
        soft = (2 * enc.budget_au + enc.bitres_max) // 8 \
            + 283 + cfg.pad_len + 64
        self.maxcb = min(hard, soft)
        # round up so the one-hot H digit is full
        self.maxcb = -(-self.maxcb // 32) * 32
        # Static proof that the model.pack_superframes overflow warning is
        # unreachable: the rate loop's crash recovery (encode.py _recover)
        # guarantees every AU's counted bits <= budget_au + allow, and the
        # model caps the reservoir draw at allow <= budget_au + bitres_max
        # (model.py au_body); the content buffer additionally carries the
        # X-PAD DSE ((pad_len+3) bytes framing) and byte alignment.  If
        # this worst case ever exceeded the pack bound the encoder could
        # emit a corrupt superframe, so fail at construction instead.
        pad_bits = (cfg.pad_len + 3) * 8 if cfg.pad_len else 0
        worst_au_bits = 2 * enc.budget_au + enc.bitres_max + pad_bits + 8
        if worst_au_bits > 8 * self.maxcb:
            raise AssertionError(
                f"device-pack AU bound {8 * self.maxcb} bits < worst-case "
                f"recovered AU {worst_au_bits} bits for subch={cfg.subch} "
                f"ch={enc.core_channels} aot={cfg.aot} pad={cfg.pad_len}")

        # long layout: tx band b < max_sfb; band of pair
        bol_l = np.asarray(AT.band_of_line(cfg.core_rate))
        self.bop_long = bol_l[::2].astype(np.int32)          # [480]
        self.tx_long = (np.arange(NB) < self.max_sfb)
        self.perm_long = np.arange(480, dtype=np.int32)
        # group starts for section restarts (long: band 0 only)
        self.gstart_long = np.zeros(NB, bool)
        self.gstart_long[0] = True
        if self.is_short_cfg:
            bol_s = np.asarray(AT.short_band_of_line(cfg.core_rate))
            self.bop_short = bol_s[::2].astype(np.int32)
            idxs = np.arange(NB)
            self.tx_short = (idxs < AT.N_GROUPS * self.nsfb_s) \
                & (idxs % self.nsfb_s < self.msfb_s)
            self.gstart_short = (idxs % self.nsfb_s == 0) \
                & (idxs < AT.N_GROUPS * self.nsfb_s)
            # spectral pair emission order: per tx grouped band, per window
            # of its group, the sfb's pairs (host _write_ics short path)
            wpg = 8 // AT.N_GROUPS
            order = []
            for g in range(AT.N_GROUPS):
                for b in range(self.msfb_s):
                    for w in range(g * wpg, (g + 1) * wpg):
                        lo = w * AT.NS + int(self.sfb_off_s[b])
                        hi = w * AT.NS + int(self.sfb_off_s[b + 1])
                        order.extend(range(lo // 2, hi // 2))
            rest = [p for p in range(480) if p not in set(order)]
            self.perm_short = np.asarray(order + rest, np.int32)
        else:
            self.bop_short = self.bop_long
            self.tx_short = self.tx_long
            self.gstart_short = self.gstart_long
            self.perm_short = self.perm_long

        self.tails = _tail_tables(self.total * 8)
        self.crc_shift, self.crc_init = _crc_shift_tables(self.maxcb,
                                                          self.total)


# ---------------------------------------------------------------------------
# AU content slots (called per AU inside the model scan)
# ---------------------------------------------------------------------------


def _ics_info_slot(ctx, wseq, is_short):
    """ics_info() (host _write_ics_info)."""
    w = jnp.where(is_short, 15, 11)
    v_long = (wseq.astype(jnp.int32) << 8) | (ctx.max_sfb << 1)
    v_short = (2 << 12) | (ctx.msfb_s << 7) | AT.SCF_GROUPING \
        if ctx.is_short_cfg else 0
    return w, jnp.where(is_short, v_short, v_long)


def _section_slots(ctx, books, is_short):
    """section_data() runs of equal codebook, restarting per group.
    books: [S, NB]; returns (w, v) [S, NB]."""
    idx = jnp.arange(NB)
    txm = jnp.where(is_short[:, None], jnp.asarray(ctx.tx_short),
                    jnp.asarray(ctx.tx_long))
    gstart = jnp.where(is_short[:, None], jnp.asarray(ctx.gstart_short),
                       jnp.asarray(ctx.gstart_long))
    prev_books = jnp.concatenate([books[:, :1], books[:, :-1]], axis=1)
    change = txm & (gstart | (books != prev_books))
    # run end: next change or first non-tx band
    stop = change | ~txm
    nxt = jnp.concatenate([jnp.where(stop[:, 1:], idx[1:], 2 * NB),
                           jnp.full((books.shape[0], 1), NB)], axis=1)
    # suffix-min from the right (inclusive) gives the next stop > b
    nc = jax.lax.associative_scan(jnp.minimum, nxt, reverse=True, axis=1)
    run = jnp.clip(nc - idx, 1, NB)
    esc = jnp.where(is_short, 7, 31)[:, None]
    bits = jnp.where(is_short, 3, 5)[:, None]
    nesc = run // esc
    v = books
    for k in range(2):
        v = jnp.where(nesc > k, (v << bits) | esc, v)
    v = (v << bits) | (run - nesc * esc)
    w = jnp.where(change, 4 + bits * (nesc + 1), 0)
    return w, jnp.where(change, v, 0)


def _scf_slots(ctx, books, gains, is_short):
    """scale_factor_data(): regular dpcm chain + PNS noise chain
    (host _write_ics scf loop).  Returns (w, v) [S, NB] and global_gain."""
    txm = jnp.where(is_short[:, None], jnp.asarray(ctx.tx_short),
                    jnp.asarray(ctx.tx_long))
    reg = txm & (books > 0) & (books != 13)
    pns = txm & (books == 13)
    idx = jnp.arange(NB)
    first_reg = jnp.min(jnp.where(reg, idx, NB), axis=1)
    gg = jnp.sum(jnp.where(idx[None] == first_reg[:, None], gains, 0),
                 axis=1) + 100
    gg = jnp.clip(jnp.where(first_reg < NB, gg, 100), 0, 255)

    def chain(carry, xs):
        prev, nprev, nfirst = carry
        g, is_reg, is_pns = xs
        d_reg = g - prev
        d0 = jnp.clip(g - nprev, -256, 255)
        dn = jnp.clip(g - nprev, -60, 60)
        use0 = is_pns & nfirst
        delta = jnp.where(is_reg, d_reg, jnp.where(use0, d0, dn))
        prev = jnp.where(is_reg, g, prev)
        nprev = jnp.where(use0, nprev + d0,
                          jnp.where(is_pns, nprev + dn, nprev))
        nfirst = jnp.where(is_pns, False, nfirst)
        return (prev, nprev, nfirst), (delta, use0)

    g_t = jnp.moveaxis(gains.astype(jnp.int32), 1, 0)
    (_, _, _), (delta, use0) = jax.lax.scan(
        chain, (gg - 100, gg - 90, jnp.ones_like(gg, bool)),
        (g_t, jnp.moveaxis(reg, 1, 0), jnp.moveaxis(pns, 1, 0)))
    delta = jnp.moveaxis(delta, 0, 1)
    use0 = jnp.moveaxis(use0, 0, 1)
    tabs = _code_tables()
    dh = jnp.clip(delta + 60, 0, 120)
    ln, c2, c1, c0 = _lut_cols(dh, tabs["scf"], 121)
    code = (c2 << 16) | (c1 << 8) | c0
    w = jnp.where(use0, 9, ln)
    v = jnp.where(use0, delta + 256, code)
    member = reg | pns
    return jnp.where(member, w, 0), jnp.where(member, v, 0), gg


def _tns_groups(ctx, tns_en, tns_order, tns_idx, tns_en_lo, tns_order_lo,
                tns_idx_lo, tns_len=None):
    """[pulse+tns_present], tns_data slots (host _write_tns_data).
    tns_len: [S] per-AU filter-1 length in bands (dynamic: the merged
    filter spans the whole TNS range, encode.py tns_analysis_fdk)."""
    S = tns_en.shape[0]
    cfgd = ctx.tns_cfg
    groups = [(jnp.full((S, 1), 2, jnp.int32),
               tns_en.astype(jnp.int32)[:, None], 2)]
    if cfgd is None:
        return groups
    en = tns_en
    en_lo = tns_en_lo & en
    n_filt = jnp.where(en_lo, 2, 1)
    order = tns_order.astype(jnp.int32)
    length = cfgd["length_code"] if tns_len is None \
        else tns_len.astype(jnp.int32)
    # n_filt(2) coef_res(1) length(6) order(5) dir(1) compress(1)
    v1 = (((((n_filt << 1) | 1) << 6) | length) << 5 | order) << 2
    groups.append((jnp.where(en, 16, 0)[:, None].astype(jnp.int32),
                   v1[:, None], 3))
    k = jnp.arange(tns_idx.shape[-1])
    wc = jnp.where(en[:, None] & (k[None] < order[:, None]), 4, 0)
    groups.append((wc.astype(jnp.int32), tns_idx.astype(jnp.int32) & 0xF, 2))
    order_lo = tns_order_lo.astype(jnp.int32)
    v2 = ((cfgd["length_code_lo"] << 5 | order_lo) << 2)
    groups.append((jnp.where(en_lo, 13, 0)[:, None].astype(jnp.int32),
                   v2[:, None], 3))
    k2 = jnp.arange(tns_idx_lo.shape[-1])
    wc2 = jnp.where(en_lo[:, None] & (k2[None] < order_lo[:, None]), 4, 0)
    groups.append((wc2.astype(jnp.int32), tns_idx_lo.astype(jnp.int32) & 0xF,
                   2))
    return groups


def _spectral_groups(ctx, q, books, is_short):
    """spectral_data(): codeword+signs slot and two escape slots per line
    pair, permuted into the short emission order when is_short.
    q: [S, 960] int32; books: [S, NB]."""
    S = q.shape[0]
    aq = jnp.abs(q)
    txm = jnp.where(is_short[:, None], jnp.asarray(ctx.tx_short),
                    jnp.asarray(ctx.tx_long))
    bk_band = jnp.where(txm & (books != 13), books, 0)  # [S, NB]
    # band-of-pair expansion as constant one-hot matmuls, NOT
    # take_along_axis: the [S, 480] gather measured 2.5 ms/AU/channel on
    # TPU (profiled fusion.3633/3634); book ids <= 13 are bf16-exact
    nb = bk_band.shape[1]

    def expand(bop_const):
        m = np.zeros((nb, 480), np.float32)
        m[bop_const, np.arange(480)] = 1.0
        return jnp.round(jnp.matmul(
            bk_band.astype(jnp.bfloat16), jnp.asarray(m, jnp.bfloat16),
            preferred_element_type=jnp.float32)).astype(jnp.int32)

    bk = jnp.where(is_short[:, None], expand(ctx.bop_short),
                   expand(ctx.bop_long))                # [S, 480]

    q4 = q.reshape(S, 240, 4)
    aq4 = aq.reshape(S, 240, 4)
    q2 = q.reshape(S, 480, 2)
    aq2 = aq.reshape(S, 480, 2)
    tabs = _code_tables()

    # quad indices/codes (books 1..4) at quad granularity; the quad index
    # i = ((c0*3+c1)*3+c2)*3+c3 factors as (c0*3+c1)*9 + (c2*3+c3), so the
    # lookup is bilinear over two 9-wide one-hots
    c1 = jnp.clip(q4 + 1, 0, 2)
    a1 = c1[..., 0] * 3 + c1[..., 1]
    b1 = c1[..., 2] * 3 + c1[..., 3]
    c3 = jnp.clip(aq4, 0, 2)
    a3 = c3[..., 0] * 3 + c3[..., 1]
    b3 = c3[..., 2] * 3 + c3[..., 3]
    l1, h1, lo1, l2, h2, lo2 = _lut_cols2(a1, b1, tabs["q12"], 9)
    l3, h3, lo3, l4, h4, lo4 = _lut_cols2(a3, b3, tabs["q34"], 9)
    cw1 = (h1 << 8) | lo1
    cw2 = (h2 << 8) | lo2
    cw3 = (h3 << 8) | lo3
    cw4 = (h4 << 8) | lo4

    # pair indices/codes; books 7..11 share one 17-wide one-hot pair
    c5 = jnp.clip(q2 + 4, 0, 8)
    l5, h5, lo5, l6, h6, lo6 = _lut_cols2(c5[..., 0], c5[..., 1],
                                          tabs["p56"], 9)
    c11 = jnp.clip(aq2, 0, 16)
    (l7, h7, lo7, l8, h8, lo8, l9, h9, lo9, l10, h10, lo10,
     l11, h11, lo11) = _lut_cols2(c11[..., 0], c11[..., 1],
                                  _pair_tables_np(), 17)
    cw5 = (h5 << 8) | lo5
    cw6 = (h6 << 8) | lo6
    cw7 = (h7 << 8) | lo7
    cw8 = (h8 << 8) | lo8
    cw9 = (h9 << 8) | lo9
    cw10 = (h10 << 8) | lo10
    cw11 = (h11 << 8) | lo11

    # sign packing: signs of nonzero values in line order
    def pack_signs(vals, nzs):
        acc = jnp.zeros(vals.shape[:-1], jnp.int32)
        n = jnp.zeros(vals.shape[:-1], jnp.int32)
        for j in range(vals.shape[-1]):
            nz = nzs[..., j]
            acc = jnp.where(nz, (acc << 1) | (vals[..., j] < 0), acc)
            n = n + nz
        return acc, n

    s4, n4 = pack_signs(q4, aq4 != 0)
    s2, n2 = pack_signs(q2, aq2 != 0)

    # assemble per-pair (cw+signs) width/value by the band's book
    p_even = (jnp.arange(480) % 2) == 0
    bk4 = bk  # book at pair; quads read it at even pairs only

    def quad_sel(lq, cwq, signed):
        # valid only at even pairs; widths include sign bits for 3/4
        lq2 = jnp.repeat(lq, 2, axis=1)
        cw2_ = jnp.repeat(cwq, 2, axis=1)
        if signed:
            w = lq2 + jnp.repeat(n4, 2, axis=1)
            v = (cw2_ << jnp.repeat(n4, 2, axis=1)) | jnp.repeat(s4, 2, axis=1)
        else:
            w, v = lq2, cw2_
        return jnp.where(p_even[None], w, 0), jnp.where(p_even[None], v, 0)

    w1, v1 = quad_sel(l1, cw1, False)
    w2, v2 = quad_sel(l2, cw2, False)
    w3, v3 = quad_sel(l3, cw3, True)
    w4, v4 = quad_sel(l4, cw4, True)
    w5, v5 = l5, cw5
    w6, v6 = l6, cw6
    w7, v7 = l7 + n2, (cw7 << n2) | s2
    w8, v8 = l8 + n2, (cw8 << n2) | s2
    w9, v9 = l9 + n2, (cw9 << n2) | s2
    w10, v10 = l10 + n2, (cw10 << n2) | s2
    w11, v11 = l11 + n2, (cw11 << n2) | s2

    ws = jnp.stack([jnp.zeros_like(w5), w1, w2, w3, w4, w5, w6, w7, w8,
                    w9, w10, w11], axis=-1)
    vs = jnp.stack([jnp.zeros_like(v5), v1, v2, v3, v4, v5, v6, v7, v8,
                    v9, v10, v11], axis=-1)
    oh = jax.nn.one_hot(bk4, 12, dtype=ws.dtype)
    w_cw = (ws * oh).sum(-1)
    v_cw = (vs * oh).sum(-1)

    # book-11 escapes per line of the pair: prefix (n-3 ones, one zero) then
    # a - 2^n in n bits, n = bit_length(a) - 1 (host _write_spectrum)
    is11 = bk4 == 11
    # floor(log2) via the f32 exponent field (exact for ints < 2^24)
    n_esc = (jax.lax.bitcast_convert_type(
        jnp.maximum(aq2, 16).astype(jnp.float32), jnp.int32) >> 23) - 127
    esc_on = is11[..., None] & (aq2 >= 16)
    w_esc = jnp.where(esc_on, 2 * n_esc - 3, 0)
    v_esc = jnp.where(esc_on,
                      (((1 << jnp.maximum(n_esc - 3, 0)) - 2) << n_esc)
                      | (aq2 - (1 << n_esc)), 0)

    # interleave [cw+signs, esc0, esc1] per pair -> [S, 480, 3]
    w = jnp.stack([w_cw, w_esc[..., 0], w_esc[..., 1]], axis=-1)
    v = jnp.stack([v_cw, v_esc[..., 0], v_esc[..., 1]], axis=-1)
    # short emission order: permute pairs (slots ride along)
    perm_s = jnp.asarray(ctx.perm_short)
    w = jnp.where(is_short[:, None, None], w[:, perm_s], w)
    v = jnp.where(is_short[:, None, None], v[:, perm_s], v)
    return [(w.reshape(S, -1), v.reshape(S, -1), 4)]


def au_content_groups(ctx, o, is_last, pad_buf=None, pad_len=None,
                      sbr_group=None):
    """Slot groups for one AU's content in exact serialization order.

    o: per-AU dict with q [S,ch,960] i32, gains [S,ch,NB], books [S,ch,NB],
    ms_used [S,NB], tns_* per channel, wseq [S]; is_last: [] or [S] bool
    (END is folded into the tail table for the last AU);
    sbr_group: optional (w, v, spans) emitted after the DSE.
    Returns list of (widths, values, spans) with leading dim S."""
    S = o["q"].shape[0]
    wseq = o["wseq"].astype(jnp.int32)
    is_short = wseq == 2
    groups = []
    i32 = jnp.int32

    def const(w, v):
        return (jnp.full((S, 1), w, i32), jnp.full((S, 1), v, i32), 3)

    iw, iv = _ics_info_slot(ctx, wseq, is_short)
    if ctx.n_ch == 2:
        groups.append(const(8, (1 << 5) | 1))         # CPE id+tag+common
        groups.append((iw[:, None], iv[:, None], 3))
        groups.append(const(2, 1))                    # ms_mask_present = 1
        txm = jnp.where(is_short[:, None], jnp.asarray(ctx.tx_short),
                        jnp.asarray(ctx.tx_long))
        groups.append((txm.astype(i32), o["ms_used"].astype(i32), 1))
    else:
        groups.append(const(7, 0))                    # SCE id+tag

    for c in range(ctx.n_ch):
        books = o["books"][:, c].astype(i32)
        gains = o["gains"][:, c].astype(i32)
        sw, sv = _section_slots(ctx, books, is_short)
        fw, fv, gg = _scf_slots(ctx, books, gains, is_short)
        groups.append((jnp.full((S, 1), 8, i32), gg[:, None], 2))
        if ctx.n_ch == 1:
            groups.append((iw[:, None], iv[:, None], 3))
        groups.append((sw, sv, 3))
        groups.append((fw, fv, 4))
        groups.extend(_tns_groups(
            ctx, o["tns_en"][:, c], o["tns_order"][:, c],
            o["tns_idx"][:, c], o["tns_en_lo"][:, c],
            o["tns_order_lo"][:, c], o["tns_idx_lo"][:, c],
            tns_len=o.get("tns_len")[:, c]
            if o.get("tns_len") is not None else None))
        groups.append(const(1, 0))                    # gain_control
        groups.extend(_spectral_groups(ctx, o["q"][:, c], books, is_short))

    if pad_buf is not None:
        cnt = pad_len.astype(i32)
        has = cnt > 0
        # ID_DSE(3) tag(4) align(1) count(8)  (host write_dse, cnt < 255)
        hv = (4 << 13) | cnt
        groups.append((jnp.where(has, 16, 0)[:, None], hv[:, None], 3))
        k = jnp.arange(pad_buf.shape[1])
        wb = jnp.where(has[:, None] & (k[None] < cnt[:, None]), 8, 0)
        groups.append((wb.astype(i32), pad_buf.astype(i32), 2))

    if sbr_group is not None:
        groups.append(sbr_group)

    last = jnp.broadcast_to(jnp.asarray(is_last), (S,))
    groups.append((jnp.where(last, 0, 3)[:, None].astype(i32),
                   jnp.full((S, 1), 7, i32), 2))      # ID_END (non-last)
    return groups


def pack_au_content(ctx, groups):
    """Pack one AU's content into a left-aligned [S, maxcb] byte buffer and
    return (buf u8->i32, content_bits [S], crc_part [S]) where crc_part is
    the fixed-alignment CRC16 reduction R(buf * x^16)."""
    buf, bits = BP.pack_groups(groups, ctx.maxcb, kchunk=4096)
    c1 = BP.crc_fixed(buf, _crc16_R(ctx.maxcb * 8), 16, 0)
    return buf, bits.astype(jnp.int32), c1


# ---------------------------------------------------------------------------
# SBR / PS FIL-element slots (built pre-scan, vectorized over [S, nau])
# ---------------------------------------------------------------------------


def _tab3(code, ln):
    """(len, three 8-bit code chunks) columns for up-to-24-bit codes."""
    code = code.astype(np.int64)
    return np.stack([ln.astype(np.int64), code >> 16,
                     (code >> 8) & 0xFF, code & 0xFF], -1)


def _delta_chain(vals, start_bits, tab3, lav, active):
    """Start + FREQ-delta slot chain mirroring sbr._write_env/_write_noise:
    d = clip(v[i]-prev, +-lav); prev += d.  vals: [..., n] int32;
    active: [...] bool gating the whole chain.  Returns (w, v) [..., n]."""
    n = vals.shape[-1]
    ws = [jnp.where(active, start_bits, 0)]
    vs = [jnp.where(active, vals[..., 0], 0)]
    prev = vals[..., 0]
    for i in range(1, n):
        d = jnp.clip(vals[..., i] - prev, -lav, lav)
        prev = prev + d
        ln, c2, c1, c0 = _lut_cols(d + lav, tab3, 2 * lav + 1)
        ws.append(jnp.where(active, ln, 0))
        vs.append(jnp.where(active, (c2 << 16) | (c1 << 8) | c0, 0))
    return jnp.stack(ws, -1), jnp.stack(vs, -1)


@lru_cache(maxsize=None)
def _sbr_tabs():
    from . import sbr as SB
    return {
        "env60": _tab3(SB.ENV_CODE_F, SB.ENV_LEN_F),
        "env31": _tab3(SB.ENV3_CODE_F, SB.ENV3_LEN_F),
        "noise31": _tab3(SB.NOISE_CODE_F, SB.NOISE_LEN_F),
        "iid14": _tab3(SB.IID_CODE_F, SB.IID_LEN_F),
        "iid30": _tab3(SB.IID_CODE_FF, SB.IID_LEN_FF),
        "icc7": _tab3(SB.ICC_CODE_F, SB.ICC_LEN_F),
        "bal24": _tab3(SB.ENVBAL_CODE_F, SB.ENVBAL_LEN_F),
        "bal12": _tab3(SB.ENVBAL3_CODE_F, SB.ENVBAL3_LEN_F),
        "nbal12": _tab3(SB.NOISEBAL_CODE_F, SB.NOISEBAL_LEN_F),
        "grid": np.stack([np.asarray([m[1] for m in SB.GRID_MENU], np.int64),
                          np.asarray([m[2] for m in SB.GRID_MENU], np.int64)],
                         -1),
    }


def _ps_slot_groups(side):
    """ps_data slots (sbr._write_ps_data order): header, per-env IID chains,
    per-env ICC chains.  All [S, nau]; returns (groups, ps_bits)."""
    tabs = _sbr_tabs()
    iid = side["ps_iid"].astype(jnp.int32)          # [S, nau, ne, 20]
    iidf = side["ps_iid_fine"].astype(jnp.int32)
    icc = side["ps_icc"].astype(jnp.int32)
    fine = side["ps_fine"]                          # [S, nau] bool
    S, nau, ne, nb = iid.shape
    mode = jnp.where(fine, 4, 1)
    nei = {1: 1, 2: 2, 4: 3}[ne]
    hdr_v = ((((((((3 << 3) | mode) << 1) | 1) << 3) | 1) << 4) | nei)
    groups = [(jnp.full((S, nau, 1), 13, jnp.int32), hdr_v[..., None], 3)]

    def chains(vals, tab, lav, active):
        out = []
        for e in range(ne):
            out.append((jnp.where(active, 1, 0)[..., None],
                        jnp.full((S, nau, 1), 0 if e == 0 else 1, jnp.int32)
                        * jnp.where(active, 1, 0)[..., None], 2))
            ref = jnp.zeros((S, nau, nb), jnp.int32) if e == 0 else \
                vals[..., e - 1, :]
            base = jnp.concatenate([ref[..., :1] * 0,
                                    vals[..., e, :-1]], -1) if e == 0 else ref
            d = jnp.clip(vals[..., e, :] - base, -lav, lav)
            ln, c2, c1, c0 = _lut_cols(d + lav, tab, 2 * lav + 1)
            out.append((jnp.where(active[..., None], ln, 0),
                        (c2 << 16) | (c1 << 8) | c0, 4))
        return out

    g_c = chains(iid, tabs["iid14"], 14, ~fine)
    g_f = chains(iidf, tabs["iid30"], 30, fine)
    g_i = chains(icc, tabs["icc7"], 7, jnp.ones_like(fine))
    groups.extend(g_c)
    groups.extend(g_f)
    groups.extend(g_i)
    bits = sum(w.sum(-1) for w, _, _ in groups)
    return groups, bits


def sbr_slot_groups(enc, side):
    """FIL(EXT_SBR_DATA) slots per AU, [S, nau] leading dims, mirroring
    sbr.write_sbr_payload bit-for-bit.  Returns (w, v) [S, nau, K] int32."""
    from . import sbr as SB
    p = enc.sbr_params
    tabs = _sbr_tabs()
    env = side["sbr_env"].astype(jnp.int32)         # [S, nau, ch, n_hi]
    env2 = side["sbr_env2"].astype(jnp.int32)       # [S, nau, ch, 2, n_hi]
    tr = side["sbr_transient"]                      # [S, nau, ch] bool
    nq = side["sbr_noise_q"].astype(jnp.int32)      # [S, nau, ch, n_q]
    invf = side["sbr_invf"].astype(jnp.int32)
    ah = side["sbr_addharm"]                        # [S, nau, ch, n_hi] bool
    tg = side["sbr_tgrid"].astype(jnp.int32)
    S, nau, n_ch, n_hi = env.shape
    n_q = p.n_q
    i32 = jnp.int32
    au0 = (jnp.arange(nau) == 0)[None, :, None]     # header on AU 0

    def const(w, v):
        return (jnp.full((S, nau, 1), w, i32), jnp.full((S, nau, 1), v, i32),
                3)

    groups = []
    # bs_header_flag (+ header, AU 0): 1+1+4+4+3+2+1+1+2+1+2 = 22 bits
    hdr_v = (1 << 21) | (1 << 20) | (p.bs_start_freq << 16) \
        | (p.bs_stop_freq << 12) | (p.bs_xover_band << 9) | (0 << 7) \
        | (1 << 6) | (0 << 5) | (p.bs_freq_scale << 3) \
        | (p.bs_alter_scale << 2) | p.bs_noise_bands
    hw = jnp.where(au0, 22, 1).astype(i32) * jnp.ones((S, nau, 1), i32)
    hv = jnp.where(au0, hdr_v, 0).astype(i32) * jnp.ones((S, nau, 1), i32)
    groups.append((hw, hv, 4))
    groups.append(const(1, 0))                      # bs_data_extra
    cpl = side.get("sbr_cpl")
    if n_ch == 2:
        if cpl is None:
            cpl = jnp.zeros((S, nau), bool)
        groups.append((jnp.full((S, nau, 1), 1, i32),
                       cpl[..., None].astype(i32), 2))   # bs_coupling
    on_all = jnp.ones((S, nau), bool)

    def grid(c, gate=None):
        fcl, rel = _lut_cols(tg[..., c], tabs["grid"], 8)
        v12 = (fcl << 10) | (0 << 8) | (1 << 6) | (rel << 4) | (0 << 2) | 3
        v5 = 1  # FIXFIX, 1 env, hi-res
        t = tr[..., c]
        g = on_all if gate is None else gate
        return (jnp.where(g, jnp.where(t, 12, 5), 0)[..., None].astype(i32),
                jnp.where(t, v12, v5)[..., None].astype(i32), 3)

    def dtdf(c):
        t = tr[..., c]
        return (jnp.where(t, 4, 2)[..., None].astype(i32),
                jnp.zeros((S, nau, 1), i32), 2)

    def invf_g(c, gate=None):
        v = jnp.zeros((S, nau), i32)
        for i in range(n_q):
            v = (v << 2) | invf[..., c, i]
        g = on_all if gate is None else gate
        return (jnp.where(g, 2 * n_q, 0)[..., None].astype(i32),
                v[..., None], 3)

    def env_g(c, gate=None, balance=False):
        t = tr[..., c]
        g = on_all if gate is None else gate
        if balance:
            # coupled channel-1: balance start widths + EnvBalance books
            w1, v1 = _delta_chain(env[..., c, :], 6, tabs["bal24"], 24,
                                  ~t & g)
            w2a, v2a = _delta_chain(env2[..., c, 0, :], 5, tabs["bal12"],
                                    12, t & g)
            w2b, v2b = _delta_chain(env2[..., c, 1, :], 5, tabs["bal12"],
                                    12, t & g)
        else:
            w1, v1 = _delta_chain(env[..., c, :], 7, tabs["env60"], 60,
                                  ~t & g)
            w2a, v2a = _delta_chain(env2[..., c, 0, :], 6, tabs["env31"],
                                    31, t & g)
            w2b, v2b = _delta_chain(env2[..., c, 1, :], 6, tabs["env31"],
                                    31, t & g)
        return [(w1, v1, 4), (w2a, v2a, 4), (w2b, v2b, 4)]

    def noise_g(c, gate=None, balance=False):
        t = tr[..., c]
        g = on_all if gate is None else gate
        tab, lav = (tabs["nbal12"], 12) if balance else \
            (tabs["noise31"], 31)
        wa, va = _delta_chain(nq[..., c, :], 5, tab, lav, g)
        wb, vb = _delta_chain(nq[..., c, :], 5, tab, lav, t & g)
        return [(wa, va, 4), (wb, vb, 4)]

    def ah_g(c):
        flags = ah[..., c, :]
        anyf = flags.any(-1)
        v = jnp.zeros((S, nau), i32)
        for i in range(n_hi):
            v = (v << 1) | flags[..., i].astype(i32)
        w = jnp.where(anyf, 1 + n_hi, 1)
        return ((w[..., None].astype(i32),
                 jnp.where(anyf, (1 << n_hi) | v, 0)[..., None], 4))

    if n_ch == 2:
        # per-AU layouts: LR = gridL gridR dtdfL dtdfR invfL invfR envL
        # envR noiseL noiseR; COUPLED = gridL dtdfL dtdfR invfL envL
        # noiseL envR(bal) noiseR(bal).  Complementary-gated groups in a
        # merged order keep every slot static-shaped.
        groups.append(grid(0))
        groups.append(grid(1, gate=~cpl))
        groups.append(dtdf(0))
        groups.append(dtdf(1))
        groups.append(invf_g(0))
        groups.append(invf_g(1, gate=~cpl))
        groups.extend(env_g(0))
        groups.extend(noise_g(0, gate=cpl))          # coupled: noise L here
        groups.extend(env_g(1, gate=~cpl))
        groups.extend(env_g(1, gate=cpl, balance=True))
        groups.extend(noise_g(0, gate=~cpl))
        groups.extend(noise_g(1, gate=~cpl))
        groups.extend(noise_g(1, gate=cpl, balance=True))
        groups.append(ah_g(0))
        groups.append(ah_g(1))
    else:
        groups.append(grid(0))
        groups.append(dtdf(0))
        groups.append(invf_g(0))
        groups.extend(env_g(0))
        groups.extend(noise_g(0))
        groups.append(ah_g(0))

    if enc.is_ps:
        ps_groups, ps_bits = _ps_slot_groups(side)
        ext_bits = 2 + ps_bits                      # ext id + ps data
        ext_sz = (ext_bits + 7) // 8
        esc = ext_sz >= 15
        # bs_extended(1) + size(4) [+ esc(8)]
        w = jnp.where(esc, 13, 5)
        v = jnp.where(esc, (1 << 12) | (15 << 8) | (ext_sz - 15),
                      (1 << 4) | ext_sz)
        groups.append((w[..., None].astype(i32), v[..., None].astype(i32),
                       3))
        groups.append(const(2, 2))                  # bs_extension_id = PS
        groups.extend(ps_groups)
        pad = ext_sz * 8 - ext_bits
        groups.append((pad[..., None].astype(i32),
                       jnp.zeros((S, nau, 1), i32), 1))
    else:
        groups.append(const(1, 0))                  # bs_extended_data

    sbr_bits = sum(w.sum(-1) for w, _, _ in groups)
    cnt = (4 + sbr_bits + 7) // 8
    esc = cnt >= 15
    # FIL hdr: ID_FIL(3) cnt(4) [esc(8)] EXT_SBR_DATA(4)
    fw = jnp.where(esc, 19, 11)
    fv = jnp.where(esc, (6 << 16) | (15 << 12) | ((cnt - 14) << 4) | 13,
                   (6 << 8) | (cnt << 4) | 13)
    head = (fw[..., None].astype(i32), fv[..., None].astype(i32), 4)
    tail_pad = cnt * 8 - 4 - sbr_bits
    tailg = (tail_pad[..., None].astype(i32), jnp.zeros((S, nau, 1), i32), 1)
    groups = [head] + groups + [tailg]
    w = jnp.concatenate([g[0] for g in groups], axis=-1)
    v = jnp.concatenate([g[1] for g in groups], axis=-1)
    return w, v


def pack_from_outputs(enc, out, pads=None, add_rs=True):
    """Validation entry: host-mode output arrays [S, nau, ...] -> device-
    packed superframes [S, bytes] (numpy).  The production path packs inside
    the model scan; this one lets tests compare the device packer against
    the host packer on the *same* encoder decisions."""
    ctx = enc.aupack_ctx if enc.aupack_ctx is not None else AuPackCtx(enc)
    S, nau = out["q"].shape[:2]
    pb = pl = None
    if pads is not None:
        padmax = max(1, enc.cfg.pad_len)
        pb = np.zeros((S, nau, padmax), np.int32)
        pl = np.zeros((S, nau), np.int32)
        for s in range(S):
            for a, p in enumerate(pads[s]):
                if p:
                    pb[s, a, :len(p)] = np.frombuffer(p, np.uint8)
                    pl[s, a] = len(p)
    keys = ["q", "gains", "books", "ms_used", "tns_en", "tns_order",
            "tns_idx", "tns_en_lo", "tns_order_lo", "tns_idx_lo", "tns_len"]
    sw = sv = None
    if enc.is_sbr:
        side = {k: jnp.asarray(np.asarray(v)) for k, v in out.items()
                if k.startswith(("sbr_", "ps_"))}
        sw, sv = sbr_slot_groups(enc, side)
    bufs, bits, crcs = [], [], []
    for a in range(nau):
        fr = {k: jnp.asarray(np.asarray(out[k])[:, a].astype(np.int32))
              for k in keys}
        fr["wseq"] = jnp.asarray(np.asarray(out["wseq"])[:, a], jnp.int32)
        groups = au_content_groups(
            ctx, fr, jnp.asarray(a == nau - 1),
            pad_buf=jnp.asarray(pb[:, a]) if pb is not None else None,
            pad_len=jnp.asarray(pl[:, a]) if pl is not None else None,
            sbr_group=(sw[:, a], sv[:, a], 4) if sw is not None else None)
        buf, b, c = pack_au_content(ctx, groups)
        bufs.append(buf)
        bits.append(b)
        crcs.append(c)
    sf, _ = assemble_superframes(
        ctx, jnp.stack(bufs, 1), jnp.stack(bits, 1), jnp.stack(crcs, 1),
        add_rs=add_rs)
    return np.asarray(sf)


# ---------------------------------------------------------------------------
# superframe assembly (after the AU scan)
# ---------------------------------------------------------------------------


def assemble_superframes(ctx, aubuf, au_bits, crc_part, add_rs=True):
    """aubuf: [S, nau, maxcb] int32 bytes; au_bits/crc_part: [S, nau].
    Returns ([S, total(+parity)] uint8, au_len_bytes [S, nau])."""
    S, nau, maxcb = aubuf.shape
    total = ctx.total
    hb = ctx.header_bytes

    # AU byte lengths and starts (tpenc_dab.cpp:361-433 semantics)
    lens = (au_bits + 7) // 8                       # non-last, incl. END
    start_list = [jnp.full((S,), hb, jnp.int32)]
    for a in range(nau - 1):
        start_list.append(start_list[-1] + lens[:, a] + 2)
    starts = jnp.stack(start_list, axis=1)          # [S, nau]
    last_len = total - 2 - starts[:, -1]
    lens = lens.at[:, -1].set(last_len)
    tail_d = last_len * 8 - au_bits[:, -1]          # fill + END + align bits

    # AU CRCs: ilut[Pb] ^ mulmod(c1, shiftlut[Pb]) (+ tail term, last AU)
    shift = _lut16(lens, ctx.crc_shift, total + 1)
    init = _lut16(lens, ctx.crc_init, total + 1)
    crc = init ^ _mulmod_dev(crc_part, shift)
    tail_slots_np, tail_crc_np = ctx.tails
    tcrc = _lut16(tail_d, tail_crc_np, tail_slots_np.shape[0])
    crc = crc.at[:, -1].set(crc[:, -1] ^ tcrc)
    crc = crc ^ 0xFFFF

    # tail slots (last AU): one-hot rows of the host-simulated fill+END
    n_tail = tail_slots_np.shape[1]
    tcols = np.concatenate(
        [np.stack([tail_slots_np[:, k, 0] >> 8, tail_slots_np[:, k, 0] & 0xFF,
                   tail_slots_np[:, k, 1] >> 8, tail_slots_np[:, k, 1] & 0xFF],
                  -1) for k in range(n_tail)], axis=1)
    oh = jax.nn.one_hot(tail_d, tail_slots_np.shape[0], dtype=jnp.bfloat16)
    row = jnp.round(jnp.matmul(oh, jnp.asarray(tcols, jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                    ).astype(jnp.int32).reshape(S, n_tail, 4)
    tw = (row[..., 0] << 8) | row[..., 1]
    tv = (row[..., 2] << 8) | row[..., 3]

    # superframe header fields
    fields = [(jnp.full((S, 1), 16, jnp.int32),
               jnp.zeros((S, 1), jnp.int32), 3),     # firecode placeholder
              (jnp.full((S, 1), 8, jnp.int32),
               jnp.full((S, 1), ctx.flags_byte, jnp.int32), 2)]
    if nau > 1:
        w12 = jnp.full((S, nau - 1), 12, jnp.int32)
        fields.append((w12, starts[:, 1:], 3))
    if ctx.hdr_pad4:
        fields.append((jnp.full((S, 1), 4, jnp.int32),
                       jnp.zeros((S, 1), jnp.int32), 2))

    # raw byte placements: AU content bytes + CRC bytes
    k = jnp.arange(maxcb)
    au_idx = starts[:, :, None] + k[None, None]
    au_ok = k[None, None] < lens[:, :, None]
    au_idx = jnp.where(au_ok, au_idx, total + 31).reshape(S, -1)
    au_val = jnp.where(au_ok, aubuf, 0).reshape(S, -1)
    crc_idx = jnp.stack([starts + lens, starts + lens + 1], -1).reshape(S, -1)
    crc_val = jnp.stack([crc >> 8, crc & 0xFF], -1).reshape(S, -1)

    core, _ = BP.pack_groups(fields, total,
                             raw=[(au_idx, au_val), (crc_idx, crc_val)],
                             kchunk=4096)
    # last AU's fill tail at bit offset start*8 + content_bits
    tail_base = starts[:, -1] * 8 + au_bits[:, -1]
    tail_buf, _ = BP.pack_groups([(tw, tv, 3)], total, bit_base=tail_base,
                                 kchunk=4096)
    core = core + tail_buf

    # firecode over bytes 2..10 (tpenc_dab.cpp:200-201,436-451)
    fc = BP.crc_fixed(core[:, 2:11], _fire_R(72), 16, 0)
    core = jnp.concatenate([(fc >> 8)[:, None], (fc & 0xFF)[:, None],
                            core[:, 2:]], axis=1)
    if not add_rs:
        return core.astype(jnp.uint8), lens
    # RS(120,110) column interleave (odr-audioenc.cpp:1189-1206): byte p at
    # (col p//subch, row p%subch); each row is one codeword
    subch = total // 110
    rows = core.reshape(S, 110, subch)
    data = jnp.moveaxis(rows, 1, 2)                  # [S, subch, 110]
    bits = BP.bytes_to_bits(data).astype(jnp.bfloat16)
    par_bits = jnp.round(jnp.einsum(
        "srk,kp->srp", bits, _rs_M(),
        preferred_element_type=jnp.float32)).astype(jnp.int32) & 1
    sh = jnp.arange(7, -1, -1, dtype=jnp.int32)
    parity = (par_bits.reshape(S, subch, 10, 8) << sh).sum(-1)
    out = jnp.concatenate([rows, jnp.moveaxis(parity, 1, 2)], axis=1)
    return out.reshape(S, 120 * subch).astype(jnp.uint8), lens
