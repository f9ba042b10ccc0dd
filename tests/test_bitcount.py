"""Exactness of the MXU Huffman bit counter (dabplus/encode.py
spectral_bits_and_books) against brute-force table lookups - pins the
factorized bilinear one-hot form (len(a,b) = oh_a @ M @ oh_b) to the flat
codebook tables (fdk bit_cnt.cpp:60-280 semantics)."""
import numpy as np
import jax.numpy as jnp

from odr_audioenc_tpu.dabplus import encode as E
from odr_audioenc_tpu.dabplus import tables as AT


def _bctx():
    rate = 48000
    off = AT.sfb_offsets(rate)
    NB = AT.MAX_SFB_LONG
    bol = np.zeros(960, np.int32)
    band_m = np.zeros((NB, 960), np.float32)
    for b in range(len(off) - 1):
        bol[off[b]:off[b + 1]] = b
        band_m[b, off[b]:off[b + 1]] = 1.0
    return E.BandCtx(jnp.asarray(band_m), jnp.asarray(bol)), off


def _ref_costs(q, off):
    """Brute-force per-band per-book bit costs from the flat tables."""
    NB = AT.MAX_SFB_LONG
    S, ch, _ = q.shape
    cost = np.zeros((S, ch, NB, 12), np.int64)
    aq = np.abs(q)
    for b in range(len(off) - 1):
        lo, hi = off[b], off[b + 1]
        for s in range(S):
            for c in range(ch):
                seg = q[s, c, lo:hi]
                aseg = aq[s, c, lo:hi]
                # quad books 1-4
                for k in range(0, hi - lo, 4):
                    v = seg[k:k + 4]
                    a = aseg[k:k + 4]
                    sg = int((a != 0).sum())
                    if (a <= 1).all():
                        i = 0
                        for x in v + 1:
                            i = i * 3 + int(x)
                        cost[s, c, b, 1] += E._LEN_QUAD[0][i]
                        cost[s, c, b, 2] += E._LEN_QUAD[1][i]
                    if (a <= 2).all():
                        i = 0
                        for x in a:
                            i = i * 3 + int(x)
                        cost[s, c, b, 3] += E._LEN_QUAD[2][i] + sg
                        cost[s, c, b, 4] += E._LEN_QUAD[3][i] + sg
                # pair books 5-11
                for k in range(0, hi - lo, 2):
                    v = seg[k:k + 2]
                    a = aseg[k:k + 2]
                    sg = int((a != 0).sum())
                    if (a <= 4).all():
                        i = (int(v[0]) + 4) * 9 + int(v[1]) + 4
                        cost[s, c, b, 5] += E._LEN_PAIR56[0][i]
                        cost[s, c, b, 6] += E._LEN_PAIR56[1][i]
                    if (a <= 7).all():
                        i = int(a[0]) * 8 + int(a[1])
                        cost[s, c, b, 7] += E._LEN_PAIR78[0][i] + sg
                        cost[s, c, b, 8] += E._LEN_PAIR78[1][i] + sg
                    if (a <= 12).all():
                        i = int(a[0]) * 13 + int(a[1])
                        cost[s, c, b, 9] += E._LEN_PAIR910[0][i] + sg
                        cost[s, c, b, 10] += E._LEN_PAIR910[1][i] + sg
                    i = min(int(a[0]), 16) * 17 + min(int(a[1]), 16)
                    esc = sum(2 * max(int(np.floor(np.log2(max(x, 16)))), 4)
                              - 3 for x in a if x >= 16)
                    cost[s, c, b, 11] += E._LEN_PAIR11[i] + sg + esc
    return cost


def test_bit_counter_matches_tables():
    rng = np.random.default_rng(7)
    bctx, off = _bctx()
    # mixed magnitudes incl. escapes (>=16) and zeros
    q = rng.integers(-40, 40, (3, 2, 960)).astype(np.int32)
    q[0, 0, :64] = 0
    q[1, 1] = rng.integers(-2, 2, 960)
    bandsel = jnp.ones((3, 1, AT.MAX_SFB_LONG), bool)
    import jax
    fn = jax.jit(lambda qq: E.spectral_bits_and_books(
        qq, bctx, bandsel, jnp.float64))
    books, bbits = fn(jnp.asarray(q))
    books, bbits = np.asarray(books), np.asarray(bbits)
    ref = _ref_costs(q, off)
    # validity per book from magnitude limits
    aq = np.abs(q)
    lim = np.array([0, 1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 1 << 30])
    nb = len(off) - 1
    for s in range(3):
        for c in range(2):
            for b in range(nb):
                amax = aq[s, c, off[b]:off[b + 1]].max()
                valid = [k for k in range(12) if amax <= lim[k] or k == 11]
                want = min(ref[s, c, b, k] if k else 0 for k in valid)
                assert bbits[s, c, b] == want, (s, c, b)
                got_book = books[s, c, b]
                assert amax <= lim[got_book] or got_book == 11
                assert (ref[s, c, b, got_book] if got_book else 0) == want
