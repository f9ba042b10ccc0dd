"""Property test: the sorted-prefix allocator equals a direct transliteration
of the C greedy loop on randomized SMR inputs (beyond what golden streams
cover: random jsbounds, tables, budgets)."""
import numpy as np
import jax.numpy as jnp
import pytest

from odr_audioenc_tpu.mp2 import allocate
from odr_audioenc_tpu import tables as T


def c_greedy(SMR, scfsi, adb, nch, sblimit, jsbound, tablenum):
    """Direct transliteration of a_bit_allocation_new (encode_new.c:1078-1187)."""
    line = T.LINE[tablenum]

    def nbal(sb):
        return int(T.NBAL[line[sb]]) if line[sb] >= 0 else 0

    bbal = sum(nch * nbal(sb) for sb in range(min(jsbound, 32))) + \
        sum(nbal(sb) for sb in range(min(jsbound, 32), sblimit))
    ad = adb - (bbal + 16 + 32)
    mnr = np.zeros((2, 32))
    ba = np.zeros((2, 32), int)
    used = np.zeros((2, 32), int)
    for sb in range(sblimit):
        for ch in range(nch):
            mnr[ch][sb] = T.SNR[0] - SMR[ch][sb]
    if nch == 1:
        used[1, :] = 2
    used[:, sblimit:] = 2
    bspl = bscf = bsel = 0
    while True:
        small, msb, mch = 999999.0, -1, -1
        for ch in range(nch):
            for sb in range(sblimit):
                if used[ch][sb] != 2 and small > mnr[ch][sb]:
                    small, msb, mch = mnr[ch][sb], sb, ch
        if msb < 0:
            break
        tl = line[msb]
        nsi = T.STEP_INDEX[tl][ba[mch][msb] + 1]
        inc = 12 * T.GROUP[nsi] * T.BITS[nsi]
        if used[mch][msb]:
            csi = T.STEP_INDEX[tl][ba[mch][msb]]
            inc -= 12 * T.GROUP[csi] * T.BITS[csi]
        oth = 1 - mch
        if used[mch][msb]:
            scale = seli = 0
        else:
            seli = 2
            scale = 6 * T.SFS_PER_SCFSI[scfsi[mch][msb]]
            if nch == 2 and msb >= jsbound:
                seli += 2
                scale += 6 * T.SFS_PER_SCFSI[scfsi[oth][msb]]
        if ad >= bspl + bscf + bsel + seli + scale + inc:
            ba[mch][msb] += 1
            bspl += inc
            bscf += scale
            bsel += seli
            used[mch][msb] = 1
            si = T.STEP_INDEX[tl][ba[mch][msb]]
            mnr[mch][msb] = T.SNR[si] - SMR[mch][msb]
            if ba[mch][msb] >= (1 << nbal(msb)) - 1:
                used[mch][msb] = 2
        else:
            used[mch][msb] = 2
        if msb >= jsbound and nch == 2:
            ba[oth][msb] = ba[mch][msb]
            used[oth][msb] = used[mch][msb]
            si = T.STEP_INDEX[tl][ba[mch][msb]]
            mnr[oth][msb] = T.SNR[si] - SMR[oth][msb]
    ad -= bspl + bscf + bsel
    return ba, ad


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sorted_allocator_matches_c_greedy(seed):
    rng = np.random.default_rng(seed)
    B = 24
    cases = []
    for _ in range(B):
        tablenum = int(rng.choice([0, 1, 2, 4]))
        sblimit = int(T.TABLE_SBLIMIT[tablenum])
        nch = int(rng.choice([1, 2]))
        jsbound = int(rng.choice([4, 8, 12, 16, sblimit])) if nch == 2 else sblimit
        adb = int(rng.integers(600, 4000))
        smr = rng.normal(10, 25, (2, 32))
        scfsi = rng.integers(0, 4, (2, 32))
        cases.append((tablenum, sblimit, nch, jsbound, adb, smr, scfsi))

    smr_j = jnp.asarray(np.stack([c[5] for c in cases]), jnp.float64)
    scfsi_j = jnp.asarray(np.stack([c[6] for c in cases]), jnp.int32)
    ft = allocate._frame_tables(jnp.asarray([c[0] for c in cases]))
    ba_j, left_j = allocate.a_bit_allocation(
        smr_j, scfsi_j, ft,
        jnp.asarray([c[1] for c in cases]),
        jnp.asarray([c[2] for c in cases]),
        jnp.asarray([c[3] for c in cases]),
        jnp.asarray([c[4] for c in cases]), jnp.float64)
    ba_j, left_j = np.asarray(ba_j), np.asarray(left_j)

    for i, (tablenum, sblimit, nch, jsbound, adb, smr, scfsi) in enumerate(cases):
        ba_c, left_c = c_greedy(smr, scfsi, adb, nch, sblimit, jsbound, tablenum)
        got = ba_j[i].copy()
        if nch == 1:
            got[1] = 0
            ba_c[1] = 0
        assert np.array_equal(got, ba_c), f"case {i}: {got} != {ba_c}"
        assert left_j[i] == left_c, f"case {i}: leftover {left_j[i]} != {left_c}"
