"""Unit tests for the device bit-packing/CRC primitives (bitpack.py)."""
import numpy as np
import jax.numpy as jnp

from odr_audioenc_tpu import bitpack as BP
from odr_audioenc_tpu.host.bitwriter import BitWriter


def _ref_pack(widths, values, n_bytes):
    bw = BitWriter()
    for w, v in zip(widths, values):
        if w:
            bw.put(int(v) & ((1 << int(w)) - 1), int(w))
    nbits = len(bw.buf) * 8 + bw.nbits
    if bw.nbits:
        bw.put(0, 8 - bw.nbits)  # align for bytes()
    out = np.zeros(n_bytes, np.uint8)
    b = np.frombuffer(bw.bytes(), np.uint8)
    out[:len(b)] = b
    return out, nbits


def test_pack_groups_matches_bitwriter():
    rng = np.random.default_rng(7)
    S, K1, K2 = 5, 40, 25
    n_bytes = 96
    w1 = rng.integers(0, 7, (S, K1)).astype(np.int32)       # <=6-bit slots
    v1 = rng.integers(0, 1 << 6, (S, K1)).astype(np.int32)
    w2 = (rng.integers(0, 3, (S, K2)) * rng.integers(5, 9, (S, K2))).astype(np.int32)
    v2 = rng.integers(0, 1 << 16, (S, K2)).astype(np.int32)  # <=16-bit slots
    pay, bits = BP.pack_groups(
        [(jnp.asarray(w1), jnp.asarray(v1), 2),
         (jnp.asarray(w2), jnp.asarray(v2), 3)], n_bytes)
    pay = np.asarray(pay)
    bits = np.asarray(bits)
    for s in range(S):
        ws = np.concatenate([w1[s], w2[s]])
        vs = np.concatenate([v1[s], v2[s]])
        ref, nb = _ref_pack(ws, vs, n_bytes)
        assert bits[s] == nb
        assert (pay[s] == ref).all(), f"stream {s} mismatch"


def test_pack_groups_raw_tail():
    S = 3
    n_bytes = 32
    w = jnp.asarray(np.full((S, 2), 8, np.int32))
    v = jnp.asarray(np.tile(np.array([[0xAB, 0xCD]], np.int32), (S, 1)))
    ridx = jnp.asarray(np.tile(np.array([[30, 31]], np.int32), (S, 1)))
    rval = jnp.asarray(np.tile(np.array([[0x12, 0x34]], np.int32), (S, 1)))
    pay, _ = BP.pack_groups([(w, v, 2)], n_bytes, raw=[(ridx, rval)])
    pay = np.asarray(pay)
    assert (pay[:, 0] == 0xAB).all() and (pay[:, 1] == 0xCD).all()
    assert (pay[:, 30] == 0x12).all() and (pay[:, 31] == 0x34).all()
    assert (pay[:, 2:30] == 0).all()


def _ref_crc_bytes(data_bits, poly, width, init):
    crc = init
    for bit in data_bits:
        carry = (crc >> (width - 1)) & 1
        crc = (crc << 1) & ((1 << width) - 1)
        if carry ^ int(bit):
            crc ^= poly & ((1 << width) - 1)
    return crc


def test_crc_device_variable_length():
    rng = np.random.default_rng(3)
    for poly, width, init in [(0x8005, 16, 0xFFFF), (0x1D, 8, 0x0),
                              (0x1021, 16, 0xFFFF), (0x782D, 16, 0x0)]:
        nb = 24
        tab = BP.CrcTable(poly, width, init, nb * 8)
        tabs = tab.device_tables()
        S = 8
        buf = np.zeros((S, nb), np.int32)
        lens = rng.integers(0, nb * 8 + 1, S).astype(np.int32)
        refs = []
        for s in range(S):
            L = int(lens[s])
            bits = rng.integers(0, 2, L)
            refs.append(_ref_crc_bytes(bits, poly, width, init))
            # left-align bits into buf[s]
            for i, b in enumerate(bits):
                if b:
                    buf[s, i // 8] |= 1 << (7 - i % 8)
        out = np.asarray(BP.crc_device(jnp.asarray(buf), jnp.asarray(lens),
                                       tabs, width))
        assert (out == np.asarray(refs)).all(), (poly, out, refs)


def test_crc_fixed():
    rng = np.random.default_rng(4)
    nb = 9  # firecode: 9 bytes
    poly, width, init = 0x782D, 16, 0
    tab = BP.CrcTable(poly, width, init, nb * 8)
    init_c = BP._crc_ref(0, nb * 8, init, poly, width)
    buf = rng.integers(0, 256, (6, nb)).astype(np.int32)
    out = np.asarray(BP.crc_fixed(jnp.asarray(buf),
                                  jnp.asarray(tab.R, jnp.bfloat16),
                                  width, init_c))
    from odr_audioenc_tpu.host.aacpack import firecode_crc
    refs = [firecode_crc(bytes(buf[s].astype(np.uint8))) for s in range(6)]
    assert (out == np.asarray(refs)).all()


def test_rs_bit_matrix():
    from odr_audioenc_tpu.fec.rs import ReedSolomon
    rs = ReedSolomon(10, 110)
    M = BP.rs_bit_matrix(rs)
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, (4, 110)).astype(np.uint8)
    ref = rs.encode(data)
    bits = ((data[:, :, None] >> np.arange(7, -1, -1)) & 1).reshape(4, -1)
    par_bits = (bits.astype(np.int64) @ M.astype(np.int64)) & 1
    par = (par_bits.reshape(4, 10, 8) << np.arange(7, -1, -1)).sum(-1)
    assert (par == ref).all()
