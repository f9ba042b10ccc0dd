"""Device-side bitstream packing + CRC primitives (TPU-native).

Measured on the target TPU (tools/prof_pack.py): XLA scatter runs at
~150M updates/s and take_along_axis gathers are ~1000x slower than the
equivalent matmul, so both packing and CRCs are expressed as one-hot
matmuls that ride the MXU:

 - ``scatter_bytes``: out[s, j] = sum_k contrib[s,k] * [idx[s,k] == j],
   factorised as out[s, hi, lo] = A^T diag(c) B with A/B one-hot in the
   high/low digits of the byte index - a batched [H,K]x[K,L] matmul whose
   cost is the one-hot HBM traffic (K*(H+L) bf16 per stream).
 - ``pack_groups``: (width, value) slots in exact serialization order;
   bit offsets are an exclusive cumsum, every slot contributes its
   <=`spans` overlapping bytes, and distinct slots never share bits so
   integer add == bitwise or.
 - GF(2) CRCs (``CrcTable``/``crc_device``): for a message of L bits
   left-aligned in a P-bit buffer, crc = (M(x)*x^w mod g) * x^(L-P)
   + init*x^L (mod g).  The fixed-alignment reduction is one [P, w] bit
   matmul; the variable-length shift and init terms are a per-length
   multiply table fetched by one-hot matmul - no gathers anywhere.

These mirror the byte formats of libtoolame-dab/bitstream.c:46-150 and
fdk-aac libMpegTPEnc/src/tpenc_dab.cpp (format contract only; the
emission strategy is original and TPU-first).
"""
import jax
import jax.numpy as jnp
import numpy as np


def scatter_bytes(idx, contrib, n_bytes, L=32, kchunk=16384):
    """Batched scatter-add via one-hot matmul factorisation.

    idx: [..., K] int32 byte indices (entries >= H*L are dropped);
    contrib: [..., K] int32 in [0, 255]; returns [..., n_bytes] int32.
    Contributions to the same byte are ADDED - callers guarantee bit
    disjointness so add == or."""
    lead = idx.shape[:-1]
    K = idx.shape[-1]
    B = int(np.prod(lead)) if lead else 1
    idx = idx.reshape(B, K)
    contrib = contrib.reshape(B, K)
    H = -(-n_bytes // L)
    pad = (-K) % kchunk if K > kchunk else 0
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=H * L)
        contrib = jnp.pad(contrib, ((0, 0), (0, pad)))
    Kp = idx.shape[1]
    nc = max(1, Kp // kchunk)

    def chunk(h, l, c):
        A = jax.nn.one_hot(h, H, dtype=jnp.bfloat16) \
            * c[..., None].astype(jnp.bfloat16)
        Bm = jax.nn.one_hot(l, L, dtype=jnp.bfloat16)
        return jnp.einsum("skh,skl->shl", A, Bm,
                          preferred_element_type=jnp.float32)

    hi, lo = idx // L, idx % L
    if nc > 1:
        hi = hi.reshape(B, nc, -1).swapaxes(0, 1)
        lo = lo.reshape(B, nc, -1).swapaxes(0, 1)
        cc = contrib.reshape(B, nc, -1).swapaxes(0, 1)
        acc, _ = jax.lax.scan(
            lambda a, xs: (a + chunk(*xs), None),
            jnp.zeros((B, H, L), jnp.float32), (hi, lo, cc))
    else:
        acc = chunk(hi, lo, contrib)
    out = jnp.round(acc).astype(jnp.int32).reshape(B, H * L)[:, :n_bytes]
    return out.reshape(*lead, n_bytes)


def scatter_slot_vectors(b0, vecs, n_bytes, L=32, kchunk=4096):
    """Scatter per-slot byte VECTORS: out[.., b0[k] + t] += vecs[.., k, t].

    b0: [..., K] int32 slot start bytes; vecs: [..., K, T] int32 0..255.
    One entry per SLOT instead of one per (slot, span byte): the einsum
    contraction is T x smaller than scatter_bytes on span-expanded entries
    (the AU content pack measured 168 ms of the LC superframe step at
    S=2048 under the expanded form).  The placement one-hot is built over
    L+T-1 lanes so vectors may straddle the L boundary; the spill lanes
    fold into the next row after the contraction (linear, so exact).
    Entries outside [0, H*L) rows are dropped; zero vecs contribute 0."""
    lead = b0.shape[:-1]
    K = b0.shape[-1]
    T = vecs.shape[-1]
    B = int(np.prod(lead)) if lead else 1
    b0 = b0.reshape(B, K)
    vecs = vecs.reshape(B, K, T)
    H = -(-n_bytes // L)
    Lp = L + T - 1
    ok = (b0 >= 0) & (b0 < H * L)
    hi = jnp.where(ok, b0 // L, H)          # row H collects dropped slots
    lo = jnp.where(ok, b0 % L, 0)
    pad = (-K) % kchunk if K > kchunk else 0
    if pad:
        hi = jnp.pad(hi, ((0, 0), (0, pad)), constant_values=H)
        lo = jnp.pad(lo, ((0, 0), (0, pad)))
        vecs = jnp.pad(vecs, ((0, 0), (0, pad), (0, 0)))
    Kp = hi.shape[1]
    nc = max(1, Kp // kchunk)

    def chunk(h, l, v):
        A = jax.nn.one_hot(h, H + 1, dtype=jnp.bfloat16)
        Bm = jnp.zeros(l.shape + (Lp,), jnp.bfloat16)
        for t in range(T):
            Bm = Bm + jax.nn.one_hot(l + t, Lp, dtype=jnp.bfloat16) \
                * v[..., t, None].astype(jnp.bfloat16)
        return jnp.einsum("skh,skl->shl", A, Bm,
                          preferred_element_type=jnp.float32)

    if nc > 1:
        h = hi.reshape(B, nc, -1).swapaxes(0, 1)
        l = lo.reshape(B, nc, -1).swapaxes(0, 1)
        v = vecs.reshape(B, nc, -1, T).swapaxes(0, 1)
        acc, _ = jax.lax.scan(
            lambda a, xs: (a + chunk(*xs), None),
            jnp.zeros((B, H + 1, Lp), jnp.float32), (h, l, v))
    else:
        acc = chunk(hi, lo, vecs)
    out = acc[:, :H, :L]
    if T > 1:
        # lanes L..Lp-1 of row h belong to row h+1 (straddling vectors);
        # spill past the last row is out of range by construction
        out = out.at[:, 1:, :T - 1].add(acc[:, :H - 1, L:])
    out = jnp.round(out).astype(jnp.int32).reshape(B, H * L)[:, :n_bytes]
    return out.reshape(*lead, n_bytes)


def _mask_to_width(values, widths):
    """Mask each value to its width so an out-of-range input degrades the
    same way the host BitWriter does (truncation, no carry corruption)."""
    w = jnp.minimum(widths, 24)
    return jnp.where(widths > 0, values & ((1 << w) - 1), 0)


def pack_groups(groups, n_bytes, raw=None, bit_base=None, **mm_kw):
    """Serialize slot groups into a byte buffer on device.

    groups: list of (widths [..,k_i] int32, values [..,k_i] int32, spans_i)
      in exact serialization order; spans_i = max bytes any slot of the
      group can touch (= (max_width+6)//8 + 1).  Max width 24 bits.
    raw: optional extra (byte_idx [..,m], byte_val [..,m]) pairs placed
      directly (already byte-aligned tail sections).
    bit_base: optional [..] int32 starting bit offset (default 0, must be
      byte-aligned if used with raw groups' assumptions).
    Returns (payload [.., n_bytes] int32 0..255, total_bits [..] int32).
    """
    widths = jnp.concatenate([g[0] for g in groups], axis=-1)
    values = jnp.concatenate([_mask_to_width(g[1], g[0]) for g in groups],
                             axis=-1)
    end = jnp.cumsum(widths, axis=-1)
    if bit_base is not None:
        end = end + bit_base[..., None]
    start = end - widths
    total_bits = end[..., -1]

    t_max = max(g[2] for g in groups)
    b0_parts, vec_parts = [], []
    off = 0
    for g_w, _, spans in groups:
        k = g_w.shape[-1]
        sl = slice(off, off + k)
        w = widths[..., sl]
        v = values[..., sl]
        e = end[..., sl]
        s = start[..., sl]
        b0 = s >> 3
        last_b = (e - 1) >> 3
        lanes = []
        for t in range(t_max):
            if t >= spans:
                lanes.append(jnp.zeros_like(v))
                continue
            bt = b0 + t
            sh = e - 8 * (bt + 1)
            c = jnp.where(sh >= 0,
                          (v >> jnp.minimum(sh, 24)) & 0xFF,
                          (v << jnp.minimum(-sh, 8)) & 0xFF)
            ok = (w > 0) & (bt <= last_b)
            lanes.append(jnp.where(ok, c, 0))
        b0_parts.append(b0)
        vec_parts.append(jnp.stack(lanes, axis=-1))
        off += k
    b0 = jnp.concatenate(b0_parts, axis=-1)
    vecs = jnp.concatenate(vec_parts, axis=-2)
    payload = scatter_slot_vectors(b0, vecs, n_bytes, **mm_kw)
    if raw:
        idx = jnp.concatenate([r[0] for r in raw], axis=-1)
        con = jnp.concatenate([r[1] & 0xFF for r in raw], axis=-1)
        payload = payload + scatter_bytes(idx, con, n_bytes,
                                          kchunk=mm_kw.get("kchunk", 16384))
    return payload, total_bits


def bytes_to_bits(x):
    """[..., B] uint8/int32 -> [..., 8B] int32 bits, MSB first."""
    sh = jnp.arange(7, -1, -1, dtype=jnp.int32)
    bits = (x[..., None].astype(jnp.int32) >> sh) & 1
    return bits.reshape(*x.shape[:-1], x.shape[-1] * 8)


# ---------------------------------------------------------------------------
# GF(2) CRC as matmul
# ---------------------------------------------------------------------------

def _crc_ref(msb_val, length, crc, poly, width):
    """Bit-serial reference (update_crc16/update_crc8 semantics, crc.c)."""
    mask = (1 << width) - 1
    for i in range(length - 1, -1, -1):
        bit = (msb_val >> i) & 1
        carry = (crc >> (width - 1)) & 1
        crc = (crc << 1) & mask
        if carry ^ bit:
            crc ^= poly & mask
    return crc


class CrcTable:
    """Host-precomputed tables for a (poly, width, init) CRC over messages
    of up to p_bits bits, left-aligned in a fixed p_bits buffer."""

    def __init__(self, poly, width, init, p_bits):
        self.poly, self.width, self.init, self.p = poly, width, init, p_bits
        w, g = width, poly | (1 << width)

        def xmul(a, b):
            """carry-less multiply."""
            r = 0
            while b:
                if b & 1:
                    r ^= a
                b >>= 1
                a <<= 1
            return r

        def xmod(a, m):
            db = m.bit_length() - 1
            while a.bit_length() - 1 >= db:
                a ^= m << (a.bit_length() - 1 - db)
            return a

        # R[p] = x^(w + P-1-p) mod g  (fixed-alignment reduction matrix)
        R = np.zeros((p_bits, w), np.int8)
        cur = xmod(1 << w, g)  # x^w mod g, i.e. exponent for p = P-1
        for p in range(p_bits - 1, -1, -1):
            R[p] = [(cur >> (w - 1 - j)) & 1 for j in range(w)]
            cur = xmod(cur << 1, g)
        self.R = R

        # x^{-1} mod g: g = x*q + 1  =>  x^{-1} = q = (g-1)/x
        xinv = (g ^ 1) >> 1
        # per-length tables: MUL[L][i][:] = x^i * x^(L-P) mod g; INIT[L]
        lut = np.zeros((p_bits + 1, w * w + w), np.int8)
        tL = 1  # x^(L-P) at L = P
        for L in range(p_bits, -1, -1):
            initL = xmod(xmul(init, self._xpow(L, g)), g)
            for i in range(w):
                # c0[i] holds the coefficient of x^(w-1-i)
                m = xmod(xmul(1 << (w - 1 - i), tL), g)
                lut[L, i * w:(i + 1) * w] = \
                    [(m >> (w - 1 - j)) & 1 for j in range(w)]
            lut[L, w * w:] = [(initL >> (w - 1 - j)) & 1 for j in range(w)]
            tL = xmod(xmul(tL, xinv), g)
        self.lut = lut

    @staticmethod
    def _xpow(n, g):
        """x^n mod g by square-and-multiply (carry-less)."""
        def xmul(a, b):
            r = 0
            while b:
                if b & 1:
                    r ^= a
                b >>= 1
                a <<= 1
            return r

        def xmod(a, m):
            db = m.bit_length() - 1
            while a.bit_length() - 1 >= db:
                a ^= m << (a.bit_length() - 1 - db)
            return a

        r, base = 1, 2  # x
        while n:
            if n & 1:
                r = xmod(xmul(r, base), g)
            base = xmod(xmul(base, base), g)
            n >>= 1
        return r

    def device_tables(self):
        return {"R": jnp.asarray(self.R, jnp.bfloat16),
                "lut": jnp.asarray(self.lut, jnp.bfloat16)}


def crc_device(buf, nbits, tabs, width):
    """buf: [.., nb] int32 bytes with the message left-aligned in the first
    `nbits` bits (rest zero); nbits: [..] int32; tabs: CrcTable.device_tables
    arrays sized for P = 8*nb.  Returns crc [..] int32."""
    bits = bytes_to_bits(buf).astype(jnp.bfloat16)          # [.., P]
    c0 = jnp.einsum("...p,pw->...w", bits, tabs["R"],
                    preferred_element_type=jnp.float32)
    c0 = jnp.round(c0).astype(jnp.int32) & 1                # [.., w]
    P = bits.shape[-1]
    oh = jax.nn.one_hot(nbits, P + 1, dtype=jnp.bfloat16)
    row = jnp.einsum("...l,lk->...k", oh, tabs["lut"],
                     preferred_element_type=jnp.float32)
    row = jnp.round(row).astype(jnp.int32) & 1
    mul = row[..., :width * width].reshape(*row.shape[:-1], width, width)
    initv = row[..., width * width:]
    out = (jnp.einsum("...i,...ij->...j", c0.astype(jnp.bfloat16),
                      mul.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32))
    out = (jnp.round(out).astype(jnp.int32) + initv) & 1
    sh = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    return jnp.sum(out << sh, axis=-1).astype(jnp.int32)


def crc_fixed(buf, tab_R, width, init_contrib):
    """CRC over a FIXED-length message (the whole buffer): one matmul.
    tab_R from CrcTable(poly, width, ·, P).R with P = 8*nb;
    init_contrib = _crc_ref(0, P, init, poly, width) (host scalar)."""
    bits = bytes_to_bits(buf).astype(jnp.bfloat16)
    c0 = jnp.einsum("...p,pw->...w", bits, tab_R,
                    preferred_element_type=jnp.float32)
    c0 = jnp.round(c0).astype(jnp.int32) & 1
    sh = jnp.arange(width - 1, -1, -1, dtype=jnp.int32)
    return (jnp.sum(c0 << sh, axis=-1) ^ init_contrib).astype(jnp.int32)


def rs_bit_matrix(rs):
    """GF(2) bit matrix [kk*8, nroots*8] of a ReedSolomon instance: parity
    bits as a linear function of data bits (GF(256)-linear => GF(2)-linear).
    Data bit (i, b) = byte i bit b (MSB-first);  parity likewise."""
    kk, nr = rs.kk, rs.nroots
    M = np.zeros((kk * 8, nr * 8), np.int8)
    for b in range(8):
        v = 1 << (7 - b)  # MSB-first bit b of a byte
        par = rs.gf.mul(rs.G, v)  # [kk, nroots] parity bytes for data=v at i
        bits = ((par[:, :, None] >> np.arange(7, -1, -1)) & 1)  # [kk,nr,8]
        M[np.arange(kk) * 8 + b] = bits.reshape(kk, nr * 8)
    return M
