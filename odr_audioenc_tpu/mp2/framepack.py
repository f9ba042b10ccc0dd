"""Device-side emission of COMPLETE MP2/DAB frames.

Produces, per stream, the exact bytes of libtoolame-dab's frame
(toolame.c:467-553 order: header, CRC16, bit allocation, scfsi,
scalefactors, sample codewords, zero stuffing, X-PAD, ScF-CRC
placeholders, F-PAD), so the host only patches the 2-4 ScF-CRC bytes
into the PREVIOUS frame (the one-frame DAB back-patch delay,
toolame.c:527-542) and slices off lg_frame(+padding) bytes.

Header CRC16 (crc.c:12-41, poly 0x8005 init 0xFFFF over the header's last
16 bits + alloc + scfsi) and the four ScF-CRC8s (crc.c:58-98, poly 0x1D
over transmitted scalefactor MSB triples per subband range) are GF(2)
matmuls (bitpack.CrcTable) over mini message buffers packed on device.
"""
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .. import bitpack as BP
from .. import tables as T
from . import binpack

SBLIMIT = 32
SCF_RANGES = [0, 4, 8, 16, 30]


@lru_cache(maxsize=None)
def _crc16_tab():
    return BP.CrcTable(0x8005, 16, 0xFFFF, 52 * 8)


@lru_cache(maxsize=None)
def _crc8_tab():
    return BP.CrcTable(0x1D, 8, 0x0, 32 * 8)


def nbal_rows(config):
    """Static per-stream nbal[32] from the allocation table choice."""
    line = T.LINE[config.tablenum]                      # [S, 32]
    return np.where(line >= 0, T.NBAL[np.maximum(line, 0)], 0).astype(np.int32)


def _scf_slots(sf, scfsi, active, width, shift):
    """Scalefactor slot grid [S, 32, 2, 3] in (sb, ch, emission) order.

    code 0 -> sf[0],sf[1],sf[2]; 1/3 -> sf[0],sf[2]; 2 -> sf[0]
    (write_scalefactors, encode_new.c:288-354 emission order).
    sf: [S,2,3,32]; active: [S,32,2]; returns (widths, values) [S, 192]."""
    S = sf.shape[0]
    code = scfsi.transpose(0, 2, 1)                     # [S, 32, 2]
    sfv = (sf >> shift).transpose(0, 3, 1, 2)           # [S, 32, 2, 3(gr)]
    n_tx = jnp.where(code == 0, 3, jnp.where(code == 2, 1, 2))
    slot = jnp.arange(3)
    w = jnp.where(slot < n_tx[..., None], width, 0)
    w = jnp.where(active[..., None], w, 0)
    # slot 1 carries gr1 for code 0 but gr2 for codes 1/3
    v1 = jnp.where((code == 1) | (code == 3), sfv[..., 2], sfv[..., 1])
    v = jnp.stack([sfv[..., 0], v1, sfv[..., 2]], axis=-1)
    return w.reshape(S, -1), v.reshape(S, -1)


def pack_full_frame(cfgd, out, sbband, ft, xpad_len, xpad_buf, n_bytes):
    """Emit complete frames [S, n_bytes] u8 + ScF-CRC values [S, 4].

    cfgd: dict of device config columns (version, bitrate_idx, sfreq_idx,
      nbal [S,32], dab_ext, dab_length, lg_frame, sblimit, nch);
    out: dict with sf_index [S,2,3,32], scfsi, bit_alloc, mode, mode_ext,
      jsbound, extra (all int32);
    sbband: [S,2,3,12,32] int32; xpad_buf: [S, padmax] int32 or None.
    """
    S = sbband.shape[0]
    sblimit, nch = cfgd["sblimit"], cfgd["nch"]
    jsbound = out["jsbound"]
    bit_alloc = out["bit_alloc"]
    scfsi = out["scfsi"]
    sf = out["sf_index"]
    extra = out.get("extra")
    if extra is None:
        extra = jnp.zeros((S,), jnp.int32)

    sb = jnp.arange(SBLIMIT)
    in_lim = sb[None, :] < sblimit[:, None]
    # alloc/scf channel activity (write order: sb outer, ch inner)
    ch_tx = jnp.stack([in_lim,
                       in_lim & (sb[None, :] < jsbound[:, None])
                       & (nch[:, None] == 2)], axis=2)        # [S,32,2] alloc
    ch_scf = jnp.stack([in_lim, in_lim & (nch[:, None] == 2)], axis=2)
    alloc_t = bit_alloc.transpose(0, 2, 1)                    # [S,32,2]
    active_scf = (alloc_t > 0) & ch_scf                       # [S,32,2]

    # --- header slots ---
    hdr1 = (0xFFF << 4) | (cfgd["version"] << 3) | (2 << 1) | 0
    hdr2 = (cfgd["bitrate_idx"] << 12) | (cfgd["sfreq_idx"] << 10) \
        | (extra << 9) | (out["mode"] << 6) | (out["mode_ext"] << 4) | 0
    hdr1 = hdr1[:, None].astype(jnp.int32)
    hdr2 = hdr2[:, None].astype(jnp.int32)
    w16 = jnp.full((S, 1), 16, jnp.int32)

    # --- alloc + scfsi slots ---
    w_alloc = jnp.where(ch_tx, cfgd["nbal"][..., None], 0).reshape(S, -1)
    v_alloc = jnp.where(ch_tx, alloc_t, 0).reshape(S, -1)
    w_scfsi = jnp.where(active_scf, 2, 0).reshape(S, -1)
    v_scfsi = jnp.where(active_scf, scfsi.transpose(0, 2, 1), 0).reshape(S, -1)

    # --- header CRC16 over hdr2 + alloc + scfsi (crc.c:12-41) ---
    msg, msg_bits = BP.pack_groups(
        [(w16, hdr2, 3), (w_alloc, v_alloc, 2), (w_scfsi, v_scfsi, 2)], 52)
    crc = BP.crc_device(msg, msg_bits, _crc16_tabs(), 16)[:, None]

    # --- scalefactor slots ---
    w_scf, v_scf = _scf_slots(sf, scfsi, (alloc_t > 0) & ch_scf, 6, 0)

    # --- sample slots (binpack grid) ---
    w_smp, v_smp = binpack.sample_slots(sbband, bit_alloc, ft, sblimit,
                                        nch, jsbound)

    # --- ScF-CRC8 values (crc.c:58-98): 3-bit MSB chunks per range ---
    scf_vals = []
    for k in range(4):
        first = SCF_RANGES[k]
        last = jnp.minimum(jnp.full_like(sblimit, SCF_RANGES[k + 1]), sblimit)
        rng_mask = (sb >= first)[None, :] & (sb[None, :] < last[:, None])
        act_k = (alloc_t > 0) & ch_scf & rng_mask[..., None]
        wk, vk = _scf_slots(sf, scfsi, act_k, 3, 3)
        mk, mbits = BP.pack_groups([(wk, vk, 2)], 32)
        scf_vals.append(BP.crc_device(mk, mbits, _crc8_tabs(), 8))
    scf_vals = jnp.stack(scf_vals, axis=1)                    # [S, 4]

    # --- tail raw bytes at end-of-frame positions ---
    lg = cfgd["lg_frame"] + extra
    dab_ext = cfgd["dab_ext"]
    raw_idx, raw_val = [], []
    if xpad_buf is not None and xpad_buf.shape[1] > 0:
        padmax = xpad_buf.shape[1]
        k = jnp.arange(padmax)[None, :]
        dl = cfgd["dab_length"][:, None]
        use = (k >= dl - xpad_len[:, None]) & (k < dl - 2) & \
            (xpad_len[:, None] > 0)
        raw_idx.append(jnp.where(use, lg[:, None] - dab_ext[:, None]
                                 - dl + k, n_bytes + 31))
        raw_val.append(jnp.where(use, xpad_buf, 0))
        # F-PAD: last two xpad bytes, or zeros (zeros need no slots)
        fpad0 = jnp.sum(jnp.where(k == dl - 2, xpad_buf, 0), axis=1)
        fpad1 = jnp.sum(jnp.where(k == dl - 1, xpad_buf, 0), axis=1)
        has = xpad_len > 0
        raw_idx.append(jnp.stack([jnp.where(has, lg - 2, n_bytes + 31),
                                  jnp.where(has, lg - 1, n_bytes + 31)], 1))
        raw_val.append(jnp.stack([fpad0, fpad1], 1))
    # ScF-CRC placeholders: crc[k] at byte lg-3-k for k < dab_ext
    kk = jnp.arange(4)[None, :]
    use = kk < dab_ext[:, None]
    raw_idx.append(jnp.where(use, lg[:, None] - 3 - kk, n_bytes + 31))
    raw_val.append(jnp.where(use, scf_vals, 0))

    frame, _ = BP.pack_groups(
        [(w16, hdr1, 3), (w16, hdr2, 3), (w16, crc, 3),
         (w_alloc, v_alloc, 2), (w_scfsi, v_scfsi, 2),
         (w_scf, v_scf, 2), (w_smp, v_smp, binpack.SAMPLE_SPANS)],
        n_bytes, raw=list(zip(raw_idx, raw_val)))
    return frame.astype(jnp.uint8), scf_vals.astype(jnp.uint8)


def _crc16_tabs():
    return _crc16_tab().device_tables()


def _crc8_tabs():
    return _crc8_tab().device_tables()
