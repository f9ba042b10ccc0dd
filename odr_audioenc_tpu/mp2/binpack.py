"""Device-side MP2 sample-section bitstream packing.

The subband codewords dominate the device->host transfer (sbband u16 is
[S,2,3,12,32] = 4.6 KB/stream, ~12x the real payload: a 128 kbps DAB frame
is 384 bytes total).  This module serializes the sample section (the exact
write_samples_new order, libtoolame-dab encode_new.c:560-598 - granule,
3-sample step, subband, channel) ON DEVICE into [S, n_bytes] uint8 plus a
per-stream bit count; the host packer then splices those bits after the
header/alloc/scfsi/scf section it still writes itself (tiny, ~60 bytes).

TPU shape: every slot of a static [S, 3, 4, 32, 2, 3] grid carries a
(width, value) pair computed with one-hot table selects; bit offsets are an
exclusive cumsum in serialization order; each codeword (width <= 16) lands
in <= 3 output bytes via a batched scatter-add (contributions of distinct
codewords never overlap within a byte, so integer add == bitwise or).
"""
import jax
import jax.numpy as jnp

from .. import tables as T
from .allocate import _onehot_lut, _onehot_sel

SBLIMIT = 32


def pack_payload(sbband, bit_alloc, ft, sblimit, nch, jsbound, n_bytes):
    """Serialize the sample section on device.

    sbband: [S,2,3,12,32] int32 codewords (quantize() output);
    bit_alloc: [S,2,32] int32; ft: allocate._frame_tables dict;
    sblimit/nch/jsbound: [S] int32; n_bytes: static output width.
    Returns (payload [S, n_bytes] uint8, nbits [S] int32)."""
    S = sbband.shape[0]

    si = _onehot_sel(ft["step_idx"][:, None], bit_alloc)      # [S,2,32]
    nbits = _onehot_lut(si, jnp.asarray(T.BITS)).astype(jnp.int32)
    group = _onehot_lut(si, jnp.asarray(T.GROUP)).astype(jnp.int32)
    steps = _onehot_lut(si, jnp.asarray(T.STEPS)).astype(jnp.int32)

    sb = jnp.arange(SBLIMIT)
    # channel loop is `ch < (sb < jsbound ? nch : 1)`: above jsbound (or in
    # mono) only channel 0 is serialized (it carries the joint codewords)
    act0 = (bit_alloc[:, 0] > 0) & (sb[None, :] < sblimit[:, None])
    act1 = (bit_alloc[:, 1] > 0) & (sb[None, :] < sblimit[:, None]) & \
        (sb[None, :] < jsbound[:, None]) & (nch[:, None] == 2)
    active = jnp.stack([act0, act1], axis=1)                  # [S,2,32]

    # values in slot order [S, gr, jstep, sb, ch, x]
    v = sbband.astype(jnp.int32).transpose(0, 2, 3, 1, 4)     # [S,3,12,2,32]
    v = v.reshape(S, 3, 4, 3, 2, SBLIMIT).transpose(0, 1, 2, 5, 4, 3)

    grouped = (group == 1) & active                           # [S,2,32]
    indiv = (group == 3) & active
    y = steps
    v_comb = v[..., 0] + v[..., 1] * y.transpose(0, 2, 1)[:, None, None] \
        + v[..., 2] * (y * y).transpose(0, 2, 1)[:, None, None]
    # broadcast per-(ch,sb) tables onto the slot grid
    nb_g = nbits.transpose(0, 2, 1)[:, None, None]            # [S,1,1,32,2]
    grp_g = grouped.transpose(0, 2, 1)[:, None, None]
    ind_g = indiv.transpose(0, 2, 1)[:, None, None]
    w = jnp.where(ind_g[..., None], nb_g[..., None],
                  0) * jnp.ones((1, 3, 4, 1, 1, 3), jnp.int32)
    w = w.at[..., 0].set(jnp.where(grp_g, nb_g, w[..., 0]))
    val = jnp.where(grp_g[..., None] & (jnp.arange(3) == 0), v_comb[..., None],
                    jnp.where(ind_g[..., None], v, 0))

    K = 3 * 4 * SBLIMIT * 2 * 3
    w = w.reshape(S, K)
    val = val.reshape(S, K)
    end = jnp.cumsum(w, axis=1)                               # inclusive
    start = end - w
    total_bits = end[:, -1]

    b0 = start >> 3
    last_b = (end - 1) >> 3
    outs = []
    idxs = []
    for t in range(3):
        bt = b0 + t
        sh = end - 8 * (bt + 1)
        contrib = jnp.where(sh >= 0,
                            (val >> jnp.maximum(sh, 0)) & 0xFF,
                            (val << jnp.minimum(-sh, 8)) & 0xFF)
        ok = (w > 0) & (bt <= last_b)
        outs.append(jnp.where(ok, contrib, 0))
        idxs.append(jnp.clip(bt, 0, n_bytes - 1))
    contrib = jnp.concatenate(outs, axis=1)
    idx = jnp.concatenate(idxs, axis=1)

    payload = jnp.zeros((S, n_bytes), jnp.int32)
    payload = payload.at[jnp.arange(S)[:, None], idx].add(contrib)
    return payload.astype(jnp.uint8), total_bits.astype(jnp.int32)
