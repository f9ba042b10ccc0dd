"""Device-side MP2 sample-section slot construction.

Serializes the sample section in the exact write_samples_new order
(libtoolame-dab encode_new.c:560-598 - granule, 3-sample step, subband,
channel) as a static [S, 3, 4, 32, 2, 3] grid of (width, value) slots:
grouped allocations combine their triplet into one codeword in slot x=0;
individual allocations emit three codewords.  Packing itself rides the
one-hot-matmul scatter in bitpack.py (XLA scatter is ~150M updates/s on
the target TPU - far too slow; see tools/prof_pack.py).
"""
import jax.numpy as jnp

from .. import bitpack as BP
from .. import tables as T
from .allocate import _onehot_lut, _onehot_sel

SBLIMIT = 32
SAMPLE_SPANS = 3  # sample codewords are <= 16 bits -> at most 3 bytes


def sample_slots(sbband, bit_alloc, ft, sblimit, nch, jsbound):
    """(widths, values) [S, K=2304] int32 in serialization order.

    sbband: [S,2,3,12,32] int32 codewords (quantize() output);
    bit_alloc: [S,2,32] int32; ft: allocate._frame_tables dict;
    sblimit/nch/jsbound: [S] int32."""
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
    return w.reshape(S, K), val.reshape(S, K)


def pack_payload(sbband, bit_alloc, ft, sblimit, nch, jsbound, n_bytes):
    """Serialize the sample section on device -> (payload [S, n_bytes]
    uint8, nbits [S] int32).  The host packer splices these bits after the
    header/alloc/scfsi/scf section (see host/mp2pack.py); framepack.py
    emits the complete frame instead."""
    w, val = sample_slots(sbband, bit_alloc, ft, sblimit, nch, jsbound)
    payload, total_bits = BP.pack_groups([(w, val, SAMPLE_SPANS)], n_bytes)
    return payload.astype(jnp.uint8), total_bits.astype(jnp.int32)
