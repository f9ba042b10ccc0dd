"""Pallas TPU kernel for the psy-1 tonal walk (tonal_fast's relaxation).

The jnp formulation in psycho1_fast.tonal_fast is ~100 small shift/compare
ops over [B, 512] tensors; as separate XLA kernels each pays a dispatch and
an HBM round trip, making the walk ~80% of the whole MP2 encode step on
TPU.  Here the whole relaxation runs in ONE kernel with the spectrum tile
resident in VMEM: the shifts become register/VMEM moves and the kernel is
memory-bound on exactly one read and one write of the spectrum.

Semantics are identical to tonal_fast (same left-causal relaxation of
psycho_1.c:267-340's sequential walk); equality is asserted against the jnp
version in tests/test_fast_path.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import tables as T
from .psycho1 import NBINS, PAD, DBMIN

_ROW_TILE = 256
BIG = NBINS + 1


def _shift_right(x, d, fill):
    """x shifted right by d along the last axis (element i reads i-d)."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (d,), fill, x.dtype), x[..., :-d]], axis=-1)


def _shift_left(x, d, fill):
    return jnp.concatenate(
        [x[..., d:], jnp.full(x.shape[:-1] + (d,), fill, x.dtype)], axis=-1)


def _tonal_kernel(power_ref, cand_ref, runs_ref, pw_out, member_out,
                  typ_out):
    # masks live as int32 0/1 vectors (Mosaic rejects i1/i8 vector casts in
    # shifts/concats); booleans appear only as ephemeral compare results
    power = power_ref[:]                            # [T, 512] f32
    cand = cand_ref[:]                              # [T, 512] i32 0/1
    runs = runs_ref[:]                              # [1, 512] int32
    Tn = power.shape[0]
    one = jnp.int32(1)
    zero = jnp.int32(0)
    bins = jax.lax.broadcasted_iota(jnp.int32, (Tn, NBINS), 1)
    runs_b = jnp.broadcast_to(runs, (Tn, NBINS))

    def lin(x):
        return jnp.power(jnp.float32(10.0), jnp.float32(0.1) * x)

    def db(p):
        return jnp.float32(10.0) * jnp.log10(jnp.maximum(p, jnp.float32(1e-37)))

    def min_zeroer(accept):
        mz = jnp.full((Tn, NBINS), BIG, jnp.int32)
        for d in range(1, PAD + 1):
            src = jnp.where(runs_b >= d, accept, zero)
            zr = _shift_right(src, d, zero)
            zl = _shift_left(src, d, zero)
            mz = jnp.where(zr > 0, jnp.minimum(mz, bins - d), mz)
            mz = jnp.where(zl > 0, jnp.minimum(mz, bins + d), mz)
        return mz

    def boost_values(mz):
        p_lin = lin(power)

        def nb(shift_fn, d):
            v = shift_fn(p_lin, d, jnp.float32(0.0))
            m = shift_fn(mz, d, BIG)
            return jnp.where(m < bins, jnp.float32(0.0), v)
        return db(p_lin + nb(_shift_right, 1) + nb(_shift_left, 1))

    def decide(accept):
        mz = min_zeroer(accept)
        boost = boost_values(mz)
        ok = jnp.where(mz < bins, zero, one)        # ~excluded
        maxv = power - jnp.float32(7.0)
        viol = jnp.zeros((Tn, NBINS), jnp.int32)
        for o in list(range(-PAD, -1)) + list(range(2, PAD + 1)):
            # value the walk sees at offset o from each candidate
            if o < 0:
                mz_o = _shift_right(mz, -o, BIG)
                acc_o = _shift_right(accept, -o, zero)
                val_o = _shift_right(power, -o, jnp.float32(DBMIN))
                b_ok = bins + o >= 0
                bst_o = _shift_right(boost, -o, jnp.float32(DBMIN))
                val = jnp.where(mz_o < bins, jnp.float32(DBMIN),
                                jnp.where(acc_o > 0, bst_o, val_o))
            else:
                mz_o = _shift_left(mz, o, BIG)
                val_o = _shift_left(power, o, jnp.float32(DBMIN))
                b_ok = bins + o < NBINS
                val = jnp.where(mz_o < bins, jnp.float32(DBMIN), val_o)
            hit = (runs_b >= abs(o)) & b_ok & (maxv < val)
            viol = jnp.where(hit, one, viol)
        return jnp.where((cand > 0) & (ok > 0) & (viol == 0), one, zero)

    accept = decide(jnp.zeros((Tn, NBINS), jnp.int32))
    mz = min_zeroer(accept)
    boost = boost_values(mz)
    zeroed = jnp.where(mz < BIG, one, zero)
    pw = jnp.where(zeroed > 0, jnp.float32(DBMIN),
                   jnp.where(accept > 0, boost, power))

    # list surgery (psycho_1.c:313-315) reformulated gather/scatter-free:
    # member p is dropped iff p is accepted, has an accepted predecessor,
    # and the NEXT accepted q satisfies q - p <= run(q).  prefix-max /
    # suffix-min run as Hillis-Steele shift passes entirely in VMEM (the
    # jnp formulation's take_along_axis + scatter cost ~22 ms at B=2048).
    idxm = jnp.where(accept > 0, bins, jnp.int32(-1))
    P = idxm
    s = 1
    while s < NBINS:
        P = jnp.maximum(P, _shift_right(P, s, jnp.int32(-1)))
        s *= 2
    prev = _shift_right(P, 1, jnp.int32(-1))       # last accepted before b

    INF = jnp.int32(NBINS + 7)
    Q = jnp.where(accept > 0, bins, INF)           # suffix-min accepted idx
    Rq = jnp.where(accept > 0, runs_b, zero)       # run(q) carried alongside
    s = 1
    while s < NBINS:
        Qs = _shift_left(Q, s, INF)
        Rs = _shift_left(Rq, s, zero)
        take = Qs < Q
        Q = jnp.where(take, Qs, Q)
        Rq = jnp.where(take, Rs, Rq)
        s *= 2
    nxt = _shift_left(Q, 1, INF)                   # next accepted after b
    rn = _shift_left(Rq, 1, zero)
    drop = (prev >= 0) & (nxt < INF) & ((nxt - bins) <= rn)
    member = jnp.where((accept > 0) & ~drop, one, zero)

    pw_out[:] = pw
    member_out[:] = member
    typ_out[:] = jnp.where((accept > 0) & (zeroed == 0), one, zero)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tonal_relax_pallas(power, cand, interpret=False):
    """power [B, 512] f32, cand [B, 512] bool ->
    (power' [B,512] f32, member [B,512] bool, typ [B,512] bool).
    The full tonal walk including the member-list surgery."""
    B = power.shape[0]
    tile = min(_ROW_TILE, B)
    assert B % tile == 0, f"batch {B} not a multiple of the row tile {tile}"
    runs = jnp.asarray(T.TONAL_RUN, jnp.int32).reshape(1, NBINS)
    grid = (B // tile,)
    pw, acc, zr = pl.pallas_call(
        _tonal_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, NBINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, NBINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NBINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, NBINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, NBINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, NBINS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NBINS), jnp.float32),
            jax.ShapeDtypeStruct((B, NBINS), jnp.int32),
            jax.ShapeDtypeStruct((B, NBINS), jnp.int32),
        ],
        interpret=interpret,
    )(power.astype(jnp.float32), cand.astype(jnp.int32), runs)
    return pw, acc != 0, zr != 0


def tonal_pallas(power, cand, dtype, interpret=False):
    """Drop-in replacement for psycho1_fast.tonal_fast: the whole walk -
    relaxation AND list surgery - runs in the fused kernel."""
    pw, member, typ = tonal_relax_pallas(power, cand, interpret=interpret)
    return pw.astype(dtype), member, typ
