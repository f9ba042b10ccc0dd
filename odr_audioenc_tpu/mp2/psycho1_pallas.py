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


def _tonal_body(power, cand, runs):
    # masks live as int32 0/1 vectors (Mosaic rejects i1/i8 vector casts in
    # shifts/concats); booleans appear only as ephemeral compare results
    # power [T, 512] f32; cand [T, 512] i32 0/1; runs [1, 512] i32
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

    typ = jnp.where((accept > 0) & (zeroed == 0), one, zero)
    return pw, member, typ


def _tonal_kernel(power_ref, cand_ref, runs_ref, pw_out, member_out,
                  typ_out):
    pw, member, typ = _tonal_body(power_ref[:], cand_ref[:], runs_ref[:])
    pw_out[:] = pw
    member_out[:] = member
    typ_out[:] = typ


NBANDS = 26


def _tonal_noise_kernel(power_ref, cand_ref, energy_ref, runs_ref, bmt_ref,
                        base_ref, span_ref, pw_out, tmem_out, nmem_out):
    """Tonal walk + noise labeling fused (noise_fast's 26-band loop is ~80
    dispatch-bound XLA kernels; here it is a VMEM loop)."""
    # --- tonal part: reuse _tonal_kernel by calling it on local refs is not
    # possible; inline via the shared helper below ---
    pw, member, typ = _tonal_body(power_ref[:], cand_ref[:], runs_ref[:])

    power = pw
    is_tone = typ
    energy = energy_ref[:]
    bmt = bmt_ref[:]                                # [512, 32] f32 (padded)
    base = base_ref[:]                              # [1, 32] i32
    span_i = span_ref[:]                            # [1, 32] i32
    Tn = power.shape[0]
    one = jnp.int32(1)
    zero = jnp.int32(0)
    bins = jax.lax.broadcasted_iota(jnp.int32, (Tn, NBINS), 1)
    binsf = bins.astype(jnp.float32)

    def lin(x):
        return jnp.power(jnp.float32(10.0), jnp.float32(0.1) * x)

    def db(p):
        return jnp.float32(10.0) * jnp.log10(jnp.maximum(p, jnp.float32(1e-37)))

    usable = jnp.where((is_tone == 0) & (power != jnp.float32(DBMIN)),
                       jnp.float32(1.0), jnp.float32(0.0))
    p_lin = lin(power) * usable
    cf = jnp.float32(T.CF)

    def bandsum(x):
        return jax.lax.dot_general(
            x, bmt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [T, 32]

    sums = bandsum(p_lin)
    wsum = bandsum(cf * energy * usable)
    wpos = bandsum(cf * energy * usable * binsf)
    basef = jnp.broadcast_to(base, (Tn, 32)).astype(jnp.float32)
    span_b = jnp.broadcast_to(span_i, (Tn, 32))
    spanf = jnp.maximum(span_b, 1).astype(jnp.float32)
    weight = (wpos - basef * wsum) / spanf
    no_comp = sums <= jnp.float32(0.0)
    sum_db = jnp.where(no_comp, jnp.float32(DBMIN), db(sums))
    index = weight / jnp.maximum(sums, jnp.float32(1e-37))
    centre = jnp.broadcast_to(base, (Tn, 32)) + (index * spanf).astype(jnp.int32)
    centre = jnp.where(no_comp, jnp.broadcast_to(base + span_i // 2, (Tn, 32)),
                       centre)
    centre = jnp.clip(centre, 0, NBINS - 1)

    tone_next = _shift_left(is_tone, 1, zero)
    # consumed lines -> DBMIN (inband = any band covers the line)
    inband = jnp.sum(bmt, axis=1)[None, :] > jnp.float32(0.0)   # [1, 512]
    power = jnp.where((usable > 0) & inband, jnp.float32(DBMIN), power)
    nmem = jnp.zeros((Tn, NBINS), jnp.int32)
    for k in range(NBANDS):
        c_k = centre[:, k][:, None]                              # [T, 1]
        oh = bins == c_k
        t_c = jnp.max(jnp.where(oh, is_tone, zero), axis=1, keepdims=True)
        t_c1 = jnp.max(jnp.where(oh, tone_next, zero), axis=1, keepdims=True)
        c_adj = jnp.clip(jnp.where(t_c > 0,
                                   jnp.where(t_c1 > 0, c_k + 1, c_k - 1), c_k),
                         0, NBINS - 1)
        valid = span_b[:, k][:, None] > 0
        oh2 = (bins == c_adj) & valid
        power = jnp.where(oh2, sum_db[:, k][:, None], power)
        nmem = jnp.where(oh2, one, nmem)

    pw_out[:] = power
    tmem_out[:] = member
    nmem_out[:] = nmem


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


@functools.partial(jax.jit, static_argnames=("interpret",))
def tonal_noise_pallas(power, cand, energy, bmt, base_row, span_row,
                       interpret=False):
    """Fused tonal walk + noise labeling.

    power/cand/energy: [B, 512]; bmt: [512, 32] band matrix (transposed,
    zero-padded); base_row/span_row: [32] uniform noise-band geometry
    (homogeneous sample rate).  Returns (power' [B,512] f32,
    tone_member [B,512] bool, noise_member [B,512] bool)."""
    B = power.shape[0]
    tile = min(_ROW_TILE, B)
    assert B % tile == 0, f"batch {B} not a multiple of the row tile {tile}"
    runs = jnp.asarray(T.TONAL_RUN, jnp.int32).reshape(1, NBINS)
    grid = (B // tile,)

    def row_spec():
        return pl.BlockSpec((tile, NBINS), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    pw, tm, nm = pl.pallas_call(
        _tonal_noise_kernel,
        grid=grid,
        in_specs=[
            row_spec(), row_spec(), row_spec(),
            pl.BlockSpec((1, NBINS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NBINS, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec(), row_spec(), row_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((B, NBINS), jnp.float32),
            jax.ShapeDtypeStruct((B, NBINS), jnp.int32),
            jax.ShapeDtypeStruct((B, NBINS), jnp.int32),
        ],
        interpret=interpret,
    )(power.astype(jnp.float32), cand.astype(jnp.int32),
      energy.astype(jnp.float32), runs, bmt.astype(jnp.float32),
      base_row.reshape(1, 32).astype(jnp.int32),
      span_row.reshape(1, 32).astype(jnp.int32))
    return pw, tm != 0, nm != 0
