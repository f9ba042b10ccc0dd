"""AAC block switching: attack detection + window-sequence state machine.

TPU re-design of the reference's per-frame scalar control
(fdk-aac/libAACenc/src/block_switch.cpp:229-346):

- the first-order high-pass IIR (coeffs -0.5095/0.7548,
  block_switch.cpp:130-131, 392-395) is re-expressed as a truncated causal
  FIR: |pole| = 0.51 so 48 taps reach ~1e-14 relative error, turning the
  per-sample recurrence into one batched convolution over the whole
  superframe;
- per-window (granule/8) filtered+unfiltered energies and the 0.7/0.3
  accumulator attack walk (block_switch.cpp:298-312) run as a short scan over
  granules with the 8-window inner loop unrolled;
- the window-sequence transition uses the look-ahead table
  (chgWndSqLkAhd, block_switch.cpp:215-227); the encoder carries one granule
  of delay so every coded AU has its true look-ahead attack flag, matching
  the reference's one-frame psychoacoustic delay;
- stereo channels are synchronised by OR-ing attack flags before the (single,
  per-stream) state machine - equivalent to the reference's common_window
  synchronisation (FDKaacEnc_SyncBlockSwitching) for our always-common-window
  CPEs.

Window sequences: 0=LONG, 1=START, 2=EIGHT_SHORT, 3=STOP.
"""
import jax
import jax.numpy as jnp
import numpy as np

LONG, START, SHORT, STOP = 0, 1, 2, 3

_HP_POLE = 0.5095  # feedback pole: hiPassCoeff[0] = -0.5095 enters the
                   # recurrence as s1 = c1*(u-u1) - (-0.5095)*s1' (the t2
                   # SUBTRACTION in CalcWindowEnergy, block_switch.cpp:392-395)
                   # so the pole is +0.5095, NOT alternating-sign
_HP_C1 = 0.7548    # feedforward coeff
_HP_TAPS = 48      # 0.5095^48 ~ 9e-15: exact to f32
_ACC_OLD, _ACC_NEW = 0.7, 0.3          # accWindowNrgFac (block_switch.cpp:133)
_INV_ATTACK_RATIO = 0.1                # block_switch.cpp:137
_MIN_ATTACK_NRG_120 = 1.0e6            # sum f^2 (int16 units) per 120-sample
                                       # window (minAttackNrg, :143-145)

# chgWndSqLkAhd[lastattack][attack][lastseq] (block_switch.cpp:215-227)
_SEQ_LUT = np.array([
    [[LONG, SHORT, STOP, LONG],        # la=0, a=0
     [START, SHORT, SHORT, START]],    # la=0, a=1
    [[LONG, SHORT, SHORT, LONG],       # la=1, a=0
     [START, SHORT, SHORT, START]],    # la=1, a=1
], np.int32).reshape(-1)               # flat [16]


def hp_fir_kernel(dtype=np.float32):
    """FIR expansion of f[n] = c1*(u[n]-u[n-1]) + p*f[n-1] (p = +0.5095):
    f[n] = sum_j p^j * c1 * (u[n-j] - u[n-j-1]).
    Returns taps h[k] applied to u (length _HP_TAPS+2, causal)."""
    g = _HP_C1 * _HP_POLE ** np.arange(_HP_TAPS + 1)    # on the diffs
    h = np.zeros(_HP_TAPS + 2)
    h[:_HP_TAPS + 1] += g
    h[1:_HP_TAPS + 2] -= g
    return h.astype(dtype)


def init_state(S, n_ch, dtype=jnp.float32):
    return {
        "bs_tail": jnp.zeros((S, n_ch, _HP_TAPS + 1), dtype),  # raw samples
        "bs_acc": jnp.zeros((S, n_ch), dtype),                 # accWindowNrg
        "bs_enF_last": jnp.zeros((S, n_ch), dtype),            # enM1 seed
        "bs_enF_prev7": jnp.zeros((S, n_ch), dtype),           # spread check
        "bs_lastatt": jnp.zeros((S, n_ch), bool),
        "bs_lastidx": jnp.zeros((S, n_ch), jnp.int32),
        "bs_seq": jnp.zeros((S,), jnp.int32),                  # per stream
        "bs_att_pend": jnp.zeros((S,), bool),                  # pending AU's
    }


def window_energies(x, tail, wl, dtype):
    """x: [S, ch, T] int16-units float; tail: [S, ch, taps+1] previous raw
    samples.  Returns (enF [S, ch, T//wl], en [S, ch, T//wl], new_tail)."""
    S, C, T = x.shape
    h = jnp.asarray(hp_fir_kernel(), dtype)
    K = h.shape[0]
    xx = jnp.concatenate([tail, x], axis=-1).reshape(S * C, 1, T + K - 1)
    f = jax.lax.conv_general_dilated(
        xx, h[::-1].reshape(1, 1, K), (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    f = f.reshape(S, C, T)
    enF = (f * f).reshape(S, C, T // wl, wl).sum(-1)
    en = (x * x).reshape(S, C, T // wl, wl).sum(-1)
    return enF, en, xx.reshape(S, C, -1)[..., -(K - 1):]


def attack_scan(enF, state, wl):
    """enF: [S, ch, nau, 8] filtered window energies for the NEW granules.
    Advances the accumulator/attack chain; returns (att [nau, S, ch] bool,
    att_idx [nau, S, ch] int32, state')."""
    S, C, nau, _ = enF.shape
    min_nrg = _MIN_ATTACK_NRG_120 * (wl / 120.0)

    def gran(carry, e):
        # e: [S, ch, 8]
        acc, enM1, enF_p7, lastatt, lastidx = carry
        att = jnp.zeros((S, C), bool)
        idx = jnp.zeros((S, C), jnp.int32)
        for i in range(8):
            acc = _ACC_OLD * acc + _ACC_NEW * enM1
            hit = e[..., i] * _INV_ATTACK_RATIO > acc
            att = att | hit
            idx = jnp.where(hit, i, idx)
            enM1 = e[..., i]
        att = att & (e.max(-1) >= min_nrg)
        # attack spreading over the frame border (block_switch.cpp:315-326)
        spread = (~att) & lastatt & (lastidx == 7) & (enF_p7 > 10.0 * e[..., 1])
        att = att | spread
        idx = jnp.where(spread, 0, idx)
        return (acc, enM1, e[..., 7], att, idx), (att, idx)

    carry0 = (state["bs_acc"], state["bs_enF_last"], state["bs_enF_prev7"],
              state["bs_lastatt"], state["bs_lastidx"])
    enF_t = jnp.moveaxis(enF, 2, 0)  # [nau, S, ch, 8]
    (acc, enM1, p7, lastatt, lastidx), (att, idx) = jax.lax.scan(
        gran, carry0, enF_t)
    state = dict(state, bs_acc=acc, bs_enF_last=enM1, bs_enF_prev7=p7,
                 bs_lastatt=lastatt, bs_lastidx=lastidx)
    return att, idx, state


def sequence_scan(att_coded, att_look, seq0):
    """att_coded/att_look: [nau, S] bool; seq0: [S] carried sequence.
    Returns (seq [nau, S] int32, seq_last [S])."""
    lut = jnp.asarray(_SEQ_LUT)

    def step(seq_prev, xs):
        la, a = xs
        flat = (la.astype(jnp.int32) * 2 + a.astype(jnp.int32)) * 4 + seq_prev
        seq = jnp.take(lut, flat)
        return seq, seq

    seq_last, seq = jax.lax.scan(step, seq0, (att_coded, att_look))
    return seq, seq_last


def block_switch(x, state, wl, dtype):
    """Full block-switching decision for one superframe.

    x: [S, ch, nau*8*wl] UNDELAYED input (int16-units float); wl = window
    length = au_samples/8 at the attack-detection rate.  The coded granules
    are the one-AU-delayed stream, so granule i's look-ahead flag is the
    attack flag of undelayed granule i.
    Returns (seq [nau, S] for the coded granules, state')."""
    S, C, T = x.shape
    nau = T // (8 * wl)
    enF, _, tail = window_energies(x, state["bs_tail"], wl, dtype)
    enF = enF.reshape(S, C, nau, 8)
    att, _, state = attack_scan(enF, state, wl)
    att_s = att.any(-1)                                   # [nau, S] ch-sync
    att_coded = jnp.concatenate([state["bs_att_pend"][None], att_s[:-1]], 0)
    seq, seq_last = sequence_scan(att_coded, att_s, state["bs_seq"])
    state = dict(state, bs_tail=tail, bs_seq=seq_last,
                 bs_att_pend=att_s[-1])
    return seq, state
